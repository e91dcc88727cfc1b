from .hashing import PHASH_A, PHASH_B, PHASH_P, phash_frag, phash_py

__all__ = ["PHASH_A", "PHASH_B", "PHASH_P", "phash_frag", "phash_py"]
