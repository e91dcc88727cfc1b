from .registry import QUERIES, ORACLES

__all__ = ["QUERIES", "ORACLES"]
