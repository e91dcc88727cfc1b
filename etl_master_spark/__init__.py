"""etl_master_spark — PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
surface of the reference repo (xuChenSJTU/ETL-master — the "ETL" cross-domain
recommender, ACM TOIS / arXiv:2009.06884), generalized into reusable,
oracle-checkable DataFrame operators plus LLM-data-pipeline extensions
(dedup, similarity search, multimodal plumbing, text analysis) designed for
100 TB scale.

Layout
------
- ``sources``    : parquet IO + the events→ratings derivation (reference
                   ``Dataset_CDAE.py:26-33`` pickle loads, relationalized)
- ``functions``  : portable deterministic hashing (the engine's substitute for
                   ``sklearn.utils.shuffle(random_state=...)``), shared SQL
                   fragments emitted identically for Spark and DuckDB
- ``operators``  : recsplit (E2-E5), ranking/eval (R1-R7), stats (E11-E13,
                   M1-M3), relational (join/agg/window coverage), text
                   (dedup + analysis), vectors (ANN / similarity)
- ``plans``      : query registry consumed by ``__spark_entry__.py``
- ``streaming``  : Structured Streaming spellings of the event pipeline
- ``model``      : the non-relational model path (mapInPandas / ALS), kept
                   out of the oracle-checked surface by design
"""

__version__ = "0.1.0"
