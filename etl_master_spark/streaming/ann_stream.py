"""Streaming ANN index maintenance — PQ-append of arriving embeddings.

The batch face (``vectors.pq_index_append``) freezes a PQ codebook on the
historical corpus slice and encodes a new batch against it WITHOUT
retraining. Production ingest is a STREAM of embedding batches; this
module is that third face (r8 verdict item 7): ``foreachBatch`` PQ-encode
of arriving vectors against ONE frozen codebook (trained once at query
start, broadcast per batch, never recomputed), epoch-keyed idempotent
appends (a replayed micro-batch rewrites its own dir — never a double
count), plus a per-batch drift series: rising mean quantization error
against the frozen codebook is the retrain signal.

Scale shape: the historical corpus is scanned ONCE (codebook training);
each micro-batch costs one scan of its own files + a broadcast-codebook
argmin + a codebook-sized aggregate. No state store — the "index" is the
appended code files themselves, exactly what an IVF-PQ serving tier
ingests.

Reference parity: the reference is batch-only (in-memory epoch loop,
``main_my.py:151``); embedding export is S5 (``model_my.py:111-145``).
Streaming maintenance is the driver-mandated scale extension; the encode
kernel is shared with the batch face so tests pin stream == batch
bit-for-bit on the same arrival set.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import phash_frag
from ..operators.vectors import (
    IDX_OLD_LT,
    IDX_OLD_MOD,
    IDX_SEED,
    _pq_d2,
    _pq_train_cdf,
    _pq_vsub,
)
from ..sources.io import load_table, spread_by


def frozen_pq_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codebook trained once on the historical (~80%) slice —
    the identical deterministic trajectory the batch face trains
    (``vectors.pq_index_append``), localCheckpoint'd so every
    micro-batch reuses the materialized frame instead of replaying
    Lloyd rounds."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    h = F.expr(phash_frag("vec_id", seed=IDX_SEED))
    old = spread_by(emb.filter((h % IDX_OLD_MOD) < IDX_OLD_LT), "vec_id")
    return _pq_train_cdf(spark, _pq_vsub(old)).localCheckpoint()


def encode_batch(cdf: DataFrame, batch: DataFrame) -> DataFrame:
    """(vec_id, m, code, qerr) for one embedding batch against the frozen
    codebook — the batch face's broadcast-argmin kernel verbatim, so the
    per-vector codes and distances are bit-equal to what
    ``pq_index_append`` assigns the same vector."""
    vsub = _pq_vsub(spread_by(batch.select("vec_id", "embedding"), "vec_id"))
    best = F.min(
        F.struct(_pq_d2().alias("d2"), F.col("k").alias("k"))
    ).alias("b")
    return (
        vsub.join(F.broadcast(cdf), "m")
        .groupBy("vec_id", "m")
        .agg(best)
        .select(
            "vec_id",
            "m",
            F.col("b.k").alias("code"),
            F.col("b.d2").alias("qerr"),
        )
    )


def make_pq_append_processor(
    spark: SparkSession, sf_dir: str, work_dir: str
):
    """The foreachBatch processor, exposed so tests can drive replay
    directly: encode the batch's NEW vectors (same hash split as the
    batch face) against the frozen codebook, land them under an
    epoch-keyed dir. A replayed epoch rewrites its own dir — idempotent,
    the eval_stream append_chunk contract."""
    cdf = frozen_pq_codebook(spark, sf_dir)
    h = F.expr(phash_frag("vec_id", seed=IDX_SEED))

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # Checkpoint/state desync guard (mirrors eval_stream.read_chunks):
        # under monotonic-epoch streaming only the RUNNING epoch can be
        # replayed, so code dirs strictly above it mean a reset/deleted
        # streaming checkpoint with a retained codes/ dir — the fresh
        # checkpoint renumbers epochs from 0 with a possibly different
        # file-to-epoch assignment, and silently rewriting e0 while stale
        # e1..eN persist would double-count or drop vectors in every
        # reader. Fail loudly instead.
        ahead = sorted(
            e for e in _code_epochs(work_dir) if e > int(epoch_id)
        )
        if ahead:
            raise RuntimeError(
                f"pq stream codes dir has epochs {ahead} above running "
                f"epoch {int(epoch_id)} — codes dir and streaming "
                "checkpoint out of sync; clear one of them"
            )
        new = batch_df.filter((h % IDX_OLD_MOD) >= IDX_OLD_LT)
        codes = encode_batch(cdf, new).withColumn(
            "batch_id", F.lit(int(epoch_id)).cast("long")
        )
        path = Path(work_dir) / "codes" / f"e{epoch_id}"
        if path.exists():  # replayed micro-batch: same rows, rewrite
            shutil.rmtree(path)
        codes.write.parquet(str(path))

    return process


def _code_epochs(work_dir: str) -> list[int]:
    base = Path(work_dir) / "codes"
    if not base.exists():
        return []
    return sorted(
        int(p.name[1:])
        for p in base.iterdir()
        if p.name.startswith("e") and p.name[1:].isdigit()
    )


def pq_index_append_stream(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    work_dir: str,
    max_files_per_trigger: int = 1,
):
    """Start the streaming index-append (availableNow); returns the
    streaming query — caller awaits, then reads the index/audit views
    below. ``stream_dir`` holds embeddings-schema parquet files arriving
    over time; ``sf_dir`` supplies the schema and the frozen-codebook
    training slice."""
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    process = make_pq_append_processor(spark, sf_dir, work_dir)
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(Path(work_dir) / "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def read_pq_codes(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """All appended (vec_id, m, code, qerr, batch_id) rows — the raw
    index a serving tier would ingest."""
    paths = [
        str(Path(work_dir) / "codes" / f"e{e}")
        for e in _code_epochs(work_dir)
    ]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def _codes_or_raise(spark: SparkSession, work_dir: str) -> DataFrame:
    codes = read_pq_codes(spark, work_dir)
    if codes is None:
        raise RuntimeError(
            f"no PQ codes under {work_dir}/codes — the stream has not "
            "drained any batch yet (await the query before auditing)"
        )
    return codes


def pq_stream_index_audit(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-(subspace, code) occupancy + mean quantization error of
    everything appended so far — the EXACT output shape of the batch
    face, so convergence is checkable row-for-row: after the stream
    drains the same arrival set, this equals ``pq_index_append``."""
    codes = _codes_or_raise(spark, work_dir)
    return (
        codes.groupBy("m", "code")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.round(F.avg("qerr"), 6).alias("avg_qerr"),
        )
        .orderBy("m", "code")
    )


def read_pq_drift(spark: SparkSession, work_dir: str) -> DataFrame:
    """Per-batch drift series (batch_id, n_codes, avg_qerr): the retrain
    trigger — derived from the epoch-keyed code files, so a replayed
    batch can never double-count a row."""
    codes = _codes_or_raise(spark, work_dir)
    return (
        codes.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_codes"),
            F.round(F.avg("qerr"), 6).alias("avg_qerr"),
        )
        .orderBy("batch_id")
    )
