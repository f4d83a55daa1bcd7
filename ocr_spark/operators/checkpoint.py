"""Checkpointed, resumable extraction runs with per-partition lineage.

The north rule requires the 10^12-document job to be *resumable from
checkpoint with per-partition lineage + metrics*: a failed run must
restart without recomputing completed partitions. The reference has no
equivalent (its fault tolerance is a per-request try/except,
fapi.py:255-263); this is the cluster-scale replacement.

Design (driver-orchestrated chunk manifest):

* The input is split into ``n_chunks`` deterministic, disjoint chunks by
  ``pmod(xxhash64(doc_id), n_chunks)`` — a pure function of the data, so
  every run of the same input produces the same chunks regardless of
  cluster size or input file layout.
* Each chunk is one Spark job: filter -> extract_documents -> atomic
  parquet write to ``out/data/chunk=K/`` (written to a temp dir, renamed
  into place — a crashed task can never leave a half-chunk that looks
  complete).
* After a chunk lands, one lineage row (FIXTURES.md §6 schema: run_id,
  partition_id, doc/media counts, status, timings, throughput) is
  appended to the ``out/_lineage/`` sidecar. The manifest of completed
  chunks IS the set of lineage rows with status='done' — a single
  source of truth for both resume and metrics.
* Resume = re-run with the same ``out`` dir: completed chunks are
  anti-joined away by chunk id (a driver-side set difference — the
  manifest is tiny: n_chunks rows, even at 10^12 docs with 10k chunks)
  and only the remainder is computed.

At 100 TB the chunk count trades off resume granularity vs scheduling
overhead: each chunk should be many executor-partitions of work (the
inner job still parallelizes across the whole cluster via the exploded
media repartition in operators/pipeline.py).
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .pipeline import extract_documents

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("doc_count", T.LongType()),
        T.StructField("media_count", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("finished_at", T.TimestampType()),
        T.StructField("throughput_docs_per_s", T.DoubleType()),
    ]
)


def _chunk_col(n_chunks: int):
    return F.pmod(F.xxhash64("doc_id"), F.lit(n_chunks)).cast("int")


def completed_chunks(spark: SparkSession, out_dir: str) -> set[int]:
    """Chunk ids already marked done in the lineage sidecar."""
    lineage_dir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lineage_dir) or not os.listdir(lineage_dir):
        return set()
    rows = (
        spark.read.schema(LINEAGE_SCHEMA)
        .parquet(lineage_dir)
        .filter(F.col("status") == "done")
        .select("partition_id")
        .collect()
    )
    return {r["partition_id"] for r in rows}


def _append_lineage(spark: SparkSession, out_dir: str, row: dict) -> None:
    lineage_dir = os.path.join(out_dir, "_lineage")
    spark.createDataFrame([row], schema=LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(lineage_dir)


def run_checkpointed(
    df: DataFrame,
    out_dir: str,
    n_chunks: int = 8,
    mode: str = "exploded",
    run_id: str | None = None,
    max_chunks: int | None = None,
) -> dict:
    """Extract ``df`` (doc_id, spans) into ``out_dir`` resumably.

    ``max_chunks`` limits how many *pending* chunks this invocation
    processes (used by the resume tests to simulate a mid-run crash).

    Returns a summary dict: chunks done now / skipped (already done) /
    remaining.
    """
    spark = df.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    os.makedirs(os.path.join(out_dir, "data"), exist_ok=True)

    done = completed_chunks(spark, out_dir)
    pending = [k for k in range(n_chunks) if k not in done]
    if max_chunks is not None:
        pending = pending[:max_chunks]

    chunked = df.withColumn("_chunk", _chunk_col(n_chunks))
    ran = 0
    for k in pending:
        t0 = time.time()
        part = chunked.filter(F.col("_chunk") == k).drop("_chunk")
        result = extract_documents(part, mode=mode)

        # atomic landing: write to tmp, rename into place
        final = os.path.join(out_dir, "data", f"chunk={k}")
        tmp = os.path.join(out_dir, "data", f"_tmp_chunk_{k}_{run_id}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        result.write.mode("overwrite").parquet(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)

        stats = spark.read.parquet(final).agg(
            F.count("*").alias("docs"), F.sum("n_media").alias("media")
        ).collect()[0]
        t1 = time.time()
        _append_lineage(
            spark,
            out_dir,
            {
                "run_id": run_id,
                "partition_id": k,
                "doc_count": stats["docs"] or 0,
                "media_count": int(stats["media"] or 0),
                "status": "done",
                "started_at": _ts(t0),
                "finished_at": _ts(t1),
                "throughput_docs_per_s": round(
                    (stats["docs"] or 0) / max(t1 - t0, 1e-9), 3
                ),
            },
        )
        ran += 1

    return {
        "run_id": run_id,
        "n_chunks": n_chunks,
        "ran": ran,
        "skipped": len(done),
        "remaining": n_chunks - len(done) - ran,
        "out_dir": out_dir,
    }


def _ts(epoch: float):
    import datetime

    return datetime.datetime.fromtimestamp(epoch)


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """The assembled output across all completed chunks."""
    return spark.read.parquet(os.path.join(out_dir, "data"))


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(
        os.path.join(out_dir, "_lineage")
    )
