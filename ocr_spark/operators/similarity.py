"""Similarity search over embedding columns (array<float>).

``brute_topk``   exact cosine top-k against a query vector — the baseline;
                 one broadcast of the query row, no shuffle except final
                 top-k (which AQE executes as a partial+final TakeOrdered).
``lsh_topk``     random-hyperplane-LSH bucketed variant — the scale path:
                 probes only same-bucket vectors, so cost per query is
                 bucket-sized, not corpus-sized.  Hyperplanes are derived
                 deterministically from md5 so the oracle reproduces them.

All arithmetic is native Spark SQL over arrays (zip_with/aggregate) —
JVM-side, no Python.  Values are rounded before comparison because the
oracle computes in a different engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOP_K = 10
N_PLANES = 6  # 64 buckets


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k by cosine similarity to the vec_id=0 query vector."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(query))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q")), 4).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), "vec_id").limit(TOP_K)


def _bucket_of(emb: Column, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket: bit p = sign(dot(v, H_p)) where
    H_p[i] = (md5-derived int in [-8, 8)) — deterministic and portable."""
    def plane_of(p: int) -> Column:
        # single-arg lambda on purpose: Spark binds higher-order lambda
        # params by arity, so a defaulted second param would receive the
        # element index instead of the closure value.
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"plane{p}:"), i.cast("string"))),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 16
                - 8
            ).cast("double"),
        )

    bits = []
    for p in range(N_PLANES):
        plane = plane_of(p)
        d = F.aggregate(
            F.zip_with(emb, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d > 0, F.lit(2**p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).alias("bucket")


def lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: top-k within the query's LSH bucket only (the IVF-style scale
    path — probes 1/2^N_PLANES of the corpus per query on average)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "bucket", _bucket_of(F.col("embedding"))
    )
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qb")
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(query), F.col("bucket") == F.col("qb"))
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("q")), 4).alias("cos"),
        )
    )
    return scored.orderBy(F.desc("cos"), "vec_id").limit(TOP_K)
