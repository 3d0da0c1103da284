"""Approximate nearest-neighbor search over the embeddings table.

Baseline: brute-force cosine top-k (docpipe.cosine_topk — oracle-checked).
Scale path: random-hyperplane LSH — bucket vectors by the sign pattern of
h fixed hyperplane projections, probe the query's bucket plus all
Hamming-1 neighbors, brute-force only within candidates. Candidate count
is ~N·(h+1)/2^h, so the cross-join is linear-ish instead of quadratic;
on a cluster the bucket join is a plain shuffle join on the bucket key.

The hyperplanes come from a seeded RNG and are broadcast; projection runs
as a vectorized pandas UDF over Arrow batches (matrix multiply per
batch — no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LSH_SEED = 42


def _bucket_udf(planes: np.ndarray):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket_of(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.values).astype(np.float64)  # (batch, dim)
        signs = (m @ planes.T) > 0  # (batch, h)
        vals = (signs * (1 << np.arange(planes.shape[0]))).sum(axis=1)
        return pd.Series(vals.astype(np.int32))

    return bucket_of


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 20,
    k: int = 3,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """(query_id, neighbor_id, rnk, sim_ppm) — approximate top-k via
    multiprobe (Hamming ≤ 1) random-hyperplane LSH."""
    rng = np.random.default_rng(LSH_SEED)
    planes = rng.standard_normal((n_planes, dim))
    bucket_of = _bucket_udf(planes)

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "bucket", bucket_of(F.col("embedding"))
    )
    cands = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        "bucket",
    )
    # query probes its own bucket + every Hamming-1 bucket
    probes = [F.col("bucket")] + [
        F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)
    ]
    q = (
        e.where(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(F.array(*probes)).alias("bucket"),
        )
    )
    from .docpipe import _cosine

    sims = (
        q.join(cands, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cosine(F.col("qe"), F.col("ce")) * 1e9).cast("long").alias("sim_q"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rnk").cast("long").alias("rnk"),
            F.round(F.col("sim_q") / 1000.0).cast("long").alias("sim_ppm"),
        )
    )
