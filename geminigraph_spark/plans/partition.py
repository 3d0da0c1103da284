"""Degree-weighted contiguous chunk partitioning (Gemini's layout).

The reference cuts the dense id space into one contiguous range per
partition, balanced by Σ(out_degree + α) with α = 8×(partitions−1)
(core/graph.hpp:213 for α, 403-425 & 823-858 for the boundary scan; the
same cost model reappears in tune_chunks, 1340-1403). Contiguity keeps
adjacency access local and makes a chunk addressable by a [begin, end) id
pair; the degree weighting shrinks hub-heavy ranges (web-graph skew).

We reproduce it as: cumulative weight over id order (two-pass distributed
cumsum — per-range partial sums + tiny offset collect, same pattern as
encode.assign_dense_ids) → chunk_id = floor(prev_cumw / target). A global
``Window.orderBy(id)`` would serialize through one task; this stays fully
parallel at any |V|.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def default_alpha(n_chunks: int) -> int:
    """α = 8 × (partitions − 1), reference core/graph.hpp:213."""
    return 8 * (n_chunks - 1)


def assign_chunks(
    vertices: DataFrame,
    n_chunks: int,
    alpha: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """vertices(id, out_degree, ...) → + chunk_id int.

    chunk_id is non-decreasing in id (contiguous ranges) and balances
    Σ(out_degree + α) across chunks.
    """
    spark = vertices.sparkSession
    if alpha is None:
        alpha = default_alpha(n_chunks)
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism

    v = (
        vertices.withColumn("w", F.col("out_degree") + F.lit(int(alpha)))
        .repartitionByRange(num_partitions, "id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    psums = v.groupBy("pid").agg(F.sum("w").alias("s")).collect()
    offsets = {}
    acc = 0
    for row in sorted(psums, key=lambda r: r["pid"]):
        offsets[row["pid"]] = acc
        acc += row["s"]
    total_w = acc
    target = max(1.0, total_w / n_chunks)
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "pid int, off long"
        )
    )
    w_cum = (
        Window.partitionBy("pid").orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        v.join(off_df, "pid")
        .withColumn(
            "cumw_prev", F.col("off") + F.coalesce(F.sum("w").over(w_cum), F.lit(0))
        )
        .withColumn(
            "chunk_id",
            F.least(
                F.floor(F.col("cumw_prev") / F.lit(float(target))),
                F.lit(n_chunks - 1),
            ).cast("int"),
        )
        .drop("w", "pid", "off", "cumw_prev")
    )
    return out


def chunk_ranges(vertices_with_chunks: DataFrame) -> pd.DataFrame:
    """Tiny driver-side table: (chunk_id, begin, end) with end exclusive."""
    rows = (
        vertices_with_chunks.groupBy("chunk_id")
        .agg(F.min("id").alias("begin"), (F.max("id") + 1).alias("end"))
        .orderBy("chunk_id")
        .collect()
    )
    return pd.DataFrame(
        {
            "chunk_id": [r["chunk_id"] for r in rows],
            "begin": [r["begin"] for r in rows],
            "end": [r["end"] for r in rows],
        }
    )


def boundaries_array(ranges: pd.DataFrame, n_vertices: int) -> np.ndarray:
    """[b_0, b_1, ..., b_k] cut points; chunk of id = searchsorted(b, id,
    'right') - 1. Covers the full [0, V) range even if some chunk is empty."""
    b = list(ranges["begin"].values)
    b[0] = 0
    b.append(n_vertices)
    return np.asarray(b, dtype=np.int64)


def with_edge_chunks(
    edges: DataFrame, boundaries: np.ndarray
) -> DataFrame:
    """Tag edges with src_chunk / dst_chunk via a broadcast boundary array
    and a vectorized searchsorted (boundaries are tiny — O(n_chunks))."""
    from pyspark.sql.functions import pandas_udf

    b = np.asarray(boundaries, dtype=np.int64)

    @pandas_udf("int")
    def chunk_of(ids: pd.Series) -> pd.Series:
        return pd.Series(
            (np.searchsorted(b, ids.values, side="right") - 1).astype(np.int32)
        )

    return edges.withColumn("src_chunk", chunk_of(F.col("src_id"))).withColumn(
        "dst_chunk", chunk_of(F.col("dst_id"))
    )
