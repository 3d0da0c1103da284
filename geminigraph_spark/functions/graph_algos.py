"""Vertex-centric workloads as declarative DataFrame pipelines.

These are the Catalyst-optimized expressions of the reference kernels
(SURVEY.md §2.3): each BSP superstep is one join + partial/final
aggregation — exactly the reference's dense/pull mode (dense_signal =
map-side partial agg, dense_slot = final agg after the shuffle,
core/graph.hpp:1663-1854). Spark's hash aggregation gives the map-side
combine and comm/compute overlap for free; AQE broadcasts the (small)
state side of the join at low |V| — which *is* the reference's
"state is resident on every socket" layout.

Parallel edges are collapsed once to (src, dst, cnt) — mathematically
identical for the sum/min/mode combiners while shrinking every iteration's
join input (the reference instead pays for every duplicate edge per
superstep: core/graph.hpp loader keeps all tuples).

Lineage: each iteration ends in ``localCheckpoint`` (or a caller-provided
checkpoint hook) — 20+ chained iterations otherwise explode the logical
plan (SURVEY.md §7 "hard parts" #1).

A faster chunked-numpy engine path for the same kernels lives in
``operators/``; both are parity-tested against functions.oracle_numpy.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Checkpointer = Callable[[int, DataFrame], DataFrame]


def _default_ckpt(_i: int, df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _collapsed(edges: DataFrame) -> DataFrame:
    return edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree, in_degree) over the edge multiset — the loader's
    degree pass (core/graph.hpp:798-821): every tuple counts."""
    verts = _vertices_of(edges)
    od = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ind = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return (
        verts.join(od, "id", "left")
        .join(ind, "id", "left")
        .fillna(0, subset=["out_degree", "in_degree"])
    )


def pagerank(
    edges: DataFrame,
    iters: int = 20,
    d: float = 0.85,
    checkpoint: Checkpointer = _default_ckpt,
    start: DataFrame | None = None,
    start_iter: int = 0,
) -> DataFrame:
    """Reference PageRank recurrence (toolkits/pagerank.cpp:24-99):
    state pre-divided by out-degree between iterations, final iteration
    undivided, dangling mass dropped. Returns (id long, rank double).

    ``start``/``start_iter`` resume from a checkpointed state (id, rank).
    """
    ew = _collapsed(edges).persist()
    verts = _vertices_of(edges)
    deg = ew.groupBy(F.col("src").alias("id")).agg(
        F.sum("cnt").cast("double").alias("outd")
    )
    base = verts.join(deg, "id", "left").fillna(0.0, subset=["outd"]).persist()
    base.count()

    if start is not None:
        curr = start.select("id", F.col("rank").alias("r"))
    else:
        curr = base.select(
            "id",
            F.when(F.col("outd") > 0, F.lit(1.0) / F.col("outd"))
            .otherwise(F.lit(1.0))
            .alias("r"),
        )
        curr = checkpoint(-1, curr)

    for i in range(start_iter, iters):
        msgs = (
            ew.join(curr.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("cnt")).alias("s"))
            .withColumnRenamed("dst", "id")
        )
        val = F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))
        if i != iters - 1:
            r = F.when(F.col("outd") > 0, val / F.col("outd")).otherwise(val)
        else:
            r = val
        curr = base.join(msgs, "id", "left").select("id", r.alias("r"))
        curr = checkpoint(i, curr)

    ew.unpersist()
    return curr.select("id", F.col("r").alias("rank"))


def connected_components(
    edges: DataFrame,
    max_iters: int = 200,
    checkpoint: Checkpointer = _default_ckpt,
) -> DataFrame:
    """HashMin min-label propagation to fixpoint over the symmetrized graph
    (toolkits/cc.cpp:22-109). Returns (id long, label long)."""
    from .edges import symmetrize_df

    sym = symmetrize_df(edges).distinct().persist()
    verts = _vertices_of(edges)
    curr = checkpoint(-1, verts.select("id", F.col("id").alias("label")))
    for i in range(max_iters):
        msgs = (
            sym.join(
                curr.select(F.col("id").alias("src"), F.col("label").alias("lsrc")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("lsrc").alias("m"))
            .withColumnRenamed("dst", "id")
        )
        nxt = curr.join(msgs, "id", "left").select(
            "id", F.least(F.col("label"), F.coalesce(F.col("m"), F.col("label"))).alias("label")
        )
        nxt = checkpoint(i, nxt)
        changed = (
            nxt.alias("n")
            .join(curr.alias("c"), "id")
            .where(F.col("n.label") != F.col("c.label"))
            .count()
        )
        curr = nxt
        if changed == 0:
            break
    sym.unpersist()
    return curr


def label_propagation(
    edges: DataFrame,
    iters: int = 10,
    checkpoint: Checkpointer = _default_ckpt,
) -> DataFrame:
    """Synchronous label propagation (SURVEY §2.3 A6): over the symmetrized
    multiset graph, new label = most frequent incoming label, ties broken
    by smallest label; vertices with no incoming labels keep theirs."""
    from .edges import symmetrize_df

    sym = _collapsed(symmetrize_df(edges)).persist()
    verts = _vertices_of(edges)
    curr = checkpoint(-1, verts.select("id", F.col("id").alias("label")))
    w = Window.partitionBy("dst").orderBy(F.col("c").desc(), F.col("lsrc").asc())
    for i in range(iters):
        counts = (
            sym.join(
                curr.select(F.col("id").alias("src"), F.col("label").alias("lsrc")),
                "src",
            )
            .groupBy("dst", "lsrc")
            .agg(F.sum("cnt").alias("c"))
        )
        pick = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("dst").alias("id"), F.col("lsrc").alias("newl"))
        )
        curr = checkpoint(
            i,
            curr.join(pick, "id", "left").select(
                "id", F.coalesce(F.col("newl"), F.col("label")).alias("label")
            ),
        )
    sym.unpersist()
    return curr


def _oriented(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges (self-loops dropped) oriented by
    (degree, id) rank low→high — SURVEY §2.3 A7; bounds the skew of the
    heavy self-join (hubs become intersection *targets*, never probes)."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("dega"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("degb"))
    j = und.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count (1 row: n_triangles long)."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    out = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    return out


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, n_tri) per vertex (vertices in ≥1 triangle)."""
    o = _oriented(edges)
    e1 = o.select(F.col("lo").alias("x"), F.col("hi").alias("y"))
    e2 = o.select(F.col("lo").alias("y"), F.col("hi").alias("z"))
    e3 = o.select(F.col("lo").alias("x"), F.col("hi").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("id"))
        .unionByName(tri.select(F.col("y").alias("id")))
        .unionByName(tri.select(F.col("z").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_tri"))


def sssp(
    wedges: DataFrame,
    root: int = 0,
    max_iters: int = 200,
    checkpoint: Checkpointer = _default_ckpt,
) -> DataFrame:
    """Bellman-Ford relaxation to fixpoint, init 1e9 (toolkits/sssp.cpp).
    wedges: (src, dst, w double). Returns (id, dist double)."""
    ew = wedges.groupBy("src", "dst").agg(F.min("w").alias("w")).persist()
    verts = _vertices_of(wedges)
    curr = checkpoint(
        -1,
        verts.select(
            "id",
            F.when(F.col("id") == root, F.lit(0.0)).otherwise(F.lit(1e9)).alias("dist"),
        ),
    )
    for i in range(max_iters):
        msgs = (
            ew.join(
                curr.select(F.col("id").alias("src"), F.col("dist").alias("dsrc")),
                "src",
            )
            .groupBy("dst")
            .agg(F.min(F.col("dsrc") + F.col("w")).alias("m"))
            .withColumnRenamed("dst", "id")
        )
        nxt = curr.join(msgs, "id", "left").select(
            "id", F.least(F.col("dist"), F.coalesce(F.col("m"), F.col("dist"))).alias("dist")
        )
        nxt = checkpoint(i, nxt)
        changed = (
            nxt.alias("n")
            .join(curr.alias("c"), "id")
            .where(F.col("n.dist") != F.col("c.dist"))
            .count()
        )
        curr = nxt
        if changed == 0:
            break
    ew.unpersist()
    return curr


def bfs_depths(
    edges: DataFrame,
    root: int = 0,
    max_iters: int = 200,
    checkpoint: Checkpointer = _default_ckpt,
) -> DataFrame:
    """BFS depth from root along directed edges; unreached → -1. Depth is
    the deterministic invariant of the reference's BFS (its parent array is
    CAS-race nondeterministic, toolkits/bfs.cpp:53). Returns (id, depth)."""
    big = (1 << 62)
    ew = _collapsed(edges).select("src", "dst").persist()
    verts = _vertices_of(edges)
    curr = checkpoint(
        -1,
        verts.select(
            "id",
            F.when(F.col("id") == root, F.lit(0)).otherwise(F.lit(big)).cast("long").alias("d"),
        ),
    )
    for i in range(max_iters):
        msgs = (
            ew.join(curr.select(F.col("id").alias("src"), F.col("d").alias("ds")), "src")
            .where(F.col("ds") < big)
            .groupBy("dst")
            .agg((F.min("ds") + 1).alias("m"))
            .withColumnRenamed("dst", "id")
        )
        nxt = curr.join(msgs, "id", "left").select(
            "id", F.least(F.col("d"), F.coalesce(F.col("m"), F.col("d"))).alias("d")
        )
        nxt = checkpoint(i, nxt)
        changed = (
            nxt.alias("n").join(curr.alias("c"), "id").where(F.col("n.d") != F.col("c.d")).count()
        )
        curr = nxt
        if changed == 0:
            break
    ew.unpersist()
    return curr.select(
        "id", F.when(F.col("d") >= big, F.lit(-1)).otherwise(F.col("d")).cast("long").alias("depth")
    )
