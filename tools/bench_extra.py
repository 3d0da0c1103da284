"""Extra (non-contract) measurements backing OPTIMIZATION_r07.md.

`bench.py` is the frozen driver contract; this file holds the round-7
isolation harnesses (guide §1): per-phase breakdowns and fresh-process
A/B legs used to decide each optimization. Every leg runs in THIS
process — launch one leg per process for clean JVMs, e.g.:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
        python tools/bench_extra.py overhead
    python tools/bench_extra.py engine          # engine kernels, synth 30M
    python tools/bench_extra.py build           # ChunkedGraph.build legs
    python tools/bench_extra.py pipeline        # extract/encode/DF kernels

Prints one JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def _spark(cores=None):
    from geminigraph_spark.session import get_spark

    return get_spark(
        "bench-extra",
        cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _emit(**kv):
    print(json.dumps(kv), flush=True)


def overhead():
    """Per-job floor measurements that motivated the RDD superstep path
    (engine.py docstring)."""
    import pandas as pd

    spark = _spark()
    sc = spark.sparkContext

    def best(fn, n=6):
        ts = []
        for _ in range(n):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return round(min(ts) * 1e3)

    _emit(leg="jvm_job_32_tasks_ms", ms=best(lambda: spark.range(0, 32, 1, 32).count()))
    rdd = sc.parallelize(range(32), 32)
    rdd.count()
    _emit(leg="python_rdd_noop_32_tasks_ms", ms=best(lambda: rdd.map(lambda x: x).collect()))
    r1 = sc.parallelize(range(1), 1)
    r1.count()
    _emit(leg="python_rdd_noop_1_task_ms", ms=best(lambda: r1.map(lambda x: x).collect()))

    def noop_pandas(batches):
        for pdf in batches:
            yield pd.DataFrame({"x": [0]})

    df = spark.createDataFrame([(i,) for i in range(32)], "x int").repartition(32).persist()
    df.count()
    _emit(
        leg="mapInPandas_noop_32_tasks_ms",
        ms=best(lambda: df.mapInPandas(noop_pandas, "x int").collect()),
    )
    spark.stop()


def engine():
    """Engine kernels on the synthetic 30M-edge graph (fresh graph)."""
    from geminigraph_spark.operators.algorithms import cc_engine, pagerank_engine
    from geminigraph_spark.operators.synth import synth_graph

    spark = _spark()
    V = int(os.environ.get("SPARK_GRAFT_BENCH_V", 1_000_000))
    E = int(os.environ.get("SPARK_GRAFT_BENCH_E", 30_000_000))
    spill = tempfile.mkdtemp(prefix="bx_synth_")
    try:
        g = synth_graph(spark, V, E, n_chunks=32, spill_dir=spill, seed=42)
        pagerank_engine(g, iters=2)  # warm
        t0 = time.time()
        _pr, eng = pagerank_engine(g, iters=20)
        per = sorted(m.wall_s for m in eng.metrics)
        _emit(
            leg="synth_pagerank20",
            sec=round(time.time() - t0, 2),
            superstep_med_ms=round(per[len(per) // 2] * 1e3),
        )
        eng.close()
        g.unpersist()
        sym = synth_graph(
            spark, V, E, n_chunks=32, spill_dir=spill + "_s", seed=42, symmetric=True
        )
        cc_engine(sym)  # warm
        t0 = time.time()
        _cc, eng = cc_engine(sym)
        _emit(leg="synth_cc", sec=round(time.time() - t0, 2), iters=len(eng.metrics))
        eng.close()
        sym.unpersist()
    finally:
        shutil.rmtree(spill, ignore_errors=True)
        shutil.rmtree(spill + "_s", ignore_errors=True)
    spark.stop()


def build():
    """ChunkedGraph.build legs in the bench's exact shapes."""
    from pyspark.sql import functions as F

    from geminigraph_spark.operators.chunked_graph import ChunkedGraph
    from geminigraph_spark.operators.synth import edge_of

    spark = _spark()
    V = int(os.environ.get("SPARK_GRAFT_BENCH_V", 1_000_000))
    E = int(os.environ.get("SPARK_GRAFT_BENCH_E", 30_000_000))
    spill = tempfile.mkdtemp(prefix="bx_build_")

    import pandas as pd

    def gen(batches):
        for pdf in batches:
            s, d = edge_of(pdf["id"].values, V, 42)
            yield pd.DataFrame({"src": s, "dst": d})

    def edges_df():
        return spark.range(0, E, 1, 32).mapInPandas(gen, "src long, dst long")

    try:
        t0 = time.time()
        g_t = ChunkedGraph.build(
            spark,
            edges_df().select(F.col("dst").alias("src"), F.col("src").alias("dst")),
            n_chunks=32, n_vertices=V, spill_dir=spill + "_t",
        )
        _emit(leg="build_transpose_30M", sec=round(time.time() - t0, 2))
        g_t.unpersist()
        t0 = time.time()
        e = edges_df()
        und = (
            e.where(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
            .distinct()
        )
        simple = ChunkedGraph.build(
            spark,
            und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
                und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
            ),
            n_chunks=32, n_vertices=V, spill_dir=spill + "_k",
        )
        _emit(
            leg="build_simple_sym_60M",
            sec=round(time.time() - t0, 2),
            n_edges=int(simple.n_edges),
        )
        simple.unpersist()
    finally:
        for sfx in ("_t", "_k"):
            shutil.rmtree(spill + sfx, ignore_errors=True)
        shutil.rmtree(spill, ignore_errors=True)
    spark.stop()


def pipeline():
    """Extraction + encode + the DF-path kernels, bench shapes."""
    from pyspark.sql import functions as F

    from geminigraph_spark.functions.graph_algos import connected_components as cc_df
    from geminigraph_spark.functions.graph_algos import pagerank as pr_df
    from geminigraph_spark.plans.encode import encode_edges
    from geminigraph_spark.sources.extract import extract_links
    from geminigraph_spark.sources.pages_fixture import gen_pages_df

    spark = _spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    t0 = time.time()
    pages = gen_pages_df(spark, 2 * n_events)
    links = extract_links(pages).persist()
    links.count()
    t_ex = time.time() - t0
    t0 = time.time()
    edges_ids, _vd = encode_edges(links)
    e = edges_ids.select(
        F.col("src_id").alias("src"), F.col("dst_id").alias("dst")
    ).persist()
    ne = e.count()
    _emit(
        leg="pipe_extract_encode",
        extract_sec=round(t_ex, 2),
        encode_sec=round(time.time() - t0, 2),
        edges=int(ne),
    )
    links.unpersist()
    for label, fn in (
        ("pipe_pagerank20_df", lambda: pr_df(e, iters=20, ckpt_interval=5).count()),
        ("pipe_cc_df", lambda: cc_df(e, ckpt_interval=5).count()),
    ):
        fn()  # warm
        ts = []
        for _ in range(2):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        _emit(leg=label, sec=round(min(ts), 2))
    spark.stop()


if __name__ == "__main__":
    {
        "overhead": overhead,
        "engine": engine,
        "build": build,
        "pipeline": pipeline,
    }[sys.argv[1]]()
