"""Kill/resume: restarting from a mid-run snapshot reproduces the straight
run exactly (north_rule resumability; SURVEY §5.5)."""

import numpy as np
import pytest

from geminigraph_spark.operators.algorithms import pagerank_engine
from geminigraph_spark.operators.chunked_graph import ChunkedGraph
from geminigraph_spark.plans.checkpoint import SnapshotStore, write_metrics_parquet


def _graph(n=100, m=600, seed=9):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, n, m).astype(np.int64),
        rng.integers(0, n, m).astype(np.int64),
        n,
    )


@pytest.fixture(scope="module")
def g(spark):
    src, dst, n = _graph()
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in zip(src, dst)], "src long, dst long"
    )
    return ChunkedGraph.build(spark, df, n_chunks=4, n_vertices=n)


def test_resume_mid_run_identical(spark, g, tmp_path):
    straight, _ = pagerank_engine(g, iters=10)

    store = SnapshotStore(str(tmp_path), "run1", "pagerank")

    class Crash(RuntimeError):
        pass

    # crash mid-run right after checkpointing iteration 5 of 10
    def save(i, arr):
        store.save(i, arr, g.boundaries)
        if i == 5:
            raise Crash()

    with pytest.raises(Crash):
        pagerank_engine(g, iters=10, on_state=save)

    # new process: resume from the latest snapshot
    store2 = SnapshotStore(str(tmp_path), "run1", "pagerank")
    it, state = store2.latest()
    assert it == 5
    resumed, _ = pagerank_engine(g, iters=10, start=state, start_iter=it + 1)
    assert np.allclose(resumed, straight, atol=0)


def test_manifest_lineage(tmp_path, g):
    store = SnapshotStore(str(tmp_path), "run2", "pagerank")
    state = np.linspace(0, 1, g.n_vertices)
    store.save(0, state, g.boundaries)
    info = store.iterations()[0]
    assert info["rows"] == g.n_vertices
    assert sum(c["rows"] for c in info["chunks"]) == g.n_vertices
    assert len(info["chunks"]) >= 1  # per-chunk lineage present
    it, back = store.latest()
    assert it == 0
    assert np.allclose(back, state)


def test_latest_skips_future(tmp_path, g):
    store = SnapshotStore(str(tmp_path), "run3", "pagerank")
    for i in range(4):
        store.save(i, np.full(g.n_vertices, float(i)), g.boundaries)
    it, state = store.latest(before=2)
    assert it == 1
    assert (state == 1.0).all()
