"""Interleaved A/B scaling measurement for the DATAFRAME-path kernels.

tools/scaling_ab.py measures the chunked-numpy engine — the single-node
path, whose int32 HashMin scatter is memory-bandwidth-bound, so on ONE
host its core-scaling flattens once a few cores saturate the memory
controller (documented in BENCH.md "8->32 ceiling"). The DataFrame path
is the path that actually runs on a multi-executor cluster (state in
shuffle partitions, per-superstep join+agg), and its per-core bandwidth
demand is far lower — so local[N] -> local[4N] on one host is a much
less bandwidth-confounded proxy for N -> 4N executors.

Protocol mirrors scaling_ab.py: several interleaved rounds of
alternating parallelism levels (slow co-tenant drift cancels inside a
matched round), fresh JVM per leg (subprocess), one shared deterministic
synth edge parquet (generation outside every timed region), best-of-2
per kernel per leg, min-of-rounds + per-round matched pairs reported.

Usage:
  python tools/scaling_ab_df.py [rounds] [cores,cores,...]   # parent
  python tools/scaling_ab_df.py --leg <cores> <edges_parquet> # one leg

Env: SPARK_GRAFT_BENCH_V / SPARK_GRAFT_BENCH_E size the graph
(default 1M vertices / 12M edges — DF supersteps are ~50x the engine's
per-edge cost, so the DF A/B uses 1/20th the engine A/B's edges for
comparable leg wall time).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
V = int(os.environ.get("SPARK_GRAFT_BENCH_V", "1000000"))
E = int(os.environ.get("SPARK_GRAFT_BENCH_E", "12000000"))
ITERS = 20
REPEATS = 2


def _gen_edges(path: str) -> None:
    """Write the deterministic synth edge set (operators/synth.edge_of,
    seed 42 — the SAME stream the engine A/B uses) once, as parquet."""
    sys.path.insert(0, REPO)
    from geminigraph_spark.session import get_spark

    import pandas as pd

    from geminigraph_spark.operators.synth import edge_of

    spark = get_spark("ab-df-gen", cores=8, shuffle_partitions=8)

    def gen(batches):
        for pdf in batches:
            g = pdf["id"].values
            s, d = edge_of(g, V, 42)
            yield pd.DataFrame({"src": s, "dst": d})

    spark.range(0, E, 1, 64).mapInPandas(gen, "src long, dst long").write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()


def _leg(cores: int, edges_path: str) -> None:
    sys.path.insert(0, REPO)
    from geminigraph_spark.functions.graph_algos import (
        connected_components,
        pagerank,
    )
    from geminigraph_spark.session import get_spark

    spark = get_spark(
        "ab-df-leg",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    edges = spark.read.parquet(edges_path).persist()
    edges.count()  # warm the cache outside every timed region
    out: dict = {"cores": cores}
    best_pr = min(
        _timed(lambda: pagerank(edges, iters=ITERS, ckpt_interval=5).count())
        for _ in range(REPEATS)
    )
    out["pagerank20_sec"] = round(best_pr, 3)
    out["pagerank20_gteps"] = round(ITERS * E / best_pr / 1e9, 4)
    best_cc = min(
        _timed(lambda: connected_components(edges, ckpt_interval=5).count())
        for _ in range(REPEATS)
    )
    out["cc_sec"] = round(best_cc, 3)
    out["exec_sec"] = round(best_pr + best_cc, 3)
    print(json.dumps(out))
    spark.stop()


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--leg":
        _leg(int(sys.argv[2]), sys.argv[3])
        return 0
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    levels = (
        [int(x) for x in sys.argv[2].split(",")] if len(sys.argv) > 2 else [16, 4]
    )
    shared = tempfile.mkdtemp(prefix="gemini_ab_df_")
    edges_path = os.path.join(shared, "edges.parquet")
    best: dict[int, dict] = {}
    per_round: dict[int, dict[int, float]] = {}
    try:
        _gen_edges(edges_path)
        for r in range(rounds):
            per_round[r] = {}
            for n in sorted(levels, reverse=True):
                p = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "--leg",
                        str(n),
                        edges_path,
                    ],
                    cwd=REPO,
                    capture_output=True,
                    text=True,
                    timeout=3600,
                )
                line = [
                    ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")
                ][-1]
                rec = json.loads(line)
                per_round[r][n] = rec["exec_sec"]
                if n not in best or rec["exec_sec"] < best[n]["exec_sec"]:
                    best[n] = rec
                print(
                    f"round {r} n={n}: exec={rec['exec_sec']} "
                    f"pr={rec['pagerank20_sec']} cc={rec['cc_sec']}",
                    file=sys.stderr,
                    flush=True,
                )
        lv = sorted(levels)
        pairs = {}
        pairs_matched = {}
        for a, b in zip(lv, lv[1:]):
            if a in best and b in best:
                pairs[f"{a}->{b}"] = round(
                    best[a]["exec_sec"] / best[b]["exec_sec"] / (b // a), 3
                )
        for r, legs in per_round.items():
            pm = {}
            for a, b in zip(lv, lv[1:]):
                if a in legs and b in legs:
                    pm[f"{a}->{b}"] = round(legs[a] / legs[b] / (b // a), 3)
            if pm:
                pairs_matched[r] = pm
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency_df_path",
                    "pairs": pairs,
                    "pairs_matched_same_round": pairs_matched,
                    "legs": {str(n): best[n] for n in best},
                    "legs_per_round": {
                        str(r): {str(n): s for n, s in legs.items()}
                        for r, legs in per_round.items()
                    },
                    "graph": {"n_vertices": V, "n_edges": E},
                    "rounds": rounds,
                    "kernels": "DataFrame-path pagerank(20, ckpt_interval=5) + connected_components(ckpt_interval=5), best-of-2 per leg",
                }
            )
        )
    finally:
        shutil.rmtree(shared, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
