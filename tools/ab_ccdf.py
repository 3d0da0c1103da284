"""Interleaved A/B of pipe_cc_df (cc DataFrame kernel, ckpt_interval=5)
between the current tree and an older commit, on identical edges
(VERDICT r4 #5: rule load in/out of a round-over-round drift).

Setup:  git worktree add /tmp/r3repo <commit>
Usage:
  python tools/ab_ccdf.py gen        # write shared edges parquet (once)
  python tools/ab_ccdf.py leg <repo> # one timed leg importing from <repo>
  python tools/ab_ccdf.py ab <reps>  # interleave current/old, print JSON

Round-5 result (tools/ab_ccdf_r5_results.jsonl): 3 matched pairs on a
loaded evening — current 24.7/30.4/42.5 s vs r3 36.7/41.9/27.6 s,
identical row counts; identical code spans 24-42 s under this noise, so
the r3→r4 12.95→13.97 best-of-runs drift was co-tenant load, not a
regression.
"""
import json
import os
import subprocess
import sys
import time

EDGES = "/tmp/ab_edges.parquet"
SF = "/root/testdata/sf0.1"
R4, R3 = "/root/repo", "/tmp/r3repo"


def spark_session(repo):
    sys.path.insert(0, repo)
    from geminigraph_spark.session import get_spark

    return get_spark("ab_ccdf", cores=32, shuffle_partitions=32,
                     extra_conf={"spark.ui.showConsoleProgress": "false"})


def gen():
    spark = spark_session(R4)
    from pyspark.sql import functions as F

    from geminigraph_spark.plans.encode import encode_edges
    from geminigraph_spark.sources.extract import extract_links
    from geminigraph_spark.sources.pages_fixture import gen_pages_df

    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    pages = gen_pages_df(spark, 2 * n_events)
    ids, _ = encode_edges(extract_links(pages))
    e = ids.select(F.col("src_id").alias("src"), F.col("dst_id").alias("dst"))
    e.write.mode("overwrite").parquet(EDGES)
    print("edges:", spark.read.parquet(EDGES).count())


def leg(repo):
    spark = spark_session(repo)
    import gc

    from geminigraph_spark.functions.graph_algos import connected_components

    e = spark.read.parquet(EDGES).persist()
    e.count()
    gc.collect()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass
    time.sleep(2)
    l0 = os.getloadavg()[0]
    t0 = time.time()
    n = connected_components(e, ckpt_interval=5).count()
    sec = time.time() - t0
    print(json.dumps({"repo": repo, "sec": round(sec, 3), "rows": n,
                      "load1m": round(l0, 2)}))


def ab(reps):
    out = []
    for i in range(reps):
        for repo in (R4, R3):
            p = subprocess.run([sys.executable, __file__, "leg", repo],
                               capture_output=True, text=True, timeout=600)
            lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
            if lines:
                out.append(json.loads(lines[-1]))
                print(out[-1], flush=True)
            else:
                print("FAILED:", p.stderr[-500:], flush=True)
    best = {}
    for r in out:
        k = "r4" if r["repo"] == R4 else "r3"
        best[k] = min(best.get(k, 1e9), r["sec"])
    print(json.dumps({"best": best, "runs": out}))


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen()
    elif sys.argv[1] == "leg":
        leg(sys.argv[2])
    else:
        ab(int(sys.argv[2]) if len(sys.argv) > 2 else 3)
