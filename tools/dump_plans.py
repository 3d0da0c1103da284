"""Dump .explain('formatted') for declared queries to plans/r07/.

Usage: python tools/dump_plans.py <before|after> q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01), SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from geminigraph_spark.session import get_spark

    spark = get_spark("dump-plans", extra_conf={"spark.ui.showConsoleProgress": "false"})

    def explain_str(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    def superstep_plan(kernel: str) -> str:
        """The FIRST superstep's physical plan captured through the real
        kernel code path (the checkpoint hook sees the lazy state frame
        before materialization) — the final returned plan of an iterative
        kernel is just a checkpoint scan and shows nothing."""
        from geminigraph_spark.functions import graph_algos as GA
        from geminigraph_spark.functions.edges import events_edges

        cell = {}

        def cap(i, df):
            if i >= 0 and "plan" not in cell:
                cell["plan"] = explain_str(df)
            return df.localCheckpoint(eager=True)

        e = events_edges(spark, sf_dir)
        if kernel == "pagerank_superstep":
            GA.pagerank(e, iters=2, checkpoint=cap)
        elif kernel == "cc_superstep":
            GA.connected_components(e, max_iters=2, checkpoint=cap)
        elif kernel == "lp_superstep":
            GA.label_propagation(e, iters=2, checkpoint=cap)
        else:
            raise KeyError(kernel)
        return cell["plan"]

    qs = entry.queries()
    for name in names:
        if name.endswith("_superstep"):
            plan = superstep_plan(name)
        else:
            plan = explain_str(qs[name](spark, sf_dir))
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
