"""Materialize the deterministic pages fixture + golden files to disk
(FIXTURES.md F1/F3). The content functions live in
geminigraph_spark/sources/pages_fixture.py; this writes parquet.

Usage: python tools/gen_fixtures.py <out_dir> [n_pages] [seed]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from geminigraph_spark.functions import oracle_numpy as O  # noqa: E402
from geminigraph_spark.sources.pages_fixture import (  # noqa: E402
    gen_pages_pandas,
    golden_edges_pandas,
)


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures_out"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    os.makedirs(out, exist_ok=True)

    pages = gen_pages_pandas(n, seed)
    pages.to_parquet(f"{out}/pages.parquet", index=False)
    golden = golden_edges_pandas(n, seed)
    golden.to_parquet(f"{out}/golden_edges.parquet", index=False)

    # dense ids in lexicographic url order (matches plans/encode)
    urls = np.unique(
        np.concatenate([golden["src_url"].values, golden["dst_url"].values])
    )
    urls = np.unique(np.concatenate([urls, pages["url"].values]))
    idx = {u: i for i, u in enumerate(sorted(urls))}
    src = golden["src_url"].map(idx).values.astype(np.int64)
    dst = golden["dst_url"].map(idx).values.astype(np.int64)
    nv = len(idx)

    import pandas as pd

    pr = O.pagerank_ref(src, dst, nv, iters=20)
    pd.DataFrame({"id": np.arange(nv), "rank": pr}).to_parquet(
        f"{out}/golden_pagerank.parquet", index=False
    )
    cc = O.cc_ref(src, dst, nv)
    pd.DataFrame({"id": np.arange(nv), "label": cc}).to_parquet(
        f"{out}/golden_cc.parquet", index=False
    )
    lp = O.lp_ref(src, dst, nv, iters=10)
    pd.DataFrame({"id": np.arange(nv), "label": lp}).to_parquet(
        f"{out}/golden_lp.parquet", index=False
    )
    tc_total, tc_pv = O.tc_ref(src, dst, nv)
    pd.DataFrame({"id": np.arange(nv), "n_tri": tc_pv}).to_parquet(
        f"{out}/golden_tc.parquet", index=False
    )
    inv = {
        "n_pages": n,
        "seed": seed,
        "n_vertices": int(nv),
        "n_edges": int(len(src)),
        "pr_sum": float(pr.sum()),
        "pr_argmax": int(np.argmax(pr)),
        "n_components": int(len(np.unique(cc))),
        "n_triangles": int(tc_total),
    }
    with open(f"{out}/golden_invariants.json", "w") as f:
        json.dump(inv, f, indent=1)
    print(json.dumps(inv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
