"""Append measured results to BENCH.md from bench/scaling JSON files.

Usage: python tools/record_results.py <bench.json> <scaling.json>
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    bench = json.load(open(sys.argv[1])) if len(sys.argv) > 1 else None
    scaling = json.load(open(sys.argv[2])) if len(sys.argv) > 2 else None
    lines = [f"\n### Measured {time.strftime('%Y-%m-%d %H:%M UTC', time.gmtime())}\n"]
    if bench:
        q = bench["queries"]
        g = bench.get("pipeline", {})
        s = bench.get("synth", {})
        lines.append(
            f"- pipeline (sf{bench['sf']}, {g.get('n_pages')} pages → "
            f"{g.get('n_edges')} links, {bench['cores']} cores): "
            f"extract+encode {q.get('pipe_extract_encode')}s, build "
            f"{q.get('pipe_build')}s, PageRank20 {q.get('pipe_pagerank20')}s "
            f"({bench.get('gteps_pipeline', {}).get('pagerank20')} GTEPS), CC "
            f"{q.get('pipe_cc')}s over {g.get('cc_iterations')} supersteps\n"
        )
        if s:
            lines.append(
                f"- synth ({s.get('n_vertices')}V/{s.get('n_edges')}E): PageRank20 "
                f"{q.get('synth_pagerank20')}s "
                f"({bench.get('gteps_synth', {}).get('pagerank20')} GTEPS), CC "
                f"{q.get('synth_cc')}s ({bench.get('gteps_synth', {}).get('cc')} GTEPS)\n"
            )
    if scaling:
        g = scaling["graph"]
        lines.append(
            f"- scaling (interleaved min-of-rounds, {g['n_vertices']}V/"
            f"{g['n_edges']}E): "
            + ", ".join(
                f"local[{n}] {v['exec_sec']}s "
                f"(PR {v['gteps']['pagerank20']} / CC {v['gteps']['cc']} GTEPS)"
                for n, v in scaling["legs"].items()
            )
            + f"; efficiency {scaling['pairs']}\n"
        )
    with open("BENCH.md", "a") as f:
        f.writelines(lines)
    print("".join(lines))
    return 0


if __name__ == "__main__":
    sys.exit(main())
