"""ANSI-SQL oracle generators for the driver's DuckDB correctness gate.

Each generator emits a self-contained SQL string over the pre-registered
``events`` view that expresses the *same recurrence* as the Spark kernel —
iterative algorithms are unrolled into one CTE per superstep (the graphs
derived from events are dense, diameter ≪ unroll depth, so fixpoint
kernels are converged well before the last unrolled step).

Float-valued results are compared as exact integers: both sides emit
``round(value * 1e6)`` as BIGINT ("ppm"), sidestepping engine-specific
double formatting in the driver's value hash while still asserting 1e-6
agreement (the north_rule tolerance).
"""

from __future__ import annotations

from .edges import (
    EDGES_SQL,
    HOST_DIV,
    SPARSE_EDGES_SQL,
    VERTICES_SQL,
    WEIGHTED_EDGES_SQL,
)

_PRELUDE = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
verts AS MATERIALIZED ({VERTICES_SQL}),
"""

#: same CTE names as _PRELUDE but over the host-projected multigraph, so
#: every unrolled kernel body below runs unchanged on the host graph
_HOST_PRELUDE = f"""WITH base AS MATERIALIZED ({EDGES_SQL}),
edges AS MATERIALIZED (SELECT src // {HOST_DIV} AS src, dst // {HOST_DIV} AS dst FROM base),
verts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
"""


def edge_table_sql() -> str:
    return f"SELECT src, dst FROM ({EDGES_SQL})"


def host_graph_sql(div: int = HOST_DIV) -> str:
    """Oracle twin of edges.host_graph (same // block assignment)."""
    return f"""
WITH edges AS MATERIALIZED ({EDGES_SQL})
SELECT src // {div} AS src_host, dst // {div} AS dst_host,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src_pages,
       CAST(COUNT(DISTINCT dst) AS BIGINT) AS n_dst_pages
FROM edges GROUP BY 1, 2
"""


def host_rank_sql(iters: int = 10, d: float = 0.85) -> str:
    """pagerank_sql's unrolled recurrence over the host multigraph."""
    return pagerank_sql(iters=iters, d=d, prelude=_HOST_PRELUDE)


def degrees_sql() -> str:
    return (
        _PRELUDE
        + """
od AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c FROM edges GROUP BY src),
id_ AS MATERIALIZED (SELECT dst AS v, COUNT(*) AS c FROM edges GROUP BY dst)
SELECT verts.v AS id,
       CAST(COALESCE(od.c, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(id_.c, 0) AS BIGINT) AS in_degree
FROM verts LEFT JOIN od ON verts.v = od.v LEFT JOIN id_ ON verts.v = id_.v
"""
    )


def pagerank_sql(iters: int = 20, d: float = 0.85, prelude: str = _PRELUDE) -> str:
    """Reference recurrence (pagerank.cpp:24-99) unrolled: pre-divided
    state, undivided final iteration, dangling mass dropped. ``prelude``
    swaps the graph (edges/verts CTEs) the recurrence runs over."""
    parts = [
        prelude
        + """
deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
s0 AS MATERIALIZED (SELECT verts.v,
              CASE WHEN COALESCE(deg.outd, 0) > 0 THEN 1.0/deg.outd ELSE 1.0 END AS r
       FROM verts LEFT JOIN deg ON verts.v = deg.v)"""
    ]
    for k in range(1, iters + 1):
        last = k == iters
        val = f"({1.0 - d:.2f} + {d:.2f}*COALESCE(m.s, 0))"
        expr = (
            val
            if last
            else f"CASE WHEN COALESCE(deg.outd, 0) > 0 THEN {val}/deg.outd ELSE {val} END"
        )
        parts.append(
            f""",
s{k} AS MATERIALIZED (SELECT verts.v, {expr} AS r
       FROM verts
       LEFT JOIN (SELECT e.dst AS v, SUM(p.r) AS s
                  FROM edges e JOIN s{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON verts.v = m.v
       LEFT JOIN deg ON verts.v = deg.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm FROM s{iters}"
    )
    return "".join(parts)


def pagerank_redistributed_sql(iters: int = 20, d: float = 0.85) -> str:
    """pagerank_sql with textbook dangling-mass redistribution: each
    iteration adds d·(Σ_{dangling} r)/|V| to every vertex's value (the
    mass CTE mirrors the one extra aggregate the Spark kernel pays)."""
    parts = [
        _PRELUDE
        + """
deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts),
s0 AS MATERIALIZED (SELECT verts.v,
              CASE WHEN COALESCE(deg.outd, 0) > 0 THEN 1.0/deg.outd ELSE 1.0 END AS r
       FROM verts LEFT JOIN deg ON verts.v = deg.v)"""
    ]
    for k in range(1, iters + 1):
        last = k == iters
        # dangling vertices are undivided, so their r IS their rank
        parts.append(
            f""",
dm{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.r), 0) AS m FROM s{k-1} p
       LEFT JOIN deg ON p.v = deg.v WHERE COALESCE(deg.outd, 0) = 0)"""
        )
        val = f"({1.0 - d:.2f} + {d:.2f}*(COALESCE(m.s, 0) + dm{k}.m/nv.n))"
        expr = (
            val
            if last
            else f"CASE WHEN COALESCE(deg.outd, 0) > 0 THEN {val}/deg.outd ELSE {val} END"
        )
        parts.append(
            f""",
s{k} AS MATERIALIZED (SELECT verts.v, {expr} AS r
       FROM verts
       CROSS JOIN dm{k} CROSS JOIN nv
       LEFT JOIN (SELECT e.dst AS v, SUM(p.r) AS s
                  FROM edges e JOIN s{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON verts.v = m.v
       LEFT JOIN deg ON verts.v = deg.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm FROM s{iters}"
    )
    return "".join(parts)


def cc_sql(iters: int = 25) -> str:
    """HashMin unrolled over the symmetrized (deduped) graph."""
    parts = [
        _PRELUDE
        + """
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
c0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
c{k} AS MATERIALIZED (SELECT c.v, LEAST(c.lab, COALESCE(m.ml, c.lab)) AS lab
       FROM c{k-1} c
       LEFT JOIN (SELECT e.dst AS v, MIN(p.lab) AS ml
                  FROM sym e JOIN c{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON c.v = m.v)"""
        )
    parts.append(f"\nSELECT v AS id, lab AS label FROM c{iters}")
    return "".join(parts)


def lp_sql(iters: int = 5) -> str:
    """Mode-combiner label propagation (SURVEY §2.3 A6) unrolled; multiset
    symmetrization (UNION ALL) so parallel edges weight the vote."""
    parts = [
        _PRELUDE
        + """
sym AS MATERIALIZED (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
cnt{k} AS MATERIALIZED (SELECT e.dst AS v, p.lab, COUNT(*) AS c
         FROM sym e JOIN l{k-1} p ON e.src = p.v GROUP BY e.dst, p.lab),
pick{k} AS MATERIALIZED (SELECT v, lab FROM (
           SELECT v, lab, ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab ASC) AS rn
           FROM cnt{k}) t WHERE rn = 1),
l{k} AS MATERIALIZED (SELECT l.v, COALESCE(p.lab, l.lab) AS lab
       FROM l{k-1} l LEFT JOIN pick{k} p ON l.v = p.v)"""
        )
    parts.append(f"\nSELECT v AS id, lab AS label FROM l{iters}")
    return "".join(parts)


def triangle_count_sql() -> str:
    """Degree-ordered oriented intersection count (SURVEY §2.3 A7)."""
    return (
        _PRELUDE
        + """
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT v, COUNT(*) AS c
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
o AS MATERIALIZED (SELECT CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN a ELSE b END AS lo,
             CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN b ELSE a END AS hi
      FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM o e1 JOIN o e2 ON e1.hi = e2.lo JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
"""
    )


def triangles_per_vertex_sql() -> str:
    """Per-corner triangle counts (stronger than the global count: checks
    WHICH triangles were found, not just how many)."""
    return (
        _PRELUDE
        + """
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT v, COUNT(*) AS c
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
o AS MATERIALIZED (SELECT CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN a ELSE b END AS lo,
             CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN b ELSE a END AS hi
      FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v),
tri AS MATERIALIZED (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM o e1 JOIN o e2 ON e1.hi = e2.lo JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi)
SELECT v AS id, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
  SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri UNION ALL SELECT z AS v FROM tri
) GROUP BY v
"""
    )


def sssp_sql(iters: int = 25, root: int = 0) -> str:
    parts = [
        f"""WITH wedges AS MATERIALIZED ({WEIGHTED_EDGES_SQL}),
verts AS MATERIALIZED ({VERTICES_SQL}),
we AS MATERIALIZED (SELECT src, dst, MIN(w) AS w FROM wedges GROUP BY src, dst),
d0 AS MATERIALIZED (SELECT v, CASE WHEN v = {root} THEN 0.0 ELSE 1e9 END AS dist FROM verts)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT c.v, LEAST(c.dist, COALESCE(m.md, c.dist)) AS dist
       FROM d{k-1} c
       LEFT JOIN (SELECT e.dst AS v, MIN(p.dist + e.w) AS md
                  FROM we e JOIN d{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON c.v = m.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(ROUND(dist * 1000000) AS BIGINT) AS dist_ppm FROM d{iters}"
    )
    return "".join(parts)


def bc_sql(levels: int = 10, root: int = 0) -> str:
    """Single-source Brandes (bc.cpp semantics): BFS depths (unrolled),
    per-level path-count accumulation over the edge MULTISET (parallel
    edges create parallel paths, matching the reference loader's
    keep-every-tuple behavior), backward dependency sweep, final
    (dep−inv)/inv in ppm. Unroll depth covers the graph diameter."""
    big = 1 << 62
    parts = [
        _PRELUDE
        + f"""
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
b0 AS MATERIALIZED (SELECT v, CAST(CASE WHEN v = {root} THEN 0 ELSE {big} END AS BIGINT) AS d FROM verts)"""
    ]
    for k in range(1, levels + 1):
        parts.append(
            f""",
b{k} AS MATERIALIZED (SELECT c.v, LEAST(c.d, COALESCE(m.md, c.d)) AS d
       FROM b{k-1} c
       LEFT JOIN (SELECT e.dst AS v, MIN(p.d) + 1 AS md
                  FROM de e JOIN b{k-1} p ON e.src = p.v AND p.d < {big}
                  GROUP BY e.dst) m ON c.v = m.v)"""
        )
    parts.append(
        f""",
depth AS MATERIALIZED (SELECT v, CASE WHEN d >= {big} THEN -1 ELSE d END AS d FROM b{levels}),
eD AS MATERIALIZED (
  SELECT e.src, e.dst, da.d AS ds, db.d AS dd
  FROM edges e JOIN depth da ON e.src = da.v JOIN depth db ON e.dst = db.v),
sg0 AS MATERIALIZED (SELECT CAST({root} AS BIGINT) AS v, CAST(1 AS DOUBLE) AS s)"""
    )
    for k in range(1, levels + 1):
        parts.append(
            f""",
sg{k} AS MATERIALIZED (
  SELECT v, s FROM sg{k-1}
  UNION ALL
  SELECT e.dst AS v, SUM(p.s) AS s
  FROM eD e JOIN sg{k-1} p ON e.src = p.v AND e.ds = {k-1}
  WHERE e.dd = {k} GROUP BY e.dst)"""
        )
    parts.append(
        f""",
sigma AS MATERIALIZED (SELECT v, MAX(s) AS s FROM sg{levels} GROUP BY v),
inv AS MATERIALIZED (
  SELECT d.v, d.d, CASE WHEN d.d >= 0 THEN 1.0/sg.s ELSE 0.0 END AS inv
  FROM depth d LEFT JOIN sigma sg ON d.v = sg.v),
dp{levels} AS MATERIALIZED (SELECT v, d, inv AS dep FROM inv WHERE d = {levels})"""
    )
    for k in range(levels - 1, -1, -1):
        parts.append(
            f""",
dp{k} AS MATERIALIZED (
  SELECT v, d, dep FROM dp{k+1}
  UNION ALL
  SELECT i.v, i.d, i.inv + COALESCE(m.acc, 0) AS dep
  FROM inv i
  LEFT JOIN (SELECT e.src AS v, SUM(p.dep) AS acc
             FROM eD e JOIN dp{k+1} p ON e.dst = p.v AND p.d = {k+1}
             WHERE e.ds = {k} GROUP BY e.src) m ON i.v = m.v
  WHERE i.d = {k})"""
        )
    parts.append(
        f"""
SELECT i.v AS id,
  CAST(ROUND(CASE WHEN i.d >= 0 THEN (COALESCE(p.dep, i.inv) - i.inv)/i.inv ELSE 0.0 END
       * 1000000) AS BIGINT) AS bc_ppm
FROM inv i LEFT JOIN dp0 p ON i.v = p.v AND i.d = p.d"""
    )
    return "".join(parts)


def bfs_sql(iters: int = 25, root: int = 0) -> str:
    big = 1 << 62
    parts = [
        _PRELUDE
        + f"""
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges),
b0 AS MATERIALIZED (SELECT v, CAST(CASE WHEN v = {root} THEN 0 ELSE {big} END AS BIGINT) AS d FROM verts)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
b{k} AS MATERIALIZED (SELECT c.v, LEAST(c.d, COALESCE(m.md, c.d)) AS d
       FROM b{k-1} c
       LEFT JOIN (SELECT e.dst AS v, MIN(p.d) + 1 AS md
                  FROM de e JOIN b{k-1} p ON e.src = p.v AND p.d < {big}
                  GROUP BY e.dst) m
         ON c.v = m.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(CASE WHEN d >= {big} THEN -1 ELSE d END AS BIGINT) AS depth FROM b{iters}"
    )
    return "".join(parts)


def ppr_sql(iters: int = 10, d: float = 0.85, seed_mod: int = 10) -> str:
    """Personalized PageRank unrolled: pagerank_sql's recurrence with the
    uniform teleport replaced by the seed indicator (v % seed_mod = 0);
    initial state is the seed indicator, pre-divided."""
    seed = f"(verts.v % {seed_mod} = 0)"
    parts = [
        _PRELUDE
        + f"""
deg AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
s0 AS MATERIALIZED (SELECT verts.v,
              CASE WHEN {seed} THEN
                CASE WHEN COALESCE(deg.outd, 0) > 0 THEN 1.0/deg.outd ELSE 1.0 END
              ELSE 0.0 END AS r
       FROM verts LEFT JOIN deg ON verts.v = deg.v)"""
    ]
    for k in range(1, iters + 1):
        last = k == iters
        val = (
            f"(CASE WHEN {seed} THEN {1.0 - d:.2f} ELSE 0.0 END"
            f" + {d:.2f}*COALESCE(m.s, 0))"
        )
        expr = (
            val
            if last
            else f"CASE WHEN COALESCE(deg.outd, 0) > 0 THEN {val}/deg.outd ELSE {val} END"
        )
        parts.append(
            f""",
s{k} AS MATERIALIZED (SELECT verts.v, {expr} AS r
       FROM verts
       LEFT JOIN (SELECT e.dst AS v, SUM(p.r) AS s
                  FROM edges e JOIN s{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON verts.v = m.v
       LEFT JOIN deg ON verts.v = deg.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm FROM s{iters}"
    )
    return "".join(parts)


def k_core_sql(k: int = 3, rounds: int = 20) -> str:
    """k-core peeling unrolled over the sparse events subgraph: one CTE
    per synchronous round (drop every vertex whose degree among survivors
    is < k); the sf0.01 gate graph peels in 14 rounds, extra rounds are
    fixpoint no-ops. Output is (id, in_core) over ALL vertices of the
    sparse edge multiset (self-loop-only vertices included, never in
    core) — the Spark kernel's contract."""
    parts = [
        f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM sedges WHERE src <> dst),
adj AS MATERIALIZED (SELECT a AS v, b AS u FROM und UNION ALL SELECT b AS v, a AS u FROM und),
a0 AS MATERIALIZED (SELECT DISTINCT v FROM adj)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
a{t} AS MATERIALIZED (SELECT e.v FROM adj e
    JOIN a{t-1} s ON e.v = s.v
    JOIN a{t-1} s2 ON e.u = s2.v
    GROUP BY e.v HAVING COUNT(*) >= {k})"""
        )
    # Fixpoint guard (ADVICE r5 low): the Spark kernel peels to fixpoint
    # while this oracle unrolls a fixed depth — on a deeper-peeling input
    # the under-peeled oracle would silently blame the kernel. If the last
    # two rounds still differ, the oracle itself is unconverged: fail the
    # gate loudly from the oracle side instead.
    parts.append(
        f"""
SELECT sverts.v AS id,
       CAST(CASE WHEN (SELECT COUNT(*) FROM a{rounds - 1})
                      <> (SELECT COUNT(*) FROM a{rounds})
                 THEN error('k_core oracle unconverged after {rounds} rounds; raise rounds')
                 WHEN c.v IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS in_core
FROM sverts LEFT JOIN a{rounds} c ON sverts.v = c.v"""
    )
    return "".join(parts)


def coreness_sql(rounds: int = 24) -> str:
    """Full core decomposition over the sparse events subgraph, unrolled
    as the h-index fixpoint the Spark kernel runs: c0 = simple degree,
    c{{t}}(v) = H({{c{{t-1}}(u)}}) computed per vertex as
    MAX(LEAST(row_number-by-desc-value, value)) over its neighbor list —
    the standard SQL h-index. Monotone non-increasing, so an unchanged
    SUM(c) between the last two rounds certifies convergence; if they
    differ the oracle errors loudly instead of under-iterating (the
    k_core fixpoint-guard convention)."""
    parts = [
        f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM sedges WHERE src <> dst),
adj AS MATERIALIZED (SELECT a AS v, b AS u FROM und UNION ALL SELECT b AS v, a AS u FROM und),
c0 AS MATERIALIZED (SELECT sverts.v, CAST(COALESCE(d.c, 0) AS BIGINT) AS c
    FROM sverts LEFT JOIN (SELECT v, COUNT(*) AS c FROM adj GROUP BY v) d
      ON sverts.v = d.v)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
c{t} AS MATERIALIZED (SELECT p.v, CAST(COALESCE(h.h, 0) AS BIGINT) AS c
    FROM c{t-1} p LEFT JOIN (
        SELECT v, MAX(LEAST(rn, cu)) AS h FROM (
            SELECT a.v, q.c AS cu,
                   ROW_NUMBER() OVER (PARTITION BY a.v ORDER BY q.c DESC) AS rn
            FROM adj a JOIN c{t-1} q ON a.u = q.v)
        GROUP BY v) h
      ON p.v = h.v)"""
        )
    parts.append(
        f"""
SELECT v AS id,
       CAST(CASE WHEN (SELECT SUM(c) FROM c{rounds - 1})
                      <> (SELECT SUM(c) FROM c{rounds})
                 THEN error('coreness oracle unconverged after {rounds} rounds; raise rounds')
                 ELSE c END AS INTEGER) AS coreness
FROM c{rounds}"""
    )
    return "".join(parts)


def _ms_bfs_cte(rounds: int, seed_mod: int) -> str:
    """Shared WITH-prefix for the multi-source-BFS family: unrolled
    level tables b{t}(s, v, d) = min hop distance from seed s to v using
    <= t hops, over the UNDIRECTED simple sparse events subgraph, seeds =
    sparse vertices with v % seed_mod = 0. Monotone (rows only appear,
    mins only tighten), so stable COUNT+SUM(d) across the last two
    levels certifies convergence — consumers fold the guard into their
    final SELECT."""
    parts = [
        f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM sedges WHERE src <> dst),
adj AS MATERIALIZED (SELECT a AS v, b AS u FROM und UNION ALL SELECT b AS v, a AS u FROM und),
b0 AS MATERIALIZED (SELECT v AS s, v, CAST(0 AS BIGINT) AS d
    FROM sverts WHERE v % {seed_mod} = 0)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
b{t} AS MATERIALIZED (SELECT s, v, MIN(d) AS d FROM (
        SELECT s, v, d FROM b{t-1}
        UNION ALL
        SELECT p.s, e.u AS v, p.d + 1 AS d
        FROM adj e JOIN b{t-1} p ON e.v = p.v)
    GROUP BY s, v)"""
        )
    return "".join(parts)


def _ms_bfs_guard(rounds: int, name: str) -> str:
    """SQL boolean: true iff the last two unrolled levels differ."""
    return (
        f"(SELECT COUNT(*) FROM b{rounds - 1}) <> (SELECT COUNT(*) FROM b{rounds}) "
        f"OR (SELECT SUM(d) FROM b{rounds - 1}) <> (SELECT SUM(d) FROM b{rounds})"
    )


def harmonic_sql(rounds: int = 16, seed_mod: int = 7) -> str:
    """Sampled harmonic centrality over the sparse events subgraph:
    H(v) = SUM(1/d(s,v)) over seeds with 0 < d, from the unrolled
    multi-source BFS; ppm-rounded like every double-valued gate."""
    return (
        _ms_bfs_cte(rounds, seed_mod)
        + f"""
SELECT sverts.v AS id,
       CAST(CASE WHEN {_ms_bfs_guard(rounds, 'harmonic')}
                 THEN error('harmonic oracle unconverged after {rounds} rounds; raise rounds')
                 ELSE ROUND(COALESCE(h.h, 0) * 1000000) END AS BIGINT) AS harmonic_ppm
FROM sverts LEFT JOIN (SELECT v, SUM(1.0 / d) AS h FROM b{rounds}
                       WHERE d > 0 GROUP BY v) h
  ON sverts.v = h.v"""
    )


def eccentricity_sql(rounds: int = 16, seed_mod: int = 7) -> str:
    """Per-seed eccentricity within its reachable set (max finite BFS
    depth) over the sparse events subgraph — max over rows is the BFS
    pseudo-diameter lower bound."""
    return (
        _ms_bfs_cte(rounds, seed_mod)
        + f"""
SELECT s AS id,
       CAST(CASE WHEN {_ms_bfs_guard(rounds, 'eccentricity')}
                 THEN error('eccentricity oracle unconverged after {rounds} rounds; raise rounds')
                 ELSE MAX(d) END AS BIGINT) AS ecc
FROM b{rounds} GROUP BY s"""
    )


def neighborhood_function_sql(rounds: int = 16, seed_mod: int = 7) -> str:
    """Sampled neighborhood function over the sparse events subgraph:
    per-depth pair counts from the unrolled multi-source BFS, cumulated;
    frac ppm-rounded against the total reached-pair count. Convergence-
    guarded like the other MS-BFS consumers."""
    return (
        _ms_bfs_cte(rounds, seed_mod)
        + f""",
per AS MATERIALIZED (SELECT d, COUNT(*) AS c FROM b{rounds} GROUP BY d)
SELECT d AS h,
       CAST(SUM(c) OVER (ORDER BY d) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN {_ms_bfs_guard(rounds, 'neighborhood_function')}
                 THEN error('neighborhood_function oracle unconverged after {rounds} rounds; raise rounds')
                 ELSE ROUND(SUM(c) OVER (ORDER BY d) * 1000000.0
                            / (SELECT COUNT(*) FROM b{rounds})) END AS BIGINT) AS frac_ppm
FROM per"""
    )


def k_truss_sql(k: int = 4, rounds: int = 20, mod: int = 7) -> str:
    """k-truss peeling unrolled over the mod-``mod`` events subgraph
    (ODD modulus — even moduli are parity-bipartite and triangle-free,
    see edges.events_edges_mod_sql): per round, per-edge support =
    common live neighbors via the wedge join, drop edges below k-2.
    The sf0.01 mod-7 graph peels 15 real rounds at k=4 to a 427-edge
    truss. Fixpoint-guarded like k_core."""
    from .edges import events_edges_mod_sql

    need = k - 2
    parts = [
        f"""WITH tedges AS MATERIALIZED ({events_edges_mod_sql(mod)}),
l0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM tedges WHERE src <> dst)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
adj{t} AS MATERIALIZED (SELECT a AS x, b AS y FROM l{t-1}
    UNION ALL SELECT b AS x, a AS y FROM l{t-1}),
sup{t} AS MATERIALIZED (
    SELECT e.a, e.b, COUNT(*) AS s
    FROM l{t-1} e
    JOIN adj{t} n1 ON n1.x = e.a AND n1.y <> e.b
    JOIN adj{t} n2 ON n2.x = e.b AND n2.y = n1.y
    GROUP BY e.a, e.b),
l{t} AS MATERIALIZED (
    SELECT e.a, e.b FROM l{t-1} e
    JOIN sup{t} s ON s.a = e.a AND s.b = e.b
    WHERE s.s >= {need})"""
        )
    parts.append(
        f"""
SELECT CASE WHEN (SELECT COUNT(*) FROM l{rounds - 1})
                 <> (SELECT COUNT(*) FROM l{rounds})
            THEN error('k_truss oracle unconverged after {rounds} rounds; raise rounds')
            ELSE a END AS a, b
FROM l{rounds}"""
    )
    return "".join(parts)


def cocitation_sql(k: int = 5) -> str:
    """Co-citation top-k over the sparse events subgraph: wedge self-join
    on src over distinct directed pairs, symmetric pair counts, per-vertex
    top-k by (common desc, neighbor asc) — the Spark kernel verbatim."""
    return f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM sedges),
pairs AS MATERIALIZED (
    SELECT a.dst AS u, b.dst AS v, CAST(COUNT(*) AS BIGINT) AS common
    FROM de a JOIN de b ON a.src = b.src
    WHERE a.dst < b.dst
    GROUP BY a.dst, b.dst),
sym AS MATERIALIZED (
    SELECT u, v, common FROM pairs
    UNION ALL
    SELECT v AS u, u AS v, common FROM pairs),
ranked AS MATERIALIZED (
    SELECT u, v, common,
           ROW_NUMBER() OVER (PARTITION BY u ORDER BY common DESC, v ASC) AS rnk
    FROM sym)
SELECT u AS id, v AS neighbor, common, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= {k}"""


def random_walks_sql(
    length: int = 8, walks_per_seed: int = 2, seed_mod: int = 7
) -> str:
    """Deterministic random walks over the sparse events subgraph,
    unrolled one CTE per step: neighbor rank = the SAME mix arithmetic
    as graph_algos.random_walks (constants WALK_*), over the distinct
    directed pairs with neighbors ranked dst-ascending. Walks end at
    dangling vertices (inner join against the degree table drops them).
    Seeds = sparse vertices with v % seed_mod = 0."""
    VMOD, VMUL, SMUL, WMUL, ADD = 1000003, 69069, 40503, 12345, 7
    parts = [
        f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
de AS MATERIALIZED (SELECT DISTINCT src, dst FROM sedges),
ranked AS MATERIALIZED (SELECT src, dst,
    ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS rn FROM de),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS outd FROM de GROUP BY src),
w0 AS MATERIALIZED (SELECT sverts.v AS seed, CAST(w.walk AS BIGINT) AS walk,
    CAST(0 AS BIGINT) AS step, sverts.v AS vertex
    FROM sverts, (SELECT CAST(range AS BIGINT) AS walk
                  FROM range({walks_per_seed})) w
    WHERE sverts.v % {seed_mod} = 0)"""
    ]
    for t in range(1, length + 1):
        parts.append(
            f""",
w{t} AS MATERIALIZED (SELECT p.seed, p.walk, CAST({t} AS BIGINT) AS step, r.dst AS vertex
    FROM w{t-1} p
    JOIN deg d ON p.vertex = d.src
    JOIN ranked r ON r.src = p.vertex
     AND r.rn = ((p.vertex % {VMOD}) * {VMUL} + {t * SMUL}
                 + p.walk * {WMUL} + {ADD}) % d.outd)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT seed, walk, step, vertex FROM w{t}" for t in range(length + 1)
    )
    parts.append(f"\n{union}")
    return "".join(parts)


def mis_sql(rounds: int = 12) -> str:
    """Deterministic-Luby maximal independent set over the sparse events
    subgraph, unrolled one CTE group per round: winners = live vertices
    with no live neighbor of smaller (priority, id) key (the same hash
    constants as the Spark kernel), retire winners + their neighbors,
    accumulate winners plus orphaned vertices (live vertices whose whole
    neighborhood retired without them). The live edge set must be EMPTY
    after ``rounds`` rounds or the oracle errors (fixpoint guard)."""
    VMOD, VMUL, ADD, PMOD = 1000003, 69069, 12345, 999983

    def pri(c: str) -> str:
        return f"((({c} % {VMOD}) * {VMUL} + {ADD}) % {PMOD})"

    parts = [
        f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM sedges WHERE src <> dst),
l0 AS MATERIALIZED (SELECT a AS v, b AS u FROM und UNION ALL SELECT b AS v, a AS u FROM und),
m0 AS MATERIALIZED (SELECT sverts.v FROM sverts
    LEFT JOIN (SELECT DISTINCT v FROM l0) lv ON sverts.v = lv.v
    WHERE lv.v IS NULL)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
lv{t} AS MATERIALIZED (SELECT DISTINCT v FROM l{t-1}),
w{t} AS MATERIALIZED (SELECT v FROM lv{t} EXCEPT
    SELECT DISTINCT v FROM l{t-1}
    WHERE {pri('u')} < {pri('v')}
       OR ({pri('u')} = {pri('v')} AND u < v)),
ret{t} AS MATERIALIZED (SELECT v FROM w{t} UNION
    SELECT l.u AS v FROM l{t-1} l JOIN w{t} w ON l.v = w.v),
l{t} AS MATERIALIZED (SELECT l.v, l.u FROM l{t-1} l
    LEFT JOIN ret{t} r1 ON l.v = r1.v
    LEFT JOIN ret{t} r2 ON l.u = r2.v
    WHERE r1.v IS NULL AND r2.v IS NULL),
orph{t} AS MATERIALIZED (SELECT v FROM lv{t}
    EXCEPT SELECT v FROM ret{t}
    EXCEPT SELECT DISTINCT v FROM l{t}),
m{t} AS MATERIALIZED (SELECT v FROM m{t-1}
    UNION SELECT v FROM w{t} UNION SELECT v FROM orph{t})"""
        )
    parts.append(
        f"""
SELECT sverts.v AS id,
       CAST(CASE WHEN (SELECT COUNT(*) FROM l{rounds}) <> 0
                 THEN error('mis oracle unconverged after {rounds} rounds; raise rounds')
                 WHEN m.v IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS in_mis
FROM sverts LEFT JOIN m{rounds} m ON sverts.v = m.v"""
    )
    return "".join(parts)


def hits_sql(iters: int = 10) -> str:
    """HITS unrolled: one auth CTE + one hub CTE per iteration, each
    L1-normalized by a scalar-subquery sum (the same deterministic
    divisor the Spark kernel applies driver-side)."""
    parts = [
        _PRELUDE
        + """
h0 AS MATERIALIZED (SELECT v, 1.0 AS h FROM verts)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
ar{k} AS MATERIALIZED (SELECT verts.v, COALESCE(m.s, 0) AS a
       FROM verts LEFT JOIN (SELECT e.dst AS v, SUM(p.h) AS s
                  FROM edges e JOIN h{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON verts.v = m.v),
a{k} AS MATERIALIZED (SELECT v, a / (SELECT SUM(a) FROM ar{k}) AS a FROM ar{k}),
hr{k} AS MATERIALIZED (SELECT verts.v, COALESCE(m.s, 0) AS h
       FROM verts LEFT JOIN (SELECT e.src AS v, SUM(p.a) AS s
                  FROM edges e JOIN a{k} p ON e.dst = p.v GROUP BY e.src) m
         ON verts.v = m.v),
h{k} AS MATERIALIZED (SELECT v, h / (SELECT SUM(h) FROM hr{k}) AS h FROM hr{k})"""
        )
    parts.append(
        f"""
SELECT a.v AS id,
       CAST(ROUND(a.a * 1000000) AS BIGINT) AS auth_ppm,
       CAST(ROUND(h.h * 1000000) AS BIGINT) AS hub_ppm
FROM a{iters} a JOIN h{iters} h ON a.v = h.v"""
    )
    return "".join(parts)


def graph_summary_sql() -> str:
    """Oracle twin of edges.graph_summary (same six aggregates)."""
    return f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
base AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
    CAST(SUM(CASE WHEN src = dst THEN 1 ELSE 0 END) AS BIGINT) AS n_self_loops
  FROM edges),
verts AS MATERIALIZED (SELECT CAST(COUNT(DISTINCT v) AS BIGINT) AS n_vertices FROM (
    SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)),
pairs AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_pairs FROM (
    SELECT DISTINCT src, dst FROM edges)),
degs AS MATERIALIZED (SELECT CAST(MAX(d) AS BIGINT) AS max_out_degree,
    CAST(ROUND(AVG(d) * 1000000) AS BIGINT) AS avg_out_degree_ppm FROM (
    SELECT COUNT(*) AS d FROM edges GROUP BY src))
SELECT n_vertices, n_edges, n_self_loops, n_distinct_pairs,
       max_out_degree, avg_out_degree_ppm
FROM base, verts, pairs, degs
"""


def local_clustering_sql() -> str:
    """Oracle twin of graph_algos.local_clustering: 2·tri/(d·(d−1)) over
    the simple undirected graph, 0 below degree 2, ppm-rounded. The tri
    CTE is triangles_per_vertex_sql's oriented intersection verbatim."""
    return (
        _PRELUDE
        + """
und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM edges WHERE src <> dst),
deg AS MATERIALIZED (SELECT v, COUNT(*) AS c
        FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
o AS MATERIALIZED (SELECT CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN a ELSE b END AS lo,
             CASE WHEN (da.c < db.c) OR (da.c = db.c AND a < b) THEN b ELSE a END AS hi
      FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v),
tri AS MATERIALIZED (SELECT e1.lo AS x, e1.hi AS y, e2.hi AS z
      FROM o e1 JOIN o e2 ON e1.hi = e2.lo JOIN o e3 ON e3.lo = e1.lo AND e3.hi = e2.hi),
tpv AS MATERIALIZED (SELECT v, COUNT(*) AS t FROM (
  SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri UNION ALL SELECT z AS v FROM tri
) GROUP BY v)
SELECT verts.v AS id,
       CAST(ROUND(CASE WHEN COALESCE(deg.c, 0) >= 2
                 THEN (2.0 * COALESCE(tpv.t, 0)) / (deg.c * (deg.c - 1))
                 ELSE 0.0 END * 1000000) AS BIGINT) AS lcc_ppm
FROM verts LEFT JOIN deg ON verts.v = deg.v LEFT JOIN tpv ON verts.v = tpv.v
"""
    )


def scc_sql() -> str:
    """Oracle twin of graph_algos.strongly_connected_components over the
    sparse events subgraph: scc_id(v) = MIN u with v →* u AND u →* v,
    computed from the full recursive-CTE reachability closure (exact and
    engine-agnostic; the closure is ~|V|² pairs at gate scale)."""
    return f"""WITH sedges AS MATERIALIZED ({SPARSE_EDGES_SQL}),
sverts AS MATERIALIZED (SELECT DISTINCT v FROM (
    SELECT src AS v FROM sedges UNION ALL SELECT dst AS v FROM sedges)),
se AS MATERIALIZED (SELECT DISTINCT src, dst FROM sedges),
reach AS MATERIALIZED (
  WITH RECURSIVE r(a, b) AS (
    SELECT v, v FROM sverts
    UNION
    SELECT r.a, e.dst FROM r JOIN se e ON r.b = e.src
  ) SELECT * FROM r
)
SELECT r1.a AS id, CAST(MIN(r1.b) AS BIGINT) AS scc_id
FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
GROUP BY r1.a
"""


def degree_histogram_sql() -> str:
    return (
        _PRELUDE
        + """
od AS MATERIALIZED (SELECT src AS v, COUNT(*) AS c FROM edges GROUP BY src),
dv AS MATERIALIZED (SELECT verts.v, COALESCE(od.c, 0) AS deg
     FROM verts LEFT JOIN od ON verts.v = od.v)
SELECT CAST(deg AS BIGINT) AS out_degree, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM dv GROUP BY deg
"""
    )


def pagerank_weighted_sql(iters: int = 20, d: float = 0.85) -> str:
    """Weighted pagerank_sql twin: pre-divided by total out-weight,
    undivided final iteration, zero-out-weight mass dropped; parallel
    edges collapse by adding weights (same as the Spark kernel)."""
    parts = [
        f"""WITH wraw AS MATERIALIZED ({WEIGHTED_EDGES_SQL}),
edges AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM wraw GROUP BY src, dst),
verts AS MATERIALIZED ({VERTICES_SQL}),
deg AS MATERIALIZED (SELECT src AS v, SUM(w) AS outw FROM edges GROUP BY src),
s0 AS MATERIALIZED (SELECT verts.v,
              CASE WHEN COALESCE(deg.outw, 0) > 0 THEN 1.0/deg.outw ELSE 1.0 END AS r
       FROM verts LEFT JOIN deg ON verts.v = deg.v)"""
    ]
    for k in range(1, iters + 1):
        last = k == iters
        val = f"({1.0 - d:.2f} + {d:.2f}*COALESCE(m.s, 0))"
        expr = (
            val
            if last
            else f"CASE WHEN COALESCE(deg.outw, 0) > 0 THEN {val}/deg.outw ELSE {val} END"
        )
        parts.append(
            f""",
s{k} AS MATERIALIZED (SELECT verts.v, {expr} AS r
       FROM verts
       LEFT JOIN (SELECT e.dst AS v, SUM(e.w * p.r) AS s
                  FROM edges e JOIN s{k-1} p ON e.src = p.v GROUP BY e.dst) m
         ON verts.v = m.v
       LEFT JOIN deg ON verts.v = deg.v)"""
        )
    parts.append(
        f"\nSELECT v AS id, CAST(ROUND(r * 1000000) AS BIGINT) AS rank_ppm FROM s{iters}"
    )
    return "".join(parts)
