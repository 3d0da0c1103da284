"""Vertex-centric execution engine: process_vertices / edge aggregation
with adaptive sparse(push)/dense(pull) mode switching.

Re-expresses the reference's two dataflow primitives (core/graph.hpp:
1406-1468 process_vertices, 1492-1866 process_edges) Spark-first:

- ``process_vertices`` — state is driver-resident numpy, so the filtered
  map + sum-reduce is a vectorized driver computation (the reference's
  work-stealing + MPI_Allreduce collapse into numpy reductions).
- ``edge_aggregate`` — one Spark stage over the cached chunk DataFrame:
  broadcast the per-vertex message vector (and frontier bitmap), each
  chunk task aggregates into its local dst range with numpy ufuncs, and
  the driver assembles the collected per-chunk results. Because chunks
  are dst-sharded, per-dst aggregation is final within a task — there is
  no shuffle in the iteration loop at all.

Mode rule is the reference's, verbatim: sparse (push) iff
``active_out_edges < |E| / 20`` (core/graph.hpp:1502-1508). Sparse mode
skips inactive edges via searchsorted spans over the src-sorted chunk
arrays (the analogue of probing the out-CSR bitmap, graph.hpp:1599-1657);
dense mode streams every edge with a fancy-indexed gather (the CSC scan of
graph.hpp:1748-1788).

Combiners are the reference's closed set — sum (write_add), min
(write_min), first-claim (cas) (core/atomic.hpp:25-51) — plus ``mode``
(most-frequent, ties→smallest) for the label-propagation extension.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .chunked_graph import ChunkedGraph

SPARSE_DENOM = 20  # push iff active_edges < n_edges / 20 (graph.hpp:1508)


def _multi_range_indices(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], ends[i]) ranges — vectorized."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    return out + np.arange(total, dtype=np.int64)


def _mode_per_dst(dl: np.ndarray, labs: np.ndarray, size: int, base: int):
    """Most frequent label per local dst, ties → smallest label.
    Returns (local_ids, labels)."""
    if len(dl) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    order = np.lexsort((labs, dl))
    d_s, l_s = dl[order], labs[order]
    # run-length over (dst, label)
    new_pair = np.ones(len(d_s), dtype=bool)
    new_pair[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
    pd_idx = np.flatnonzero(new_pair)
    cnt = np.diff(np.concatenate([pd_idx, [len(d_s)]]))
    gd, gl = d_s[pd_idx], l_s[pd_idx]
    # per dst pick max count, tie smallest label: lexsort by (dst, -cnt, label)
    o2 = np.lexsort((gl, -cnt, gd))
    gd2, gl2 = gd[o2], gl[o2]
    first = np.ones(len(gd2), dtype=bool)
    first[1:] = gd2[1:] != gd2[:-1]
    return gd2[first], gl2[first]


def _make_task(combiner: str, out_dtype: str, msg_offset, bc, weighted: bool):
    """Build the per-chunk mapInPandas function. ``bc`` broadcasts
    (msg_vec, frontier_mask_or_None, sparse_bool, frontier_ids_or_None).
    Chunk arrays are mmap-loaded from spill files (page-cache resident
    across supersteps); the metadata row shipped per task is ~100 bytes."""
    from .chunked_graph import load_chunk_arrays

    def task(batches):
        msg_vec, frontier, sparse, frontier_ids = bc.value
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                begin, end = int(row.begin), int(row.end)
                a = load_chunk_arrays(row.path, weighted)
                srcs, dsts, w = a["srcs"], a["dsts"], a["weights"]
                if sparse and frontier_ids is not None:
                    # push: only spans of active srcs (srcs are sorted) —
                    # the out-CSR bitmap probe of graph.hpp:1599-1657
                    s = np.searchsorted(srcs, frontier_ids, side="left")
                    e = np.searchsorted(srcs, frontier_ids, side="right")
                    sel = _multi_range_indices(s, e)
                    srcs, dsts = srcs[sel], dsts[sel]
                    if w is not None:
                        w = w[sel]
                elif frontier is not None:
                    # dense with selective bitmap: mask inactive srcs
                    m = frontier[srcs]
                    srcs, dsts = np.asarray(srcs)[m], np.asarray(dsts)[m]
                    if w is not None:
                        w = np.asarray(w)[m]
                if len(srcs) == 0:
                    continue
                d = np.asarray(dsts)
                dl = d - d.dtype.type(begin)  # stay int32 when ids are int32
                size = end - begin
                if combiner == "mode":
                    ids_l, vals = _mode_per_dst(
                        dl, msg_vec[np.asarray(srcs)], size, begin
                    )
                    ids = ids_l + begin
                elif combiner == "sum":
                    msgs = msg_vec[np.asarray(srcs)]
                    if msg_offset == "w":
                        msgs = msgs + w
                    elif msg_offset:
                        msgs = msgs + msg_offset
                    acc = np.bincount(dl, weights=msgs, minlength=size)
                    if frontier is None and frontier_ids is None:
                        # dense full-frontier: emit the whole local range
                        ids = np.arange(begin, end, dtype=np.int64)
                        vals = acc
                    else:
                        cnt = np.bincount(dl, minlength=size)
                        ids_l = np.flatnonzero(cnt)
                        ids, vals = ids_l + begin, acc[ids_l]
                elif combiner == "min":
                    msgs = msg_vec[np.asarray(srcs)]
                    if msg_offset == "w":
                        msgs = msgs + w
                    elif msg_offset:
                        msgs = msgs + msg_offset
                    ident = np.inf if out_dtype == "double" else np.iinfo(np.int64).max
                    acc = np.full(
                        size,
                        ident,
                        dtype=np.float64 if out_dtype == "double" else np.int64,
                    )
                    np.minimum.at(acc, dl, msgs)
                    cnt = np.bincount(dl, minlength=size)
                    ids_l = np.flatnonzero(cnt)
                    ids, vals = ids_l + begin, acc[ids_l]
                else:  # pragma: no cover
                    raise ValueError(combiner)
                if len(ids):
                    yield pd.DataFrame({"id": ids, "val": vals})

    return task


@dataclass
class IterationMetrics:
    iteration: int
    mode: str
    active_vertices: int
    active_edges: int
    wall_s: float


class VertexEngine:
    """Driver-side engine over a ChunkedGraph with numpy vertex state."""

    def __init__(self, graph: ChunkedGraph):
        self.g = graph
        self.metrics: list[IterationMetrics] = []

    # ---- V1: filtered map + sum reduce (graph.hpp:1406-1468) -------------
    def process_vertices(self, fn, active: np.ndarray | None = None):
        ids = (
            np.flatnonzero(active)
            if active is not None
            else np.arange(self.g.n_vertices)
        )
        return fn(ids)

    def active_out_edges(self, active: np.ndarray | None) -> int:
        if active is None:
            return self.g.n_edges
        return int(self.g.out_degree[active].sum())

    # ---- V2: edge-centric aggregation (graph.hpp:1492-1866) --------------
    def edge_aggregate(
        self,
        msg_vec: np.ndarray,
        combiner: str,
        msg_offset=None,
        frontier: np.ndarray | None = None,
        iteration: int = -1,
        force_mode: str | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """One superstep. Returns (ids, vals) of dsts that received ≥1
        message, aggregated with ``combiner``. ``frontier`` is a boolean
        mask over vertices (None = all active)."""
        t0 = time.time()
        g = self.g
        active_edges = self.active_out_edges(frontier)
        active_vertices = (
            int(frontier.sum()) if frontier is not None else g.n_vertices
        )
        sparse = active_edges < g.n_edges / SPARSE_DENOM
        if force_mode is not None:
            sparse = force_mode == "sparse"
        frontier_ids = (
            np.flatnonzero(frontier) if (sparse and frontier is not None) else None
        )
        out_dtype = "double" if msg_vec.dtype.kind == "f" else "long"

        sc = g.spark.sparkContext
        bc = sc.broadcast((msg_vec, frontier, sparse, frontier_ids))
        try:
            task = _make_task(combiner, out_dtype, msg_offset, bc, g.weighted)
            out = g.chunks.mapInPandas(
                task, f"id long, val {out_dtype}"
            ).toPandas()
        finally:
            bc.destroy()
        self.metrics.append(
            IterationMetrics(
                iteration=iteration,
                mode="sparse" if sparse else "dense",
                active_vertices=active_vertices,
                active_edges=active_edges,
                wall_s=time.time() - t0,
            )
        )
        return out["id"].values, out["val"].values
