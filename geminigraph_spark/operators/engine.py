"""Vertex-centric execution engine: process_vertices / edge aggregation
with adaptive sparse(push)/dense(pull) mode switching.

Re-expresses the reference's two dataflow primitives (core/graph.hpp:
1406-1468 process_vertices, 1492-1866 process_edges) Spark-first:

- ``process_vertices`` — state is driver-resident numpy, so the filtered
  map + sum-reduce is a vectorized driver computation (the reference's
  work-stealing + MPI_Allreduce collapse into numpy reductions).
- ``edge_aggregate`` — one Spark stage over the cached chunk-metadata
  DataFrame: the per-superstep state reaches workers either as a
  page-cache-shared state file (local master: zero pickling, the
  analogue of Gemini's per-node state replicas) or a torrent broadcast
  (cluster master). Sparse/push supersteps ship ONLY the frontier rows
  (ids + values, O(|frontier|) bytes) on both transports — the long
  fixpoint tail costs frontier-sized transport, not |V|; dense/pull
  supersteps replicate the full vector, which is the reference's own
  dense-mode state residency (graph.hpp:228-236) and by the adaptive
  rule happens only on the few high-work supersteps. Each chunk task
  aggregates into its local dst range
  with numpy ufuncs and returns ONE row per chunk with packed binary
  (ids, vals) arrays — Arrow ships a handful of big cells instead of
  millions of rows. Because chunks are dst-sharded, per-dst aggregation
  is final within a task: there is no shuffle in the iteration loop.

Mode rule is the reference's, verbatim: sparse (push) iff
``active_out_edges < |E| / 20`` (core/graph.hpp:1502-1508). Sparse mode
skips inactive edges via searchsorted spans over the src-sorted chunk
arrays (the out-CSR bitmap probe of graph.hpp:1599-1657); dense mode
streams every edge with a fancy-indexed gather (the CSC scan of
graph.hpp:1748-1788).

Combiners are the reference's closed set — sum (write_add), min
(write_min), first-claim (cas) (core/atomic.hpp:25-51) — plus ``mode``
(most-frequent, ties→smallest) for the label-propagation extension.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd

from .chunked_graph import ChunkedGraph

SPARSE_DENOM = 20  # push iff active_edges < n_edges / 20 (graph.hpp:1508)

_OUT_SCHEMA = "begin long, ids binary, vals binary, n_proc long"


def _multi_range_indices(starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Concatenate [starts[i], ends[i]) ranges — vectorized."""
    lens = ends - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.repeat(starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
    return out + np.arange(total, dtype=np.int64)


def _mode_per_dst(dl: np.ndarray, labs: np.ndarray):
    """Most frequent label per local dst, ties → smallest label.
    Returns (local_ids, labels)."""
    if len(dl) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    order = np.lexsort((labs, dl))
    d_s, l_s = np.asarray(dl)[order], np.asarray(labs)[order]
    new_pair = np.ones(len(d_s), dtype=bool)
    new_pair[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
    pd_idx = np.flatnonzero(new_pair)
    cnt = np.diff(np.concatenate([pd_idx, [len(d_s)]]))
    gd, gl = d_s[pd_idx], l_s[pd_idx]
    o2 = np.lexsort((gl, -cnt, gd))
    gd2, gl2 = gd[o2], gl[o2]
    first = np.ones(len(gd2), dtype=bool)
    first[1:] = gd2[1:] != gd2[:-1]
    return gd2[first].astype(np.int64), gl2[first].astype(np.int64)


def _load_state(transport: dict):
    """Worker-side: resolve (msg_vec, frontier, sparse, frontier_ids,
    dense_selective, frontier_vals).

    ``frontier_vals`` non-None ⇒ COMPACT sparse shipment: only the
    frontier rows of the state were transported (ids + values), not the
    |V| vector — message lookup is fvals[searchsorted(fids, src)]."""
    if transport["kind"] == "bc":
        return transport["bc"].value
    fids = (
        np.load(transport["fids"], mmap_mode="r") if transport["fids"] else None
    )
    fvals = (
        np.load(transport["fvals"], mmap_mode="r")
        if transport.get("fvals")
        else None
    )
    msg = np.load(transport["msg"], mmap_mode="r") if transport["msg"] else None
    fro = (
        np.load(transport["frontier"], mmap_mode="r")
        if transport["frontier"]
        else None
    )
    dsel = (
        np.load(transport["dsel"], mmap_mode="r") if transport.get("dsel") else None
    )
    return msg, fro, transport["sparse"], fids, dsel, fvals


def _make_task(
    combiner: str, val_dtype, msg_offset, transport: dict, affected_mode: bool = False
):
    """Per-chunk mapInPandas body. Output: one row per chunk with packed
    binary (ids, vals); ids=None ⇒ contiguous range starting at begin.

    ``affected_mode`` (mode combiner only): frontier_ids mark the vertices
    whose label CHANGED last superstep; the task recomputes the mode only
    at dsts with ≥1 in-edge from the frontier, but over ALL their in-edges
    (a mode is not decomposable over a frontier subset, unlike sum/min) —
    untouched dsts keep their label because their in-label multiset is
    unchanged. This is the activation discipline CC got from cc.cpp:48-59,
    applied to A6."""
    from .chunked_graph import load_chunk_arrays

    def task(batches):
        msg_vec, frontier, sparse, frontier_ids, dense_sel, fvals = _load_state(
            transport
        )

        def msg_of(srcs):
            # compact sparse shipment: every selected src is a frontier id
            if fvals is not None:
                return np.asarray(fvals)[
                    np.searchsorted(frontier_ids, srcs)
                ]
            return msg_vec[srcs]
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                begin, end = int(row.begin), int(row.end)
                a = load_chunk_arrays(row.path, False)
                srcs, dsts, w = a["srcs"], a["dsts"], a["weights"]
                if affected_mode and frontier_ids is not None:
                    # touched dsts from the frontier's src spans, then ALL
                    # in-edges of those dsts (src-unrestricted gather)
                    s = np.searchsorted(srcs, frontier_ids, side="left")
                    e = np.searchsorted(srcs, frontier_ids, side="right")
                    sel = _multi_range_indices(s, e)
                    if len(sel) == 0:
                        continue
                    size0 = end - begin
                    aff = np.zeros(size0, dtype=bool)
                    aff[np.asarray(dsts)[sel] - begin] = True
                    m = aff[np.asarray(dsts) - begin]
                    srcs, dsts = np.asarray(srcs)[m], np.asarray(dsts)[m]
                elif sparse and frontier_ids is not None:
                    s = np.searchsorted(srcs, frontier_ids, side="left")
                    e = np.searchsorted(srcs, frontier_ids, side="right")
                    sel = _multi_range_indices(s, e)
                    srcs, dsts = np.asarray(srcs)[sel], np.asarray(dsts)[sel]
                    if w is not None:
                        w = np.asarray(w)[sel]
                elif frontier is not None:
                    m = np.asarray(frontier)[np.asarray(srcs)]
                    srcs, dsts = np.asarray(srcs)[m], np.asarray(dsts)[m]
                    if w is not None:
                        w = np.asarray(w)[m]
                if dense_sel is not None and not sparse:
                    # pull-skip at already-settled dsts — the reference's
                    # dense_selective bitmap (graph.hpp:1665-1689; bfs.cpp:77)
                    m = np.asarray(dense_sel)[np.asarray(dsts)]
                    srcs, dsts = np.asarray(srcs)[m], np.asarray(dsts)[m]
                    if w is not None:
                        w = np.asarray(w)[m]
                if len(srcs) == 0:
                    continue
                d = np.asarray(dsts)
                dl = d - d.dtype.type(begin)
                size = end - begin
                ids_b = None
                if combiner == "mode":
                    ids_l, vals = _mode_per_dst(dl, msg_of(np.asarray(srcs)))
                    ids_b = (ids_l + begin).tobytes()
                elif combiner == "sum":
                    msgs = msg_of(np.asarray(srcs))
                    if msg_offset == "w":
                        msgs = msgs + w
                    elif msg_offset:
                        msgs = msgs + msg_offset
                    acc = np.bincount(dl, weights=msgs, minlength=size)
                    if frontier is None and frontier_ids is None:
                        vals = acc  # dense full-frontier: whole range
                    else:
                        cnt = np.bincount(dl, minlength=size)
                        ids_l = np.flatnonzero(cnt)
                        vals = acc[ids_l]
                        ids_b = (ids_l + begin).tobytes()
                elif combiner == "min":
                    msgs = msg_of(np.asarray(srcs))
                    if msg_offset == "w":
                        msgs = msgs + w
                    elif msg_offset:
                        msgs = msgs + msg_offset
                    ident = np.inf if val_dtype == np.float64 else np.iinfo(np.int64).max
                    acc = np.full(size, ident, dtype=val_dtype)
                    np.minimum.at(acc, dl, msgs)
                    cnt = np.bincount(dl, minlength=size)
                    ids_l = np.flatnonzero(cnt)
                    vals = acc[ids_l]
                    ids_b = (ids_l + begin).tobytes()
                else:  # pragma: no cover
                    raise ValueError(combiner)
                yield pd.DataFrame(
                    {
                        "begin": [begin],
                        "ids": [ids_b],
                        "vals": [np.ascontiguousarray(vals, dtype=val_dtype).tobytes()],
                        "n_proc": [len(srcs)],
                    }
                )

    return task


@dataclass
class IterationMetrics:
    iteration: int
    mode: str
    active_vertices: int
    active_edges: int
    wall_s: float
    processed_edges: int = -1  # measured inside tasks (post dense_selective)
    bytes_shipped: int = -1  # state bytes sent to workers this superstep


class VertexEngine:
    """Driver-side engine over a ChunkedGraph with numpy vertex state."""

    def __init__(self, graph: ChunkedGraph, transport: str | None = None):
        self.g = graph
        self.metrics: list[IterationMetrics] = []
        if transport is None:
            master = graph.spark.sparkContext.master
            transport = "file" if master.startswith("local") else "bc"
        self.transport = transport
        self._state_dir = tempfile.mkdtemp(prefix="gemini_state_")
        self._seq = 0

    def close(self) -> None:
        shutil.rmtree(self._state_dir, ignore_errors=True)

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

    def _ship_state(self, msg_vec, frontier, sparse, frontier_ids, dense_sel=None):
        """Ship the superstep state to workers. Sparse/push supersteps ship
        ONLY the frontier rows — (frontier_ids, msg_vec[frontier_ids]),
        O(|frontier|) bytes — because every message read in push mode comes
        from a frontier vertex. Dense/pull supersteps replicate the full
        state vector, which is the reference's own dense-mode layout (state
        resident per node, graph.hpp:228-236); the adaptive rule guarantees
        dense supersteps are the few high-work ones, so per-superstep
        transport is O(frontier + chunk results) through the long tail.
        Returns (transport, broadcast_handle, bytes_shipped)."""
        compact = sparse and frontier_ids is not None
        fvals = msg_vec[frontier_ids] if compact else None
        nbytes = 0
        for arr in (
            (frontier_ids, fvals) if compact else (msg_vec, frontier, frontier_ids)
        ):
            if arr is not None:
                nbytes += arr.nbytes
        if dense_sel is not None:
            nbytes += dense_sel.nbytes
        if self.transport == "bc":
            payload = (
                (None, None, sparse, frontier_ids, None, fvals)
                if compact
                else (msg_vec, frontier, sparse, frontier_ids, dense_sel, None)
            )
            bc = self.g.spark.sparkContext.broadcast(payload)
            return {"kind": "bc", "bc": bc}, bc, nbytes
        self._seq += 1
        base = os.path.join(self._state_dir, f"s{self._seq}")
        t = {
            "kind": "file",
            "msg": "",
            "frontier": "",
            "fids": "",
            "fvals": "",
            "dsel": "",
            "sparse": sparse,
        }
        if compact:
            np.save(base + ".fid.npy", frontier_ids)
            t["fids"] = base + ".fid.npy"
            np.save(base + ".fvl.npy", fvals)
            t["fvals"] = base + ".fvl.npy"
            return t, None, nbytes
        np.save(base + ".msg.npy", msg_vec)
        t["msg"] = base + ".msg.npy"
        if frontier is not None:
            np.save(base + ".fro.npy", frontier)
            t["frontier"] = base + ".fro.npy"
        if frontier_ids is not None:
            np.save(base + ".fid.npy", frontier_ids)
            t["fids"] = base + ".fid.npy"
        if dense_sel is not None:
            np.save(base + ".dsel.npy", dense_sel)
            t["dsel"] = base + ".dsel.npy"
        return t, None, nbytes

    # ---- V2: edge-centric aggregation (graph.hpp:1492-1866) --------------
    def edge_aggregate(
        self,
        msg_vec: np.ndarray,
        combiner: str,
        msg_offset=None,
        frontier: np.ndarray | None = None,
        iteration: int = -1,
        force_mode: str | None = None,
        dense_selective: np.ndarray | None = None,
        affected_only: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """One superstep. Returns (ids, vals) of dsts that received ≥1
        message, aggregated with ``combiner``. ``frontier`` is a boolean
        mask over vertices (None = all active). ``dense_selective`` is a
        boolean dst mask applied only in dense/pull mode — the reference's
        visited-skip bitmap (core/graph.hpp:1665-1689, bfs.cpp:77).

        ``affected_only`` (mode combiner): ``frontier`` marks the vertices
        whose value changed last superstep; when the frontier is sparse by
        the /20 rule, only dsts with ≥1 in-edge from the frontier are
        recomputed — over ALL their in-edges, so the returned modes are
        identical to a full sweep (an untouched dst's in-multiset is
        unchanged). Transport still ships the full value vector (the mode
        reads every in-neighbor, not just frontier ones) plus the frontier
        ids."""
        t0 = time.time()
        g = self.g
        active_edges = self.active_out_edges(frontier)
        active_vertices = (
            int(frontier.sum()) if frontier is not None else g.n_vertices
        )
        sparse = active_edges < g.n_edges / SPARSE_DENOM
        if force_mode is not None:
            sparse = force_mode == "sparse"
        affected_mode = False
        if affected_only:
            if combiner != "mode":  # pragma: no cover
                raise ValueError("affected_only applies to the mode combiner")
            affected_mode = (
                sparse and frontier is not None and not frontier.all()
            )
            frontier_ids = (
                np.flatnonzero(frontier) if affected_mode else None
            )
            # mode reads all in-neighbors: never src-mask the edges, and
            # the shipment is always the full vector (+ frontier ids)
            frontier = None
            sparse = False
            dense_selective = None
        else:
            if frontier is not None and not sparse and frontier.all():
                # full frontier: dense scans every edge anyway — skip the mask
                frontier = None
            frontier_ids = (
                np.flatnonzero(frontier) if (sparse and frontier is not None) else None
            )
            if sparse or (dense_selective is not None and dense_selective.all()):
                dense_selective = None
        val_dtype = np.float64 if msg_vec.dtype.kind == "f" else np.int64

        transport, bc, bytes_shipped = self._ship_state(
            msg_vec, frontier, sparse, frontier_ids, dense_selective
        )
        try:
            task = _make_task(
                combiner, val_dtype, msg_offset, transport, affected_mode
            )
            rows = g.chunks.mapInPandas(task, _OUT_SCHEMA).collect()
        finally:
            if bc is not None:
                bc.destroy()
            if transport["kind"] == "file":
                for key in ("msg", "frontier", "fids", "fvals", "dsel"):
                    p = transport.get(key)
                    if p:
                        try:
                            os.remove(p)
                        except OSError:
                            pass
        ids_parts, val_parts = [], []
        processed = 0
        for row in rows:
            processed += int(row.n_proc)
            vals = np.frombuffer(row.vals, dtype=val_dtype)
            if row.ids is None:
                ids = np.arange(row.begin, row.begin + len(vals), dtype=np.int64)
            else:
                ids = np.frombuffer(row.ids, dtype=np.int64)
            ids_parts.append(ids)
            val_parts.append(vals)
        out_ids = (
            np.concatenate(ids_parts) if ids_parts else np.empty(0, dtype=np.int64)
        )
        out_vals = (
            np.concatenate(val_parts) if val_parts else np.empty(0, dtype=val_dtype)
        )
        self.metrics.append(
            IterationMetrics(
                iteration=iteration,
                mode="sparse" if (sparse or affected_mode) else "dense",
                active_vertices=active_vertices,
                active_edges=active_edges,
                wall_s=time.time() - t0,
                processed_edges=processed,
                bytes_shipped=bytes_shipped,
            )
        )
        return out_ids, out_vals
