"""Deterministic synthetic edge generator, pre-bucketed by dst chunk.

For throughput/scaling benchmarks we need graphs far larger than the
HTML-pipeline fixture can produce in bench time. Edges are pure functions
of their global edge id g, constructed so each chunk can *enumerate*
exactly its own edges arithmetically — no scan of the full id space and
no bucketing shuffle; generation is O(E) total work across all chunks:

  directed:   dst_g = g mod V            (uniform → balanced dst chunks)
              src_g = ⌊V·u²⌋, u = mix(g) (hub-skewed like a web graph)
              {g : dst_g ∈ [b,e)} = arithmetic progressions r + tV.

  symmetric:  the SAME directed edges plus every edge reversed — the
              reference's non-deduped symmetrization
              (core/graph.hpp:572-587). The forward half (dst = g mod V
              ∈ chunk) is enumerated arithmetically; the reversed half
              (dst = src_g ∈ chunk) is found by a vectorized
              one-mix-per-id filter scan — O(E) extra work per chunk but
              a single ufunc pass, and it keeps both endpoint
              distributions genuinely pseudorandom (a linear map of
              g mod V would collapse each vertex's neighborhood to one
              node and blow the graph diameter up to O(V)).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from .chunked_graph import ChunkedGraph, save_chunk_arrays

_U64 = np.uint64
_K0 = 1_000_003


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(_U64, copy=True)
    x += _U64(0x9E3779B97F4A7C15)
    x ^= x >> _U64(30)
    x *= _U64(0xBF58476D1CE4E5B9)
    x ^= x >> _U64(27)
    x *= _U64(0x94D049BB133111EB)
    x ^= x >> _U64(31)
    return x


def _pair_mult(n_vertices: int) -> int:
    k = _K0
    while math.gcd(k, n_vertices) != 1:
        k += 2
    return k


def _skew_src(g: np.ndarray, n_vertices: int, seed: int) -> np.ndarray:
    h = _mix64(g.astype(_U64) + _U64(seed * 0x9E3779B9))
    u = (h >> _U64(11)).astype(np.float64) / float(1 << 53)
    return np.minimum((n_vertices * u * u).astype(np.int64), n_vertices - 1)


def edge_of(g: np.ndarray, n_vertices: int, seed: int):
    """Directed graph: (src, dst) for edge ids g."""
    g = np.asarray(g, dtype=np.int64)
    return _skew_src(g, n_vertices, seed), g % n_vertices


def pair_of(g: np.ndarray, n_vertices: int, seed: int = 42):
    """Symmetric graph's undirected pair = the directed edge (src, dst);
    the symmetric multigraph is {(src,dst)} ∪ {(dst,src)}."""
    return edge_of(g, n_vertices, seed)


def _ids_with_residue(lo: int, hi: int, residues: np.ndarray, modulus: int, limit: int):
    """All g < limit with g mod modulus ∈ residues (given as the residue
    array for a contiguous dst range) — vectorized enumeration."""
    periods = (limit + modulus - 1) // modulus
    g = residues[None, :] + modulus * np.arange(periods, dtype=np.int64)[:, None]
    g = g.ravel()
    return g[g < limit]


def synth_graph(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    n_chunks: int,
    spill_dir: str,
    seed: int = 42,
    symmetric: bool = False,
) -> ChunkedGraph:
    os.makedirs(spill_dir, exist_ok=True)
    V, E, C = n_vertices, n_edges, n_chunks
    bounds = np.linspace(0, V, C + 1).astype(np.int64)

    # reuse: if this exact graph was already generated here (e.g. by a
    # previous scaling leg), wrap the existing files — generation is not
    # part of the timed region, and sharing the input between parallelism
    # levels is precisely what the scaling protocol wants
    meta_path = os.path.join(spill_dir, "meta.npz")
    if os.path.exists(meta_path):
        with np.load(meta_path) as mz:
            if (
                int(mz["V"]) == V
                and int(mz["E"]) == E
                and int(mz["C"]) == C
                and int(mz["seed"]) == seed
                and bool(mz["symmetric"]) == symmetric
            ):
                return ChunkedGraph.from_chunk_files(
                    spark,
                    spill_dir,
                    mz["bounds"],
                    mz["out_degree"],
                    mz["in_degree"],
                    owns_spill=False,
                )

    meta = pd.DataFrame({"chunk_id": np.arange(C, dtype=np.int32)})
    mdf = spark.createDataFrame(meta).repartition(C, "chunk_id")

    def gen(batches):
        idt = np.int32 if V < 2**31 else np.int64
        for pdf in batches:
            for cid in pdf["chunk_id"].tolist():
                begin, end = int(bounds[cid]), int(bounds[cid + 1])
                r = np.arange(begin, end, dtype=np.int64)
                # forward edges whose dst = g mod V falls in this chunk
                g = _ids_with_residue(begin, end, r, V, E)
                dsts = (g % V).astype(idt)
                srcs = _skew_src(g, V, seed).astype(idt)
                order = np.argsort(srcs, kind="stable")
                srcs, dsts = srcs[order], dsts[order]
                prefix = os.path.join(spill_dir, f"chunk_{cid:05d}")
                save_chunk_arrays(prefix, {"srcs": srcs, "dsts": dsts})
                od = np.bincount(srcs, minlength=V).astype(np.int64)
                np.save(f"{prefix}.outdeg.npy", od)
                ind = np.bincount(dsts - begin, minlength=end - begin).astype(np.int64)
                np.save(f"{prefix}.indeg.npy", ind)
                yield pd.DataFrame({"chunk_id": [cid], "n": [len(srcs)]})

    mdf.mapInPandas(gen, "chunk_id int, n long").collect()

    if symmetric:
        # pass 2: append the reversed orientation. Chunk files are
        # src-sorted, so the reversed edges owned by chunk c (those whose
        # forward src ∈ [begin,end)) are ONE contiguous slice of every
        # forward file — binary search + copy, no rescan of the id space.
        def sym_pass(batches):
            idt = np.int32 if V < 2**31 else np.int64
            for pdf in batches:
                for cid in pdf["chunk_id"].tolist():
                    begin, end = int(bounds[cid]), int(bounds[cid + 1])
                    prefix = os.path.join(spill_dir, f"chunk_{cid:05d}")
                    fs = np.load(f"{prefix}.srcs.npy", mmap_mode="r")
                    fd = np.load(f"{prefix}.dsts.npy", mmap_mode="r")
                    parts_s = [np.asarray(fs)]
                    parts_d = [np.asarray(fd)]
                    for oc in range(C):
                        op = os.path.join(spill_dir, f"chunk_{oc:05d}")
                        os_ = np.load(f"{op}.srcs.npy", mmap_mode="r")
                        lo = np.searchsorted(os_, begin, side="left")
                        hi = np.searchsorted(os_, end, side="left")
                        if hi > lo:
                            od_ = np.load(f"{op}.dsts.npy", mmap_mode="r")
                            parts_s.append(np.asarray(od_[lo:hi]))  # reversed src
                            parts_d.append(np.asarray(os_[lo:hi]))  # reversed dst
                    srcs = np.concatenate(parts_s).astype(idt)
                    dsts = np.concatenate(parts_d).astype(idt)
                    order = np.argsort(srcs, kind="stable")
                    srcs, dsts = srcs[order], dsts[order]
                    save_chunk_arrays(
                        prefix + "sym", {"srcs": srcs, "dsts": dsts}
                    )
                    od = np.bincount(srcs, minlength=V).astype(np.int64)
                    np.save(f"{prefix}sym.outdeg.npy", od)
                    ind = np.bincount(
                        dsts - dsts.dtype.type(begin), minlength=end - begin
                    ).astype(np.int64)
                    np.save(f"{prefix}sym.indeg.npy", ind)
                    yield pd.DataFrame({"chunk_id": [cid], "n": [len(srcs)]})

        mdf.mapInPandas(sym_pass, "chunk_id int, n long").collect()
        # promote the sym files to the canonical names
        for cid in range(C):
            prefix = os.path.join(spill_dir, f"chunk_{cid:05d}")
            for suffix in ("srcs.npy", "dsts.npy", "outdeg.npy", "indeg.npy"):
                os.replace(f"{prefix}sym.{suffix}", f"{prefix}.{suffix}")

    out_degree = np.zeros(V, dtype=np.int64)
    in_degree = np.zeros(V, dtype=np.int64)
    for cid in range(C):
        prefix = os.path.join(spill_dir, f"chunk_{cid:05d}")
        out_degree += np.load(f"{prefix}.outdeg.npy")
        in_degree[bounds[cid] : bounds[cid + 1]] = np.load(f"{prefix}.indeg.npy")
        os.remove(f"{prefix}.outdeg.npy")
        os.remove(f"{prefix}.indeg.npy")
    np.savez(
        meta_path,
        V=V, E=E, C=C, seed=seed, symmetric=symmetric,
        bounds=bounds, out_degree=out_degree, in_degree=in_degree,
    )
    return ChunkedGraph.from_chunk_files(
        spark, spill_dir, bounds, out_degree, in_degree
    )
