"""Deterministic synthetic edge generator, pre-bucketed by dst chunk.

For throughput/scaling benchmarks we need graphs far larger than the
HTML-pipeline fixture can produce in bench time. Edges are pure functions
of their global edge id g, constructed so each chunk can *enumerate*
exactly its own edges arithmetically — no scan of the full id space and
no bucketing shuffle; generation is O(E) total work across all chunks:

  directed:   dst_g = g mod V            (uniform → balanced dst chunks)
              src_g = ⌊V·u²⌋, u = mix(g) (hub-skewed like a web graph)
              {g : dst_g ∈ [b,e)} = arithmetic progressions r + tV.

  symmetric:  undirected pair (a_g, b_g), a_g = g mod V,
              b_g = (gK + 7) mod V with gcd(K, V) = 1; the edge multiset
              is {(a,b)} ∪ {(b,a)} — the reference's non-deduped
              symmetrization (core/graph.hpp:572-587). Both
              {g : a_g ∈ chunk} and {g : b_g ∈ chunk} are arithmetic
              progressions (the latter via K⁻¹ mod V).
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


def pair_of(g: np.ndarray, n_vertices: int):
    """Symmetric graph's undirected pair (a, b) for edge ids g."""
    g = np.asarray(g, dtype=np.int64)
    k = _pair_mult(n_vertices)
    return g % n_vertices, (g * k + 7) % n_vertices


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
    k = _pair_mult(V)
    kinv = pow(k, -1, V)

    meta = pd.DataFrame({"chunk_id": np.arange(C, dtype=np.int32)})
    mdf = spark.createDataFrame(meta).repartition(C, "chunk_id")

    def gen(batches):
        idt = np.int32 if V < 2**31 else np.int64
        for pdf in batches:
            for cid in pdf["chunk_id"].tolist():
                begin, end = int(bounds[cid]), int(bounds[cid + 1])
                r = np.arange(begin, end, dtype=np.int64)
                if not symmetric:
                    g = _ids_with_residue(begin, end, r, V, E)
                    dsts = g % V
                    srcs = _skew_src(g, V, seed)
                else:
                    # orientation (b→a): dst = a_g ∈ chunk
                    gA = _ids_with_residue(begin, end, r, V, E)
                    aA = gA % V
                    bA = (gA * k + 7) % V
                    # orientation (a→b): dst = b_g ∈ chunk
                    resB = (kinv * (r - 7)) % V
                    gB = _ids_with_residue(begin, end, resB, V, E)
                    aB = gB % V
                    bB = (gB * k + 7) % V
                    srcs = np.concatenate([bA, aB])
                    dsts = np.concatenate([aA, bB])
                srcs = srcs.astype(idt)
                dsts = dsts.astype(idt)
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

    out_degree = np.zeros(V, dtype=np.int64)
    in_degree = np.zeros(V, dtype=np.int64)
    for cid in range(C):
        prefix = os.path.join(spill_dir, f"chunk_{cid:05d}")
        out_degree += np.load(f"{prefix}.outdeg.npy")
        in_degree[bounds[cid] : bounds[cid + 1]] = np.load(f"{prefix}.indeg.npy")
        os.remove(f"{prefix}.outdeg.npy")
        os.remove(f"{prefix}.indeg.npy")
    return ChunkedGraph.from_chunk_files(
        spark, spill_dir, bounds, out_degree, in_degree
    )
