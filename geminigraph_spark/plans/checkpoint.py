"""Snapshot store: per-iteration state checkpoints + lineage + metrics.

Plays the role of Iceberg snapshot-per-iteration from the north_rule (and
of the reference's dump_vertex_array / restore_vertex_array,
core/graph.hpp:253-306): every superstep's vertex state is persisted as
parquet with an explicit ``chunk_id`` column and **one row-group per
chunk** (per-partition lineage), alongside a JSON manifest recording the
iteration, per-chunk row counts, and engine metrics (mode, active
vertices/edges, wall time — the same quantities the reference's
process_edges computes for its mode decision, graph.hpp:1502-1507).

Any run can resume mid-computation: ``latest()`` returns the newest
complete snapshot; the algorithm entry points accept (start, start_iter).
Manifest writes are atomic (tmp + rename), so a killed run can never
leave a truncated manifest pointing at a half-written snapshot: the state
parquet is written first, the manifest entry only after.

In a deployment with an Iceberg catalog the same layout maps 1:1 onto an
Iceberg table partitioned by (algo, iteration, chunk_id) with one snapshot
per iteration; this store keeps the identical contract on plain parquet so
the repo runs hermetically.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class SnapshotStore:
    def __init__(self, root: str, run_id: str, algo: str):
        self.dir = os.path.join(root, run_id, algo)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.json")

    # ------------------------------------------------------------ manifest
    def _read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"iterations": []}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self.manifest_path)

    # --------------------------------------------------------------- save
    def save(
        self,
        iteration: int,
        state: np.ndarray,
        boundaries: np.ndarray,
        metrics: object | None = None,
        value_name: str = "value",
    ) -> str:
        """Persist state (dense array indexed by vertex id) with one
        parquet row-group per chunk."""
        path = os.path.join(self.dir, f"iter={iteration:05d}.parquet")
        n = len(state)
        ids = np.arange(n, dtype=np.int64)
        chunk = (np.searchsorted(boundaries, ids, side="right") - 1).astype(np.int32)
        table = pa.table(
            {"id": ids, value_name: state, "chunk_id": chunk}
        )
        starts = boundaries[:-1]
        ends = boundaries[1:]
        writer = pq.ParquetWriter(path, table.schema)
        per_chunk = []
        for c, (s, e) in enumerate(zip(starts, ends)):
            if e > s:
                writer.write_table(table.slice(int(s), int(e - s)))
                per_chunk.append({"chunk_id": int(c), "rows": int(e - s)})
        writer.close()
        m = self._read_manifest()
        m["iterations"] = [x for x in m["iterations"] if x["iteration"] != iteration]
        m["iterations"].append(
            {
                "iteration": int(iteration),
                "path": path,
                "rows": int(n),
                "value": value_name,
                "chunks": per_chunk,
                "ts": time.time(),
                "metrics": _metrics_dict(metrics),
            }
        )
        m["iterations"].sort(key=lambda x: x["iteration"])
        self._write_manifest(m)
        return path

    # ------------------------------------------------------------- resume
    def latest(self, before: int | None = None) -> tuple[int, np.ndarray] | None:
        m = self._read_manifest()
        cands = [
            x
            for x in m["iterations"]
            if (before is None or x["iteration"] < before) and os.path.exists(x["path"])
        ]
        if not cands:
            return None
        last = cands[-1]
        t = pq.read_table(last["path"])
        state = np.empty(last["rows"], dtype=t.column(last["value"]).type.to_pandas_dtype())
        ids = t.column("id").to_numpy()
        state[ids] = t.column(last["value"]).to_numpy()
        return last["iteration"], state

    def iterations(self) -> list[dict]:
        return self._read_manifest()["iterations"]


def _metrics_dict(metrics) -> dict | None:
    if metrics is None:
        return None
    if hasattr(metrics, "__dataclass_fields__"):
        return asdict(metrics)
    return dict(metrics)


def write_metrics_parquet(store: SnapshotStore, engine_metrics: list) -> str:
    """Flatten engine IterationMetrics into a metrics.parquet table
    (run-level observability: per-iteration mode / active counts / wall)."""
    path = os.path.join(store.dir, "metrics.parquet")
    rows = [asdict(m) for m in engine_metrics]
    if not rows:
        return path
    table = pa.table({k: [r[k] for r in rows] for k in rows[0]})
    pq.write_table(table, path)
    return path
