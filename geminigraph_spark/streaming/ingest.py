"""Structured Streaming edge ingest: new page files → incremental edge
table + windowed crawl-rate metrics.

The reference is batch-only BSP (no streaming anywhere in
/root/reference — SURVEY §2.4); the north_rule needs resumability, not
streams. This module is the forward-looking ingest path a production
crawl would use: ``readStream`` over a landing directory of pages
parquet, the SAME vectorized extractor as batch (sources/extract —
one code path for both), ``foreachBatch`` appends to the edge-pairs
parquet, and a watermarked sliding-window count of links by extraction
minute tolerates late WARC timestamps.

Checkpointing is Spark's own streaming checkpoint (exactly-once file
source progress); downstream encode/build then run batch on the
accumulated edge table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_pages(spark: SparkSession, landing_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(landing_dir)
    )


def start_edge_ingest(
    spark: SparkSession,
    landing_dir: str,
    edges_out: str,
    checkpoint_dir: str,
):
    """Append (src_url, dst_url, link_pos) for every newly landed page
    file. Returns the StreamingQuery."""
    from ..sources.extract import extract_links

    pages = stream_pages(spark, landing_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        links = extract_links(batch_df)
        links.write.mode("append").parquet(edges_out)

    return (
        pages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _dedup_stream(spark: SparkSession, landing_dir: str) -> DataFrame:
    """The stateful cross-batch dedup operator (shared by the memory and
    parquet sinks): key = sha256 of the raw ``html`` bytes (sha2 takes
    BinaryType directly — no lossy binary→string cast, so distinct
    non-UTF-8 payloads can never collapse); per-key state remembers the
    first-seen url (ties within a batch broken by url) and the running
    copy count; every micro-batch that observes a hash re-emits one row
    with the updated running count (update-mode semantics). State is
    Spark's HDFS-backed state store — per-key, partitioned by the hash,
    so it scales horizontally like any keyed state."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    pages = stream_pages(spark, landing_dir).select(
        F.sha2(F.col("html"), 256).alias("h"), "url"
    )

    out_schema = T.StructType(
        [
            T.StructField("h", T.StringType(), False),
            T.StructField("first_url", T.StringType(), False),
            T.StructField("n_copies", T.LongType(), False),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("first_url", T.StringType(), False),
            T.StructField("n_copies", T.LongType(), False),
        ]
    )

    def dedup(key, pdfs, state: GroupState):
        n_batch = 0
        first_url = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_batch += len(pdf)
            best = pdf["url"].min()
            if first_url is None or best < first_url:
                first_url = best
        if n_batch == 0:
            return
        if state.exists:
            prev_url, prev_n = state.get
            state.update((prev_url, prev_n + n_batch))
            yield pd.DataFrame(
                {"h": [key[0]], "first_url": [prev_url], "n_copies": [prev_n + n_batch]}
            )
        else:
            state.update((first_url, n_batch))
            yield pd.DataFrame(
                {"h": [key[0]], "first_url": [first_url], "n_copies": [n_batch]}
            )

    return pages.groupBy("h").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_streaming_dedup(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    out_table: str = "stream_dedup",
):
    """Streaming twin of docpipe.dedup_exact (hash-then-group) — see
    ``_dedup_stream`` for the operator semantics. The memory sink here is
    TEST-ONLY (it appends every update-mode emission for inspection);
    ``start_streaming_dedup_parquet`` is the production consumer."""
    return (
        _dedup_stream(spark, landing_dir)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_streaming_dedup_parquet(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    out_dir: str,
):
    """Production consumer for the update-mode dedup contract (VERDICT r3
    #10): same stateful operator, but the sink is a ``foreachBatch``
    parquet APPEND — each micro-batch appends its updated
    (h, first_url, n_copies) rows, so the table accumulates one row per
    (hash, observation-batch) and ``compact_dedup_parquet`` is the
    reducing view the update-mode contract requires."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    return (
        _dedup_stream(spark, landing_dir)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_dedup_parquet(spark: SparkSession, out_dir: str) -> DataFrame:
    """Current dedup state from the appended parquet: one row per hash.
    ``n_copies`` is monotone per ``h`` (each re-emission carries the
    running total) and ``first_url`` never changes after first sight, so
    max() over both is exactly the latest state — no window needed, one
    partial-aggregated groupBy."""
    df = spark.read.parquet(out_dir)
    return df.groupBy("h").agg(
        F.max("first_url").alias("first_url"),
        F.max("n_copies").alias("n_copies"),
    )


def link_rate_query(
    spark: SparkSession,
    landing_dir: str,
    checkpoint_dir: str,
    out_table: str = "link_rate",
):
    """Watermarked per-minute link counts (late pages up to 2 minutes) —
    the canonical windowed-aggregation-with-late-data pattern, kept
    in-memory for inspection/tests."""
    import pandas as pd

    from ..sources.extract import links_from_pandas

    pages = stream_pages(spark, landing_dir)
    # one-pass extractor variant that carries warc_ts (a stream-stream
    # self-join would need join watermarks; this avoids it entirely)
    schema = T.StructType(
        [
            T.StructField("src_url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("dst_url", T.StringType(), False),
        ]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = links_from_pandas(pdf)
            ts = pdf.set_index("url")["warc_ts"]
            out = out.assign(warc_ts=out["src_url"].map(ts).values)
            yield pd.DataFrame(
                {
                    "src_url": out["src_url"],
                    "warc_ts": out["warc_ts"],
                    "dst_url": out["dst_url"],
                }
            )

    links = pages.select("url", "warc_ts", "html").mapInPandas(run, schema)
    agg = (
        links.withWatermark("warc_ts", "2 minutes")
        .groupBy(F.window("warc_ts", "1 minute"))
        .agg(F.count(F.lit(1)).alias("n_links"))
        .select(
            F.col("window.start").alias("minute"), F.col("n_links")
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(out_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


EDGE_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)


def start_incremental_cc(
    spark: SparkSession,
    edges_landing: str,
    state_dir: str,
    checkpoint_dir: str,
):
    """Incremental connected components over a continuously-growing edge
    table: ``readStream`` over a landing directory of (src, dst) parquet
    files; every micro-batch appends its edges to the accumulated edge
    table and re-labels by WARM-starting
    ``connected_components_warm`` from the previous batch's converged
    labels — only the appended-edge seam seeds the frontier, so per-batch
    work is proportional to how far the new edges' merges propagate, not
    |E| (the round-6 warm-start contract, exact for HashMin).

    Label versions are written to ``{state_dir}/labels/v{batch_id}`` and
    published by an atomically-swapped ``MANIFEST.json`` (tmp+rename,
    the same commit-protocol ordering as the snapshot store / Iceberg's
    metadata swap) — a reader never observes a half-written label set,
    and the warm read of batch N+1 never races the overwrite of batch N
    because each version is immutable. Returns the StreamingQuery;
    ``read_cc_labels`` reads the current published labels."""
    import json
    import os

    from ..functions.graph_algos import (
        connected_components,
        connected_components_warm,
    )

    acc = os.path.join(state_dir, "edges")
    lab_root = os.path.join(state_dir, "labels")
    os.makedirs(lab_root, exist_ok=True)
    manifest = os.path.join(lab_root, "MANIFEST.json")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        if batch_df.count() == 0:
            batch_df.unpersist()
            return
        batch_df.write.mode("append").parquet(acc)
        full = spark.read.parquet(acc)
        if os.path.exists(manifest):
            with open(manifest) as f:
                cur = json.load(f)["current"]
            prior = spark.read.parquet(os.path.join(lab_root, cur))
            labels = connected_components_warm(full, prior, batch_df)
        else:
            labels = connected_components(full)
        vdir = f"v{batch_id}"
        labels.write.mode("overwrite").parquet(os.path.join(lab_root, vdir))
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"current": vdir, "batch_id": batch_id}, f)
        os.replace(tmp, manifest)
        batch_df.unpersist()

    return (
        spark.readStream.schema(EDGE_PAIR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_landing)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cc_labels(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current published (id, label) of the incremental-CC stream."""
    import json
    import os

    lab_root = os.path.join(state_dir, "labels")
    with open(os.path.join(lab_root, "MANIFEST.json")) as f:
        cur = json.load(f)["current"]
    return spark.read.parquet(os.path.join(lab_root, cur))
