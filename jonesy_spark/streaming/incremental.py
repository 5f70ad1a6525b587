"""Streaming twins of the reference's incremental-refresh pipeline.

The reference's ``upload_recent_refresh`` is a micro-batch incremental
pipeline in disguise (SURVEY.md §2.10): change-log source
(``CLASS_INSTR_UPDATESV00_VW``), 5-day lookback watermark
(``jonesy/jobs.py:19,40``), change-type filter (``queries.py:146``),
latest-change ordering (``queries.py:148``). Structured Streaming makes
the watermark real state instead of a re-scanned predicate:

  * ``readStream`` over the events source (file source here; Kafka/CDC
    in production — same plan from the first transformation on),
  * ``withWatermark`` bounds state exactly like the 5-day cutoff
    bounded the re-extract window,
  * windowed/`dropDuplicates` state replaces the re-scan+dedup,
  * ``foreachBatch`` reuses the batch multi-target sink for exactly-once
    fan-out (same gzip CSV contract).

Tests drive these with the file source + memory sink via
``processAllAvailable`` — batch parity is asserted against the
equivalent batch queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events.parquet logical schema. The physical ts type has varied across
#: fixture generations (INT64 TIMESTAMP(NANOS) vs µs TIMESTAMP);
#: :func:`events_stream` probes the footer with a batch read and adapts
#: the declared stream schema + conversion to whichever it finds.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (one file = one
    micro-batch in tests; a real deployment points the same code at a
    landing directory or Kafka).

    The file source monitors a *directory*; the fixture is a single
    parquet file, so we stage a symlink dir next to it (read-only
    testdata is never touched).
    """
    import hashlib
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.abspath(f"{sf_dir}/events.parquet")
    stage = os.path.join(
        tempfile.gettempdir(),
        f"jonesy_stream_{hashlib.md5(src.encode()).hexdigest()[:12]}",
    )
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        os.symlink(src, link)
    # The file source needs an explicit schema; probe the footer with a
    # one-file batch read (no data scan) so the declared ts type and the
    # conversion match whichever physical encoding this fixture carries.
    ts_type = spark.read.parquet(src).schema["ts"].dataType
    schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", ts_type)
            for f in EVENTS_SCHEMA.fields
        ]
    )
    raw = spark.readStream.schema(schema).format("parquet").load(stage)
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if not isinstance(ts_type, T.TimestampType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Tumbling 6-hour counts with late-data watermark — streaming twin
    of plans.extension_queries.events_tumbling_window (identical bucket
    semantics; watermark bounds state instead of re-scans)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def latest_state_dedup(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Streaming dedup state: first event per (user_id, event_type) per
    watermark horizon — the stateful analogue of the reference's
    re-extract+dedup (SURVEY.md §2.10 mapping: withWatermark +
    dropDuplicates)."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["user_id", "event_type"]
    )


def purchases_with_recent_clicks(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase
    joined to same-user clicks from the preceding hour.

    Both sides carry watermarks so the join state is bounded: the range
    condition (`click_ts` in [purchase_ts − 1h, purchase_ts]) tells the
    engine exactly when a buffered click can never match again and is
    evicted. This is the streaming analogue of the as-of/interval join
    (SURVEY §2.10); without the time bound the state would grow forever.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("value").alias("click_value"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("purchase_id", F.col("p_user").alias("user_id"), "purchase_ts", "click_ts")


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a per-user running aggregate (event count + value sum) whose state
    survives across micro-batches.

    This is the §2.10 escape hatch for operators the built-in stateful
    primitives (windows, dropDuplicates, stream joins) can't express —
    arbitrary per-key state with explicit update logic, Arrow-batched.
    State is (count, total); each micro-batch folds its rows in and
    emits the updated running totals for keys it touched.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    output_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drive a streaming frame to completion into an in-memory table
    (test harness; production uses foreachBatch → write_gzip_csv +
    MultiTargetSink for exactly-once object fan-out)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def dir_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-source stream over a landing directory with a declared
    schema — the generic ingestion edge (new files become micro-batches;
    same shape as a Kafka source from the first transformation on)."""
    return spark.readStream.schema(schema).format("parquet").load(path)


def run_file_sink(
    df: DataFrame, path: str, checkpoint: str, mode: str = "append"
) -> None:
    """Drive a streaming frame into a checkpointed directory sink and
    drain everything currently available.

    The checkpoint carries the source offsets + sink commit log, so a
    restart with the same (path, checkpoint) resumes exactly where the
    previous run stopped: already-committed files are never reprocessed
    and the output directory stays exactly-once. This is the durable
    production shape (the memory sink in run_to_memory is test-only).
    """
    q = (
        df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def run_foreach_batch_fanout(
    df: DataFrame, emit
) -> None:
    """foreachBatch sink: each micro-batch is handed to the batch sink
    (gzip CSV + multi-target upload) with its epoch id — the
    exactly-once pattern for object stores."""
    q = df.writeStream.foreachBatch(
        lambda batch_df, epoch_id: emit(batch_df, epoch_id)
    ).start()
    q.processAllAvailable()
    q.stop()


def run_incremental_dedup_stream(
    docs: DataFrame,
    index_path: str,
    novel_path: str,
    checkpoint: str,
) -> None:
    """Streaming bridge to the PERSISTED digest index: each micro-batch
    dedups against the on-disk index (``hygiene.read_digest_index`` —
    re-read per batch, so it sees every previously committed epoch),
    writes the surviving novel documents under ``novel_path``, and lands
    their digests in a batch-scoped ``ingest_batch=epoch-N`` partition
    of the index via ``hygiene.write_novel_digests`` — the SAME
    one-layout-per-index contract the nightly writer uses, so a corpus
    that runs both against one ``index_path`` stays readable (partition
    discovery needs uniform directory depth; r4 verdict #4).

    foreachBatch is at-least-once; idempotence comes from the writes,
    not the framework: an epoch replay OVERWRITES its own
    ``ingest_batch=epoch-N`` subtree on both sinks, so the index never
    double-counts a retried batch — the streaming analogue of the
    nightly append-only-novel invariant. (``content_dedup_stream``
    below is the state-store twin for *within-horizon* duplicates; this
    one is the *historical* gate — production runs both, in that
    order.)
    """
    from ..operators import hygiene as H

    def handle(batch_df, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        seen = H.read_digest_index(spark, index_path)
        novel, _ = H.incremental_dedup(batch_df, seen)
        novel = novel.localCheckpoint()  # two sinks, one computation
        novel.write.mode("overwrite").parquet(
            f"{novel_path}/ingest_batch={epoch_id}"
        )
        H.write_novel_digests(
            novel, index_path, mode="overwrite", run_id=f"epoch-{epoch_id}"
        )

    q = (
        docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def content_dedup_stream(docs: DataFrame, watermark_col: str = "ts", horizon: str = "1 day") -> DataFrame:
    """Streaming content dedup: first document per normalized content
    digest within the watermark horizon — the streaming twin of
    ``operators.hygiene.incremental_dedup`` (there the "state" is the
    persisted seen-digest index; here it is the streaming state store).

    Uses ``dropDuplicatesWithinWatermark`` so state for a digest is
    evicted once the watermark passes it — at corpus-ingest scale the
    state store holds one 16-byte digest per doc *in the horizon*, not
    per doc ever seen (the batch-side index covers history)."""
    from ..operators.hygiene import content_digest

    return (
        docs.withColumn("content_hash", content_digest(F.col("text")))
        .withWatermark(watermark_col, horizon)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
