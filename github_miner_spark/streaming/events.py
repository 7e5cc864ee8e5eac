"""Structured Streaming jobs over the events table (SURVEY.md §2.10).

The reference has no streaming operators — its mining loop is a polling
batch with checkpoint/resume (R5/R6). Here that capability is upgraded
to first-class Structured Streaming: file-source reads with rate
limiting (maxFilesPerTrigger — the analog of the reference's page-rate
throttling), event-time windowed aggregation with watermarks for late
data, and checkpointed exactly-once sinks (the analog of the
processed-date-ranges Redis checkpoint, src/miner.ts:83-86).

Tests run with trigger(availableNow=True) and prove the streaming
results equal the batch twins in queries/events_queries.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from github_miner_spark.io.tables import TABLE_SCHEMAS, _events_ts_is_nanos


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events parquet with the declared
    schema. ``maxFilesPerTrigger`` bounds per-microbatch intake —
    source-level rate limiting, like the reference's requests/min cap."""
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    schema = TABLE_SCHEMAS["events"]
    # gate the ns-as-long rescale on the file's actual logical type,
    # mirroring io.tables.load_table (testdata is timestamp[us])
    is_nanos = _events_ts_is_nanos(os.path.join(sf_dir, "events.parquet"))
    if is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = StructType(
            [
                StructField(f.name, LongType() if f.name == "ts" else f.dataType)
                for f in schema.fields
            ]
        )
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file stream source requires a directory; glob-filter the one table
    df = (
        reader.format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if is_nanos:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed counts with a watermark: late rows beyond
    the watermark are dropped and window state is evicted — bounded
    state at 100 TB/day rates. ``slide`` = None gives tumbling
    windows; a slide interval gives overlapping sliding windows (each
    event lands in window/slide windows; batch twin
    events_sliding_windows)."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    result: DataFrame, checkpoint_dir: str, query_name: str = "events_stream"
) -> None:
    """Drain everything currently available through the streaming
    engine into an in-memory sink (exactly-once per checkpoint), then
    stop — the Structured-Streaming form of the reference's
    'poll until all partitions processed, then exit' loop
    (src/miner.ts:167-181)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_stream(
    events: DataFrame, keys: tuple[str, ...] = ("event_id",), watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each key,
    with state bounded by the event-time watermark
    (dropDuplicatesWithinWatermark) — at-least-once sources become
    effectively-once without unbounded key state. The streaming twin of
    the batch first-writer-wins merge (etl/merge.py)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start bigint, last bigint, n bigint"


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, flush_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user session assembly with a 30-min inactivity gap.

    State per user = (session_start, last_ts, n_events) in epoch micros.
    A batch's events are processed in ts order; an event more than
    ``gap_minutes`` after the last closes the open session (emitted) and
    starts a new one. This is the streaming twin of the batch
    lag/running-sum sessionization (queries/events_queries.py
    events_sessionization) — state is one tuple per active user, so
    memory is bounded by the active-user set, not the event volume.

    ``flush_timeout_ms``: in continuous deployments, set a
    processing-time timeout so idle users' open sessions are flushed
    and their state evicted. Leave None for bounded availableNow
    drains — a pending timeout keeps the query scheduling batches and
    the drain would never terminate."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def assemble(key, pdf_iter, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start, unit="us")],
                        "session_end": [pd.Timestamp(last, unit="us")],
                        "n_events": [n],
                    }
                )
            return
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = {"user_id": [], "session_start": [], "session_end": [], "n_events": []}
        # a group's rows can arrive as MULTIPLE Arrow chunks with no
        # cross-chunk order guarantee: concatenate and sort ONCE so the
        # session fold really processes the whole batch in ts order
        # (sorting per-chunk gave wrong boundaries for interleaved
        # chunks — round-1 advisor finding)
        chunks = [pdf["ts"] for pdf in pdf_iter]
        all_ts = pd.concat(chunks).sort_values() if chunks else pd.Series([], dtype="datetime64[ns]")
        for ts in all_ts:
            us = int(ts.value // 1_000)  # pandas ns -> us
            if start is None:
                start, last, n = us, us, 1
            elif us - last > gap_us:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start, unit="us"))
                out["session_end"].append(pd.Timestamp(last, unit="us"))
                out["n_events"].append(n)
                start, last, n = us, us, 1
            else:
                # us can precede `last` for late events from an earlier
                # micro-batch: widen the session, never move it backwards
                start, last, n = min(start, us), max(last, us), n + 1
        state.update((start, last, n))
        if flush_timeout_ms is not None:
            state.setTimeoutDuration(flush_timeout_ms)
        if out["user_id"]:
            yield pd.DataFrame(out)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )


def interval_join_stream(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream event-time interval join: per purchase, the views
    by the same user in the preceding ``window``. Both sides carry
    watermarks and the join predicate bounds view-time against
    purchase-time, so the state store holds only rows inside the
    watermark horizon — the exact condition Structured Streaming needs
    to evict join state (bounded memory at any rate). Batch twin:
    queries/events_queries.py events_purchase_attribution (inner-join
    form; streaming left-outer emits on watermark expiry instead)."""
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", watermark)
    )
    v = (
        events.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("vts"))
        .withWatermark("vts", watermark)
    )
    return p.join(
        v,
        F.expr(
            f"v_user = p_user AND vts >= pts - INTERVAL {window} AND vts < pts"
        ),
        "inner",
    ).select("purchase_id", F.col("p_user").alias("user_id"), "vts")


FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, stage_reached int, signup_ts timestamp, purchase_ts timestamp"
)
FUNNEL_STATE_SCHEMA = "t1 bigint, t2 bigint, t3 bigint, t4 bigint"

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def funnel_stream(events: DataFrame) -> DataFrame:
    """Stateful streaming funnel: per-user signup -> view -> click ->
    purchase stage machine via applyInPandasWithState — the streaming
    twin of the batch events_funnel (queries/events_queries.py).

    State per user = the four stage timestamps in epoch micros (-1 =
    not reached). Each batch's events are concatenated and processed in
    ts order (the sessionizer's multi-chunk lesson), and a stage fires
    on the FIRST qualifying event at-or-after the previous stage's
    time — which equals the batch twin's min-aggregate chain when
    events arrive in order (an availableNow drain sees every event in
    one sorted pass; in continuous mode a late earlier-stage event
    cannot retract an already-advanced machine, the standard streaming
    relaxation). Emits the user's current stage each batch; memory is
    four longs per user, bounded by the user set."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def advance(key, pdf_iter, state: GroupState):
        user_id = key[0]
        t = list(state.get) if state.exists else [-1, -1, -1, -1]
        chunks = [pdf[["ts", "event_type"]] for pdf in pdf_iter]
        if chunks:
            ev = pd.concat(chunks).sort_values("ts")
            for ts, etype in zip(ev["ts"], ev["event_type"]):
                if etype not in _FUNNEL_STAGES:
                    continue
                i = _FUNNEL_STAGES.index(etype)
                us = int(ts.value // 1_000)
                if i == 0:
                    if t[0] < 0:
                        t[0] = us
                elif t[i] < 0 and t[i - 1] >= 0 and us >= t[i - 1]:
                    t[i] = us
        state.update(tuple(t))
        stage = sum(1 for x in t if x >= 0)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "stage_reached": [stage],
                "signup_ts": [pd.Timestamp(t[0], unit="us") if t[0] >= 0 else pd.NaT],
                "purchase_ts": [pd.Timestamp(t[3], unit="us") if t[3] >= 0 else pd.NaT],
            }
        )

    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            advance,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def rank_trending(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank event types inside each window by count (event_type
    tiebreak) and attach the hour-over-hour delta (LAG per type over
    window_start — the previous window the type appeared in). Shared by
    the batch query (events_trending_topk) and the streaming twin so
    the two can never diverge. Input: (window_start, event_type,
    n_events[, ...])."""
    from pyspark.sql import Window

    lagw = Window.partitionBy("event_type").orderBy("window_start")
    rankw = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.select("window_start", "event_type", "n_events")
        .withColumn("delta", F.col("n_events") - F.lag("n_events").over(lagw))
        .withColumn("rank", F.row_number().over(rankw))
        .filter(F.col("rank") <= k)
        .select("window_start", "event_type", "n_events", "rank", "delta")
    )


def trending_topk_stream(
    events: DataFrame,
    view_name: str = "trending_topk",
    k: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
    horizon_windows: int | None = 48,
    state_path: str | None = None,
):
    """Streaming trending dashboard with BOUNDED state at every layer:

    - The stateful half (watermarked windowed counts) runs in
      ``update`` mode, so Spark emits only the (window, type) rows a
      trigger changed and EVICTS aggregation state past the watermark —
      unlike ``complete`` mode, which retains (and re-emits) every
      window ever seen.
    - The driver-side dashboard keeps the latest count per
      (window, type) for the trailing ``horizon_windows`` windows plus
      one carry row per event type (its newest pre-horizon count, so
      LAG for a type's first in-horizon window still sees its true
      predecessor). Memory is horizon x types + types, independent of
      stream lifetime; per-trigger collect() is bounded by the rows the
      watermark lets change. ``horizon_windows=None`` keeps everything
      (backfill / exact-replay mode).
    - Each trigger re-runs the same ``rank_trending`` transform the
      batch query uses over that horizon-sized frame and publishes the
      in-horizon rows to a global temp view. Within the horizon the
      view is row-identical to the batch query (pinned in
      tests/test_streaming.py). Returns the DataStreamWriter (caller
      starts/awaits).

    RESTART CONTRACT: update mode only re-delivers rows whose
    aggregates change after a restart, so the driver dashboard cannot
    rebuild itself from the stream alone (complete mode could, at the
    cost of unbounded state). Pass ``state_path`` to persist the
    dashboard snapshot atomically after every trigger and restore it
    on construction — a restart from the same checkpointLocation +
    state_path then continues exactly (update rows carry absolute
    counts, so a replayed trigger is an idempotent overwrite). Without
    ``state_path``, restart from a fresh checkpoint (full replay) or
    accept a dashboard that only covers windows changed since the
    restart — pinned in tests/test_streaming.py."""
    counts = windowed_event_counts(events, window=window, watermark=watermark)
    schema = (
        "window_start timestamp, event_type string, n_events bigint, "
        "rank int, delta bigint"
    )
    latest: dict = {}  # (window_start, event_type) -> n_events
    carry: dict = {}  # event_type -> (window_start, n_events) just before horizon
    if state_path is not None and os.path.exists(state_path):
        import json as _json
        from datetime import datetime as _dt

        with open(state_path) as f:
            snap = _json.load(f)
        latest.update(
            ((_dt.fromisoformat(w), t), int(n)) for w, t, n in snap["latest"]
        )
        carry.update(
            (t, (_dt.fromisoformat(w), int(n)))
            for t, (w, n) in snap["carry"].items()
        )

    def _rank(batch_df: DataFrame, _batch_id: int) -> None:
        for r in (
            batch_df.select("window_start", "event_type", "n_events").collect()
        ):
            latest[(r["window_start"], r["event_type"])] = r["n_events"]
        cutoff = None
        if horizon_windows is not None and latest:
            ws = sorted({w for (w, _t) in latest})
            if len(ws) > horizon_windows:
                cutoff = ws[-horizon_windows]
                for key in [key for key in latest if key[0] < cutoff]:
                    w, t = key
                    # <= so a late in-watermark re-emit of the SAME
                    # carried window replaces its stale count
                    if t not in carry or carry[t][0] <= w:
                        carry[t] = (w, latest[key])
                    del latest[key]
        rows = [(w, t, n) for (w, t), n in latest.items()] + [
            (w, t, n) for t, (w, n) in carry.items()
        ]
        spark = batch_df.sparkSession
        cur = spark.createDataFrame(
            rows, "window_start timestamp, event_type string, n_events bigint"
        )
        ranked = rank_trending(cur, k)
        if carry:
            # carry rows exist only to feed LAG; never publish them.
            # With latest empty (restored snapshot whose latest was
            # empty, filter-degenerate batch) there is no horizon to
            # filter against — publish nothing rather than leak carry
            # (ADVICE r6 #3).
            if latest:
                lo = min(w for (w, _t) in latest)
                ranked = ranked.filter(F.col("window_start") >= F.lit(lo))
            else:
                ranked = ranked.filter(F.lit(False))
        spark.createDataFrame(
            ranked.collect(), schema
        ).createOrReplaceGlobalTempView(view_name)
        if state_path is not None:
            import json as _json

            snap = {
                "latest": [
                    [w.isoformat(), t, int(n)] for (w, t), n in latest.items()
                ],
                "carry": {
                    t: [w.isoformat(), int(n)] for t, (w, n) in carry.items()
                },
                "batch_id": int(_batch_id),
            }
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(snap, f)
            os.replace(tmp, state_path)

    writer = counts.writeStream.outputMode("update").foreachBatch(_rank)
    # exposed for tests: lets the carry/horizon edge cases be driven
    # with crafted static batches without building a real stream
    writer._spark_graft_rank = _rank
    return writer

def _ks_from_binned(cnt: DataFrame) -> DataFrame:
    """KS statistic per event type from a (event_type, bin, ca, cb)
    count table: cumulative integer sums over the bin support, max
    absolute CDF gap. Shared verbatim by the batch twin and every
    streaming trigger so the two can only disagree if the counts do."""
    from pyspark.sql.window import Window

    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("bin")
    run = cnt.select(
        "event_type",
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(wt).alias("tota"),
        F.sum("cb").over(wt).alias("totb"),
        F.sum("ca").over(wo).alias("cuma"),
        F.sum("cb").over(wo).alias("cumb"),
    )
    return (
        run.filter((F.col("tota") > 0) & (F.col("totb") > 0))
        .groupBy("event_type")
        .agg(
            F.max("tota").cast("bigint").alias("n_early"),
            F.max("totb").cast("bigint").alias("n_late"),
            F.round(
                F.max(
                    F.abs(
                        F.col("cuma") / F.col("tota") - F.col("cumb") / F.col("totb")
                    )
                ),
                6,
            ).alias("ks_stat"),
        )
        .orderBy("event_type")
    )


def _binned_sides(
    events: DataFrame, split_ts_micros: int, bin_width: float
) -> DataFrame:
    # value-less events have no place in a value-distribution test;
    # dropping them HERE keeps batch and stream identical (a NULL bin
    # would also crash the dashboard's python-side sort)
    return events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") / F.lit(bin_width)).cast("bigint").alias("bin"),
        F.when(F.unix_micros("ts") < F.lit(split_ts_micros), 1)
        .otherwise(0)
        .alias("early"),
    )


def ks_drift_binned(
    events: DataFrame, split_ts_micros: int, bin_width: float = 1.0
) -> DataFrame:
    """Batch twin of the streaming drift monitor: two-sample KS per
    event type between the value distributions before/after a FIXED
    cutover timestamp, on a binned support (bin = floor(value /
    bin_width)). The registered events_ks_drift query is the
    exact-support, data-derived-midpoint form; this fixed-cutover
    binned form is the one a production monitor runs, because the
    cutover (a deploy, a new ingestion source) is known up front and
    the binned support is what bounds streaming state."""
    sided = _binned_sides(events, split_ts_micros, bin_width)
    cnt = sided.groupBy("event_type", "bin").agg(
        F.sum("early").cast("bigint").alias("ca"),
        (F.count("*") - F.sum("early")).cast("bigint").alias("cb"),
    )
    return _ks_from_binned(cnt)


def drift_monitor_stream(
    events: DataFrame,
    split_ts_micros: int,
    view_name: str = "drift_monitor",
    bin_width: float = 1.0,
    state_path: str | None = None,
):
    """Streaming drift monitor against a fixed cutover timestamp: the
    stateful half counts (event_type, bin, side) keys in update mode —
    state is bounded by the VALUE DOMAIN (types x bins x 2), not by
    stream lifetime, which is why the support is binned (per-distinct-
    value keys would grow forever; event-time watermarks cannot evict
    here because the keys are not windows). Each trigger's update rows
    carry absolute counts, so the driver dashboard overwrites its copy
    of the changed keys (idempotent under replay) and republishes the
    KS table through the same _ks_from_binned transform the batch twin
    uses. Returns the DataStreamWriter (caller starts/awaits).

    RESTART CONTRACT (same as trending_topk_stream): update mode only
    re-delivers keys changed after a restart, so the dashboard cannot
    rebuild itself from the stream alone — and a PARTIAL count table
    yields a wrong KS, not a stale one. Pass ``state_path`` to persist
    the count dict atomically after every trigger and restore it on
    construction; restarting from the same checkpointLocation +
    state_path then continues exactly. Without it, restart from a
    fresh checkpoint (full replay)."""
    sided = _binned_sides(events, split_ts_micros, bin_width)
    counts = sided.groupBy("event_type", "bin", "early").agg(
        F.count("*").alias("n")
    )
    latest: dict = {}  # (event_type, bin, early) -> n
    if state_path is not None and os.path.exists(state_path):
        import json as _json

        with open(state_path) as f:
            snap = _json.load(f)
        latest.update(
            ((t, int(b), int(e)), int(n)) for t, b, e, n in snap["latest"]
        )

    def _publish(batch_df: DataFrame, _batch_id: int) -> None:
        for r in batch_df.collect():
            latest[(r["event_type"], r["bin"], r["early"])] = r["n"]
        agg: dict = {}
        for (t, b, e), n in latest.items():
            ca, cb = agg.get((t, b), (0, 0))
            agg[(t, b)] = (ca + n, cb) if e == 1 else (ca, cb + n)
        rows = [(t, b, ca, cb) for (t, b), (ca, cb) in sorted(agg.items())]
        spark = batch_df.sparkSession
        cur = spark.createDataFrame(
            rows, "event_type string, bin bigint, ca bigint, cb bigint"
        )
        out = _ks_from_binned(cur)
        spark.createDataFrame(
            out.collect(),
            "event_type string, n_early bigint, n_late bigint, ks_stat double",
        ).createOrReplaceGlobalTempView(view_name)
        if state_path is not None:
            import json as _json

            snap = {
                "latest": [[t, int(b), int(e), int(n)] for (t, b, e), n in latest.items()],
                "batch_id": int(_batch_id),
            }
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(snap, f)
            os.replace(tmp, state_path)

    return counts.writeStream.outputMode("update").foreachBatch(_publish)
