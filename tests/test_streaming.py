"""Structured Streaming equivalence: the availableNow streaming drain
must produce the same windowed aggregates as the batch twin."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from github_miner_spark.queries.events_queries import events_tumbling_hourly
from github_miner_spark.streaming.events import (
    run_available_now,
    stream_events,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark):
    stream = stream_events(spark, SF)
    assert stream.isStreaming
    result = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, ckpt, query_name="t_events_stream")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_events_stream").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in events_tumbling_hourly(spark, SF).collect()
    }
    assert set(got) == set(want)
    for k, (n, tv) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - tv) < 1e-6


def test_streaming_rate_limited_resume(spark):
    # maxFilesPerTrigger=1: the whole table is one file, so one batch —
    # the point is the option plumbs through and the drain still matches
    stream = stream_events(spark, SF, max_files_per_trigger=1)
    result = windowed_event_counts(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, ckpt, query_name="t_events_stream2")
        n1 = spark.sql("SELECT count(*) c FROM t_events_stream2").collect()[0].c
        # re-run on the same checkpoint: the source is exhausted, so no
        # batch fires and the fresh memory table stays empty — the file
        # was NOT reprocessed (exactly-once, the reference's
        # processed-date-ranges skip semantics)
        run_available_now(result, ckpt, query_name="t_events_stream2")
        n2 = spark.sql("SELECT count(*) c FROM t_events_stream2").collect()[0].c
    assert n1 > 0
    assert n2 == 0


def test_stateful_sessionization_stream(spark):
    """applyInPandasWithState sessionization: the availableNow drain
    must emit exactly the CLOSED sessions of the batch twin (each
    user's final session stays open in state)."""
    from github_miner_spark.queries.events_queries import events_sessionization
    from github_miner_spark.streaming.events import sessionize_stream

    stream = sessionize_stream(stream_events(spark, SF), gap_minutes=30)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_sessions")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.user_id, r.session_start, r.session_end, r.n_events)
            for r in spark.sql("SELECT * FROM t_sessions").collect()
        }
    batch = events_sessionization(spark, SF).collect()
    last_seq = {}
    for r in batch:
        last_seq[r.user_id] = max(last_seq.get(r.user_id, 0), r.session_seq)
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch
        if r.session_seq != last_seq[r.user_id]
    }
    assert got == want
    assert len(want) > 0  # fixture has multi-session users


def test_watermark_drops_late_events_and_finalizes_once(spark):
    """Append-mode watermark contract (SURVEY §2.10): a row older than
    the watermark (max event time - 2h) is DROPPED, finalized windows
    emit exactly once, and open windows stay in state until the
    watermark passes them. Three availableNow drains share one
    checkpoint, so the watermark persists across micro-batches exactly
    as in a continuous deployment."""
    import tempfile

    from github_miner_spark.streaming.events import windowed_event_counts

    BASE = 1700000000 - (1700000000 % 3600)  # hour-aligned epoch, UTC

    def ns(hour, minute):
        # events schema stores TIMESTAMP(NANOS) as long
        return int((BASE + hour * 3600 + minute * 60) * 1_000_000_000)

    # batch 1 max = 14:00 -> watermark 12:00: window [10:00,11:00) is
    # finalized+emitted in run 1 and its state evicted
    rows1 = [(1, ns(10, 0)), (2, ns(10, 30)), (3, ns(10, 45)), (4, ns(14, 0))]
    # 10:50's window closed below the watermark -> row DROPPED;
    # 12:30's window is still open -> buffered in state
    rows2 = [(5, ns(10, 50)), (6, ns(12, 30))]
    # advances wm to 13:30, finalizing [12:00, 13:00)
    rows3 = [(7, ns(15, 30))]

    with tempfile.TemporaryDirectory() as d:
        src, out, ckpt = f"{d}/in", f"{d}/out", f"{d}/ckpt"

        def write_batch(rows, name):
            spark.createDataFrame(
                [(eid, "click", 7, tsns, 1.0) for eid, tsns in rows],
                "event_id bigint, event_type string, user_id bigint, ts bigint, value double",
            ).coalesce(1).write.mode("append").parquet(src)

        def drain():
            stream = (
                spark.readStream.schema(
                    "event_id bigint, event_type string, user_id bigint, ts bigint, value double"
                )
                .parquet(src)
                .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            )
            q = (
                windowed_event_counts(stream, window="1 hour", watermark="2 hours")
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        write_batch(rows1, "b1")
        drain()
        write_batch(rows2, "b2")
        drain()
        write_batch(rows3, "b3")
        drain()

        import datetime as _dt

        def hour_of(w):
            return int((w.replace(tzinfo=_dt.timezone.utc).timestamp() - BASE) // 3600)

        got = {
            hour_of(r["window_start"]): r["n_events"]
            for r in spark.read.parquet(out).collect()
        }
        # [10:00,11:00) finalized with batch-1 rows ONLY (late 10:50 dropped,
        # never re-emitted); [12:00,13:00) finalized by the wm advance;
        # 14:00 and 15:00 windows still open in state
        assert got == {10: 3, 12: 1}, got


def test_mining_lake_streams_exactly_once(spark, tmp_path):
    """SURVEY §2.10 upgrade path (round-2 verdict item 8): the mining
    lake as a readStream source. Mine -> drain -> mine more -> drain:
    every fetched repo row lands in the downstream store exactly once;
    a drain with nothing new is a no-op."""
    import datetime as dt

    from github_miner_spark.etl.mining import (
        SearchPartition,
        plan_partitions,
        run_mining_job,
    )
    from github_miner_spark.streaming.mining import drain_lake, read_drained

    def fake_fetcher(part: SearchPartition):
        h = abs(hash(part.key)) % 1000
        return [
            {
                "full_name": f"owner{h % 7}/repo{h}_{i}",
                "name": f"repo{h}_{i}",
                "stargazers_count": 100 + i,
                "forks_count": 100,
                "pushed_at": part.pushed_to,
            }
            for i in range(2)
        ]

    state = str(tmp_path / "state")
    lake = str(tmp_path / "lake")
    out = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    parts = plan_partitions(dt.date(2020, 1, 31), lookback_days=7)
    n1 = run_mining_job(spark, parts, state, lake, fetcher=fake_fetcher)
    assert n1 == len(parts)
    drain_lake(spark, lake, out, ckpt)
    first = read_drained(spark, out)
    assert first.count() == 2 * len(parts)
    # full_name+partition_key identifies a fetched row uniquely
    assert first.select("partition_key", "full_name").distinct().count() == first.count()

    # incremental: extend the plan; only the new slices are fetched and
    # only their files are drained — prior rows are NOT reprocessed
    # a wider lookback re-slices the space, so only the genuinely new
    # partition KEYS are pending (n2 of them) — prior keys are skipped
    wider = plan_partitions(dt.date(2020, 1, 31), lookback_days=14)
    n2 = run_mining_job(spark, wider, state, lake, fetcher=fake_fetcher)
    assert 0 < n2
    drain_lake(spark, lake, out, ckpt)
    second = read_drained(spark, out)
    assert second.count() == 2 * (n1 + n2)
    assert second.select("partition_key", "full_name").distinct().count() == second.count()

    # nothing new: the drain is a checkpointed no-op
    drain_lake(spark, lake, out, ckpt)
    assert read_drained(spark, out).count() == 2 * (n1 + n2)


def test_interval_join_stream_matches_batch(spark):
    """Stream-stream watermarked interval join drains to the same
    (purchase, view) pairs as the batch range join's inner form."""
    from github_miner_spark.io.tables import load_table
    from github_miner_spark.streaming.events import interval_join_stream

    stream = stream_events(spark, SF)
    joined = interval_join_stream(stream, window="1 hour", watermark="2 hours")
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory")
            .queryName("t_interval_join")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = {
        (r.purchase_id, r.user_id, r.vts)
        for r in spark.sql("SELECT * FROM t_interval_join").collect()
    }
    ev = load_table(spark, "events", SF)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("vts")
    )
    want = {
        (r.purchase_id, r.user_id, r.vts)
        for r in p.join(
            v,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("vts") < F.col("pts")),
        ).select("purchase_id", "user_id", "vts").collect()
    }
    assert got == want and len(want) > 0


def test_sliding_window_stream_matches_batch(spark):
    """Streaming sliding windows (2h window / 1h slide) drain to the
    same aggregates as the batch twin events_sliding_windows."""
    from github_miner_spark.queries.events_queries import events_sliding_windows

    stream = stream_events(spark, SF)
    result = windowed_event_counts(
        stream, window="2 hours", watermark="2 hours", slide="1 hour"
    )
    with tempfile.TemporaryDirectory() as ckpt:
        run_available_now(result, ckpt, query_name="t_sliding_stream")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM t_sliding_stream").collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in events_sliding_windows(spark, SF).collect()
    }
    assert set(got) == set(want) and len(want) > 0
    for k, (n, tv) in want.items():
        assert got[k][0] == n and abs(got[k][1] - tv) < 1e-6


def test_stateful_funnel_stream_matches_batch(spark):
    """The streaming stage machine drained with availableNow must agree
    with the batch min-aggregate funnel: same per-stage user counts and
    the same end-to-end converter set."""
    from github_miner_spark.queries.events_queries import events_funnel
    from github_miner_spark.streaming.events import funnel_stream

    stream = funnel_stream(stream_events(spark, SF))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_funnel")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.sql("SELECT * FROM t_funnel").collect()
    # one availableNow batch -> exactly one row per user with events
    assert len({r.user_id for r in rows}) == len(rows)
    got = [sum(1 for r in rows if r.stage_reached >= k) for k in (1, 2, 3, 4)]
    b = events_funnel(spark, SF).collect()[0]
    assert got == [b["n_signup"], b["n_viewed"], b["n_clicked"], b["n_purchased"]], (
        got,
        b,
    )
    assert all(
        r.purchase_ts is not None for r in rows if r.stage_reached == 4
    )


def test_trending_topk_stream_matches_batch(spark):
    """The trending dashboard's final trigger must equal the batch
    query exactly: same stateful windowed counts, same rank_trending
    transform (shared code), availableNow drain."""
    from github_miner_spark.queries.events_queries import events_trending_topk
    from github_miner_spark.streaming.events import stream_events, trending_topk_stream

    stream = stream_events(spark, SF)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            trending_topk_stream(
                stream, view_name="t_trending", horizon_windows=None
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM global_temp.t_trending").collect())
    )
    want = sorted(map(tuple, events_trending_topk(spark, SF).collect()))
    assert got == want and len(got) > 0


def test_trending_topk_stream_horizon_bounds_state(spark):
    """With a trailing horizon the dashboard keeps only the newest N
    windows — and inside that horizon it is still row-identical to the
    batch query (the per-type carry row feeds LAG its true predecessor,
    so even each type's first in-horizon delta matches)."""
    from github_miner_spark.queries.events_queries import events_trending_topk
    from github_miner_spark.streaming.events import stream_events, trending_topk_stream

    stream = stream_events(spark, SF)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            trending_topk_stream(
                stream, view_name="t_trending_h", horizon_windows=5
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM global_temp.t_trending_h").collect())
    )
    batch = events_trending_topk(spark, SF).collect()
    tail = sorted({r["window_start"] for r in batch})[-5:]
    want = sorted(tuple(r) for r in batch if r["window_start"] in tail)
    assert got == want and len(got) > 0
    assert len({w for (w, *_rest) in got}) == 5


def test_trending_topk_stream_restart_restores_dashboard(spark, tmp_path):
    """Restart contract: update mode only re-delivers changed rows, so
    after a restart the dashboard must come back from the persisted
    state snapshot. Run 1 drains the base events; run 2 restarts from
    the SAME checkpoint + state_path with one new file of later-window
    events — the rebuilt view must equal rank_trending over the
    COMBINED corpus, including run-1 windows the restarted stream never
    re-emits (without state_path they would be silently missing)."""
    import shutil

    from github_miner_spark.io.tables import TABLE_SCHEMAS
    from github_miner_spark.streaming.events import (
        rank_trending,
        trending_topk_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part1.parquet")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "dashboard.json")
    schema = TABLE_SCHEMAS["events"]

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(src))
        q = (
            trending_topk_stream(
                stream,
                view_name="t_trending_r",
                horizon_windows=None,
                state_path=state,
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    spark.catalog.dropGlobalTempView("t_trending_r")

    # run 2: new events strictly after the base range -> new windows only
    base = spark.read.schema(schema).parquet(f"{SF}/events.parquet")
    # shift strictly past the base range: in-range "late" events would
    # be older than run 1's checkpointed watermark and rightly dropped
    span_h = base.agg(
        F.ceil(
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))) / 3600
        ).alias("h")
    ).collect()[0]["h"]
    late = base.limit(500).withColumn(
        "ts", F.col("ts") + F.expr(f"INTERVAL {int(span_h) + 4} HOURS")
    )
    late.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "late"))
    for f in (tmp_path / "late").glob("*.parquet"):
        shutil.copy(f, src / "part2.parquet")
    run_once()

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM global_temp.t_trending_r").collect())
    )
    combined = base.unionByName(late)
    hourly = (
        combined.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )
    want = sorted(map(tuple, rank_trending(hourly, 3).collect()))
    assert got == want and len(got) > 0
    # run-1-only windows must be present (the restart-restore payoff)
    run1_windows = {w for (w, *_r) in want} - {
        r["window_start"]
        for r in rank_trending(
            late.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n_events"),
            3,
        ).collect()
    }
    assert run1_windows & {w for (w, *_r) in got}


def test_trending_topk_stream_empty_latest_never_leaks_carry(spark, tmp_path):
    """Carry rows exist only to feed LAG and must NEVER publish. The
    degenerate trigger — carry non-empty while latest is empty (a
    restored snapshot whose latest was empty, or a filter-degenerate
    batch) — used to skip the horizon filter entirely and leak carry
    rows into the view (ADVICE r6 #3); it must publish an empty view."""
    import json

    from github_miner_spark.streaming.events import (
        stream_events,
        trending_topk_stream,
    )

    state = tmp_path / "dash.json"
    state.write_text(
        json.dumps(
            {
                "latest": [],
                "carry": {"click": ["2024-01-01T00:00:00", 7]},
                "batch_id": 0,
            }
        )
    )
    writer = trending_topk_stream(
        stream_events(spark, SF),
        view_name="t_trending_leak",
        horizon_windows=5,
        state_path=str(state),
    )
    rank = writer._spark_graft_rank
    empty_batch = spark.createDataFrame(
        [], "window_start timestamp, event_type string, n_events bigint"
    )
    rank(empty_batch, 1)
    assert spark.sql("SELECT * FROM global_temp.t_trending_leak").count() == 0
    # and once real rows arrive, carry still feeds LAG without publishing
    from datetime import datetime

    real = spark.createDataFrame(
        [(datetime(2024, 1, 1, 1), "click", 9)],
        "window_start timestamp, event_type string, n_events bigint",
    )
    rank(real, 2)
    rows = spark.sql("SELECT * FROM global_temp.t_trending_leak").collect()
    assert [(r["event_type"], r["n_events"], r["delta"]) for r in rows] == [
        ("click", 9, 2)  # delta vs the carried 7 — carry fed LAG, unpublished
    ]


def test_drift_monitor_stream_matches_batch(spark):
    """The drift dashboard's final trigger must equal the batch twin
    exactly: same binned side counts, same _ks_from_binned transform
    (shared code), fixed midpoint cutover, availableNow drain."""
    from github_miner_spark.io.tables import load_table
    from github_miner_spark.streaming.events import (
        drift_monitor_stream,
        ks_drift_binned,
        stream_events,
    )

    ev = load_table(spark, "events", SF)
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    split = (lo + hi) // 2

    stream = stream_events(spark, SF)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            drift_monitor_stream(stream, split, view_name="t_drift")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = sorted(map(tuple, spark.sql("SELECT * FROM global_temp.t_drift").collect()))
    want = sorted(map(tuple, ks_drift_binned(ev, split).collect()))
    assert got == want and len(got) > 0
    for _t, n_early, n_late, ks in got:
        assert n_early > 0 and n_late > 0
        assert 0.0 <= ks <= 1.0


def test_drift_monitor_stream_restart_restores_counts(spark, tmp_path):
    """Restart contract: update mode only re-delivers changed keys, so
    after a restart the KS dashboard must come back from the persisted
    count snapshot — a PARTIAL count table yields a wrong statistic,
    not a stale one. Run 1 drains the base events; run 2 restarts from
    the SAME checkpoint + state_path with one new file; the rebuilt
    view must equal the batch twin over the COMBINED corpus."""
    import shutil

    from github_miner_spark.io.tables import TABLE_SCHEMAS, load_table
    from github_miner_spark.streaming.events import (
        drift_monitor_stream,
        ks_drift_binned,
    )

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part1.parquet")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "counts.json")
    schema = TABLE_SCHEMAS["events"]

    base = load_table(spark, "events", SF)
    lo, hi = base.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    split = (lo + hi) // 2

    def run_once():
        stream = spark.readStream.schema(schema).format("parquet").load(str(src))
        q = (
            drift_monitor_stream(
                stream, split, view_name="t_drift_r", state_path=state
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    spark.catalog.dropGlobalTempView("t_drift_r")

    extra = base.limit(400).withColumn("value", F.col("value") + 7.0)
    extra.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "extra"))
    for f in (tmp_path / "extra").glob("*.parquet"):
        shutil.copy(f, src / "part2.parquet")
    run_once()

    got = sorted(
        map(tuple, spark.sql("SELECT * FROM global_temp.t_drift_r").collect())
    )
    combined = base.unionByName(spark.read.schema(schema).parquet(str(tmp_path / "extra")))
    want = sorted(map(tuple, ks_drift_binned(combined, split).collect()))
    assert got == want and len(got) > 0
