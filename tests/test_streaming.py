"""Structured Streaming tests: file-watcher ingest → stg/fct transform
→ continuously-maintained report; watermarked windowed event stats."""

import csv
import os

import pytest
from pyspark.sql import functions as F


def _write_corporate_csv(path, rows):
    from city_payroll_data_pipeline_spark.schemas import CORPORATE_RAW_COLUMNS

    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(CORPORATE_RAW_COLUMNS)
        w.writerows(rows)


def test_streaming_ingest_to_report(spark, tmp_path):
    from city_payroll_data_pipeline_spark.plans.corporate import (
        fct_corporate,
        stg_corporate,
    )
    from city_payroll_data_pipeline_spark.schemas import CORPORATE_RAW_COLUMNS
    from city_payroll_data_pipeline_spark.streaming import (
        stream_raw_csv,
        streaming_budget_report,
    )
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory

    raw_dir = tmp_path / "raw"
    os.makedirs(raw_dir)
    _write_corporate_csv(
        raw_dir / "corporate_a.csv",
        [
            ["1", "2013", "P", "Officer", "FT", "$100.00", "$10.00", "", ""],
            ["2", "2013", "P", "Officer", "FT", "$200.00", "", "", ""],
        ],
    )
    _write_corporate_csv(
        raw_dir / "corporate_b.csv",
        [["3", "2013", "F", "Captain", "FT", "$300.00", "$90.00", "", ""]],
    )

    stream = stream_raw_csv(spark, str(raw_dir), CORPORATE_RAW_COLUMNS)
    assert stream.isStreaming
    # batch transforms compose unchanged onto the unbounded frame
    fct = fct_corporate(stg_corporate(stream, processed_at="2024-06-01T00:00:00"))
    run_to_memory(streaming_budget_report(fct), "budget_stream")

    out = {
        r["job_title"]: r
        for r in spark.sql("SELECT * FROM budget_stream").collect()
    }
    assert out["Officer"]["total_employee"] == 2
    assert out["Officer"]["total_budget"] == pytest.approx(310.0)
    assert out["Captain"]["total_budget"] == pytest.approx(390.0)


def test_streaming_incremental_files(spark, tmp_path):
    """New files arriving between runs are picked up incrementally."""
    from city_payroll_data_pipeline_spark.schemas import CORPORATE_RAW_COLUMNS
    from city_payroll_data_pipeline_spark.streaming import stream_raw_csv
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory

    raw_dir = tmp_path / "raw2"
    os.makedirs(raw_dir)
    _write_corporate_csv(
        raw_dir / "corporate_1.csv",
        [["1", "2013", "P", "A", "FT", "$1.00", "", "", ""]],
    )
    counts = stream_raw_csv(spark, str(raw_dir), CORPORATE_RAW_COLUMNS).groupBy().count()
    run_to_memory(counts, "cnt_stream")
    assert spark.sql("SELECT * FROM cnt_stream").collect()[0]["count"] == 1

    _write_corporate_csv(
        raw_dir / "corporate_2.csv",
        [["2", "2013", "P", "B", "FT", "$1.00", "", "", ""],
         ["3", "2013", "P", "C", "FT", "$1.00", "", "", ""]],
    )
    run_to_memory(counts, "cnt_stream2")
    assert spark.sql("SELECT * FROM cnt_stream2").collect()[0]["count"] == 3


def test_stream_to_parquet_exactly_once(spark, tmp_path):
    """Checkpointed parquet sink: a restart re-ingests nothing; new
    files land incrementally."""
    from city_payroll_data_pipeline_spark.schemas import CORPORATE_RAW_COLUMNS
    from city_payroll_data_pipeline_spark.streaming import stream_raw_csv
    from city_payroll_data_pipeline_spark.streaming.jobs import stream_to_parquet

    raw = tmp_path / "raw3"
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(raw)
    _write_corporate_csv(
        raw / "corporate_1.csv",
        [["1", "2013", "P", "A", "FT", "$1.00", "", "", ""]],
    )
    stream = stream_raw_csv(spark, str(raw), CORPORATE_RAW_COLUMNS)
    stream_to_parquet(stream, str(out), str(ckpt))
    assert spark.read.parquet(str(out)).count() == 1

    # restart with the same checkpoint: old file NOT re-ingested
    stream_to_parquet(
        stream_raw_csv(spark, str(raw), CORPORATE_RAW_COLUMNS), str(out), str(ckpt)
    )
    assert spark.read.parquet(str(out)).count() == 1

    _write_corporate_csv(
        raw / "corporate_2.csv",
        [["2", "2013", "P", "B", "FT", "$1.00", "", "", ""]],
    )
    stream_to_parquet(
        stream_raw_csv(spark, str(raw), CORPORATE_RAW_COLUMNS), str(out), str(ckpt)
    )
    assert spark.read.parquet(str(out)).count() == 2


def test_streaming_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: closed sessions are
    emitted as soon as the gap is observed; the open tail stays in
    state. The emitted rows must agree with the batch twin."""
    from city_payroll_data_pipeline_spark.operators.sessions import session_stats
    from city_payroll_data_pipeline_spark.streaming import sessionize_stream
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory

    src = tmp_path / "sess_json"
    os.makedirs(src)
    rows = [
        # user 1: 2-event session, 2h gap, then a 2-event open tail
        '{"ts": "2024-01-01 00:00:00", "user_id": 1, "event_id": 1}',
        '{"ts": "2024-01-01 00:10:00", "user_id": 1, "event_id": 2}',
        '{"ts": "2024-01-01 02:30:00", "user_id": 1, "event_id": 3}',
        '{"ts": "2024-01-01 02:35:00", "user_id": 1, "event_id": 4}',
        # user 2: single event — never closes in-batch
        '{"ts": "2024-01-01 01:00:00", "user_id": 2, "event_id": 5}',
    ]
    (src / "b1.json").write_text("\n".join(rows))
    schema = "ts timestamp, user_id bigint, event_id bigint"
    stream = spark.readStream.schema(schema).json(str(src))
    run_to_memory(
        sessionize_stream(stream, gap_seconds=1800),
        "sessions_stream",
        output_mode="append",
    )
    out = spark.sql("SELECT * FROM sessions_stream").collect()
    assert [
        (r["user_id"], r["session_id"], r["n_events"], r["duration_s"])
        for r in out
    ] == [(1, 1, 2, 600)]

    # batch twin on the same rows: same closed session + the open tails
    batch = spark.read.schema(schema).json(str(src))
    stats = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_s"])
        for r in session_stats(batch, gap_seconds=1800).collect()
    }
    assert stats[(1, 1)] == (2, 600)
    assert stats[(1, 2)] == (2, 300)  # open tail, batch sees it
    assert stats[(2, 1)] == (1, 0)


def test_streaming_event_window_watermark(spark, tmp_path):
    from city_payroll_data_pipeline_spark.streaming import streaming_event_stats
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory

    src = tmp_path / "events_json"
    os.makedirs(src)
    rows = [
        '{"ts": "2024-01-01 00:10:00", "event_type": "click", "value": 1.0}',
        '{"ts": "2024-01-01 00:50:00", "event_type": "click", "value": 2.0}',
        '{"ts": "2024-01-01 01:20:00", "event_type": "view", "value": 3.0}',
    ]
    (src / "batch1.json").write_text("\n".join(rows))
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .json(str(src))
    )
    stats = streaming_event_stats(stream, window="1 hour", watermark="2 hours")
    run_to_memory(stats, "ev_stream", output_mode="append")
    # append mode emits only watermark-closed windows; availableNow with a
    # final empty batch closes windows older than max_ts - 2h → the
    # 00:00 window (max 01:20 - 2h = 23:20 previous day) stays open, so
    # validate via complete-mode run instead
    run_to_memory(stats, "ev_stream_c", output_mode="complete")
    out = spark.sql(
        "SELECT * FROM ev_stream_c ORDER BY window_start, event_type"
    ).collect()
    assert [(r["event_type"], r["n_events"], r["total_value"]) for r in out] == [
        ("click", 2, 3.0),
        ("view", 1, 3.0),
    ]
    assert out[0]["window_start"].minute == 0  # tumbling hour alignment


def test_streaming_dedup_drops_reingested_copies(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) re-ingest the same
    text under new doc_ids; only the first copy of each distinct
    fingerprint survives."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        streaming_dedup,
    )

    src = tmp_path / "stream_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(rows):
        spark.createDataFrame(
            rows, "doc_id long, text string, ingest_ts timestamp"
        ).coalesce(1).write.mode("append").parquet(str(src))

    write_batch([(1, "alpha beta", t0), (2, "gamma", t0), (3, "alpha  beta", t0)])
    write_batch([(4, "alpha beta", t0 + dt.timedelta(minutes=5)),
                 (5, "delta", t0 + dt.timedelta(minutes=5))])

    stream = (
        spark.readStream.schema("doc_id long, text string, ingest_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = run_to_memory(
        streaming_dedup(stream, watermark="1 hour"), "dedup_out",
        output_mode="append",
    )
    out = spark.table("dedup_out").collect()
    fps = [r["fingerprint"] for r in out]
    assert len(fps) == len(set(fps)) == 3  # alpha-beta, gamma, delta
    texts = {r["text"] for r in out}
    assert "delta" in texts and "gamma" in texts


def test_stream_merge_upsert_idempotent_table(spark, tmp_path):
    """Two micro-batches with overlapping keys stream-merge into a
    versioned table: later batches replace matched keys; re-running
    the drained stream (same checkpoint) commits nothing new."""
    from city_payroll_data_pipeline_spark.operators import upsert as U
    from city_payroll_data_pipeline_spark.streaming.jobs import (
        stream_merge_to_table,
    )

    src = tmp_path / "src"
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    import os
    import time

    seen: set = set()

    def write_batch(rows, mtime):
        spark.createDataFrame(rows, "id long, text string").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        # file-source batch order follows modification time — pin it so
        # "later batch wins the key" is deterministic
        for p in src.glob("*.parquet"):
            if p not in seen:
                os.utime(p, (mtime, mtime))
                seen.add(p)

    t0 = time.time()
    write_batch([(1, "a"), (2, "b")], t0)
    write_batch([(2, "b2"), (3, "c")], t0 + 10)

    def run():
        stream = (
            spark.readStream.schema("id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        stream_merge_to_table(stream, root, key="id", checkpoint=ckpt)

    run()
    live = {(r["id"], r["text"]) for r in U.read_table(spark, root).collect()}
    assert live == {(1, "a"), (2, "b2"), (3, "c")}
    v = U.current_version(root)
    run()  # no new input → no new version
    assert U.current_version(root) == v


def test_stream_static_enrichment_join(spark, tmp_path):
    """Events stream joins a static kind→weight dim per micro-batch."""
    from city_payroll_data_pipeline_spark.streaming.jobs import (
        enrich_stream,
        run_to_memory,
    )

    src = tmp_path / "ev"
    spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "purchase")], "id long, kind string"
    ).coalesce(1).write.parquet(str(src))
    dim = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0)], "kind string, weight double"
    )
    stream = spark.readStream.schema("id long, kind string").parquet(str(src))
    run_to_memory(
        enrich_stream(stream, dim, on="kind"), "enriched", output_mode="append"
    )
    rows = {r["id"]: r["weight"] for r in spark.table("enriched").collect()}
    assert rows == {1: 1.0, 2: None, 3: 5.0}


def test_stream_stream_interval_join(spark, tmp_path):
    """Clicks attribute to impressions with the same ad within 30
    minutes; a click 2h later and a click with no impression drop."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        join_streams,
        run_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    imp_src = tmp_path / "impressions"
    clk_src = tmp_path / "clicks"
    spark.createDataFrame(
        [(10, t0, "campaign_a"), (20, t0, "campaign_b")],
        "ad_id long, imp_ts timestamp, campaign string",
    ).coalesce(1).write.parquet(str(imp_src))
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(minutes=10), 0.5),   # attributes
            (10, t0 + dt.timedelta(hours=2), 0.7),      # outside band
            (30, t0 + dt.timedelta(minutes=5), 0.9),    # no impression
        ],
        "ad_id long, click_ts timestamp, cost double",
    ).coalesce(1).write.parquet(str(clk_src))

    imps = spark.readStream.schema(
        "ad_id long, imp_ts timestamp, campaign string"
    ).parquet(str(imp_src))
    clks = spark.readStream.schema(
        "ad_id long, click_ts timestamp, cost double"
    ).parquet(str(clk_src))
    joined = join_streams(
        imps, clks, key="ad_id", left_ts="imp_ts", right_ts="click_ts",
        watermark="1 hour", within="30 minutes",
    )
    assert joined.isStreaming
    run_to_memory(joined, "attributed", output_mode="append")
    out = spark.table("attributed").collect()
    assert len(out) == 1
    r = out[0]
    assert r["ad_id"] == 10 and r["campaign"] == "campaign_a"
    assert r["cost"] == 0.5


def test_stream_stream_join_colliding_columns(spark, tmp_path):
    """Both sides carry a non-key column named ``value``: the right
    side's copy must come out suffixed ``_r`` (not as a duplicate
    name, which would make any later reference ambiguous)."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        join_streams,
        run_to_memory,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    l_src = tmp_path / "left"
    r_src = tmp_path / "right"
    spark.createDataFrame(
        [(1, t0, "left-payload")], "k long, lts timestamp, value string"
    ).coalesce(1).write.parquet(str(l_src))
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=1), "right-payload")],
        "k long, rts timestamp, value string",
    ).coalesce(1).write.parquet(str(r_src))

    joined = join_streams(
        spark.readStream.schema("k long, lts timestamp, value string")
        .parquet(str(l_src)),
        spark.readStream.schema("k long, rts timestamp, value string")
        .parquet(str(r_src)),
        key="k", left_ts="lts", right_ts="rts",
    )
    assert sorted(joined.columns) == ["k", "lts", "rts", "value", "value_r"]
    run_to_memory(joined, "collide_out", output_mode="append")
    # the deduplicated name is selectable without AMBIGUOUS_REFERENCE
    row = spark.table("collide_out").select("value", "value_r").collect()[0]
    assert row["value"] == "left-payload" and row["value_r"] == "right-payload"


def test_streaming_ewma_agrees_with_batch_fold(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) splitting each user's
    series mid-stream: the final stateful EWMA must equal the batch
    fold over the whole series — the accumulator carries across the
    batch boundary exactly."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.ewma import ewma_stream
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory

    t0 = dt.datetime(2024, 1, 1)
    src = tmp_path / "ev"
    schema = "user_id long, ts timestamp, event_id long, value double"
    rows1 = [
        (1, t0 + dt.timedelta(minutes=i), i, float(10 + i)) for i in range(3)
    ] + [(2, t0, 100, 5.0)]
    rows2 = [
        (1, t0 + dt.timedelta(minutes=10 + i), 50 + i, float(i)) for i in range(2)
    ] + [(2, t0 + dt.timedelta(minutes=1), 101, 7.0)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(ewma_stream(stream, alpha=0.3), "ewma_out", output_mode="update")
    # update mode: take the LAST emitted row per user (highest n_events)
    out = {}
    for r in spark.table("ewma_out").collect():
        if r["user_id"] not in out or r["n_events"] > out[r["user_id"]][0]:
            out[r["user_id"]] = (r["n_events"], r["ewma_value"])

    def fold(vals):
        acc = vals[0]
        for x in vals[1:]:
            acc = 0.3 * x + 0.7 * acc
        return acc

    series = {
        1: [10.0, 11.0, 12.0, 0.0, 1.0],  # (ts, event_id) order
        2: [5.0, 7.0],
    }
    for uid, vals in series.items():
        n, ewma = out[uid]
        assert n == len(vals)
        assert ewma == fold(vals), (uid, ewma, fold(vals))


def test_streaming_topk_leaderboard(spark, tmp_path):
    """Two micro-batches; the published table holds the top-2 event
    types per window from the COMPLETE aggregate (batch 2 overturns
    batch 1's leader)."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        streaming_topk_to_table,
    )

    src = tmp_path / "tk_src"
    t0 = dt.datetime(2024, 1, 1, 10, 15, 0)

    def write_batch(rows):
        spark.createDataFrame(rows, "ts timestamp, event_type string").coalesce(
            1
        ).write.mode("append").parquet(str(src))

    write_batch([(t0, "view")] * 3 + [(t0, "click")] * 2 + [(t0, "buy")])
    write_batch([(t0, "click")] * 4)  # click overtakes view: 6 vs 3

    stream = (
        spark.readStream.schema("ts timestamp, event_type string")
        .parquet(str(src))
    )
    out = tmp_path / "tk_out"
    streaming_topk_to_table(
        stream, str(out), str(tmp_path / "tk_chk"), k=2, window="1 hour"
    )
    from city_payroll_data_pipeline_spark.operators.upsert import read_table

    rows = {
        (r["rank"], r["event_type"]): r["n"]
        for r in read_table(spark, str(out)).collect()
    }
    assert rows == {(1, "click"): 6, (2, "view"): 3}

    # a later run with NEW data must merge, not clobber: a new window's
    # leaderboard appears while the old window's rows stay published
    # (update-mode publish only touches the windows a batch changed)
    t1 = t0 + dt.timedelta(hours=2)
    write_batch([(t1, "buy")] * 5 + [(t1, "view")])
    streaming_topk_to_table(
        stream, str(out), str(tmp_path / "tk_chk"), k=2, window="1 hour"
    )
    by_win = {}
    for r in read_table(spark, str(out)).collect():
        by_win.setdefault(r["window_start"], {})[
            (r["rank"], r["event_type"])
        ] = r["n"]
    assert by_win[t0.replace(minute=0)] == {(1, "click"): 6, (2, "view"): 3}
    assert by_win[t1.replace(minute=0)] == {(1, "buy"): 5, (2, "view"): 1}

    # VERDICT r4 item 8: state must stay BOUNDED by the watermark
    # horizon. A far-future batch advances the watermark past the two
    # earlier windows: the side counts table must evict them (only the
    # new window's counts survive), the published leaderboard must
    # keep its history (merge, never clobber), and the streaming
    # aggregation state itself must not accumulate closed windows.
    t2 = t0 + dt.timedelta(hours=6)
    write_batch([(t2, "click")] * 2)
    q = streaming_topk_to_table(
        stream, str(out), str(tmp_path / "tk_chk"), k=2, window="1 hour"
    )
    side_wins = {
        r["window_start"]
        for r in read_table(spark, str(out) + "_counts")
        .select("window_start")
        .collect()
    }
    assert side_wins == {t2.replace(minute=0)}, side_wins
    pub_wins = {
        r["window_start"]
        for r in read_table(spark, str(out)).select("window_start").collect()
    }
    assert {
        t0.replace(minute=0), t1.replace(minute=0), t2.replace(minute=0)
    } <= pub_wins
    prog = q.lastProgress
    if prog and prog.get("stateOperators"):
        state_rows = sum(
            op["numRowsTotal"] for op in prog["stateOperators"]
        )
        # inside-horizon windows only: the t2 window's single group
        # (plus at most the not-yet-finalized eviction of one batch)
        assert state_rows <= 4, prog


def test_streaming_session_window_agrees_with_batch(spark, tmp_path):
    """The native session_window groupBy must produce the SAME sessions
    under Structured Streaming as the batch session_window_stats twin —
    that equivalence is the whole point of using the engine-native
    sessionizer (state + watermark handling come free)."""
    from city_payroll_data_pipeline_spark.streaming.jobs import run_to_memory
    from city_payroll_data_pipeline_spark.suite import build_suite, table
    from tests.conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events").select("user_id", "ts")
    src = tmp_path / "sw_src"
    ev.write.parquet(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        str(src)
    )
    sess = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("user_id", F.session_window("ts", "3600 seconds").alias("w"))
        .agg(F.count("*").alias("n_events"))
    )
    run_to_memory(sess, "sw_stream", output_mode="complete")
    got = {
        (r["user_id"], r["w"]["start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sw_stream").collect()
    }
    batch = {
        (r["user_id"], r["w"]["start"], r["n_events"])
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "3600 seconds").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == batch and len(batch) > 0


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Mergeability made operational: the registers a streaming
    max-aggregate accumulates across micro-batches are bit-identical
    to a batch build over the same rows — state stays capped at
    groups x 4096 regardless of stream length."""
    from pyspark.sql import functions as F

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        streaming_hll_registers,
    )

    src = tmp_path / "ev"
    rows = [
        (i, "t%d" % (i % 3), 1.0) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    # two separate files -> at least two input splits for the backlog
    df.filter(F.col("user_id") < 250).write.parquet(f"{src}/a.parquet")
    df.filter(F.col("user_id") >= 250).write.parquet(f"{src}/b.parquet")

    stream = (
        spark.readStream.schema("user_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*.parquet")
    )
    assert stream.isStreaming
    run_to_memory(streaming_hll_registers(stream), "hll_stream")
    streamed = {
        (r["event_type"], r["bucket"]): r["m_j"]
        for r in spark.sql("SELECT * FROM hll_stream").collect()
    }
    batch = {
        (r["event_type"], r["bucket"]): r["m_j"]
        for r in streaming_hll_registers(df).collect()
    }
    assert streamed == batch
    assert len(batch) <= 3 * 4096


def test_session_timeout_flush_preserves_ordinal():
    """The quiet-user flush must leave an ordinal tombstone, not
    remove state outright: a returning user restarting at session_id=1
    would emit duplicate (user_id, session_id) keys into the append
    stream. Driven against a stub GroupState because availableNow
    drains can never fire processing-time timeouts."""
    import datetime as dt

    import pandas as pd

    from city_payroll_data_pipeline_spark.streaming.sessionize import (
        _make_session_fold,
    )

    class StubState:
        def __init__(self):
            self.value = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self.value is not None

        @property
        def get(self):
            return self.value

        def update(self, v):
            self.value = tuple(v)

        def remove(self):
            self.value = None

        def setTimeoutDuration(self, ms):
            pass

    fn = _make_session_fold(
        gap_seconds=1800, ts_col="ts", flush_timeout_seconds=1800
    )
    state = StubState()
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    # batch 1: two events, one open session
    out1 = list(
        fn(
            (7,),
            [pd.DataFrame({"ts": [t0, t0 + dt.timedelta(seconds=60)]})],
            state,
        )
    )
    assert out1 == []  # session still open
    assert state.value[0] == 1  # ordinal 1 in state

    # timeout fires: session 1 flushed, ordinal tombstone remains
    state.hasTimedOut = True
    flushed = pd.concat(list(fn((7,), iter([]), state)))
    assert flushed["session_id"].tolist() == [1]
    assert state.value == (2, None, None, 0)  # tombstone, NOT removed

    # a second timeout on the tombstone must not emit a ghost session
    assert list(fn((7,), iter([]), state)) == []

    # user returns: next session numbers 2, not a duplicate 1
    state.hasTimedOut = False
    t1 = t0 + dt.timedelta(hours=6)
    list(fn((7,), [pd.DataFrame({"ts": [t1]})], state))
    assert state.value[0] == 2


def test_streaming_psi_drift_agrees_with_batch(spark, tmp_path):
    """Windowed PSI drift monitor: the streamed per-window PSI (one
    stateful aggregation, conditional per-bin sums) must equal the
    same function applied to the batch union of the micro-batches —
    the module's batch-twin equality contract."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        windowed_psi_drift,
    )

    src = tmp_path / "psi_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(minute, values):
        return [
            (float(v), t0 + dt.timedelta(minutes=minute, seconds=i))
            for i, v in enumerate(values)
        ]

    batch1 = rows(0, [1, 2, 3, 10, 11, 2, 1]) + rows(12, [50, 60, 2])
    batch2 = rows(3, [5, 55, 70, 1]) + rows(14, [80, 90, 95, 99])
    schema = "value double, ts timestamp"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    edges = [5.0, 25.0, 75.0]
    baseline = [0.4, 0.3, 0.2, 0.1]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(
        windowed_psi_drift(stream, "value", "ts", edges, baseline),
        "psi_out",
        output_mode="complete",
    )
    got = {
        r["window_start"]: (r["n"], r["c0"], r["c1"], r["c2"], r["c3"], r["psi"])
        for r in spark.table("psi_out").collect()
    }
    want_df = windowed_psi_drift(
        spark.createDataFrame(batch1 + batch2, schema),
        "value",
        "ts",
        edges,
        baseline,
    )
    want = {
        r["window_start"]: (r["n"], r["c0"], r["c1"], r["c2"], r["c3"], r["psi"])
        for r in want_df.collect()
    }
    assert got == want
    assert len(want) == 2  # two 10-minute windows

    def bad():
        windowed_psi_drift(
            spark.createDataFrame(batch1, schema), "value", "ts",
            edges, [0.5, 0.5],
        )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        bad()


def test_streaming_psi_drift_zero_on_stable_skewed_baseline(spark):
    """Regression (VERDICT r8 item 1): a drift-free window whose bin
    counts exactly match a SKEWED baseline must score PSI ≈ 0. The
    old fixed-shrink-toward-uniform baseline smoothing read ≈0.097 on
    baseline [0.7,0.1,0.1,0.1] — touching the 0.1 "drifting" alert
    threshold with zero actual drift. Both sides are now smoothed as
    pseudo-counts at the window's own n, so the zero point is exact
    for any baseline; the batch-twin equality test cannot catch this
    (both twins share the formula), hence this dedicated check."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        windowed_psi_drift,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    edges = [10.0, 20.0, 30.0]
    baseline = [0.7, 0.1, 0.1, 0.1]
    # 10 000 events distributed EXACTLY per the baseline: 7000 in
    # bin0 (<10), 1000 each in bins 1..3.
    n = 10_000
    per_bin = [int(n * s) for s in baseline]
    vals = (
        [5.0] * per_bin[0]
        + [15.0] * per_bin[1]
        + [25.0] * per_bin[2]
        + [35.0] * per_bin[3]
    )
    rows = [
        (v, t0 + dt.timedelta(milliseconds=i)) for i, v in enumerate(vals)
    ]
    out = windowed_psi_drift(
        spark.createDataFrame(rows, "value double, ts timestamp"),
        "value",
        "ts",
        edges,
        baseline,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == n
    assert (r["c0"], r["c1"], r["c2"], r["c3"]) == tuple(per_bin)
    # exact-match window: smoothed p_i == smoothed q_i bin-by-bin
    assert abs(r["psi"]) < 1e-9
    # and a genuinely drifted window still alerts: all mass in bin 3
    drift_rows = [
        (35.0, t0 + dt.timedelta(milliseconds=i)) for i in range(1000)
    ]
    drifted = windowed_psi_drift(
        spark.createDataFrame(drift_rows, "value double, ts timestamp"),
        "value",
        "ts",
        edges,
        baseline,
    ).collect()[0]
    assert drifted["psi"] > 0.25


def test_streaming_dedup_groups_agrees_with_batch(spark, tmp_path):
    """Windowed dedup LEDGER (VERDICT r8 item 7): the streamed
    per-(window, fingerprint) group stats must equal the same function
    applied to the batch union of the micro-batches — possible because
    every output column is an arrival-order-free aggregate (count /
    min), unlike streaming_dedup's keep-first-arrival filter."""
    import datetime as dt

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        streaming_dedup_groups,
    )

    src = tmp_path / "dg_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "doc_id long, text string, ingest_ts timestamp"

    def rows(minute, items):
        return [
            (i, t, t0 + dt.timedelta(minutes=minute, seconds=s))
            for s, (i, t) in enumerate(items)
        ]

    # window 1 (minutes 0-9): "alpha beta" x3 (normalized-equal),
    # "gamma" unique; window 2 (minutes 10-19): "gamma" x2 — same
    # fingerprint, DIFFERENT window, so it must form its own group
    batch1 = rows(0, [(7, "alpha beta"), (2, "gamma"), (9, "Alpha  beta")])
    batch2 = rows(1, [(4, "alpha beta")]) + rows(
        12, [(11, "gamma"), (10, "gamma")]
    )
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(
        streaming_dedup_groups(stream), "dedup_groups_out",
        output_mode="complete",
    )

    def key(frame):
        return {
            (r["window_start"], r["fingerprint"]): (
                r["keep_id"], r["group_size"], r["first_ts"],
            )
            for r in frame
        }

    got = key(spark.table("dedup_groups_out").collect())
    want = key(
        streaming_dedup_groups(
            spark.createDataFrame(batch1 + batch2, schema)
        ).collect()
    )
    assert got == want
    assert len(got) == 2  # alpha-beta group in w1, gamma group in w2
    keeps = sorted(v[0] for v in got.values())
    assert keeps == [4, 10]  # min doc_id, arrival-order-free
    sizes = sorted(v[1] for v in got.values())
    assert sizes == [2, 3]


def test_streaming_source_mix_agrees_with_batch(spark, tmp_path):
    """Windowed source-mix monitor: the streamed per-window counts /
    dominance / entropy (one stateful aggregation, conditional
    per-source sums) must equal the same function applied to the
    batch union of the micro-batches — the module's batch-twin
    equality contract. Includes an out-of-contract source that must
    land in n_other, and a single-source window whose entropy must be
    exactly 0."""
    import datetime as dt
    import math

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        windowed_source_mix,
    )

    src = tmp_path / "mix_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(minute, names):
        return [
            (nm, t0 + dt.timedelta(minutes=minute, seconds=i))
            for i, nm in enumerate(names)
        ]

    # window 1: mixed feeds + one rogue source; window 2: src0 only
    batch1 = rows(0, ["src0", "src1", "src1", "rogue", "src2"]) + rows(
        12, ["src0", "src0"]
    )
    batch2 = rows(3, ["src2", "src0", "rogue"]) + rows(14, ["src0"])
    schema = "source string, ts timestamp"
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    sources = ["src0", "src1", "src2"]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(
        windowed_source_mix(stream, "source", "ts", sources),
        "mix_out",
        output_mode="complete",
    )
    key = lambda r: r["window_start"]
    val = lambda r: (
        r["n"], r["n_src0"], r["n_src1"], r["n_src2"], r["n_other"],
        r["max_share"], r["entropy"], r["entropy_norm"],
    )
    got = {key(r): val(r) for r in spark.table("mix_out").collect()}
    want_df = windowed_source_mix(
        spark.createDataFrame(batch1 + batch2, schema), "source", "ts", sources
    )
    want = {key(r): val(r) for r in want_df.collect()}
    assert got == want
    assert len(want) == 2
    w2 = want[dt.datetime(2024, 1, 1, 0, 10, 0)]
    # single-source window: 3 × src0 → dominance 1, entropy exactly 0
    assert w2[:5] == (3, 3, 0, 0, 0)
    assert w2[5:] == (1.0, 0.0, 0.0)
    w1 = want[dt.datetime(2024, 1, 1, 0, 0, 0)]
    # mixed window: 8 events = 2/2/2/2 across src0/src1/src2/rogue
    assert w1[:5] == (8, 2, 2, 2, 2)
    assert w1[5] == 0.25
    assert w1[6] == round(math.log(4), 6)


def test_streaming_heavy_hitters_agrees_with_batch(spark, tmp_path):
    """Windowed heavy-hitter alert (thirteenth job): the streamed
    per-window CM probe estimates and flags must equal the same
    function applied to the batch union of the micro-batches (one
    stateful aggregation of arrival-order-free conditional counts),
    AND every estimate must keep the CM one-sided guarantee
    est >= exact count of the probe in that window."""
    import datetime as dt
    from collections import Counter

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        windowed_heavy_hitters,
    )

    src = tmp_path / "hh_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "tok string, ts timestamp"

    def rows(minute, names):
        return [
            (nm, t0 + dt.timedelta(minutes=minute, seconds=i))
            for i, nm in enumerate(names)
        ]

    # window 1: "spam" floods (6/10 > 0.25); window 2: balanced feed
    # where no probe crosses the threshold; "offlist" keys exercise
    # collision-only contribution to the probes' cells
    batch1 = rows(0, ["spam"] * 6 + ["ham", "eggs", "offlist1", "offlist2"])
    batch2 = rows(12, ["ham", "eggs", "spam", "offlist1"] * 2)
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    probes = ["spam", "ham", "eggs"]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(
        windowed_heavy_hitters(
            stream, "tok", "ts", probes, min_share=0.25
        ),
        "hh_out",
        output_mode="complete",
    )

    def key(frame):
        return {
            r["window_start"]: tuple(
                (r[f"est_{j}"], r[f"heavy_{j}"]) for j in range(len(probes))
            )
            + (r["n"], r["n_heavy"])
            for r in frame
        }

    got = key(spark.table("hh_out").collect())
    want = key(
        windowed_heavy_hitters(
            spark.createDataFrame(batch1 + batch2, schema),
            "tok",
            "ts",
            probes,
            min_share=0.25,
        ).collect()
    )
    assert got == want
    assert len(got) == 2

    # one-sided guarantee vs exact per-window counts
    win1 = t0
    win2 = t0 + dt.timedelta(minutes=10)
    exact = {
        win1: Counter(nm for nm, _ in batch1),
        win2: Counter(nm for nm, _ in batch2),
    }
    for ws, vals in got.items():
        for j, p in enumerate(probes):
            est, _ = vals[j]
            assert est >= exact[ws][p], (ws, p, est, exact[ws][p])

    # the flood window flags spam (6/10 > 0.25) and ONLY spam unless
    # a collision pushes another probe's estimate over the line —
    # assert via the recomputed rule on the returned estimates, so
    # the test stays exact under any hash layout
    for ws, vals in got.items():
        n = vals[len(probes)]
        for j in range(len(probes)):
            est, heavy = vals[j]
            assert heavy == int(est > 0.25 * n)
    spam_est, spam_heavy = got[win1][0]
    assert spam_est >= 6 and spam_heavy == 1


def test_streaming_quality_gate_agrees_with_batch(spark, tmp_path):
    """Trained-quality-gate deployment (fourteenth job): the streamed
    per-(window, source) funnel counts must equal the same function on
    the batch union of the micro-batches, AND every count must match a
    pure-Python replay of the feature grid + left-associated double
    score — so the map-side per-row feature fold provably reproduces
    the batch probe's explode+groupBy features."""
    import datetime as dt
    import re
    from collections import defaultdict

    from city_payroll_data_pipeline_spark.streaming.jobs import (
        run_to_memory,
        streaming_quality_gate,
    )

    src = tmp_path / "qg_src"
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "text string, source string, ts timestamp"
    # chosen so the windows mix keeps and drops (rich/ten keep,
    # loopy/short/spam drop) with no score on the threshold
    weights = (-0.1, 0.05, 0.001, -0.001)
    threshold = 0.25

    # window 1: a loopy doc, a rich doc, a short doc, an empty doc
    # (dropped); window 2: re-mixed per source so shares differ
    batch1 = [
        ("the the the the the the", "feedA", t0),
        ("alpha beta gamma delta epsilon zeta eta theta", "feedA",
         t0 + dt.timedelta(seconds=10)),
        ("ok", "feedB", t0 + dt.timedelta(seconds=20)),
        ("   ", "feedB", t0 + dt.timedelta(seconds=30)),
    ]
    batch2 = [
        ("one two three four five six seven eight nine ten", "feedB",
         t0 + dt.timedelta(minutes=12)),
        ("spam spam spam spam spam spam spam spam", "feedA",
         t0 + dt.timedelta(minutes=12, seconds=5)),
    ]
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_to_memory(
        streaming_quality_gate(
            stream, "text", "source", "ts", weights, threshold=threshold
        ),
        "qg_out",
        output_mode="complete",
    )

    def key(frame):
        return {
            (r["window_start"], r["source"]): (
                r["n_docs"],
                r["n_keep"],
                r["kept_share"],
                r["kept_chars"],
            )
            for r in frame
        }

    got = key(spark.table("qg_out").collect())
    want = key(
        streaming_quality_gate(
            spark.createDataFrame(batch1 + batch2, schema),
            "text",
            "source",
            "ts",
            weights,
            threshold=threshold,
        ).collect()
    )
    assert got == want

    # pure-Python replay: the exact integer feature grid + the same
    # left-associated double score
    def tdiv(a, b):
        return a // b  # all operands non-negative here

    replay = defaultdict(lambda: [0, 0, 0])
    for text, source, ts in batch1 + batch2:
        ws = re.findall(r"[a-z]+", text.lower())
        if not ws:
            continue
        nw, nd = len(ws), len(set(ws))
        tc = max(ws.count(w) for w in set(ws))
        f1 = min(nw, 100)
        f2 = tdiv(100 * nd, nw)
        f3 = min(tdiv(1000 * tc, nw), 100)
        w0, w1, w2, w3 = weights
        keep = (
            w0 + w1 * float(f1) + w2 * float(f2) + w3 * float(f3)
        ) >= threshold
        win = t0 if ts < t0 + dt.timedelta(minutes=10) else t0 + dt.timedelta(
            minutes=10
        )
        cell = replay[(win, source)]
        cell[0] += 1
        cell[1] += int(keep)
        cell[2] += len(text) if keep else 0
    assert len(got) == len(replay)
    for k, (n_docs, n_keep, share, chars) in got.items():
        rn, rk, rc = replay[k]
        assert (n_docs, n_keep, chars) == (rn, rk, rc), k
        assert share == rk / rn, k

    # the empty doc was dropped, not counted; both keep AND drop
    # outcomes occur, so the gate is exercised on both sides
    assert got[(t0, "feedB")][0] == 1
    keeps = [v[1] for v in got.values()]
    assert any(k > 0 for k in keeps) and sum(
        v[0] - v[1] for v in got.values()
    ) > 0
