"""Streaming-native path tests: AvailableNow drains, watermarked
windows, checkpoint-based exactly-once re-runs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from group5_spark.generator import events as gen
from group5_spark.schemas import USER_EVENT_SCHEMA
from group5_spark.sources.landing import write_ndjson_batch
from group5_spark.streaming import jobs


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    customers = gen.make_customers(20)
    products = gen.make_products(20)
    ue = gen.make_user_events(300, customers, products)
    write_ndjson_batch(ue, "user_events", str(root / "landing"), batch_ts=1)
    return root


def test_available_now_counts_match_batch(spark, landing):
    glob = str(landing / "landing" / "user_events_batch_*.json")
    stream = jobs.stream_landing(spark, glob, USER_EVENT_SCHEMA)
    typed = stream.withColumn(
        "event_ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    )
    windowed = jobs.windowed_event_counts(typed, window="5 minutes")
    # complete mode: emit all windows incl. ones the watermark has not
    # closed yet (append would drop the tail windows of the batch)
    jobs.run_available_now(
        windowed, str(landing / "ckpt1"), "stream_counts", output_mode="complete"
    )
    stream_total = (
        spark.table("stream_counts").agg(F.sum("n_events")).collect()[0][0]
    )
    batch_total = spark.read.schema(USER_EVENT_SCHEMA).json(glob).count()
    assert stream_total == batch_total


def test_checkpoint_no_reprocess(spark, landing):
    """Second AvailableNow run with the same checkpoint processes
    nothing new (exactly-once over the already-drained files)."""
    glob = str(landing / "landing" / "user_events_batch_*.json")
    stream = jobs.stream_landing(spark, glob, USER_EVENT_SCHEMA)
    typed = stream.withColumn(
        "event_ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    )
    counts = typed.groupBy("event_type").count()
    jobs.run_available_now(
        counts, str(landing / "ckpt2"), "run_a", output_mode="complete"
    )
    total_a = spark.table("run_a").agg(F.sum("count")).collect()[0][0]

    # new file lands → only it is processed on the next drain
    customers = gen.make_customers(20)
    products = gen.make_products(20)
    extra = gen.make_user_events(50, customers, products, seed=99)
    write_ndjson_batch(extra, "user_events", str(landing / "landing"), batch_ts=2)

    stream2 = jobs.stream_landing(spark, glob, USER_EVENT_SCHEMA)
    typed2 = stream2.withColumn(
        "event_ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    )
    counts2 = typed2.groupBy("event_type").count()
    jobs.run_available_now(
        counts2, str(landing / "ckpt2"), "run_b", output_mode="complete"
    )
    total_b = spark.table("run_b").agg(F.sum("count")).collect()[0][0]
    assert total_a == 300
    assert total_b == 350  # complete mode: cumulative state, +50 only


def test_watermark_drops_late_state(spark, tmp_path):
    """Rows older than the watermark do not open new windows in the
    final result (append mode emits only closed windows)."""
    base = datetime(2026, 1, 1, 12, 0, 0)
    rows = [("e1", base), ("e2", base + timedelta(minutes=30))]
    src = tmp_path / "wm"
    src.mkdir()
    import json

    with open(src / "events.json", "w") as fh:
        for eid, ts in rows:
            fh.write(json.dumps({
                "event_id": eid, "user_id": "u", "event_type": "view",
                "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z",
            }) + "\n")
    stream = jobs.stream_landing(spark, str(src / "*.json"), USER_EVENT_SCHEMA)
    typed = stream.withColumn(
        "event_ts", F.to_timestamp("timestamp", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    )
    win = jobs.windowed_event_counts(typed, window="5 minutes", watermark="10 minutes")
    jobs.run_available_now(win, str(tmp_path / "ckpt"), "wm_out", "append")
    got = spark.table("wm_out").collect()
    # the first window (12:00) closed once the 12:30 event advanced the
    # watermark past 12:05+10m; the 12:30 window stays open → 1 row
    assert len(got) == 1 and got[0].n_events == 1
