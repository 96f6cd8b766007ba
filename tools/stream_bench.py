"""Streaming drain throughput: rows/sec through the four streaming
operator shapes, at 1× and 16× event volume (hot-keyed replicas from
tools/scale_curve.py materialize).

Methodology: each operator drains the whole parquet-backed file
stream with Trigger.AvailableNow into a no-op foreachBatch sink
(count only), fresh checkpoint per run, one untimed JVM warm-up on
the smallest input. AvailableNow processes in bounded micro-batches
(maxFilesPerTrigger default), so this measures the real micro-batch
loop — planning, state store, watermark bookkeeping — not one giant
batch. Numbers are single-node `local[$SPARK_GRAFT_CPUS]`; on a
cluster the same plans shard by key.

Usage: python tools/stream_bench.py [scales...]   (default 1 16)
Prints one JSON line per (operator, scale).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCALE_ROOT = os.environ.get("SPARK_GRAFT_SCALE_ROOT", "/tmp/group5_scale")


def _stream(spark, sf_dir: str):
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/events.parquet")
        .withColumn("event_ts", F.col("ts"))
        # the stateful operators' output schemas type the key as string
        .withColumn("user_id", F.col("user_id").cast("string"))
    )


def drain(df, name: str, mode: str = "append") -> int:
    """Run to completion into a counting sink; return rows out."""
    seen = {"rows": 0}

    def sink(batch_df, _bid):
        seen["rows"] += batch_df.count()

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.foreachBatch(sink)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return seen["rows"]


def _doc_stream(spark, docs_dir: str):
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    return spark.readStream.schema(schema).parquet(f"{docs_dir}/documents.parquet")


def shapes(spark, sf_dir: str) -> dict:
    from group5_spark.streaming import jobs

    ev = lambda: _stream(spark, sf_dir)  # noqa: E731
    out = {
        "windowed_counts": lambda: jobs.windowed_event_counts(
            ev(), ts_col="event_ts", window="1 hour", watermark="2 hours"
        ),
        "stream_dedup": lambda: jobs.stream_dedup(
            ev(), ["event_id"], "event_ts", watermark="2 hours"
        ),
        "sessionize_stateful": lambda: jobs.sessionize_stateful(
            ev(), gap="30 minutes", watermark="2 hours"
        ),
        "heavy_hitters": lambda: jobs.heavy_hitters_stateful(ev(), k=8),
    }
    # corpus-dedup drain over the replica-distinct documents ladder
    # (xd dirs): the streamed batch anti-joins the 1x corpus's
    # fingerprints per micro-batch — only 32-char hashes join
    docs_dir = sf_dir.replace("/x", "/xd")
    if os.path.exists(f"{docs_dir}/documents.parquet") and os.path.exists(
        f"{SCALE_ROOT}/xd001/documents.parquet"
    ):
        from pyspark.sql import functions as F

        corpus = (
            spark.read.parquet(f"{SCALE_ROOT}/xd001/documents.parquet")
            .select(
                F.md5(
                    F.lower(F.trim(F.regexp_replace("text", "\\s+", " ")))
                ).alias("fingerprint")
            )
        )
        out["dedup_vs_corpus"] = lambda: jobs.stream_dedup_vs_corpus(
            _doc_stream(spark, docs_dir), corpus, text_col="text"
        )
    return out


MODES = {"heavy_hitters": "update"}


def main() -> None:
    from group5_spark.session import create_spark_session

    scales = [int(a) for a in sys.argv[1:]] or [1, 16]
    spark = create_spark_session("group5-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/state-store warm-up on the smallest scale (untimed)
    small = f"{SCALE_ROOT}/x{scales[0]:03d}"
    for name, build in shapes(spark, small).items():
        drain(build(), "warmup", MODES.get(name, "append"))

    for n in scales:
        sf_dir = f"{SCALE_ROOT}/x{n:03d}"
        rows_in_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        for name, build in shapes(spark, sf_dir).items():
            if name == "dedup_vs_corpus":
                rows_in = spark.read.parquet(
                    f"{SCALE_ROOT}/xd{n:03d}/documents.parquet"
                ).count()
            else:
                rows_in = rows_in_events
            start = time.perf_counter()
            rows_out = drain(build(), name, MODES.get(name, "append"))
            sec = time.perf_counter() - start
            print(
                json.dumps(
                    {
                        "operator": name,
                        "scale": n,
                        "rows_in": rows_in,
                        "rows_out": rows_out,
                        "seconds": round(sec, 2),
                        "rows_per_sec": int(rows_in / sec),
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
