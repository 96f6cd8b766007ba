"""Per-query measurement probe for the optimization rounds (guide §1).

For each headline query (or names passed on argv):
  * dumps ``.explain('formatted')`` to plans/<tag>/<name>_<suffix>.txt
  * times construction (Python plan building) separately from execution
  * times execution twice per pass with BOTH actions:
      - ``count()``   — the bench's timed action (comparable to BENCH_r*)
      - noop sink     — computes every column (guide §1.4), catches wins
                        that count() would hide behind column pruning
  * labels jobs via setJobDescription so the UI maps stages to queries

Usage:
    python tools/bench_probe.py --tag r13 --suffix before [names...]
    python tools/bench_probe.py --repeat 3          # all headliners
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from group5_spark.queries import QUERIES  # noqa: E402
from group5_spark.session import create_spark_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag, suffix, repeat = "r13", "", 3
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--tag":
            tag, i = args[i + 1], i + 2
        elif a == "--suffix":
            suffix, i = args[i + 1], i + 2
        elif a == "--repeat":
            repeat, i = int(args[i + 1]), i + 2
        else:
            names.append(a)
            i += 1
    if not names:
        names = list(HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(repo, "plans", tag)
    os.makedirs(plan_dir, exist_ok=True)

    spark = create_spark_session("group5-bench-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # Warm-up pass (JIT, codegen cache, parquet footers) — same
    # methodology as bench.py.
    for name in names:
        QUERIES[name](spark, sf_dir).count()

    rows = []
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        t_build = time.perf_counter() - t0

        if suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plan_dir, f"{name}_{suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)

        counts, noops = [], []
        for _ in range(repeat):
            sc.setJobDescription(f"{name}: count")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            counts.append(time.perf_counter() - t0)
            sc.setJobDescription(f"{name}: noop")
            t0 = time.perf_counter()
            (
                QUERIES[name](spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            noops.append(time.perf_counter() - t0)
            sc.setJobDescription(None)
        med = lambda xs: sorted(xs)[(len(xs) - 1) // 2]  # noqa: E731
        rows.append(
            {
                "name": name,
                "build_s": round(t_build, 4),
                "count_s": round(med(counts), 4),
                "noop_s": round(med(noops), 4),
            }
        )
        print(
            f"{name:35s} build={t_build:6.3f} "
            f"count={med(counts):6.3f} noop={med(noops):6.3f}",
            flush=True,
        )

    total_count = round(sum(r["count_s"] for r in rows), 3)
    total_noop = round(sum(r["noop_s"] for r in rows), 3)
    print(json.dumps({"total_count_s": total_count, "total_noop_s": total_noop}))
    spark.stop()


if __name__ == "__main__":
    main()
