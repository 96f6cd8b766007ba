"""Data-quality checker (quality.py): verdict math on a frame with
known violations, and the one-scan plan contract."""

from __future__ import annotations

from pyspark.sql import Row

from group5_spark.plans import inspect as I
from group5_spark.quality import (
    Check,
    accepted_values,
    in_range,
    matches,
    not_null,
    run_checks,
    unique,
)

ROWS = [
    Row(id=1, status="O", price=10.0, tag="1-URGENT"),
    Row(id=2, status="F", price=-5.0, tag="9-BOGUS"),
    Row(id=2, status="X", price=None, tag=None),
    Row(id=None, status=None, price=3.0, tag="2-HIGH"),
]


def _report(spark):
    df = spark.createDataFrame(ROWS)
    out = run_checks(
        df,
        [
            not_null("id"),
            unique("id"),
            accepted_values("status", ("O", "F")),
            in_range("price", lo=0),
            matches("tag", "^[1-5]-"),
        ],
    )
    return {r["check_name"]: r for r in out.collect()}


def test_violation_counts(spark):
    rep = _report(spark)
    assert rep["id_not_null"]["n_violations"] == 1
    # id=2 appears twice -> 1 surplus row (the NULL group is a key too)
    assert rep["id_unique"]["n_violations"] == 1
    # status: 'X' and NULL
    assert rep["status_accepted"]["n_violations"] == 2
    # price: -5.0 and NULL
    assert rep["price_range"]["n_violations"] == 2
    # tag: '9-BOGUS' and NULL
    assert rep["tag_shape"]["n_violations"] == 2
    assert all(not r["passed"] for r in rep.values())


def test_all_green_on_clean_frame(spark):
    df = spark.createDataFrame(
        [Row(id=1, v="a"), Row(id=2, v="b")]
    )
    rep = run_checks(df, [not_null("id"), unique("id"),
                          accepted_values("v", ("a", "b"))])
    assert all(r["passed"] for r in rep.collect())
    assert rep.count() == 3


def test_row_local_checks_share_one_scan(spark):
    df = spark.createDataFrame(ROWS)
    out = run_checks(
        df,
        [not_null("id"), accepted_values("status", ("O", "F")),
         in_range("price", lo=0), matches("tag", "^[1-5]-")],
    )
    import re

    plan = I.formatted_plan(out)
    # four row-local checks, ONE scan of the input (the second scan
    # node is the 4-row check-metadata frame, not data)
    scans = re.findall(r"\(\d+\) Scan \w+", plan)
    assert len(scans) <= 2


def test_unknown_kind_raises(spark):
    bad = Check("x", "id", "entropy")
    try:
        bad.violation_predicate()
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
