"""A22 orchestration parity: local DAG runner + reference DAG graphs."""

import duckdb
import pytest

from group5_spark.orchestration import (
    LocalDAG,
    build_streamflow_dag,
    build_warehouse_dag,
    to_airflow,
)


def test_dependency_wiring_and_topo_order():
    dag = LocalDAG("t")
    a = dag.task("a", lambda: "a")
    b = dag.task("b", lambda: "b")
    c = dag.task("c", lambda: "c")
    d = dag.task("d", lambda: "d")
    [a, b] >> c >> d
    order = dag.topological_order()
    assert set(order[:2]) == {"a", "b"}
    assert order[2:] == ["c", "d"]


def test_cycle_detection():
    dag = LocalDAG("cyc")
    a = dag.task("a", lambda: None)
    b = dag.task("b", lambda: None)
    a >> b
    b >> a
    with pytest.raises(ValueError, match="cycle"):
        dag.topological_order()


def test_retries_then_success_and_downstream_skip_on_failure():
    calls = {"flaky": 0, "down": 0}

    def flaky():
        calls["flaky"] += 1
        if calls["flaky"] < 3:
            raise RuntimeError("transient")
        return "ok"

    dag = LocalDAG("r", default_retries=3)
    f = dag.task("flaky", flaky)
    f >> dag.task("down", lambda: calls.__setitem__("down", 1))
    results = dag.run()
    assert results["flaky"] == "ok" and calls["flaky"] == 3
    assert calls["down"] == 1

    # exhausted retries abort the run before downstream executes
    calls2 = {"down": 0}
    dag2 = LocalDAG("r2", default_retries=1)
    bad = dag2.task("bad", lambda: 1 / 0)
    bad >> dag2.task("down", lambda: calls2.__setitem__("down", 1))
    with pytest.raises(ZeroDivisionError):
        dag2.run()
    assert calls2["down"] == 0


def test_streamflow_dag_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "landing")
    gold = str(tmp_path / "gold")
    dag = build_streamflow_dag(
        spark, landing, gold, fmt="csv",
        n_user_events=120, n_transactions=60, retries=0)
    assert dag.topological_order() == [
        "ingest_user_events", "ingest_transaction_events", "etl_job",
        "validate_outputs",
    ]
    results = dag.run()
    assert results["ingest_user_events"] == 120
    assert results["ingest_transaction_events"] == 60
    assert results["etl_job"]["user_events"] == 120
    assert results["etl_job"]["transactions"] >= 60  # items explode
    assert len(results["validate_outputs"]) >= 2


def test_warehouse_dag_loads_bronze_and_refreshes_silver(spark, tmp_path):
    landing = str(tmp_path / "landing")
    gold = str(tmp_path / "gold")
    db = str(tmp_path / "wh.duckdb")
    # land data first (streamflow ingest half), then run the warehouse DAG
    pre = build_streamflow_dag(
        spark, landing, gold, fmt="csv",
        n_user_events=100, n_transactions=40, retries=0)
    pre.run()

    dag = build_warehouse_dag(spark, landing, gold, db, retries=0)
    assert dag.topological_order() == [
        "etl_job", "load_to_warehouse", "trigger_root_task"]
    results = dag.run()
    assert results["load_to_warehouse"]["raw_user_events"] == 100
    assert results["load_to_warehouse"]["raw_transactions"] >= 40
    # silver refresh deduplicates by event_id
    assert results["trigger_root_task"] == 100
    con = duckdb.connect(db)
    try:
        n_distinct = con.execute(
            "SELECT count(DISTINCT event_id) FROM silver.user_events"
        ).fetchone()[0]
        assert n_distinct == results["trigger_root_task"]
    finally:
        con.close()


def test_to_airflow_is_import_gated():
    dag = LocalDAG("g")
    dag.task("only", lambda: None)
    try:
        import airflow  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="LocalDAG.run"):
            to_airflow(dag)
    else:  # pragma: no cover - airflow not in this container
        adag = to_airflow(dag)
        assert adag.dag_id == "g"
