"""Orchestration parity layer (SURVEY §2 A22).

The reference orchestrates with Airflow DAGs
(``Assets/dags/dag_streamflow.py:42-92``: ``[ingest_user_events,
ingest_transaction_events] >> etl_job >> validate_outputs`` and
``Assets/dags/dag_snowflake.py:109-139``: ``etl_job >> load_to_snowflake
>> trigger_root_task``).  This module re-expresses those graphs as plain
Python callables wired into a dependency-free local DAG runner with the
same surface (task ids, ``>>`` dependency syntax, retries with delay),
plus ``to_airflow()`` which materializes a real ``airflow.DAG`` when
airflow is importable (it is not in this container — import-gated).

The warehouse target is DuckDB instead of Snowflake: ``PUT file://…`` +
``COPY INTO bronze`` + ``EXECUTE TASK …SILVER`` become ``read_csv`` +
``CREATE OR REPLACE TABLE bronze.…`` + a silver-refresh statement on a
local DuckDB database file.  Same load semantics (stage gold CSVs into
warehouse bronze, then trigger the silver refresh), public engine.
"""

from __future__ import annotations

import time
from typing import Any, Callable


class LocalTask:
    """One node: a task id plus a python callable.

    Mirrors the Airflow operator surface we rely on: ``>>`` / ``<<``
    dependency wiring (lists supported) and per-task ``retries`` /
    ``retry_delay`` (``dag_streamflow.py:12-17`` uses retries=3).
    """

    def __init__(
        self,
        task_id: str,
        fn: Callable[..., Any],
        retries: int = 0,
        retry_delay: float = 0.0,
    ) -> None:
        self.task_id = task_id
        self.fn = fn
        self.retries = retries
        self.retry_delay = retry_delay
        self.upstream: set[str] = set()
        self.downstream: set[str] = set()

    def __rshift__(self, other):
        targets = other if isinstance(other, (list, tuple)) else [other]
        for t in targets:
            t.upstream.add(self.task_id)
            self.downstream.add(t.task_id)
        return other

    def __rrshift__(self, others):
        # [a, b] >> c  → list.__rshift__ is undefined, python retries
        # with c.__rrshift__([a, b]).
        for o in others:
            o >> self
        return self

    def __lshift__(self, other):
        targets = other if isinstance(other, (list, tuple)) else [other]
        for t in targets:
            t >> self
        return other

    def __repr__(self) -> str:  # pragma: no cover
        return f"LocalTask({self.task_id!r})"


class LocalDAG:
    """Minimal DAG container + sequential topological executor.

    A deliberate non-goal is parallel task execution: inside one Spark
    application the tasks share the session, and the cluster-parallelism
    lives *inside* each task's Spark job — the DAG layer only sequences
    them, exactly like the reference's single-worker Airflow deploy.
    """

    def __init__(self, dag_id: str, default_retries: int = 0,
                 default_retry_delay: float = 0.0) -> None:
        self.dag_id = dag_id
        self.default_retries = default_retries
        self.default_retry_delay = default_retry_delay
        self.tasks: dict[str, LocalTask] = {}

    def task(self, task_id: str, fn: Callable[..., Any], **kw) -> LocalTask:
        if task_id in self.tasks:
            raise ValueError(f"duplicate task_id {task_id!r}")
        kw.setdefault("retries", self.default_retries)
        kw.setdefault("retry_delay", self.default_retry_delay)
        t = LocalTask(task_id, fn, **kw)
        self.tasks[task_id] = t
        return t

    def topological_order(self) -> list[str]:
        """Kahn's algorithm; deterministic (insertion-order ties) and
        cycle-detecting."""
        indeg = {tid: len(t.upstream) for tid, t in self.tasks.items()}
        ready = [tid for tid in self.tasks if indeg[tid] == 0]
        order: list[str] = []
        while ready:
            tid = ready.pop(0)
            order.append(tid)
            for d in self.tasks[tid].downstream:
                indeg[d] -= 1
                if indeg[d] == 0:
                    ready.append(d)
        if len(order) != len(self.tasks):
            raise ValueError(f"cycle detected in dag {self.dag_id!r}")
        return order

    def run(self) -> dict[str, Any]:
        """Execute every task in dependency order; returns
        ``{task_id: return_value}`` (the xcom equivalent).  A task is
        retried ``retries`` times (so ``retries + 1`` attempts) with
        ``retry_delay`` seconds between attempts, then the run aborts —
        downstream tasks never execute after an exhausted task, matching
        Airflow's default trigger rule."""
        results: dict[str, Any] = {}
        for tid in self.topological_order():
            task = self.tasks[tid]
            attempts = task.retries + 1
            for attempt in range(1, attempts + 1):
                try:
                    results[tid] = task.fn()
                    break
                except Exception:
                    if attempt == attempts:
                        raise
                    if task.retry_delay:
                        time.sleep(task.retry_delay)
        return results


# ---------------------------------------------------------------------------
# DAG factories (reference parity)
# ---------------------------------------------------------------------------


def build_streamflow_dag(
    spark,
    landing_dir: str,
    output_dir: str,
    fmt: str = "csv",
    n_user_events: int = 500,
    n_transactions: int = 200,
    seed: int = 42,
    retries: int = 3,
    retry_delay: float = 0.0,
) -> LocalDAG:
    """``streamflow_main`` (``dag_streamflow.py:42-92``):
    ``[ingest_user_events, ingest_transaction_events] >> etl_job >>
    validate_outputs``.

    The two ingest tasks play the reference's per-topic Kafka consumer
    shell-outs (``run_consumer.sh <topic>``): each lands one topic's
    NDJSON batch.  ``etl_job`` is the spark-submit equivalent calling
    :func:`group5_spark.etl.run_etl` in-process; ``validate_outputs``
    is the same recursive gold-zone file scan.
    """
    from group5_spark.etl import run_etl, validate_outputs
    from group5_spark.generator import events as gen
    from group5_spark.sources.landing import write_ndjson_batch

    dag = LocalDAG("streamflow_main", default_retries=retries,
                   default_retry_delay=retry_delay)

    customers = gen.make_customers(200, seed=seed)
    products = gen.make_products(100, seed=seed + 1)

    def ingest_user_events() -> int:
        rows = gen.make_user_events(
            n_user_events, customers, products, seed=seed + 2)
        write_ndjson_batch(rows, "user_events", landing_dir, batch_ts=seed)
        return len(rows)

    def ingest_transaction_events() -> int:
        rows = gen.make_transactions(
            n_transactions, customers, products, seed=seed + 3)
        write_ndjson_batch(rows, "transaction_events", landing_dir,
                           batch_ts=seed)
        return len(rows)

    def etl_job() -> dict[str, int]:
        return run_etl(spark, landing_dir, output_dir, fmt=fmt)

    def validate() -> list[str]:
        return validate_outputs(output_dir, fmt=fmt)

    t_ue = dag.task("ingest_user_events", ingest_user_events)
    t_tx = dag.task("ingest_transaction_events", ingest_transaction_events)
    t_etl = dag.task("etl_job", etl_job)
    t_val = dag.task("validate_outputs", validate)
    [t_ue, t_tx] >> t_etl >> t_val
    return dag


def build_warehouse_dag(
    spark,
    landing_dir: str,
    gold_dir: str,
    warehouse_db: str,
    retries: int = 3,
    retry_delay: float = 0.0,
) -> LocalDAG:
    """``dag_snowflake`` (``dag_snowflake.py:109-139``): ``etl_job >>
    load_to_warehouse >> trigger_root_task`` with DuckDB standing in
    for Snowflake.

    ``load_to_warehouse`` maps gold CSV glob patterns to warehouse
    bronze tables (the reference's ``CSV_TO_TABLE`` + ``PUT``/``COPY
    INTO`` loop, ``dag_snowflake.py:35-92``) via ``read_csv`` into
    ``bronze.raw_*``; ``trigger_root_task`` plays ``EXECUTE TASK
    …TASK_USER_EVENTS_SILVER`` by refreshing a typed, deduplicated
    ``silver.user_events`` table from bronze.
    """
    import glob
    import os

    import duckdb

    from group5_spark.etl import run_etl

    dag = LocalDAG("dag_warehouse", default_retries=retries,
                   default_retry_delay=retry_delay)

    csv_to_table = {
        "user_events/*.csv": "raw_user_events",
        "transactions/*.csv": "raw_transactions",
    }

    def etl_job() -> dict[str, int]:
        return run_etl(spark, landing_dir, gold_dir, fmt="csv")

    def load_to_warehouse() -> dict[str, int]:
        con = duckdb.connect(warehouse_db)
        try:
            con.execute("CREATE SCHEMA IF NOT EXISTS bronze")
            loaded: dict[str, int] = {}
            for pattern, table in csv_to_table.items():
                files = sorted(glob.glob(os.path.join(gold_dir, pattern)))
                if not files:
                    continue
                con.execute(
                    f"CREATE OR REPLACE TABLE bronze.{table} AS "
                    "SELECT * FROM read_csv(?, header=true, "
                    "union_by_name=true)",
                    [files],
                )
                loaded[table] = con.execute(
                    f"SELECT count(*) FROM bronze.{table}").fetchone()[0]
            if not loaded:
                raise FileNotFoundError(f"no gold CSVs under {gold_dir}")
            return loaded
        finally:
            con.close()

    def trigger_root_task() -> int:
        con = duckdb.connect(warehouse_db)
        try:
            con.execute("CREATE SCHEMA IF NOT EXISTS silver")
            con.execute(
                "CREATE OR REPLACE TABLE silver.user_events AS "
                "SELECT * EXCLUDE rn FROM ("
                "  SELECT *, row_number() OVER ("
                "    PARTITION BY event_id ORDER BY timestamp DESC) AS rn"
                "  FROM bronze.raw_user_events) WHERE rn = 1"
            )
            return con.execute(
                "SELECT count(*) FROM silver.user_events").fetchone()[0]
        finally:
            con.close()

    t_etl = dag.task("etl_job", etl_job)
    t_load = dag.task("load_to_warehouse", load_to_warehouse)
    t_root = dag.task("trigger_root_task", trigger_root_task)
    t_etl >> t_load >> t_root
    return dag


def to_airflow(dag: LocalDAG, start_date=None):
    """Materialize a :class:`LocalDAG` as a real ``airflow.DAG`` of
    PythonOperators with identical ids and wiring.  Import-gated:
    airflow is not installed in this container, so callers should treat
    ``ImportError`` as 'run it with :meth:`LocalDAG.run` instead'."""
    try:
        from datetime import datetime, timedelta

        from airflow import DAG  # type: ignore[import-not-found]
        from airflow.operators.python import (  # type: ignore[import-not-found]
            PythonOperator,
        )
    except ImportError as exc:  # pragma: no cover - airflow absent here
        raise ImportError(
            "airflow is not installed; use LocalDAG.run()") from exc

    adag = DAG(  # pragma: no cover - airflow absent here
        dag_id=dag.dag_id,
        start_date=start_date or datetime(2024, 1, 1),
        schedule=None,
        catchup=False,
    )
    ops = {}  # pragma: no cover
    for tid, t in dag.tasks.items():  # pragma: no cover
        ops[tid] = PythonOperator(
            task_id=tid, python_callable=t.fn, retries=t.retries,
            retry_delay=timedelta(seconds=t.retry_delay), dag=adag)
    for tid, t in dag.tasks.items():  # pragma: no cover
        for d in t.downstream:
            ops[tid] >> ops[d]
    return adag  # pragma: no cover
