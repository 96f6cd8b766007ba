from group5_spark.orchestration.dags import (
    LocalDAG,
    LocalTask,
    build_streamflow_dag,
    build_warehouse_dag,
    to_airflow,
)

__all__ = [
    "LocalDAG",
    "LocalTask",
    "build_streamflow_dag",
    "build_warehouse_dag",
    "to_airflow",
]
