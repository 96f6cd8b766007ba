"""Multi-format table IO router: Parquet, ORC, JSON-lines, CSV
(SURVEY §2 A24–A28 family — the reference's Snowflake FILE FORMAT
objects for CSV/JSON/PARQUET, reference `Assets/snowflake_ddl.sql`
STAGE/FILE FORMAT section, generalized to Spark's source registry).

Format choice is a scale decision, so the router keeps the defaults
honest at 100 TB:
- Parquet and ORC are the only splittable+columnar options here —
  both carry min/max statistics and support predicate pushdown and
  column pruning (`assert_filter_pushed` holds for either backend);
  Parquet stays the engine default, ORC exists for ecosystems
  standardized on it (Hive ACID, legacy warehouses).
- JSON/CSV are interchange formats: schema is mandatory on read
  (schema inference is a full extra pass over 100 TB — never
  implicit), compression-codec splittability is the caller's
  problem, and they exist for landing/export edges, not for the
  medallion core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

SUPPORTED_FORMATS = ("parquet", "orc", "json", "csv")


def _check(fmt: str) -> str:
    f = fmt.lower()
    if f not in SUPPORTED_FORMATS:
        raise ValueError(
            f"unsupported format {fmt!r}; choose one of {SUPPORTED_FORMATS}"
        )
    return f


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt``. Text formats (json/csv) REQUIRE an
    explicit schema — inference costs a second full scan and silently
    drifts types between runs; columnar formats carry their own."""
    f = _check(fmt)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif f in ("json", "csv"):
        raise ValueError(
            f"{f} reads require an explicit schema (inference is a "
            f"full extra pass and is not run-to-run stable)"
        )
    if f == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    for k, v in options.items():
        reader = reader.option(k, v)
    return getattr(reader, f)(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
    **options: str,
) -> None:
    """Write ``df`` to ``path`` in ``fmt``. ``single_file`` gates the
    coalesce(1) anti-pattern (export edges only — a flag, never a
    default, per the reference-parity note on A9)."""
    f = _check(fmt)
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if f == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    getattr(writer, f)(path)
