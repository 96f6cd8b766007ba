"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values. Use while iterating:

    python tools/check_oracle.py [--strict] [sf_dir] [query ...]

``--strict`` replicates the driver's representation-sensitive hash:
the oracle is fetched via ``fetchdf()`` (DECIMAL and HUGEINT become
float64 — the driver's float path) and cells compare by *type class +
repr* with no Decimal normalization.  Under strict mode any Spark-side
``Decimal`` in the final output fails (the driver hashed Spark
``Decimal('4997.10')`` differently from DuckDB's ``4997.1`` in round
1 despite value-equality), as does an int↔float class mismatch (DuckDB
``SUM(int)`` is HUGEINT → float on fetch).  Rule of thumb enforced
here: every final output column must be DOUBLE, BIGINT, STRING, DATE,
TIMESTAMP, BOOLEAN, or an array thereof — on BOTH sides.
"""

from __future__ import annotations

import math
import sys
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from group5_spark.catalog import TABLES  # noqa: E402
from group5_spark.session import create_spark_session  # noqa: E402


def normalize(v):
    """Map any cell to a uniformly sortable/comparable key (grouping
    sets yield None next to strings — raw Python sort would throw)."""
    if v is None:
        return ("0none", "")
    if isinstance(v, Decimal):
        # lenient mode is value-based: DuckDB returns DECIMAL for
        # numeric literals/ROUND-of-decimal where Spark computes a
        # DOUBLE of identical value — compare on the float value so
        # only strict mode (driver-faithful) flags representation.
        return ("f", repr(float(v)))
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", f"{v:+025d}")
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(normalize(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("s", str(v))


def strict_normalize(v):
    """Driver-faithful cell key: type class + exact repr, no Decimal
    normalization, no int/float unification.  Temporal values collapse
    to their isoformat date/instant (both engines agree there)."""
    if v is None:
        return ("0none", "")
    if type(v).__module__ == "numpy" and getattr(v, "ndim", None) == 0:
        v = v.item()  # numpy scalar (e.g. int32 inside a list cell)
    if isinstance(v, Decimal):
        return ("DECIMAL", str(v))  # presence alone should fail vs float
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else repr(v))
    if isinstance(v, int):
        return ("i", f"{v:+025d}")
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        # pandas Timestamp at midnight vs datetime.date: same instant
        return ("t", iso[:10] if iso.endswith("T00:00:00") else iso)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        # The driver's canonicalizer pandas-sorts every output column;
        # list cells throw `TypeError: unhashable type: 'list'` there.
        # Replicate the intolerance instead of normalizing (round-3
        # lesson: the replica must be at least as strict as the driver).
        raise TypeError(
            "unhashable type: 'list' (driver-faithful: array-typed "
            "final columns cannot be canonicalized — serialize with "
            "concat_ws/array_to_string on both sides)"
        )
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v).hex())
    return ("s", str(v))


def _df_rows(pdf):
    """pandas DataFrame → list of python-native row tuples (fetchdf path)."""
    out = []
    for row in pdf.itertuples(index=False, name=None):
        cells = []
        for v in row:
            if type(v).__name__ == "ndarray":
                cells.append(list(v))
                continue
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append(v)
                continue
            if type(v).__name__ == "NaTType" or (
                not isinstance(v, (str, bytes, list, tuple)) and v != v
            ):
                cells.append(None)  # pandas NaT / NA → SQL NULL
                continue
            item = getattr(v, "item", None)
            if item is not None and type(v).__module__ == "numpy":
                v = v.item()
            cells.append(v)
        out.append(tuple(cells))
    return out


def compare(name, spark_df, duck_rows, duck_cols, strict=False):
    norm = strict_normalize if strict else normalize
    if strict:
        from pyspark.sql import types as ST

        bad = [
            f.name
            for f in spark_df.schema.fields
            if isinstance(f.dataType, (ST.ArrayType, ST.MapType, ST.StructType))
        ]
        if bad:
            return (
                f"COMPLEX-TYPED FINAL COLUMNS {bad} — the driver's pandas "
                "canonicalizer throws on list cells; serialize them"
            )
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"COLUMN MISMATCH spark={s_cols} duck={d_cols}"
    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_rows = sorted(
        tuple(norm(r[i]) for i in s_idx) for r in spark_df.collect()
    )
    d_rows = sorted(tuple(norm(r[i]) for i in d_idx) for r in duck_rows)
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duck={len(d_rows)}"
    if s_rows != d_rows:
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                return f"VALUE MISMATCH at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return None


def main():
    args = sys.argv[1:]
    strict = "--strict" in args
    args = [a for a in args if a != "--strict"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = create_spark_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"  {name}: rows-only ({n} rows)")
                continue
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            if strict:
                pdf = res.fetchdf()
                err = compare(name, sdf, _df_rows(pdf), duck_cols, strict=True)
            else:
                err = compare(name, sdf, res.fetchall(), duck_cols)
            if err:
                failures += 1
                print(f"✗ {name}: {err}")
            else:
                print(f"✓ {name}")
        except Exception as ex:  # noqa: BLE001
            failures += 1
            print(f"✗ {name}: EXCEPTION {type(ex).__name__}: {ex}")
    print(f"\n{failures} failures / {len(only or qs)} checked")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
