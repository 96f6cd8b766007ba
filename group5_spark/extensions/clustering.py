"""K-means clustering over embedding columns (SURVEY §2 B-7
"beyond-reference": topic/quality bucketing of a training corpus by
embedding geometry — IVF's sibling; reference has no equivalent).

Lloyd's algorithm, Spark-shaped:
- The *points* table only ever streams through map-side expressions:
  distance evaluation against k broadcast centroid literals is pure
  whole-stage-codegen (aggregate/zip_with HOFs — no UDF), and the
  re-centering step is one hash aggregation on (cluster, dim_pos).
- Driver state is k×dim doubles per iteration (the centroids) — the
  same bounded-collect contract as similarity.ivf_topk's centroid
  sample; nothing data-sized ever reaches the driver.
- Iterations are Spark jobs over a cached points projection; at 100 TB
  each iteration is one scan + one shuffle of k×dim partial sums.

Cross-engine determinism (the DuckDB oracle replays the algorithm
exactly):
- centroid components round to 6 decimals after init and after every
  re-centering, so both engines iterate from identical state;
- squared-L2 distances fold the 64 addends in array order (Spark
  `aggregate` and DuckDB `list_sum` are both sequential left folds
  over identical operands — bit-identical IEEE sums) and round to 6
  before the argmin;
- argmin ties break on cluster id (struct-ordering array_min here,
  ROW_NUMBER over (dist, cid) in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_assign", "kmeans_oracle_sql"]


def _dist_sql(vec_col: str, centroid: list[float]) -> str:
    """Rounded squared-L2 distance to a literal centroid, as one SQL
    expression string (HOF lambdas composed as SQL text — the Column
    API mis-binds extra literals inside lambdas on 4.1.2, see
    dedup._shingles_sql)."""
    arr = "array(" + ", ".join(f"{c!r}D" for c in centroid) + ")"
    return (
        f"round(aggregate(zip_with({vec_col}, {arr},"
        f" (x, y) -> (x - y) * (x - y)),"
        f" 0.0D, (acc, z) -> acc + z), 6)"
    )


def _assign(pts: DataFrame, centroids: list[list[float]]) -> DataFrame:
    structs = ", ".join(
        f"struct({_dist_sql('v', c)} AS d, {cid} AS cid)"
        for cid, c in enumerate(centroids)
    )
    best = F.expr(f"array_min(array({structs}))")
    return pts.withColumn("best", best).select(
        "id",
        "v",
        F.col("best.cid").cast("bigint").alias("cluster_id"),
        F.col("best.d").alias("dist"),
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Run ``iters`` assignment passes of Lloyd's k-means (recentering
    between passes) and return ``(id, cluster_id, dist)`` for the final
    assignment.

    Deterministic init: the ``k`` lowest-id vectors, components rounded
    to 6. :func:`kmeans_oracle_sql` emits DuckDB SQL replaying the
    identical iteration, so the result is exactly oracle-checkable.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    pts = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seed_rows = pts.orderBy("id").limit(k).collect()
    centroids = [[round(x, 6) for x in r["v"]] for r in seed_rows]
    assigned = _assign(pts, centroids)
    for _ in range(iters - 1):
        means = (
            assigned.select(
                "cluster_id", F.posexplode("v").alias("pos", "x")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cluster_id"], {})[r["pos"]] = r["m"]
        # a cluster emptied by reassignment keeps its previous centroid
        centroids = [
            [by_cid[cid][p] for p in sorted(by_cid[cid])]
            if cid in by_cid
            else centroids[cid]
            for cid in range(k)
        ]
        assigned = _assign(pts, centroids)
    return assigned.select("id", "cluster_id", "dist")


def kmeans_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """DuckDB SQL replaying :func:`kmeans_assign` step for step,
    returning per-cluster ``(cluster_id, n_members, inertia)``.

    Unrolls the iterations as chained CTEs: assignment = point ×
    centroid distances with ROW_NUMBER argmin (ties on cid),
    re-centering = per-(cid, pos) AVG rounded to 6. The empty-cluster
    carry-over branch in kmeans_assign has no CTE equivalent, so the
    oracle assumes every cluster stays populated — true for the
    checked data and asserted by the paired unit test.
    """
    d_expr = (
        f"round(list_sum([ (p.v[i] - c.cv[i]) * (p.v[i] - c.cv[i])"
        f" FOR i IN range(1, {dim + 1}) ]), 6)"
    )
    sql = f"""WITH pts AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    ),
    c0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY id) - 1 AS cid,
             [round(x, 6) FOR x IN v] AS cv
      FROM pts ORDER BY id LIMIT {k}
    )"""
    for it in range(1, iters + 1):
        prev = f"c{it - 1}"
        sql += f""",
    a{it} AS (
      SELECT id, v, cid, d FROM (
        SELECT p.id, p.v, c.cid, {d_expr} AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY p.id ORDER BY {d_expr}, c.cid) AS rn
        FROM pts p CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
        if it < iters:
            sql += f""",
    c{it} AS (
      SELECT cid, list(round(m, 6) ORDER BY i) AS cv FROM (
        SELECT cid, i, AVG(v[i]) AS m
        FROM a{it} CROSS JOIN generate_series(1, {dim}) t(i)
        GROUP BY cid, i
      ) GROUP BY cid
    )"""
    sql += f"""
    SELECT cid AS cluster_id, COUNT(*) AS n_members,
           ROUND(SUM(d), 4) AS inertia
    FROM a{iters} GROUP BY cid
    """
    return sql
