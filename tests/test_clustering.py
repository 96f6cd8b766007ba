"""K-means (extensions/clustering.py): invariants the DuckDB oracle
can't express — empty-cluster carry-over assumption, Lloyd objective
monotonicity, assignment totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from group5_spark.catalog import load_table
from group5_spark.extensions.clustering import kmeans_assign

K = 8


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_assignment_total_and_clusters_populated(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assigned = kmeans_assign(emb, k=K, iters=3)
    n = emb.count()
    assert assigned.count() == n
    sizes = {r["cluster_id"]: r["n"] for r in
             assigned.groupBy("cluster_id").agg(
                 F.count(F.lit(1)).alias("n")).collect()}
    # the oracle replay assumes no cluster empties out mid-iteration;
    # all k populated at the end is the observable half of that
    assert set(sizes) == set(range(K))
    assert all(v > 0 for v in sizes.values())


def test_kmeans_inertia_monotone_over_iterations(spark, sf_dir):
    emb = _emb(spark, sf_dir)

    def inertia(iters: int) -> float:
        a = kmeans_assign(emb, k=K, iters=iters)
        return a.agg(F.sum("dist")).collect()[0][0]

    i1, i2, i3 = inertia(1), inertia(2), inertia(3)
    # Lloyd's objective is non-increasing; 1e-3 slack for the per-pass
    # 6-decimal rounding of centroids/distances
    assert i2 <= i1 + 1e-3
    assert i3 <= i2 + 1e-3


def test_kmeans_dist_is_true_distance_to_some_centroid(spark, sf_dir):
    # dist must be a plausible squared L2: non-negative everywhere
    a = kmeans_assign(_emb(spark, sf_dir), k=K, iters=2)
    assert a.filter(F.col("dist") < 0).count() == 0
