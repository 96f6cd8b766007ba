"""Similarity search over embedding columns (SURVEY §2 B-7).

Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The query side is tiny and broadcast; the corpus never shuffles.
  Per-pair math is built-in ``zip_with``/``aggregate`` in DOUBLE —
  JVM codegen, deterministic accumulation order.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path.
  Sign-bit sketches shrink each vector to one long; candidates come
  from an equi-join on the bucket key, then exact re-ranking only
  within buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def _as_double(df: DataFrame, vec_col: str) -> F.Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    """L2 norm of a vector column, in double."""
    return df.withColumn("v", _as_double(df, vec_col)).withColumn(
        out, F.sqrt(F.expr(DOT.format(a="v", b="v")))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k
    nearest corpus vectors (excluding itself).

    Plan shape: broadcast(queries) × corpus → map-side cosine →
    per-query top-k via rank-filter (WindowGroupLimit keeps only k
    rows per query per task). Cosine is rounded to 6 dp before
    ranking with an id tie-break, so ordering is reproducible across
    engines and runs.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("cand_id"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    dot = F.expr(DOT.format(a="qv", b="cv"))
    scored = (
        c.join(F.broadcast(q), on=F.col("query_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(dot / (F.col("qn") * F.col("cn")), 6))
        .select("query_id", "cand_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_sketch(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Sign-bit sketch: bit j = sign(v · plane_j), planes generated
    deterministically from hash(j, i) — no stored model, fully
    reproducible, all built-ins.

    ``hash_fn="md5"`` derives plane components from the 56-bit
    portable hash (centered to ±0.5 since it is non-negative), making
    the sketch — and therefore the LSH bucketing — reproducible in a
    DuckDB oracle; the dot products fold left in DOUBLE on both
    engines, so the sign bits agree bit-for-bit.
    """
    if hash_fn == "md5":
        from group5_spark.extensions.dedup import portable_hash56_sql

        h = portable_hash56_sql("concat('p', {j}, '_', i)")
        plane_component = (
            f"(CAST({h} % 1000 - 500 AS DOUBLE) / 1000.0)"
        )
    else:
        plane_component = (
            "(CAST(xxhash64(concat('p', {j}, '_', i)) % 1000 AS DOUBLE) / 1000.0)"
        )
    bits = [
        F.expr(
            f"""
            CASE WHEN aggregate(
              zip_with(v, transform(sequence(0, size(v) - 1),
                                    i -> {plane_component.format(j=j)}),
                       (x, y) -> x * y),
              0D, (acc, w) -> acc + w) > 0
            THEN shiftleft(1L, {j}) ELSE 0L END
            """
        )
        for j in range(n_planes)
    ]
    sketch = bits[0]
    for b in bits[1:]:
        # Column.__or__ is boolean OR; disjoint power-of-two bits sum
        # to the same value as bitwise OR.
        sketch = sketch + b
    return df.withColumn("v", _as_double(df, vec_col)).select(
        F.col(id_col).alias("id"), F.col("v"), sketch.alias("sketch")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    band_bits: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k: hyperplane-sketch banding for candidates,
    exact cosine re-rank within buckets.

    Bands of ``band_bits`` sketch bits form bucket keys; the
    corpus-side join is an equi-join on (band, value) — at scale this
    replaces the O(|corpus|·|queries|) scan with bucket-local work.
    """
    n_bands = n_planes // band_bits
    mask = (1 << band_bits) - 1

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        s = hyperplane_sketch(df, id_col, vec_col, n_planes, hash_fn=hash_fn)
        bands = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.expr(
                        f"shiftright(sketch, {b * band_bits}) & {mask}L"
                    ).alias("bv"),
                )
                for b in range(n_bands)
            ]
        )
        return s.select(
            F.col("id").alias(f"{prefix}_id"),
            F.col("v").alias(f"{prefix}_v"),
            F.explode(bands).alias("bb"),
        ).select(
            f"{prefix}_id",
            f"{prefix}_v",
            F.col("bb.band").alias("band"),
            F.col("bb.bv").alias("bv"),
        )

    cb = banded(corpus, "cand")
    qb = banded(queries, "query")
    cand = (
        qb.join(cb, on=["band", "bv"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "query_v", "cand_id", "cand_v")
        .distinct()
    )
    dot = F.expr(DOT.format(a="query_v", b="cand_v"))
    qn = F.sqrt(F.expr(DOT.format(a="query_v", b="query_v")))
    cn = F.sqrt(F.expr(DOT.format(a="cand_v", b="cand_v")))
    scored = cand.withColumn("cosine", F.round(dot / (qn * cn), 6)).select(
        "query_id", "cand_id", "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into Voronoi
    cells around sampled centroids, search only the ``n_probe``
    nearest cells per query.

    Centroid selection is a deterministic pseudo-random sample: the
    ``n_cells`` corpus vectors with the smallest ``xxhash64(id)`` —
    id-distribution-independent (sparse/offset id spaces work), no
    iterative k-means, no training loop, one small collect job.
    Centroids are L2-normalized driver-side, so the map-side dot
    product against them IS cosine assignment (row norm is constant
    across cells). Cell assignment is a map-only argmax over an
    array of (cosine, cell) structs built from the broadcast centroid
    literals: struct comparison orders by the first field, so
    ``array_max`` *is* the argmax — zero shuffle to assign. The
    probe join is an equi-join on cell_id: at 100 TB each query
    touches ~``n_probe/n_cells`` of the corpus instead of all of it;
    persist/bucket the assigned layout (and ``.cache()`` ``corpus``
    when assignment and search run in one job) so repeated query
    batches skip re-assignment.
    """
    c_vec = corpus.withColumn("v", _as_double(corpus, vec_col)).select(
        F.col(id_col).alias("cand_id"), "v"
    )
    q_vec = queries.withColumn("v", _as_double(queries, vec_col)).select(
        F.col(id_col).alias("query_id"), "v"
    )

    if hash_fn == "md5":
        from group5_spark.extensions.dedup import portable_hash56_sql

        sample_key = F.expr(portable_hash56_sql("cast(cand_id as string)"))
    else:
        sample_key = F.xxhash64(F.col("cand_id"))
    sampled = (
        c_vec.orderBy(sample_key, F.col("cand_id"))
        .limit(n_cells)
        .collect()
    )
    if not sampled:
        raise ValueError("ivf_topk: corpus is empty, cannot sample centroids")

    def _l2_normalize(vec: list[float]) -> list[float]:
        # math.sqrt (correctly-rounded IEEE) rather than ** 0.5: a SQL
        # oracle recomputing the centroids must land on the same bits.
        import math

        norm = math.sqrt(sum(x * x for x in vec))
        return [x / norm for x in vec] if norm > 0 else vec

    centroids = [
        (int(r.cand_id), _l2_normalize([float(x) for x in r.v]))
        for r in sampled
    ]

    def cell_scores(v_col: str) -> F.Column:
        entries = []
        for cid, cvec in centroids:
            cos = F.expr(
                DOT.format(a=v_col, b=f"array({', '.join(repr(x) for x in cvec)})")
            )
            entries.append(
                F.struct(cos.alias("score"), F.lit(cid).alias("cell"))
            )
        return F.array(*entries)

    assigned = c_vec.withColumn(
        "cell_id", F.array_max(cell_scores("v")).getField("cell")
    )
    probes = (
        q_vec.withColumn(
            "probe",
            F.slice(F.reverse(F.array_sort(cell_scores("v"))), 1, n_probe),
        )
        .withColumn("cell_id", F.explode(F.col("probe.cell")))
        .select("query_id", F.col("v").alias("qv"), "cell_id")
    )

    cand = probes.join(assigned, on="cell_id").filter(
        F.col("query_id") != F.col("cand_id")
    )
    dot = F.expr(DOT.format(a="qv", b="v"))
    qn = F.sqrt(F.expr(DOT.format(a="qv", b="qv")))
    cn = F.sqrt(F.expr(DOT.format(a="v", b="v")))
    scored = cand.withColumn("cosine", F.round(dot / (qn * cn), 6)).select(
        "query_id", "cand_id", "cosine"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
