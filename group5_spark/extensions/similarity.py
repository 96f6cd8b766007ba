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

import math

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


def _ivf_c_vec(corpus: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return corpus.withColumn("v", _as_double(corpus, vec_col)).select(
        F.col(id_col).alias("cand_id"), "v"
    )


def ivf_sample_centroids(
    c_vec: DataFrame, n_cells: int, hash_fn: str = "xxhash64"
) -> list[tuple[int, list[float]]]:
    """Deterministic pseudo-random centroid sample over a
    ``(cand_id, v)`` frame: the ``n_cells`` vectors with the smallest
    ``hash(id)`` — id-distribution-independent (sparse/offset id
    spaces work), no iterative k-means, no training loop, one small
    collect job. Centroids are L2-normalized driver-side so the
    map-side dot product against them IS cosine assignment (row norm
    is constant across cells)."""
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
        raise ValueError("ivf: corpus is empty, cannot sample centroids")

    def _l2_normalize(vec: list[float]) -> list[float]:
        # math.sqrt (correctly-rounded IEEE) rather than ** 0.5: a SQL
        # oracle recomputing the centroids must land on the same bits.
        import math

        norm = math.sqrt(sum(x * x for x in vec))
        return [x / norm for x in vec] if norm > 0 else vec

    return [
        (int(r.cand_id), _l2_normalize([float(x) for x in r.v]))
        for r in sampled
    ]


def _cell_scores(
    centroids: list[tuple[int, list[float]]], v_col: str
) -> F.Column:
    """Array of (cosine-to-centroid, cell) structs from broadcast
    centroid literals; struct comparison orders by the first field, so
    ``array_max`` *is* the argmax — zero shuffle to assign."""
    entries = []
    for cid, cvec in centroids:
        cos = F.expr(
            DOT.format(a=v_col, b=f"array({', '.join(repr(x) for x in cvec)})")
        )
        entries.append(
            F.struct(cos.alias("score"), F.lit(cid).alias("cell"))
        )
    return F.array(*entries)


def ivf_assign_cells(
    c_vec: DataFrame, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """Map-only Voronoi assignment: ``(cand_id, v)`` → + ``cell_id``."""
    return c_vec.withColumn(
        "cell_id", F.array_max(_cell_scores(centroids, "v")).getField("cell")
    )


def ivf_probe_cells(
    q_vec: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_probe: int,
) -> DataFrame:
    """Per-query probe list: the ``n_probe`` nearest cells, exploded
    to ``(query_id, qv, cell_id)`` rows."""
    return (
        q_vec.withColumn(
            "probe",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(centroids, "v"))),
                1,
                n_probe,
            ),
        )
        .withColumn("cell_id", F.explode(F.col("probe.cell")))
        .select("query_id", F.col("v").alias("qv"), "cell_id")
    )


def ivf_rank(probes: DataFrame, assigned: DataFrame, k: int) -> DataFrame:
    """Probe ⋈ assigned on cell_id, exact cosine within cells, per-
    query top-k (rank-filter → WindowGroupLimit)."""
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

    Composition of :func:`ivf_sample_centroids` (deterministic hash
    sample, driver-side L2 normalize) → :func:`ivf_assign_cells`
    (map-only argmax over broadcast centroid literals) →
    :func:`ivf_probe_cells` → :func:`ivf_rank` (cell equi-join +
    top-k rank filter). At 100 TB each query touches
    ~``n_probe/n_cells`` of the corpus instead of all of it; persist
    the assigned layout (:func:`ivf_index_init`) so repeated query
    batches skip re-assignment entirely and file-prune their probes.
    """
    c_vec = _ivf_c_vec(corpus, id_col, vec_col)
    q_vec = queries.withColumn("v", _as_double(queries, vec_col)).select(
        F.col(id_col).alias("query_id"), "v"
    )
    centroids = ivf_sample_centroids(c_vec, n_cells, hash_fn)
    assigned = ivf_assign_cells(c_vec, centroids)
    probes = ivf_probe_cells(q_vec, centroids, n_probe)
    return ivf_rank(probes, assigned, k)


# --------------------------------------------------------------------
# Persisted IVF index maintenance (snapshot append job)
# --------------------------------------------------------------------
# The embedding twin of the persisted LSH index (extensions.dedup
# lsh_index_*): assignment is the expensive corpus-wide half of IVF,
# so persist it once and maintain it per-batch.
#
#   v1 = ivf_index_init(corpus, idx_path, n_cells=...)   # once
#   for each embedding batch:
#       hits = ivf_index_search(batch_queries, idx_path)
#       ivf_index_append(new_vectors, idx_path)          # O(batch)
#
# The index is a snapshot table of (cand_id, v, cell_id) PARTITIONED
# BY cell_id, so a probe is not just an equi-join — it is a
# manifest-level FILE PRUNE: searching n_probe of n_cells cells reads
# ~n_probe/n_cells of the index files and skips the rest without
# opening them. Centroids (the model) are pinned in the manifest note
# at init time; appends and searches read them from there, so a batch
# can never be assigned against drifted centroids. Centroids are
# deliberately FROZEN across appends — the FAISS/IVF convention:
# re-training cells is a new index (re-run init), not an append.

#: note key under which the index's parameters + centroids are pinned
_IVF_NOTE_KEY = "ivf_params"


def ivf_index_params(
    index_path: str,
    version: int | None = None,
) -> tuple[dict, list[tuple[int, list[float]]]]:
    """The parameters and frozen centroids pinned in the index's
    manifest note — metadata-only (one manifest read, no Spark). JSON
    round-trips floats exactly (shortest-repr), so the centroid
    literals rebuilt from the note are bit-identical to the ones the
    index was assigned with.

    ``version=`` reads THAT version's note: the centroids are part of
    the versioned index state, so a time-travel probe must use the
    centroids its files were assigned with — after a
    :func:`ivf_index_retrain`, the head's centroids describe only the
    head's assignment."""
    from group5_spark.medallion.snapshots import snapshot_manifest

    try:
        note = snapshot_manifest(index_path, version).get("note") or {}
    except FileNotFoundError:
        note = {}
    params = note.get(_IVF_NOTE_KEY)
    if not params:
        raise ValueError(
            f"{index_path} is not an IVF index table (no {_IVF_NOTE_KEY!r} "
            "note; was it created by ivf_index_init?)"
        )
    centroids = [
        (int(cid), [float(x) for x in vec])
        for cid, vec in note["centroids"]
    ]
    return params, centroids


def ivf_index_init(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    hash_fn: str = "xxhash64",
) -> int:
    """Bootstrap the persisted IVF index: sample + freeze centroids,
    assign every corpus vector, and commit the assigned layout
    partitioned by ``cell_id``. Returns the committed version.

    The one full-corpus assignment pass of the index's lifetime;
    every later batch pays :func:`ivf_index_append` instead.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    c_vec = _ivf_c_vec(corpus, id_col, vec_col)
    centroids = ivf_sample_centroids(c_vec, n_cells, hash_fn)
    # hash-cluster rows by cell before the partitioned write: without
    # it every input split writes a sliver into every cell directory,
    # and the file count (and probe-time manifest) grows as
    # splits × cells instead of ~cells
    assigned = ivf_assign_cells(c_vec, centroids).repartition("cell_id")
    return snapshot_commit(
        assigned,
        index_path,
        mode="overwrite",
        partition_by="cell_id",
        note={
            _IVF_NOTE_KEY: {
                "id_col": id_col,
                "vec_col": vec_col,
                "n_cells": n_cells,
                "hash_fn": hash_fn,
            },
            "centroids": centroids,
            "op": "ivf_index_init",
        },
    )


def ivf_index_append(
    new_df: DataFrame,
    index_path: str,
    extra_note: dict | None = None,
) -> int:
    """Assign one new embedding batch against the index's FROZEN
    centroids and append it — O(batch) incremental maintenance with
    snapshot atomicity. Returns the committed version.

    Re-appending an id adds duplicate candidate rows (they would each
    rank), mirroring the LSH index contract: dedupe upstream, use the
    exactly-once streaming wrapper, or compact. A blind append —
    concurrent batches serialize through the chain claim.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    params, centroids = ivf_index_params(index_path)
    c_vec = _ivf_c_vec(new_df, params["id_col"], params["vec_col"])
    assigned = ivf_assign_cells(c_vec, centroids).repartition("cell_id")
    return snapshot_commit(
        assigned,
        index_path,
        mode="append",
        partition_by="cell_id",
        note={
            _IVF_NOTE_KEY: params,
            "centroids": centroids,
            "op": "ivf_index_append",
            **(extra_note or {}),
        },
    )


def ivf_index_retrain(
    corpus: DataFrame,
    index_path: str,
    n_cells: int | None = None,
    expected_parent: int | None = None,
) -> int:
    """Re-train the index: sample FRESH centroids from the current
    corpus and commit a full re-assignment as a new overwrite version
    — the FAISS "train a new index" operation, expressed as one
    snapshot commit so readers never see a half-retrained index and
    the pre-retrain index stays probe-able by version (each version's
    note carries ITS centroids — :func:`ivf_index_params` is
    version-aware for exactly this reason).

    Run it when appended batches have drifted the data distribution
    away from the init-time sample, or to re-dial ``n_cells`` after
    corpus growth (the √N heuristic). ``n_cells=None`` keeps the
    current cell count; id/vec columns and hash mode always carry
    over. ``expected_parent`` guards against racing a concurrent
    append (SnapshotConflict → re-read, retrain against the fresh
    corpus). Returns the new version.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    params, _ = ivf_index_params(index_path)
    cells = n_cells if n_cells is not None else params["n_cells"]
    c_vec = _ivf_c_vec(corpus, params["id_col"], params["vec_col"])
    centroids = ivf_sample_centroids(c_vec, cells, params["hash_fn"])
    assigned = ivf_assign_cells(c_vec, centroids).repartition("cell_id")
    return snapshot_commit(
        assigned,
        index_path,
        mode="overwrite",
        partition_by="cell_id",
        expected_parent=expected_parent,
        note={
            _IVF_NOTE_KEY: {**params, "n_cells": cells},
            "centroids": centroids,
            "op": "ivf_index_retrain",
        },
    )


def ivf_index_search(
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_probe: int = 4,
    version: int | None = None,
) -> DataFrame:
    """Top-k search against the PERSISTED index: probe cells are
    chosen against the pinned centroids, and only the probed cells'
    FILES are read — ``snapshot_read`` prunes on the ``cell_id``
    partition stat, so ``n_probe/n_cells`` of the index bytes are
    touched per query batch (union of per-cell pruned reads; the
    probed-cell set is collected driver-side, bounded by
    ``n_cells``). ``version=`` searches the index as of an earlier
    corpus state. Same output contract as :func:`ivf_topk`.
    """
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    # pin the version ONCE: params/centroids and the per-cell reads
    # must describe the same index state — re-resolving the head per
    # read would let a concurrent ivf_index_retrain land in between,
    # probing NEW-centroid files with OLD-centroid cells (silently
    # wrong candidates)
    try:
        version = snapshot_manifest(index_path, version)["version"]
    except FileNotFoundError:
        raise ValueError(
            f"{index_path} is not an IVF index table (no snapshot "
            "manifest found)"
        ) from None
    params, centroids = ivf_index_params(index_path, version=version)
    spark = queries.sparkSession
    q_vec = queries.withColumn(
        "v", _as_double(queries, params["vec_col"])
    ).select(F.col(params["id_col"]).alias("query_id"), "v")
    # The probe frame is consumed twice: once to collect the probed-
    # cell set (a cell_id-only projection — Catalyst prunes the rest),
    # once in the rank join the caller materializes later. No persist:
    # a lazily-returned persisted frame could never be unpersisted by
    # this function (the CacheManager would hold its blocks for the
    # session lifetime), and a persist scoped to the collect alone
    # buys nothing — one action computes the pipeline exactly once
    # either way. Cost of the trade: the returned plan re-runs the
    # map-only centroid scoring once; deterministic (centroids are
    # frozen at this pinned version), zero extra index I/O.
    probes = ivf_probe_cells(q_vec, centroids, n_probe)
    probed = sorted(
        r["cell_id"]
        for r in probes.select("cell_id").distinct().collect()
    )
    if not probed:  # empty query batch: empty result, right schema
        assigned = snapshot_read(spark, index_path, version=version).limit(0)
        return ivf_rank(probes, assigned, k)
    parts = [
        snapshot_read(
            spark,
            index_path,
            version=version,
            # partition values are directory strings in manifest stats
            predicates=[("cell_id", "=", str(c))],
        )
        for c in probed
    ]
    assigned = parts[0]
    for p in parts[1:]:
        assigned = assigned.unionByName(p)
    return ivf_rank(probes, assigned, k)


# ---------------------------------------------------------------------------
# IVF-PQ: file-pruned probes over compressed codes + exact re-rank
# ---------------------------------------------------------------------------

_IVFPQ_NOTE_KEY = "ivfpq_params"


def ivf_pq_index_init(
    corpus: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    k_codes: int = 16,
    iters: int = 2,
    hash_fn: str = "xxhash64",
    residual: bool | str = False,
) -> int:
    """Build the persisted IVF-PQ index — the FAISS `IVFx,PQy,refine`
    composition over the snapshot layer: Voronoi cells for FILE-LEVEL
    pruning (a probe reads n_probe/n_cells of the index bytes), PQ
    codes for the in-cell scan (m small ints per vector instead of
    full-vector math), and the raw vector riding the same row for the
    exact re-rank of the short ADC candidate list. Returns the
    committed version.

    Metric consistency: every vector is projected to the UNIT sphere
    before centroid sampling, cell assignment, and PQ training — on
    unit vectors cosine and L2 order identically, so the cosine cell
    routing, the L2 ADC, and the cosine re-rank all rank the same way
    (zero-norm vectors are excluded; cosine is undefined for them).
    The stored row is ``(cand_id, v RAW, cn norm, pq_codes, cell_id)``
    — codes ~m bytes, the raw vector kept only for the re-rank read
    of the top-``rerank`` rows. Centroids AND codebooks pin in the
    manifest note (k·dim doubles — kilobytes at any corpus size), so
    a probe needs one manifest read, no model table.

    With ``residual=True`` the codes quantize the RESIDUAL
    ``vu − centroid[cell]`` instead of the unit vector itself — the
    classic FAISS IVF-ADC refinement: when cells capture real cluster
    structure, residuals are smaller than the vectors and the same
    (m, k) code budget spends its codewords on within-cell structure
    instead of re-describing the cell's position. Measured (pinned in
    ``tests/test_ivf_index.py``): on a clustered corpus — the
    realistic embedding shape — residual recall@10 beats direct at
    the same shortlist budget (0.45 vs 0.32 at rerank=8); on a
    near-ISOTROPIC corpus it is WORSE (high-dim vectors are nearly
    orthogonal to any centroid, so the residual is LARGER than the
    vector and the shared codebook spreads thinner) — which is why
    the mode is opt-in, default off. Queries build one LUT per PROBED
    cell against ``qu − centroid[cell]`` (n_probe × m × k literal
    folds, kilobytes of driver math) and the per-cell shortlists
    merge into one global top-``rerank`` by their mutually-comparable
    ADC distances, so the shortlist budget matches direct mode
    exactly; the exact re-rank is unchanged, and the exactness anchor
    (probe-all + rerank-all ≡ brute force) holds in both modes.

    So callers don't have to GUESS which mode fits their corpus, init
    measures it: the mean within-cell residual norm over the assigned
    corpus (unit vectors, so the mean vector norm is exactly 1 and
    the ratio is the residual norm itself — one aggregate, no second
    model). The manifest note records it under
    ``anisotropy: {residual_norm_ratio, recommended}`` — clustered
    corpora (cells capture structure, residuals SMALLER than the
    vectors) recommend ``residual``; near-isotropic corpora
    (residual ≈ √2 · vector — nearly orthogonal to any centroid)
    recommend ``direct``. The threshold is ``_ANISO_RESIDUAL_MAX`` —
    strictly below 1.0, i.e. residual only when the codes genuinely
    have less norm to describe.

    ``residual="auto"`` closes the loop: the chosen mode FOLLOWS that
    measurement (the aggregate lands before codebook training, so
    auto costs nothing extra), the note records the resolved bool
    under ``residual`` plus ``residual_mode: "auto"``, and
    :func:`ivf_pq_index_retrain` re-decides on every retrain of an
    auto index. Explicit True/False forces the mode as before.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    final, centroids, books, aniso, res, cached = _ivfpq_build(
        corpus, id_col, vec_col, n_cells, m, k_codes, iters, hash_fn,
        residual,
    )
    try:
        return snapshot_commit(
            final,
            index_path,
            mode="overwrite",
            partition_by="cell_id",
            note={
                _IVFPQ_NOTE_KEY: {
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "n_cells": n_cells,
                    "m": m,
                    "k_codes": k_codes,
                    "hash_fn": hash_fn,
                    "residual": res,
                    "residual_mode": (
                        "auto" if residual == "auto" else "explicit"
                    ),
                    "anisotropy": aniso,
                },
                "centroids": centroids,
                "codebooks": books,
                "op": "ivf_pq_index_init",
            },
        )
    finally:
        cached.unpersist()


#: recommend residual codes only when the mean within-cell residual
#: norm is meaningfully below the (unit) vector norm — residuals must
#: actually be smaller for the codebook to spend its codewords on
#: within-cell structure. Isotropic corpora sit near √2 ≈ 1.41.
_ANISO_RESIDUAL_MAX = 0.9


def _ivfpq_build(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    m: int,
    k_codes: int,
    iters: int,
    hash_fn: str,
    residual: bool | str,
):
    """The shared model-fit + encode pipeline behind
    :func:`ivf_pq_index_init` and :func:`ivf_pq_index_retrain`:
    unit-project, sample centroids, assign cells, measure the
    anisotropy ratio (one aggregate), resolve ``residual`` (a bool
    forces the code mode; ``"auto"`` follows the measurement's
    recommendation), train codebooks on the chosen code column,
    encode. Returns
    ``(final_df, centroids, codebooks, anisotropy, resolved_residual,
    cached)`` — the caller decides the commit mode/note and MUST
    unpersist ``cached`` after its commit action (the assigned frame is persisted here so
    the anisotropy aggregate, the Lloyd training passes, and the
    final encode all read one materialization of the
    unit-projection + cell-assignment pipeline instead of re-deriving
    it per action — default MEMORY_AND_DISK, so oversized corpora
    spill rather than recompute)."""
    from group5_spark.extensions.clustering import pq_encode, pq_train

    if not isinstance(residual, bool) and residual != "auto":
        raise ValueError(
            f"residual must be a bool or 'auto', got {residual!r}"
        )
    c_vec = _ivf_c_vec(corpus, id_col, vec_col)
    base = (
        c_vec.withColumn("cn", F.sqrt(F.expr(DOT.format(a="v", b="v"))))
        .where(F.col("cn") > 0)
        .withColumn("vu", F.transform(F.col("v"), lambda x: x / F.col("cn")))
    )
    unit = base.select("cand_id", F.col("vu").alias("v"))
    centroids = ivf_sample_centroids(unit, n_cells, hash_fn)
    assigned = base.withColumn(
        "cell_id", F.array_max(_cell_scores(centroids, "vu")).getField("cell")
    ).withColumn("vr", _ivfpq_residual_col(centroids)).persist()
    measured = assigned.agg(
        F.avg(F.sqrt(F.expr(DOT.format(a="vr", b="vr"))))
    ).first()[0]
    ratio = None if measured is None else round(float(measured), 4)
    aniso = {
        "residual_norm_ratio": ratio,
        "recommended": (
            "residual"
            if ratio is not None and ratio < _ANISO_RESIDUAL_MAX
            else "direct"
        ),
    }
    # residual="auto" FOLLOWS the measurement just taken (the
    # recommendation is computed before codebook training on purpose —
    # one aggregate over the already-persisted assignment, so auto
    # costs nothing extra): clustered corpora (residuals smaller than
    # the unit vectors) train on residuals, near-isotropic ones train
    # direct. Explicit True/False still forces the mode.
    res = (
        aniso["recommended"] == "residual"
        if residual == "auto"
        else bool(residual)
    )
    code_col = "vr" if res else "vu"
    books = pq_train(
        assigned, vec_col=code_col, id_col="cand_id",
        m=m, k=k_codes, iters=iters,
    )
    encoded = pq_encode(assigned, books, vec_col=code_col, out="pq_codes")
    final = encoded.select(
        "cand_id", "v", "cn", "pq_codes", "cell_id"
    ).repartition("cell_id")
    return final, centroids, books, aniso, res, assigned


def ivf_pq_index_retrain(
    corpus: DataFrame,
    index_path: str,
    n_cells: int | None = None,
    residual: bool | str | None = None,
    iters: int = 2,
    expected_parent: int | None = None,
) -> int:
    """Re-train the composed index: fresh centroid sample AND fresh
    codebooks from the current corpus, full re-assignment + re-encode
    committed as ONE overwrite version — the missing half of the
    frozen-model contract (:func:`ivf_pq_index_append` never
    retrains, so a corpus that doubles leaves probe cost and code
    quality pinned to the init-time model; this is the operation that
    un-pins them, exactly like :func:`ivf_index_retrain` for the
    plain IVF index).

    ``n_cells=None`` keeps the current cell count — pass the √N
    re-dial after corpus growth. ``residual=None`` keeps the current
    code MODE: an ``"auto"`` index re-decides from the fresh
    anisotropy measurement (the corpus may have gained or lost
    cluster structure since init), an explicit index keeps its forced
    bool; pass True/False/"auto" to switch modes at the natural
    boundary (codes are retrained anyway, and the fresh
    ``anisotropy`` measurement in the new note says which mode the
    CURRENT corpus wants). id/vec columns, the (m, k) code budget,
    and hash mode always carry over. ``expected_parent`` guards
    against racing a concurrent append (SnapshotConflict → re-read,
    retrain against the fresh corpus). Pre-retrain versions stay
    probe-able with their own model: every version's note carries ITS
    centroids and codebooks, and :func:`ivf_pq_topk` pins
    ``version=`` before reading either. Returns the new version."""
    from group5_spark.medallion.snapshots import snapshot_commit

    params, _, _ = ivf_pq_params(index_path)
    cells = n_cells if n_cells is not None else params["n_cells"]
    if residual is None:
        # inherit the MODE, not just the bool: an auto index re-decides
        # from the fresh measurement on every retrain (the corpus may
        # have gained or lost cluster structure); an explicit index
        # keeps its forced setting
        req: bool | str = (
            "auto"
            if params.get("residual_mode") == "auto"
            else bool(params.get("residual"))
        )
    else:
        req = residual
    final, centroids, books, aniso, res, cached = _ivfpq_build(
        corpus, params["id_col"], params["vec_col"], cells,
        params["m"], params["k_codes"], iters, params["hash_fn"], req,
    )
    try:
        return snapshot_commit(
            final,
            index_path,
            mode="overwrite",
            partition_by="cell_id",
            expected_parent=expected_parent,
            note={
                _IVFPQ_NOTE_KEY: {
                    **params,
                    "n_cells": cells,
                    "residual": res,
                    "residual_mode": (
                        "auto" if req == "auto" else "explicit"
                    ),
                    "anisotropy": aniso,
                },
                "centroids": centroids,
                "codebooks": books,
                "op": "ivf_pq_index_retrain",
            },
        )
    finally:
        cached.unpersist()


def _ivfpq_residual_col(
    centroids: list, vu_col: str = "vu"
) -> F.Column:
    """``vu − centroid[cell_id]`` with the centroid table inlined as a
    literal map — map-only, no join; n_cells × dim doubles of literals
    (kilobytes; the same payload the manifest note already carries)."""
    entries = ", ".join(
        f"{int(cell)}, array("
        + ", ".join(f"{float(x)!r}D" for x in cv)
        + ")"
        for cell, cv in centroids
    )
    return F.expr(
        f"zip_with({vu_col}, element_at(map({entries}), cell_id),"
        " (x, y) -> x - y)"
    )


def ivf_pq_params(
    index_path: str, version: int | None = None
) -> tuple[dict, list, list]:
    """``(params, centroids, codebooks)`` pinned in the index's
    manifest note — one manifest read, no Spark (JSON round-trips the
    float literals exactly, like :func:`ivf_index_params`)."""
    from group5_spark.medallion.snapshots import snapshot_manifest

    try:
        note = snapshot_manifest(index_path, version).get("note") or {}
    except FileNotFoundError:
        note = {}
    params = note.get(_IVFPQ_NOTE_KEY)
    if not params:
        raise ValueError(
            f"{index_path} is not an IVF-PQ index table (no "
            f"{_IVFPQ_NOTE_KEY!r} in the manifest note)"
        )
    return params, note["centroids"], note["codebooks"]


def ivf_pq_topk(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 64,
    exclude_id: int | None = None,
    version: int | None = None,
) -> DataFrame:
    """Top-k cosine search against the persisted IVF-PQ index, three
    prunes deep: (1) the ``n_probe`` nearest cells are chosen DRIVER-
    side against the pinned centroids (no Spark job — the centroid
    table is kilobytes) and only those cells' FILES are read
    (manifest partition pruning); (2) within the probed cells the
    scan is pq_topk's ADC over the PERSISTED codes — m ``element_at``
    lookups per row, no vector math — keeping the best ``rerank``
    candidates; (3) only those ``rerank`` rows pay the exact cosine
    (identical expression and rounding to :func:`cosine_topk`, so
    with ``n_probe=n_cells`` and ``rerank`` ≥ the corpus this is
    EXACTLY brute force — tested). Returns ``(cand_id, cosine,
    rank)``.

    At 100 TB: probe bytes ∝ n_probe/n_cells of m-byte codes, the
    re-rank reads ``rerank`` raw vectors, and the model (centroids +
    codebooks) travels as manifest metadata + expression literals.
    """
    import math as _math

    from group5_spark.extensions.clustering import pq_topk
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    version = snapshot_manifest(index_path, version)["version"]
    params, centroids, books = ivf_pq_params(index_path, version=version)
    # plain sequential sum, NOT fsum: the re-rank divides by qn and
    # Spark's aggregate() is a plain left fold — matching its rounding
    # keeps the 6-dp cosine bit-identical to cosine_topk's
    sq = 0.0
    for x in query_vec:
        sq += float(x) * float(x)
    qn = _math.sqrt(sq)
    if qn == 0:
        raise ValueError("cosine search is undefined for a zero vector")
    qu = [float(x) / qn for x in query_vec]
    scored = sorted(
        (
            (-_math.fsum(a * b for a, b in zip(qu, cv)), cell)
            for cell, cv in centroids
        ),
    )[: max(1, n_probe)]
    probed = sorted(cell for _, cell in scored)

    parts = [
        snapshot_read(
            spark,
            index_path,
            version=version,
            predicates=[("cell_id", "=", str(c))],
        )
        for c in probed
    ]
    if exclude_id is not None:
        parts = [p.where(F.col("cand_id") != exclude_id) for p in parts]
    pruned = parts[0]
    for p in parts[1:]:
        pruned = pruned.unionByName(p)

    if params.get("residual"):
        # residual codes are cell-relative: one LUT per PROBED cell
        # against (qu − centroid[cell]) — still n_probe × m × k
        # literal folds of driver math. Per-cell ADC distances all
        # approximate the same ||qu − x||², so the per-cell lists
        # merge into ONE global top-`rerank` shortlist: the shortlist
        # budget is identical to direct mode, mode changes only how
        # well the codes spend it.
        cents = {int(cell): cv for cell, cv in centroids}
        lists = []
        for c, part in zip(probed, parts):
            qr = [a - float(b) for a, b in zip(qu, cents[int(c)])]
            lists.append(
                pq_topk(
                    part, books, qr, id_col="cand_id", k_top=rerank,
                    codes_col="pq_codes",
                ).select("cand_id", "pq_dist")
            )
        merged = lists[0]
        for p in lists[1:]:
            merged = merged.unionByName(p)
        cand = (
            merged.orderBy("pq_dist", "cand_id")
            .limit(rerank)
            .select("cand_id")
        )
    else:
        cand = pq_topk(
            pruned, books, qu, id_col="cand_id", k_top=rerank,
            codes_col="pq_codes",
        )
    qarr = "array(" + ", ".join(f"{float(x)!r}D" for x in query_vec) + ")"
    cos = F.round(
        F.expr(DOT.format(a=qarr, b="v")) / (F.lit(qn) * F.col("cn")), 6
    )
    w = Window.orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        pruned.join(F.broadcast(cand.select("cand_id")), "cand_id")
        .withColumn("cosine", cos)
        .select("cand_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_search(
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 64,
    exclude_self: bool = True,
    version: int | None = None,
) -> DataFrame:
    """BATCH top-k search against the persisted IVF-PQ index — the
    composed-index sibling of :func:`ivf_index_search` (a production
    reranker probes thousands of queries, not one driver-side
    vector). Same three prunes as :func:`ivf_pq_topk`, expressed for
    a query DataFrame:

    1. **cells**: each query routes to its ``n_probe`` nearest cells
       map-side against the pinned centroid literals; the UNION of
       probed cells (collected driver-side, bounded by ``n_cells``)
       selects which index FILES are read via manifest partition
       pruning.
    2. **codes**: the per-(query, cell) ADC lookup table — m×k
       rounded subspace distances, residual-aware (``qu −
       centroid[cell]`` when the index carries residual codes) — is
       computed ON SPARK per probe row (|queries| × n_probe rows,
       kilobytes) with the same ``_slice_dist_sql`` folds as
       :func:`clustering.pq_topk`'s driver LUT, then BROADCAST into
       the cell-pruned scan: per candidate the distance is m
       ``element_at`` picks over the PERSISTED codes, and the
       per-query top-``rerank`` shortlist is a rank filter
       (WindowGroupLimit — no global sort).
    3. **re-rank**: only shortlist rows pay the exact cosine (the
       raw vector and norm ride the index row — no second read), with
       :func:`cosine_topk`'s exact expression and rounding, so with
       ``n_probe = n_cells`` and ``rerank`` ≥ the corpus the batch
       search IS ``cosine_topk`` bit-for-bit (tested, both code
       modes) — every approximation is the (n_probe, rerank) dials.

    Zero-norm query vectors are excluded (cosine undefined — the
    index-build rule). ``exclude_self=False`` keeps a query's own
    index row (by id) in its results. Returns ``(query_id, cand_id,
    cosine, rank)``.

    At 100 TB: probe bytes ∝ |probed cells|/n_cells of m-byte codes,
    the ADC join broadcasts the (queries × n_probe)-row LUT frame —
    never shuffles the index — and the re-rank touches
    ``rerank`` rows per query."""
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    # pin the version ONCE (see ivf_index_search: a concurrent retrain
    # must not split params and file reads across index states)
    try:
        version = snapshot_manifest(index_path, version)["version"]
    except FileNotFoundError:
        raise ValueError(
            f"{index_path} is not an IVF-PQ index table (no snapshot "
            "manifest found)"
        ) from None
    params, centroids, books = ivf_pq_params(index_path, version=version)
    from group5_spark.extensions.clustering import _slice_dist_sql

    m = len(books)
    d = len(books[0][0])
    spark = queries.sparkSession
    q = (
        queries.withColumn("qv", _as_double(queries, params["vec_col"]))
        .select(F.col(params["id_col"]).alias("query_id"), "qv")
        .withColumn("qn", F.sqrt(F.expr(DOT.format(a="qv", b="qv"))))
        .where(F.col("qn") > 0)
        .withColumn("qu", F.transform(F.col("qv"), lambda x: x / F.col("qn")))
    )
    probes = (
        q.withColumn(
            "probe",
            F.slice(
                F.reverse(F.array_sort(_cell_scores(centroids, "qu"))),
                1,
                max(1, n_probe),
            ),
        )
        .withColumn("cell_id", F.explode(F.col("probe.cell")))
        .select("query_id", "qv", "qn", "qu", "cell_id")
    )
    equ = (
        _ivfpq_residual_col(centroids, "qu")
        if params.get("residual")
        else F.col("qu")
    )
    lut_sql = "array(" + ", ".join(
        "array(" + ", ".join(
            _slice_dist_sql("equ", cw, s * d) for cw in book
        ) + ")"
        for s, book in enumerate(books)
    ) + ")"
    # collect the probed-cell set from the ROUTE projection, before
    # the m×k LUT expression attaches — the collect then pays only the
    # centroid scoring, never the LUT folds, and no persist is needed
    # (a persist scoped to one action buys nothing, and one held past
    # the return could never be unpersisted here — see
    # ivf_index_search). The returned plan re-runs the map-only
    # routing once when consumed; deterministic at this pinned
    # version, zero extra index I/O.
    probed = sorted(
        r["cell_id"]
        for r in probes.select("cell_id").distinct().collect()
    )
    probes = (
        probes.withColumn("equ", equ)
        .withColumn("lut", F.expr(lut_sql))
        .drop("equ", "qu")
    )
    if not probed:  # empty (or all-zero-norm) batch: right schema
        rows = snapshot_read(spark, index_path, version=version).limit(0)
    else:
        parts = [
            snapshot_read(
                spark,
                index_path,
                version=version,
                predicates=[("cell_id", "=", str(c))],
            )
            for c in probed
        ]
        rows = parts[0]
        for p in parts[1:]:
            rows = rows.unionByName(p)

    cand = rows.join(F.broadcast(probes), on="cell_id")
    if exclude_self:
        cand = cand.filter(F.col("query_id") != F.col("cand_id"))
    # same left-to-right addition chain and rounding as pq_topk's ADC
    terms = " + ".join(
        f"element_at(element_at(lut, {s + 1}),"
        f" element_at(pq_codes, {s + 1}) + 1)"
        for s in range(m)
    )
    w_pq = Window.partitionBy("query_id").orderBy("pq_dist", "cand_id")
    shortlist = (
        cand.withColumn("pq_dist", F.expr(f"round({terms}, 6)"))
        .withColumn("_sr", F.row_number().over(w_pq))
        .filter(F.col("_sr") <= rerank)
    )
    cosine = F.round(
        F.expr(DOT.format(a="qv", b="v")) / (F.col("qn") * F.col("cn")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id")
    )
    return (
        shortlist.withColumn("cosine", cosine)
        .select("query_id", "cand_id", "cosine")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_index_append(
    new_df: DataFrame,
    index_path: str,
    extra_note: dict | None = None,
) -> int:
    """Assign + encode one new embedding batch against the index's
    FROZEN model (centroids and codebooks both pin at init — appends
    never retrain, so old codes stay comparable) and append it —
    O(batch) incremental maintenance with snapshot atomicity, the
    same contract as :func:`ivf_index_append` and the LSH index.
    Zero-norm vectors are excluded (the init-time rule). Returns the
    committed version."""
    from group5_spark.extensions.clustering import pq_encode
    from group5_spark.medallion.snapshots import snapshot_commit

    params, centroids, books = ivf_pq_params(index_path)
    c_vec = _ivf_c_vec(new_df, params["id_col"], params["vec_col"])
    base = (
        c_vec.withColumn("cn", F.sqrt(F.expr(DOT.format(a="v", b="v"))))
        .where(F.col("cn") > 0)
        .withColumn("vu", F.transform(F.col("v"), lambda x: x / F.col("cn")))
    )
    assigned = base.withColumn(
        "cell_id", F.array_max(_cell_scores(centroids, "vu")).getField("cell")
    )
    code_col = "vu"
    if params.get("residual"):
        assigned = assigned.withColumn("vr", _ivfpq_residual_col(centroids))
        code_col = "vr"
    encoded = pq_encode(assigned, books, vec_col=code_col, out="pq_codes")
    final = encoded.select(
        "cand_id", "v", "cn", "pq_codes", "cell_id"
    ).repartition("cell_id")
    return snapshot_commit(
        final,
        index_path,
        mode="append",
        partition_by="cell_id",
        note={
            _IVFPQ_NOTE_KEY: params,
            "centroids": centroids,
            "codebooks": books,
            "op": "ivf_pq_index_append",
            **(extra_note or {}),
        },
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cid",
    keep: str = "central",
) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al., 2023,
    arXiv:2303.09540): paraphrases and re-encoded near-copies that no
    lexical dedup (exact hash, MinHash, containment) can see — the
    embeddings are near-parallel even when the token streams share
    nothing. Every vector is assigned to its nearest centroid cell
    (cosine argmax, ties toward the smaller centroid id), and WITHIN
    each cell a vector is doomed when some τ-cosine neighbor sits
    strictly closer to the centroid (ties toward the smaller id) —
    the domination election, chain semantics like
    :func:`dedup.drop_contained`: a doomed vector can still doom its
    own neighbors, so mutually-duplicate groups keep exactly their
    centroid-closest member. NOTE the DEFAULT keep-rule deliberately
    DEVIATES from the paper's: Abbas et al. keep the group member
    with LOW centroid similarity (preserving atypical examples);
    ``keep="central"`` keeps the centroid-CLOSEST member because
    every other election in this engine
    (:func:`dedup.drop_contained`'s size/id rule, the LSH family's id
    rule) keeps the most-canonical representative, and a
    representative that later anchors an IVF cell or a cluster medoid
    should be central, not atypical. ``keep="atypical"`` is the
    paper's policy verbatim — the domination comparator flips
    (a τ-neighbor strictly FARTHER from the centroid dooms you), ties
    still break toward the smaller id, so either mode retires exactly
    one of a mutually-duplicate pair. Returns the SURVIVORS as
    ``(id_col, cell_id, cent_sim)`` with ``cent_sim`` rounded to 6 dp
    — the same
    cross-engine determinism contract as :func:`cosine_topk` (raw
    doubles differ between engines in the last bits; 6-dp rounding
    BEFORE the argmax and every domination comparison makes the
    election replay exactly, with residual ties broken by id).

    Scale shape — the published trick and the whole point of
    clustering first: the τ-pair join runs PER CELL (one equi-join on
    ``cell_id``), so the quadratic is O(Σ|cell|²) ≈ O(n²/k) instead
    of O(n²), and the assignment pass keeps the N·k scoring work
    where the rows live (:func:`_semantic_assign` — broadcast
    centroids + map-side `max(struct(sim, −cid))`: the only shuffle
    carries N assigned rows, independent of k).
    Cells bound the join the same way LSH bands bound
    :func:`dedup.minhash_lsh_pairs`.

    THE k DIAL, priced (``SCALE_TRAINOPS.json:fixed_corpus_semdedup``,
    measured 1×–64×): fixed k lets the pair join grow as N²/k —
    cheapest per run today, quadratic debt tomorrow; k ∝ √N balances
    both terms at N^1.5; the PUBLISHED SemDeDup operating point k ∝ N
    holds per-cell size constant, making the pair join LINEAR — but a
    per-run assignment then pays N·k ∝ N², so at 100 TB you take the
    k ∝ N cell geometry from a PERSISTED index instead:
    :func:`semantic_dedup_ivf` elects over the IVF index's stored
    cells (the ladder's ``ivf_reuse`` rung — assignment amortized to
    the index build the ANN serving path already needed, per-run cost
    just the linear join). Production centroids come from
    :func:`extensions.clustering.kmeans` (or the persisted IVF
    index's frozen cells — the assignment here IS
    :func:`ivf_assign_cells` semantics), while the oracle-gated query
    pins semantics with deterministic seed centroids.
    """
    assign = _semantic_assign(corpus, centroids, id_col, vec_col, cent_id_col)
    return _semantic_election(assign, threshold, id_col, keep)


def _semantic_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id_col: str = "cid",
) -> DataFrame:
    """Centroid assignment behind :func:`semantic_dedup`, shaped so
    the N·k scoring work NEVER shuffles: broadcast the k centroid
    rows against the corpus (the N·k scored rows stay in the corpus
    row's partition), then ``groupBy(id).agg(max(struct(sim, −cid)))``
    — struct max orders by similarity then −cid, so the aggregate IS
    "highest similarity, ties toward the smaller centroid id", and
    hash aggregation collapses the k rows per vector MAP-SIDE: the
    only shuffle carries N already-assigned rows, independent of k.
    (Two rejected shapes, kept as plan rationale: a row_number window
    over the scored join shuffles all N·k rows WITH their vectors —
    ~300 GB at the ladder's 64× scale; k inline array literals à la
    `_cell_scores` blow up codegen past a few dozen centroids.)
    Similarity rounds to 6 dp BEFORE the argmax so the assignment
    replays against an oracle computing the same cosine under its own
    float arithmetic. Returns ``(_vid, _v, _n, cell_id, _cs)``."""
    cents = centroids.select(
        (-F.col(cent_id_col).cast("long")).alias("_negcid"),
        _as_double(centroids, vec_col).alias("_cv"),
    ).withColumn("_cn", F.sqrt(F.expr(DOT.format(a="_cv", b="_cv"))))
    vecs = corpus.select(
        F.col(id_col).alias("_vid"),
        _as_double(corpus, vec_col).alias("_v"),
    ).withColumn("_n", F.sqrt(F.expr(DOT.format(a="_v", b="_v"))))
    sim = F.round(
        F.expr(DOT.format(a="_v", b="_cv"))
        / (F.col("_n") * F.col("_cn")),
        6,
    )
    best = (
        vecs.join(F.broadcast(cents))
        .select(
            "_vid", "_v", "_n",
            F.struct(sim.alias("_sim"), F.col("_negcid")).alias("_sc"),
        )
        .groupBy("_vid")
        .agg(
            F.max("_sc").alias("_best"),
            F.first("_v").alias("_v"),
            F.first("_n").alias("_n"),
        )
    )
    return best.select(
        "_vid", "_v", "_n",
        (-F.col("_best._negcid")).cast("long").alias("cell_id"),
        F.col("_best._sim").alias("_cs"),
    )


def _semantic_election(
    assign: DataFrame, threshold: float, id_col: str,
    keep: str = "central",
) -> DataFrame:
    """The shared within-cell domination election behind
    :func:`semantic_dedup` and :func:`semantic_dedup_ivf` — one
    pipeline, not two hand-synced copies. ``assign`` carries one row
    per vector: ``(_vid, _v, _n, cell_id, _cs)`` with ``_cs`` already
    rounded to the cross-engine comparison precision. A vector is
    doomed when some τ-cosine cell-mate sits strictly closer to the
    centroid (``keep="central"``) or strictly farther
    (``keep="atypical"`` — the SemDeDup paper's rule), ties toward
    the smaller id either way; survivors return as
    ``(id_col, cell_id, cent_sim)``."""
    if keep not in ("central", "atypical"):
        raise ValueError(
            f"keep must be 'central' or 'atypical', got {keep!r}"
        )
    a = assign.select(
        F.col("_vid").alias("id_a"), F.col("_v").alias("va"),
        F.col("_n").alias("na"), "cell_id",
        F.col("_cs").alias("csa"),
    )
    b = assign.select(
        F.col("_vid").alias("id_b"), F.col("_v").alias("vb"),
        F.col("_n").alias("nb"), "cell_id",
        F.col("_cs").alias("csb"),
    )
    # 6-dp rounding BEFORE the τ comparison — the same cross-engine
    # determinism contract as the centroid similarity (_cs): a pair
    # within float error of τ must land on the same side of the
    # threshold in Spark, in the DuckDB oracle, and across Spark
    # versions/plans, or the survivor set flips nondeterministically
    pair_cos = F.round(
        F.expr(DOT.format(a="va", b="vb")) / (F.col("na") * F.col("nb")),
        6,
    )
    dominates = (
        F.col("csb") > F.col("csa")
        if keep == "central"
        else F.col("csb") < F.col("csa")
    )
    doomed = (
        a.join(b, on="cell_id")
        .where(F.col("id_a") != F.col("id_b"))
        .where(pair_cos >= F.lit(float(threshold)))
        .where(
            dominates
            | ((F.col("csb") == F.col("csa")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias("_vid"))
        .distinct()
    )
    return (
        assign.join(doomed, on="_vid", how="left_anti")
        .select(
            F.col("_vid").alias(id_col),
            "cell_id",
            F.round("_cs", 6).alias("cent_sim"),
        )
    )


def semantic_dedup_ivf(
    spark,
    index_path: str,
    threshold: float = 0.95,
    keep: str = "central",
) -> DataFrame:
    """:func:`semantic_dedup` over a PERSISTED IVF index's own cells
    (`ivf_index_init`/`ivf_index_append` output) — the "reuse the
    index" deployment the ladder's exponents point at: the N·k
    assignment pass is already paid and stored as the index's
    ``cell_id`` column, so this costs ONE cosine per row (against the
    row's own cell centroid, for the domination ranking) plus the
    linear within-cell pair join. Returns survivors as the index's
    ``(id_col, cell_id, cent_sim)``.

    The index's assignment argmaxes raw doubles
    (:func:`ivf_assign_cells`) where :func:`semantic_dedup` argmaxes
    6-dp-rounded ones, so a vector lying within 1e-6 of equidistant
    between two centroids may sit in a different cell here — the
    election within each cell is identical, ``keep=`` dial included
    (see :func:`semantic_dedup` for the central-vs-atypical policy
    note)."""
    from group5_spark.medallion.snapshots import snapshot_read

    params, centroids = ivf_index_params(index_path)
    idx = snapshot_read(spark, index_path)
    cents = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cell_id long, _cv array<double>",
    ).withColumn("_cn", F.sqrt(F.expr(DOT.format(a="_cv", b="_cv"))))
    dot = F.expr(DOT.format(a="_v", b="_cv"))
    assign = (
        idx.select(
            F.col(params["id_col"]).alias("_vid")
            if params["id_col"] in idx.columns
            else F.col("cand_id").alias("_vid"),
            F.col("v").alias("_v"),
            "cell_id",
        )
        .withColumn("_n", F.sqrt(F.expr(DOT.format(a="_v", b="_v"))))
        .join(F.broadcast(cents), on="cell_id")
        .withColumn("_cs", F.round(dot / (F.col("_n") * F.col("_cn")), 6))
        .drop("_cv", "_cn")
    )
    return _semantic_election(assign, threshold, params["id_col"], keep)


def semantic_dedup_against(
    new_df: DataFrame,
    index_path: str,
    threshold: float = 0.95,
    keep: str = "central",
    on_overlap: str = "error",
    assume_unique_ids: bool = False,
    version: int | None = None,
) -> DataFrame:
    """The INCREMENTAL semantic-dedup ACTION (the embedding-space twin
    of :func:`dedup.drop_contained_against`): which rows of a new
    embedding batch SURVIVE ingestion against a corpus whose
    assignment already lives in a persisted IVF index. A batch vector
    drops when some τ-cosine neighbor in its Voronoi cell is an
    ALREADY-INDEXED vector (ingest-order precedence — the resident
    copy is the vector of record, whatever its centrality; an append
    stream never retires residents, so the ``keep=`` dial governs
    only batch-mate elections) or a BATCH-MATE that dominates under
    the ``keep`` rule (:func:`_semantic_election`'s comparator —
    centroid-closer for ``"central"``, centroid-farther for
    ``"atypical"``, ties toward the smaller id — evaluated against
    the batch AS FED: a doomed batch-mate still dooms its own
    τ-neighbors, the same chain semantics as the containment
    election). Returns the surviving rows of ``new_df`` unchanged.
    For a GLOBAL re-election that can retire residents (what this
    incremental path deliberately never does), run
    :func:`semantic_dedup_ivf` over the head index offline and purge
    the doomed ids via ``medallion.maintenance.snapshot_purge_ids`` —
    the same offline/online split as ``containment_compact`` vs
    ``stream_containment_dedup``.

    Batch rows are assigned with the INDEX's own semantics
    (:func:`ivf_assign_cells` against the pinned frozen centroids —
    raw-double argmax, exactly what ``ivf_index_append`` will store
    for the survivors), so a survivor's later index row sits in the
    cell this election tested it in. The version is pinned ONCE
    (params, centroids, and the per-cell reads must describe the same
    index state — a concurrent ``ivf_index_retrain`` landing between
    reads would mix centroid generations).

    Per-batch cost at 100 TB: the batch's distinct cell set is
    collected driver-side (bounded by ``n_cells`` — the same small
    action :func:`ivf_index_search` pays for its probe set) and only
    THOSE cells' index files are read (``snapshot_read`` prunes on
    the ``cell_id`` partition stat), so the resident side of the
    τ-join scans ``|batch cells| / n_cells`` of the index bytes, not
    the corpus; the batch-mate election is the cell-bounded pair join
    :func:`semantic_dedup` already prices. Index vectors are never
    re-scored against centroids here — residency alone dooms
    (ingest precedence), so the resident side reads ``(id, v,
    cell_id)`` and pays one dot product per τ-candidate pair.

    ``on_overlap``: ``"error"`` (default) fails loudly on a batch id
    already in the index (an EAGER check — one column-pruned id scan
    of the WHOLE index, since ids are not cell-aligned);
    ``"drop"`` applies first-ingest-wins END-TO-END —
    the overlapping batch row is neither elected nor returned;
    ``"unchecked"`` skips the check for callers that established
    disjointness out-of-band (an actual overlap makes a row its own
    τ-neighbor and silently dooms it). Batch-internal id collisions
    resolve HERE via :func:`dedup.dedup_batch_ids` (one
    deterministic row per id — the vector column is orderable, so
    replays pick the same row) unless ``assume_unique_ids=True``.
    """
    from group5_spark.extensions.dedup import dedup_batch_ids
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    if on_overlap not in ("error", "drop", "unchecked"):
        raise ValueError(
            f"on_overlap must be 'error', 'drop', or 'unchecked', "
            f"got {on_overlap!r}"
        )
    if keep not in ("central", "atypical"):
        raise ValueError(
            f"keep must be 'central' or 'atypical', got {keep!r}"
        )
    spark = new_df.sparkSession
    version = snapshot_manifest(index_path, version)["version"]
    params, centroids = ivf_index_params(index_path, version=version)
    id_col, vec_col = params["id_col"], params["vec_col"]
    if not assume_unique_ids:
        new_df = dedup_batch_ids(new_df, id_col, vec_col)
    index_ids = snapshot_read(spark, index_path, version=version).select(
        F.col("cand_id").alias(id_col)
    )
    if on_overlap == "error":
        n = new_df.join(index_ids, on=id_col, how="left_semi").count()
        if n:
            raise ValueError(
                f"semantic_dedup_against: {n} batch id(s) already in "
                f"the index at {index_path} — pass on_overlap='drop' "
                f"for first-ingest-wins re-feeds, or 'unchecked' if "
                f"disjointness is guaranteed out-of-band"
            )
    elif on_overlap == "drop":
        new_df = new_df.join(index_ids, on=id_col, how="left_anti")
    cents = spark.createDataFrame(
        [(cid, [float(x) for x in vec]) for cid, vec in centroids],
        "cell_id long, _cv array<double>",
    ).withColumn("_cn", F.sqrt(F.expr(DOT.format(a="_cv", b="_cv"))))
    assign = (
        ivf_assign_cells(_ivf_c_vec(new_df, id_col, vec_col), centroids)
        .select(
            F.col("cand_id").alias("_vid"),
            F.col("v").alias("_v"),
            "cell_id",
        )
        .withColumn("_n", F.sqrt(F.expr(DOT.format(a="_v", b="_v"))))
        .join(F.broadcast(cents), on="cell_id")
        .withColumn(
            "_cs",
            F.round(
                F.expr(DOT.format(a="_v", b="_cv"))
                / (F.col("_n") * F.col("_cn")),
                6,
            ),
        )
        .drop("_cv", "_cn")
    )
    touched = sorted(
        r["cell_id"]
        for r in assign.select("cell_id").distinct().collect()
    )
    if not touched:  # empty batch: nothing to elect, nothing survives
        return new_df
    parts = [
        snapshot_read(
            spark,
            index_path,
            version=version,
            predicates=[("cell_id", "=", str(c))],
        )
        for c in touched
    ]
    resident = parts[0]
    for p in parts[1:]:
        resident = resident.unionByName(p)
    resident = resident.select(
        F.col("v").alias("_iv"), "cell_id"
    ).withColumn("_in", F.sqrt(F.expr(DOT.format(a="_iv", b="_iv"))))
    pair_cos = F.round(
        F.expr(DOT.format(a="_v", b="_iv")) / (F.col("_n") * F.col("_in")),
        6,
    )
    doomed_by_resident = (
        assign.join(resident, on="cell_id")
        .where(pair_cos >= F.lit(float(threshold)))
        .select(F.col("_vid").alias(id_col))
        .distinct()
    )
    mates_ok = _semantic_election(assign, threshold, id_col, keep)
    surviving = mates_ok.select(id_col).join(
        doomed_by_resident, on=id_col, how="left_anti"
    )
    return new_df.join(surviving, on=id_col, how="left_semi")
