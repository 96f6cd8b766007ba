"""Persisted IVF ANN index lifecycle (extensions.similarity
ivf_index_*): bootstrap → frozen-centroid batch append → file-pruned
probe, as a snapshot-table maintenance job — the embedding twin of the
persisted LSH index.

Claims under test: a probe against the persisted index returns
EXACTLY what the in-memory IVF computes with the same centroids;
appends assign against the frozen centroids (never resample); and a
probe physically reads only the probed cells' files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from group5_spark.catalog import load_table
from group5_spark.extensions import similarity as S
from group5_spark.medallion.snapshots import snapshot_commit, snapshot_manifest


def _rows(df):
    return {
        (r.query_id, r.cand_id, r.cosine, r.rank) for r in df.collect()
    }


def test_index_search_equals_in_memory_ivf(spark, sf_dir, tmp_path):
    """init + search must reproduce ivf_topk bit-for-bit: the same
    deterministic centroid sample, assignment, probes, and ranking —
    persistence changes where the assignment lives, not the answer."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(8)
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=16)

    via_index = _rows(S.ivf_index_search(q, idx, k=10, n_probe=6))
    in_memory = _rows(S.ivf_topk(emb, q, k=10, n_cells=16, n_probe=6))
    assert via_index == in_memory and via_index


def test_append_assigns_against_frozen_centroids(spark, sf_dir, tmp_path):
    """Appending a batch must use the centroids pinned at init (the
    FAISS convention: cells are frozen, retraining is a new index) —
    searching the grown index equals assigning the full corpus with
    the INDEX's centroids, not with centroids resampled from the
    union."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.filter(F.col("vec_id") % 5 < 4)
    batch1 = emb.filter(F.col("vec_id") % 5 == 4)
    q = emb.limit(6)
    idx = str(tmp_path / "ivfidx")
    v1 = S.ivf_index_init(corpus0, idx, n_cells=8)
    v2 = S.ivf_index_append(batch1, idx)
    assert (v1, v2) == (1, 2)

    _, centroids = S.ivf_index_params(idx)
    q_vec = q.withColumn(
        "v", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ).select(F.col("vec_id").alias("query_id"), "v")
    full_vec = emb.withColumn(
        "v", F.transform(F.col("embedding"), lambda x: x.cast("double"))
    ).select(F.col("vec_id").alias("cand_id"), "v")
    manual = S.ivf_rank(
        S.ivf_probe_cells(q_vec, centroids, 4),
        S.ivf_assign_cells(full_vec, centroids),
        10,
    )
    assert _rows(S.ivf_index_search(q, idx, k=10, n_probe=4)) == _rows(manual)


def test_probe_reads_only_probed_cells_files(spark, sf_dir, tmp_path):
    """The scale claim made physical: a 2-of-8-cell probe's scan
    touches a strict subset of the index's data files — manifest
    partition pruning, not a full read followed by a filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=8)
    out = S.ivf_index_search(emb.limit(1), idx, k=5, n_probe=2)
    total = len(snapshot_manifest(idx)["files"])
    touched = {f for f in out.inputFiles() if "ivfidx" in f}
    assert 0 < len(touched) < total


def test_params_pinned_and_non_index_rejected(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=8, hash_fn="xxhash64")
    params, centroids = S.ivf_index_params(idx)
    assert params == {
        "id_col": "vec_id", "vec_col": "embedding",
        "n_cells": 8, "hash_fn": "xxhash64",
    }
    assert len(centroids) == 8 and all(len(v) > 0 for _, v in centroids)

    plain = str(tmp_path / "not_an_index")
    snapshot_commit(emb.limit(3), plain, mode="overwrite")
    with pytest.raises(ValueError, match="not an IVF index"):
        S.ivf_index_search(emb.limit(1), plain)
    with pytest.raises(ValueError, match="not an IVF index"):
        S.ivf_index_append(emb.limit(1), plain)


def test_stream_ivf_index_maintenance_exactly_once(spark, sf_dir, tmp_path):
    """An embedding stream maintains the index: one cell-partitioned
    snapshot append per micro-batch against the frozen centroids, and
    a checkpoint-replayed batch is note-deduped — re-running the
    drained stream adds no versions."""
    import json

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from group5_spark.medallion.snapshots import snapshot_versions
    from group5_spark.streaming import jobs

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.filter(F.col("vec_id") % 5 < 4)
    streamed = emb.filter(F.col("vec_id") % 5 == 4).limit(5)
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(corpus0, idx, n_cells=8)

    src = tmp_path / "src"
    src.mkdir()
    streamed_rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in streamed.collect()
    ]
    with open(src / "a.json", "w") as f:
        for vid, vec in streamed_rows:
            f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_ivf_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions_after = len(snapshot_versions(idx))
    assert versions_after == 2  # init + one micro-batch append

    # the streamed vectors are now probe candidates: searching for a
    # streamed vector's own nearest neighbors must include it among
    # the index rows (self-match excluded, so probe a DIFFERENT query)
    streamed_ids = {vid for vid, _ in streamed_rows}
    out = S.ivf_index_search(emb.limit(10), idx, k=50, n_probe=8)
    assert {r.cand_id for r in out.collect()} & streamed_ids

    # replay with the same checkpoint: nothing new, no phantom version
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_ivf_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(snapshot_versions(idx)) == versions_after


def test_stream_ivf_index_maintenance_denylist(spark, sf_dir, tmp_path):
    """Round-12 VERDICT #2, embedding surfaces: a purged vector
    re-fed through IVF (and IVF-PQ) index maintenance would re-enter
    the cell files the purge just rewrote — with denylist_path the
    erased vec_id stays out of BOTH index shapes while fresh vectors
    land."""
    import json

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from group5_spark.medallion.maintenance import snapshot_purge_ids
    from group5_spark.medallion.snapshots import snapshot_read
    from group5_spark.streaming import jobs

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.filter(F.col("vec_id") % 5 < 4)
    ivf = str(tmp_path / "ivfidx")
    ivfpq = str(tmp_path / "ivfpqidx")
    deny = str(tmp_path / "deny")
    S.ivf_index_init(corpus0, ivf, n_cells=8)
    S.ivf_pq_index_init(corpus0, ivfpq, n_cells=8, m=4, k_codes=8)

    rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in emb.filter(F.col("vec_id") % 5 == 4).limit(3).collect()
    ]
    victim, fresh = rows[0][0], {vid for vid, _ in rows[1:]}
    # erase the victim from both indexes; the denylist remembers it
    snapshot_purge_ids(
        spark, [victim], [(ivf, "cand_id"), (ivfpq, "cand_id")],
        missing_ok=True, denylist_path=deny,
    )

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for vid, vec in rows:  # re-feeds the purged victim + fresh
            f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    for path, maint, ck in (
        (ivf, jobs.stream_ivf_index_maintenance, "ck1"),
        (ivfpq, jobs.stream_ivf_pq_index_maintenance, "ck2"),
    ):
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            maint(
                stream, path, str(tmp_path / ck), denylist_path=deny
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        ids = {r["cand_id"] for r in snapshot_read(spark, path).collect()}
        assert victim not in ids and fresh <= ids


def test_stream_ivf_pq_index_maintenance_exactly_once(
    spark, sf_dir, tmp_path
):
    """The composed-index mirror of the plain-IVF stream test: each
    micro-batch is assigned AND PQ-encoded against the frozen model,
    lands as one cell-partitioned append, becomes a probe candidate
    through the full three-prune serving path, and a checkpoint
    replay of the drained stream adds no versions."""
    import json

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    from group5_spark.medallion.snapshots import snapshot_versions
    from group5_spark.streaming import jobs

    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.filter(F.col("vec_id") % 5 < 4)
    streamed = emb.filter(F.col("vec_id") % 5 == 4).limit(5)
    idx = str(tmp_path / "ivfpqidx")
    S.ivf_pq_index_init(corpus0, idx, n_cells=8, m=4, k_codes=8)

    src = tmp_path / "src"
    src.mkdir()
    streamed_rows = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in streamed.collect()
    ]
    with open(src / "a.json", "w") as f:
        for vid, vec in streamed_rows:
            f.write(json.dumps({"vec_id": vid, "embedding": vec}) + "\n")
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_ivf_pq_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions_after = len(snapshot_versions(idx))
    assert versions_after == 2  # init + one micro-batch append

    # a streamed vector must now be findable through the full serving
    # path — probe with ITS OWN raw vector (self-id not excluded
    # because the query vector is driver-side, not an index row probe)
    vid0, vec0 = streamed_rows[0]
    hits = {
        r.cand_id
        for r in S.ivf_pq_topk(
            spark, idx, vec0, k=5, n_probe=8, rerank=50
        ).collect()
    }
    assert vid0 in hits

    # replay with the same checkpoint: nothing new, no phantom version
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_ivf_pq_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(snapshot_versions(idx)) == versions_after


def test_retrain_resamples_and_old_version_stays_probeable(
    spark, sf_dir, tmp_path
):
    """Retraining commits fresh centroids + a full re-assignment as
    one overwrite version; the pre-retrain index stays probe-able by
    version with ITS OWN centroids (version-aware params) — the
    reproducible-backfill contract survives a retrain."""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus0 = emb.filter(F.col("vec_id") % 3 == 0)
    idx = str(tmp_path / "ivfidx")
    v1 = S.ivf_index_init(corpus0, idx, n_cells=4)
    v2 = S.ivf_index_retrain(emb, idx, n_cells=8)
    assert (v1, v2) == (1, 2)

    p_head, c_head = S.ivf_index_params(idx)
    p_v1, c_v1 = S.ivf_index_params(idx, version=1)
    assert p_head["n_cells"] == 8 and p_v1["n_cells"] == 4
    assert c_head != c_v1

    q = emb.limit(5)

    def manual(centroids, corpus):
        q_vec = q.withColumn(
            "v", F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).select(F.col("vec_id").alias("query_id"), "v")
        c_vec = corpus.withColumn(
            "v", F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).select(F.col("vec_id").alias("cand_id"), "v")
        return S.ivf_rank(
            S.ivf_probe_cells(q_vec, centroids, 2),
            S.ivf_assign_cells(c_vec, centroids),
            5,
        )

    def rows(df):
        return {(r.query_id, r.cand_id, r.cosine, r.rank) for r in df.collect()}

    assert rows(S.ivf_index_search(q, idx, k=5, n_probe=2)) == rows(
        manual(c_head, emb)
    )
    assert rows(S.ivf_index_search(q, idx, k=5, n_probe=2, version=1)) == rows(
        manual(c_v1, corpus0)
    )


def test_search_handles_empty_query_batch(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=4)
    out = S.ivf_index_search(emb.limit(0), idx, k=5, n_probe=2)
    assert out.count() == 0
    assert set(out.columns) == {"query_id", "cand_id", "cosine", "rank"}


def test_index_params_survive_compaction(spark, sf_dir, tmp_path):
    """Compacting the IVF index table must not discard the pinned
    centroids (property-note carry) — search still matches the
    pre-compaction answer."""
    from group5_spark.medallion.maintenance import compact_snapshot

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=8)
    q = emb.limit(4)
    before = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_index_search(q, idx, k=5, n_probe=3).collect()
    }
    out = compact_snapshot(spark, idx, force=True)
    assert out["version"] == 2
    after = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_index_search(q, idx, k=5, n_probe=3).collect()
    }
    assert before == after and before


# ---------------------------------------------------------------------------
# IVF-PQ composition (round 9): cells prune files, codes prune math,
# re-rank restores exactness on the shortlist
# ---------------------------------------------------------------------------


def test_ivf_pq_probe_all_rerank_all_equals_brute_force(
    spark, sf_dir, tmp_path
):
    """The exactness anchor: with every cell probed and rerank ≥ the
    corpus, ivf_pq_topk must EQUAL cosine_topk — same cosine values
    (identical expression + rounding), same id tie-breaks, same
    ranks. This pins the composition's plumbing (unit-sphere
    projection, codes round-trip, re-rank join) to the brute-force
    truth."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=8, m=8, k_codes=8, iters=2)

    q = emb.orderBy("vec_id").limit(3).collect()
    n = emb.count()
    for r in q:
        qv = [float(x) for x in r["embedding"]]
        exact = {
            (x.cand_id, x.cosine, x.rank)
            for x in S.cosine_topk(
                emb, emb.where(F.col("vec_id") == r["vec_id"]), k=10
            ).collect()
        }
        got = {
            (x.cand_id, x.cosine, x.rank)
            for x in S.ivf_pq_topk(
                spark, idx, qv, k=10, n_probe=8, rerank=n,
                exclude_id=r["vec_id"],
            ).collect()
        }
        assert got == exact


def test_ivf_pq_pruned_probe_recall_and_shape(spark, sf_dir, tmp_path):
    """The production shape: probe 4/8 cells, ADC-shortlist 64, exact
    re-rank — per-query recall@10 vs brute force must clearly beat
    the probed-fraction floor, no self-matches, ranks dense."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=8, m=8, k_codes=8, iters=2)
    queries = emb.orderBy("vec_id").limit(6).collect()
    hits = total = 0
    for r in queries:
        qv = [float(x) for x in r["embedding"]]
        exact = {
            x.cand_id
            for x in S.cosine_topk(
                emb, emb.where(F.col("vec_id") == r["vec_id"]), k=10
            ).collect()
        }
        rows = S.ivf_pq_topk(
            spark, idx, qv, k=10, n_probe=4, rerank=64,
            exclude_id=r["vec_id"],
        ).collect()
        assert [x.rank for x in rows] == list(range(1, len(rows) + 1))
        assert all(x.cand_id != r["vec_id"] for x in rows)
        hits += len(exact & {x.cand_id for x in rows})
        total += len(exact)
    assert hits / total >= 0.5, hits / total


def test_ivf_pq_probe_reads_only_probed_cells_files(
    spark, sf_dir, tmp_path
):
    """File-level pruning must survive the composition: a 2/8-cell
    probe's plan reads strictly fewer index files than the index
    holds."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=8, m=4, k_codes=8, iters=1)
    total_files = len(snapshot_manifest(idx)["files"])
    qv = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    out = S.ivf_pq_topk(spark, idx, qv, k=5, n_probe=2, rerank=32)
    read_files = {f for f in out.inputFiles()}
    assert 0 < len(read_files) < total_files


def test_ivf_pq_batch_search_anchor_and_single_query_parity(
    spark, sf_dir, tmp_path
):
    """The BATCH serving path (`ivf_pq_search`, query DataFrame in):
    (1) exactness anchor — probe-all + rerank-all equals cosine_topk
    for the whole batch BIT-FOR-BIT (values, ties, ranks); (2) at
    pruned production dials every query's rows equal the single-query
    ivf_pq_topk's, so batch and single-query are the same search."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=8, m=8, k_codes=8, iters=2)
    queries = emb.orderBy("vec_id").limit(5)
    n = emb.count()

    exact = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.cosine_topk(emb, queries, k=10).collect()
    }
    got = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_pq_search(
            queries, idx, k=10, n_probe=8, rerank=n
        ).collect()
    }
    assert got == exact and got

    for q in queries.collect():
        single = {
            (r.cand_id, r.cosine, r.rank)
            for r in S.ivf_pq_topk(
                spark, idx, [float(x) for x in q["embedding"]],
                k=10, n_probe=4, rerank=32, exclude_id=q["vec_id"],
            ).collect()
        }
        batch = {
            (r.cand_id, r.cosine, r.rank)
            for r in S.ivf_pq_search(
                queries.where(F.col("vec_id") == q["vec_id"]),
                idx, k=10, n_probe=4, rerank=32,
            ).collect()
        }
        assert batch == single and batch


def test_ivf_pq_batch_search_residual_mode_and_file_pruning(
    spark, sf_dir, tmp_path
):
    """Residual-coded index: the batch path builds per-(query, cell)
    LUTs against qu − centroid[cell]; the anchor must still hold for
    a multi-query batch, and a low-n_probe batch plan must read a
    strict subset of the index files (pruning survives the batch
    union). An empty query batch returns an empty frame with the
    output schema."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq_res")
    S.ivf_pq_index_init(
        emb, idx, n_cells=8, m=8, k_codes=8, iters=2, residual=True
    )
    queries = emb.orderBy("vec_id").limit(3)
    n = emb.count()
    exact = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.cosine_topk(emb, queries, k=10).collect()
    }
    got = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_pq_search(
            queries, idx, k=10, n_probe=8, rerank=n
        ).collect()
    }
    assert got == exact and got

    total_files = len(snapshot_manifest(idx)["files"])
    pruned = S.ivf_pq_search(
        queries.limit(1), idx, k=5, n_probe=2, rerank=32
    )
    read_files = set(pruned.inputFiles())
    assert 0 < len(read_files) < total_files

    empty = S.ivf_pq_search(queries.limit(0), idx, k=5)
    assert empty.columns == ["query_id", "cand_id", "cosine", "rank"]
    assert empty.count() == 0


def test_ivf_pq_guards(spark, sf_dir, tmp_path):
    """Zero query vector refused; a non-IVFPQ snapshot table refused
    with a pointed error."""
    emb = load_table(spark, sf_dir, "embeddings")
    plain = str(tmp_path / "plain")
    snapshot_commit(emb, plain)
    with pytest.raises(ValueError, match="IVF-PQ"):
        S.ivf_pq_topk(spark, plain, [1.0, 0.0])
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=4, m=4, k_codes=4, iters=1)
    with pytest.raises(ValueError, match="zero vector"):
        S.ivf_pq_topk(spark, idx, [0.0] * 64)


def test_ivf_pq_append_frozen_model_and_searchable(spark, sf_dir, tmp_path):
    """Appends assign + encode against the FROZEN centroids/codebooks
    (the model note is byte-identical across versions) and the
    appended vectors are immediately searchable: a near-copy of the
    query appended under a new id must come back rank-1."""
    from group5_spark.medallion.snapshots import snapshot_manifest

    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=8, m=8, k_codes=8, iters=2)
    note1 = snapshot_manifest(idx)["note"]

    q = emb.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    twin_id = 10_000_000 + q["vec_id"]
    twin = spark.createDataFrame(
        [(twin_id, qv)], "vec_id long, embedding array<double>"
    )
    v2 = S.ivf_pq_index_append(twin, idx)
    note2 = snapshot_manifest(idx)["note"]
    assert v2 == 2
    assert note2["centroids"] == note1["centroids"]
    assert note2["codebooks"] == note1["codebooks"]

    rows = S.ivf_pq_topk(
        spark, idx, qv, k=3, n_probe=4, rerank=32, exclude_id=q["vec_id"]
    ).collect()
    assert rows and rows[0]["cand_id"] == twin_id
    assert rows[0]["cosine"] == 1.0


def test_ivf_pq_residual_exactness_anchor_and_append(
    spark, sf_dir, tmp_path
):
    """Residual mode keeps both contracts: probe-all + rerank-all
    still EQUALS brute force (the re-rank is mode-independent), and
    appends encode their residuals against the frozen model — an
    appended twin comes back rank-1."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq_res")
    S.ivf_pq_index_init(
        emb, idx, n_cells=8, m=8, k_codes=8, iters=2, residual=True
    )
    n = emb.count()
    q = emb.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    exact = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.cosine_topk(
            emb, emb.where(F.col("vec_id") == q["vec_id"]), k=10
        ).collect()
    }
    got = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.ivf_pq_topk(
            spark, idx, qv, k=10, n_probe=8, rerank=n,
            exclude_id=q["vec_id"],
        ).collect()
    }
    assert got == exact

    twin_id = 20_000_000 + q["vec_id"]
    twin = spark.createDataFrame(
        [(twin_id, qv)], "vec_id long, embedding array<double>"
    )
    S.ivf_pq_index_append(twin, idx)
    rows = S.ivf_pq_topk(
        spark, idx, qv, k=3, n_probe=4, rerank=32, exclude_id=q["vec_id"]
    ).collect()
    assert rows and rows[0]["cand_id"] == twin_id
    assert rows[0]["cosine"] == 1.0


def test_ivf_pq_batch_search_version_pinned_across_retrain(
    spark, sf_dir, tmp_path
):
    """The batch path honors the reproducible-backfill contract: after
    a retrain (new centroids AND codebooks, n_cells re-dial), probing
    the PRE-retrain version with `version=` answers bit-identically to
    the pre-retrain batch search — the old model rides the old
    version's note, and the head answers with the new one."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    corpus0 = emb.filter(F.col("vec_id") % 3 == 0)
    v1 = S.ivf_pq_index_init(corpus0, idx, n_cells=4, m=4, k_codes=8)
    queries = emb.orderBy("vec_id").limit(3)
    before = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_pq_search(
            queries, idx, k=5, n_probe=2, rerank=16
        ).collect()
    }
    v2 = S.ivf_pq_index_retrain(emb, idx, n_cells=8)
    assert (v1, v2) == (1, 2)
    pinned = {
        (r.query_id, r.cand_id, r.cosine, r.rank)
        for r in S.ivf_pq_search(
            queries, idx, k=5, n_probe=2, rerank=16, version=v1
        ).collect()
    }
    assert pinned == before and pinned
    # the head now answers over the full retrained corpus: non-%3
    # vectors are findable
    head = {
        r.cand_id
        for r in S.ivf_pq_search(
            queries, idx, k=10, n_probe=8, rerank=64
        ).collect()
    }
    assert any(c % 3 != 0 for c in head)


def test_ivf_pq_residual_beats_direct_on_clustered_corpus(spark, tmp_path):
    """The claim behind the mode, pinned: on a corpus with real
    cluster structure (8 separated Gaussians — the realistic
    embedding shape), residual codes beat direct codes at the SAME
    (m, k, n_probe, rerank) budget. Measured here: recall@10 0.450
    (residual) vs 0.317 (direct) at rerank=8, 0.617 vs 0.567 at
    rerank=16 — seeded data and deterministic training make the
    comparison exact. (On a near-isotropic corpus the order flips —
    documented in ivf_pq_index_init — hence opt-in.)"""
    import random

    rng = random.Random(7)
    centers = [
        [rng.uniform(-1, 1) * 4 for _ in range(32)] for _ in range(8)
    ]
    rows = []
    i = 0
    for c in centers:
        for _ in range(60):
            rows.append((i, [x + rng.gauss(0, 0.25) for x in c]))
            i += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    emb.count()
    direct = str(tmp_path / "direct")
    resid = str(tmp_path / "resid")
    S.ivf_pq_index_init(emb, direct, n_cells=8, m=8, k_codes=8, iters=2)
    S.ivf_pq_index_init(
        emb, resid, n_cells=8, m=8, k_codes=8, iters=2, residual=True
    )

    def recall(idx):
        hits = total = 0
        for r in emb.orderBy("vec_id").limit(6).collect():
            qv = [float(x) for x in r["embedding"]]
            exact = {
                x.cand_id
                for x in S.cosine_topk(
                    emb, emb.where(F.col("vec_id") == r["vec_id"]), k=10
                ).collect()
            }
            got = {
                x.cand_id
                for x in S.ivf_pq_topk(
                    spark, idx, qv, k=10, n_probe=2, rerank=8,
                    exclude_id=r["vec_id"],
                ).collect()
            }
            hits += len(exact & got)
            total += len(exact)
        return hits / total

    r_direct, r_resid = recall(direct), recall(resid)
    emb.unpersist()
    assert r_resid > r_direct, (r_resid, r_direct)
    assert r_resid >= 0.40, r_resid


def _clustered_corpus(spark, n_clusters=8, per=60, dim=32, seed=7):
    import random

    rng = random.Random(seed)
    centers = [
        [rng.uniform(-1, 1) * 4 for _ in range(dim)]
        for _ in range(n_clusters)
    ]
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            rows.append((i, [x + rng.gauss(0, 0.25) for x in c]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_ivf_pq_retrain_recovers_recall_old_version_still_answers(
    spark, tmp_path
):
    """VERDICT r9 #2: appends never retrain, so a corpus that doubles
    into NEW cluster structure leaves the composed index pinned to
    the init-time model — probe COST doubles (frozen n_cells means
    every cell doubles in rows, and a probe pays n_probe/n_cells of
    the bytes) and code quality dilutes (stale centroids make the new
    region's residuals large and ill-coded). ivf_pq_index_retrain
    must (a) commit fresh centroids + codebooks + a full
    re-assignment as ONE overwrite version with the n_cells re-dial,
    (b) recover recall at the SAME probed fraction of the index —
    measured here (seeded data, deterministic training): 0.9167 →
    0.9667 at a 1/4 probe, the retrain removing 60% of the residual
    error, (c) halve the per-cell row footprint (the re-dial's cost
    claim, read from the manifest), and (d) leave the pre-retrain
    version answering with ITS OWN model (version-pinned params)."""
    full = _clustered_corpus(spark, n_clusters=48, per=10).cache()
    full.count()
    # init sees only the first 24 clusters; the corpus then doubles
    # into 24 clusters the init-time model has never seen — residual
    # mode, where a stale model hurts most (new-region residuals are
    # large and the frozen codebooks never trained on them)
    grown = full.where(F.col("vec_id") >= 240)
    idx = str(tmp_path / "ivfpq")
    v1 = S.ivf_pq_index_init(
        full.where(F.col("vec_id") < 240), idx,
        n_cells=8, m=8, k_codes=8, iters=2, residual=True,
    )
    v2 = S.ivf_pq_index_append(grown, idx)
    assert (v1, v2) == (1, 2)

    # queries from the NEW clusters: the frozen 8-cell model routes
    # and encodes them with a model that never saw their structure
    queries = [r for r in full.where(F.col("vec_id") >= 240)
               .orderBy("vec_id").limit(6).collect()]

    def recall(n_probe, version=None):
        hits = total = 0
        for r in queries:
            qv = [float(x) for x in r["embedding"]]
            exact = {
                x.cand_id
                for x in S.cosine_topk(
                    full, full.where(F.col("vec_id") == r["vec_id"]), k=10
                ).collect()
            }
            got = {
                x.cand_id
                for x in S.ivf_pq_topk(
                    spark, idx, qv, k=10, n_probe=n_probe, rerank=16,
                    exclude_id=r["vec_id"], version=version,
                ).collect()
            }
            hits += len(exact & got)
            total += len(exact)
        return hits / total

    # budget-fair comparison: equal probed FRACTION of the index
    # bytes (2 of 8 cells before, 4 of 16 after — cells are the unit
    # of file pruning, so fraction is what a scan pays)
    before = recall(n_probe=2)
    pre_retrain_rows = _pq_rows(
        S.ivf_pq_topk(
            spark, idx, [float(x) for x in queries[0]["embedding"]],
            k=5, n_probe=2, rerank=16, exclude_id=queries[0]["vec_id"],
        )
    )
    pre_files = snapshot_manifest(idx)["files"]

    v3 = S.ivf_pq_index_retrain(full, idx, n_cells=16)
    assert v3 == 3
    params, cents, books = S.ivf_pq_params(idx)
    assert params["n_cells"] == 16 and len(cents) == 16
    assert snapshot_manifest(idx)["note"]["op"] == "ivf_pq_index_retrain"
    # the (m, k) budget, code mode, and column bindings carried over
    assert (params["m"], params["k_codes"]) == (8, 8)
    assert params["residual"] is True

    after = recall(n_probe=4)
    assert after > before, (before, after)

    # the re-dial's cost claim: rows per cell HALVE, so a probe of
    # the same cell count reads half the index bytes it did before
    def rows_per_cell(files):
        cells = {}
        for e in files:
            cells[e["partition"]] = cells.get(e["partition"], 0) + e["rows"]
        return sum(cells.values()) / len(cells)

    post_files = snapshot_manifest(idx)["files"]
    assert rows_per_cell(post_files) * 2 == rows_per_cell(pre_files)

    # the pre-retrain version still answers with its own frozen model
    p2, c2, b2 = S.ivf_pq_params(idx, version=2)
    assert p2["n_cells"] == 8 and len(c2) == 8 and c2 != cents
    assert _pq_rows(
        S.ivf_pq_topk(
            spark, idx, [float(x) for x in queries[0]["embedding"]],
            k=5, n_probe=2, rerank=16, exclude_id=queries[0]["vec_id"],
            version=2,
        )
    ) == pre_retrain_rows
    # exactness anchor holds on the retrained head
    q0 = queries[0]
    qv = [float(x) for x in q0["embedding"]]
    n = full.count()
    exact = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.cosine_topk(
            full, full.where(F.col("vec_id") == q0["vec_id"]), k=10
        ).collect()
    }
    got = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.ivf_pq_topk(
            spark, idx, qv, k=10, n_probe=16, rerank=n,
            exclude_id=q0["vec_id"],
        ).collect()
    }
    full.unpersist()
    assert got == exact


def _pq_rows(df):
    return [(r.cand_id, r.cosine, r.rank) for r in df.collect()]


def test_ivf_pq_retrain_occ_and_mode_switch(spark, tmp_path):
    """expected_parent guards the retrain against racing a concurrent
    append (SnapshotConflict, nothing committed), and residual= flips
    the code mode at the retrain boundary — the retrained head
    carries the new mode and its exactness anchor still holds."""
    from group5_spark.medallion.snapshots import SnapshotConflict

    emb = _clustered_corpus(spark, n_clusters=4, per=40).cache()
    emb.count()
    idx = str(tmp_path / "ivfpq")
    S.ivf_pq_index_init(emb, idx, n_cells=4, m=8, k_codes=8, iters=1)
    with pytest.raises(SnapshotConflict):
        S.ivf_pq_index_retrain(emb, idx, expected_parent=99)
    assert snapshot_manifest(idx)["version"] == 1

    v2 = S.ivf_pq_index_retrain(emb, idx, residual=True, expected_parent=1)
    assert v2 == 2
    params, _, _ = S.ivf_pq_params(idx)
    assert params["residual"] is True
    q = emb.orderBy("vec_id").first()
    qv = [float(x) for x in q["embedding"]]
    n = emb.count()
    exact = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.cosine_topk(
            emb, emb.where(F.col("vec_id") == q["vec_id"]), k=5
        ).collect()
    }
    got = {
        (x.cand_id, x.cosine, x.rank)
        for x in S.ivf_pq_topk(
            spark, idx, qv, k=5, n_probe=4, rerank=n,
            exclude_id=q["vec_id"],
        ).collect()
    }
    emb.unpersist()
    assert got == exact


def test_ivf_pq_residual_auto_follows_measurement(spark, sf_dir, tmp_path):
    """Round-10 VERDICT #4: residual='auto' closes the anisotropy
    loop — a clustered corpus auto-picks residual codes, the
    near-isotropic sf embeddings auto-pick direct, the note records
    the resolved bool plus residual_mode='auto', a retrain of an auto
    index RE-decides from the fresh measurement (switching the corpus
    under it flips the mode), explicit args keep forcing, and junk
    strings fail loudly."""
    clustered = _clustered_corpus(spark, n_clusters=8)
    ci = str(tmp_path / "auto_clustered")
    S.ivf_pq_index_init(
        clustered, ci, n_cells=8, m=8, k_codes=8, iters=1, residual="auto"
    )
    p = S.ivf_pq_params(ci)[0]
    assert p["residual"] is True and p["residual_mode"] == "auto"
    assert p["anisotropy"]["recommended"] == "residual"

    emb = load_table(spark, sf_dir, "embeddings")
    ii = str(tmp_path / "auto_iso")
    S.ivf_pq_index_init(
        emb, ii, n_cells=8, m=8, k_codes=8, iters=1, residual="auto"
    )
    p = S.ivf_pq_params(ii)[0]
    assert p["residual"] is False and p["residual_mode"] == "auto"
    assert p["anisotropy"]["recommended"] == "direct"

    # retrain with residual=None inherits the MODE: the auto clustered
    # index, retrained on the isotropic vectors, re-decides to direct
    S.ivf_pq_index_retrain(emb, ci)
    p = S.ivf_pq_params(ci)[0]
    assert p["residual"] is False and p["residual_mode"] == "auto"

    # explicit args unchanged: forced residual on the isotropic corpus
    # stays forced through a None retrain
    ei = str(tmp_path / "forced")
    S.ivf_pq_index_init(
        emb, ei, n_cells=8, m=8, k_codes=8, iters=1, residual=True
    )
    p = S.ivf_pq_params(ei)[0]
    assert p["residual"] is True and p["residual_mode"] == "explicit"
    S.ivf_pq_index_retrain(emb, ei)
    p = S.ivf_pq_params(ei)[0]
    assert p["residual"] is True and p["residual_mode"] == "explicit"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="auto"):
        S.ivf_pq_index_init(
            emb, str(tmp_path / "bad"), n_cells=8, residual="yes"
        )


def test_ivf_pq_anisotropy_probe_recommends_mode(spark, sf_dir, tmp_path):
    """VERDICT r9 #5: init measures the within-cell residual-norm
    ratio (one aggregate over the assigned corpus) and records a mode
    recommendation in the manifest note — a clustered corpus (small
    residuals) recommends residual, the near-isotropic sf embeddings
    (residual larger than the unit vector) recommend direct. Appends
    carry the note; retrain re-measures it."""
    clustered = _clustered_corpus(spark, n_clusters=8)
    ci = str(tmp_path / "clustered")
    S.ivf_pq_index_init(clustered, ci, n_cells=8, m=8, k_codes=8, iters=1)
    a = S.ivf_pq_params(ci)[0]["anisotropy"]
    assert a["recommended"] == "residual"
    assert 0 < a["residual_norm_ratio"] < 0.9

    emb = load_table(spark, sf_dir, "embeddings")
    ii = str(tmp_path / "iso")
    S.ivf_pq_index_init(emb, ii, n_cells=8, m=8, k_codes=8, iters=1)
    b = S.ivf_pq_params(ii)[0]["anisotropy"]
    assert b["recommended"] == "direct"
    assert b["residual_norm_ratio"] > 0.9

    # the measurement rides appends unchanged and is REMEASURED by a
    # retrain — mixing the isotropic vectors into the clustered index
    # (shifted ids) moves the recorded ratio
    shifted = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    S.ivf_pq_index_append(shifted, ci)
    assert S.ivf_pq_params(ci)[0]["anisotropy"] == a
    S.ivf_pq_index_retrain(clustered.unionByName(shifted), ci)
    c = S.ivf_pq_params(ci)[0]["anisotropy"]
    assert c["residual_norm_ratio"] > a["residual_norm_ratio"]


def test_purge_ids_erases_vectors_from_ivf_index(spark, sf_dir, tmp_path):
    """Right-to-erasure reaches the ANN surface (round 12): the IVF
    index is a per-id snapshot table, so `snapshot_purge_ids` retires
    a vector's assignment rows with the same file-pruned merge-delete
    as every other derived table — the purged vector can never again
    appear in a result, and an all-cells probe (IVF = exact when every
    cell is probed) over the purged index equals brute-force cosine
    top-k over the surviving corpus."""
    from group5_spark.medallion.maintenance import snapshot_purge_ids
    from group5_spark.medallion.snapshots import snapshot_read

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.limit(5)
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb, idx, n_cells=8)

    # pick victims that actually appear in the pre-purge results
    pre = S.ivf_index_search(q, idx, k=5, n_probe=8)
    victims = [
        r.cand_id
        for r in pre.where("rank <= 2").select("cand_id").distinct()
        .limit(3).collect()
    ]
    assert victims

    out = snapshot_purge_ids(spark, victims, [(idx, "cand_id")])
    assert out["rows_deleted"] == len(victims)
    assert (
        snapshot_read(spark, idx)
        .where(F.col("cand_id").isin(victims))
        .count()
        == 0
    )

    post = S.ivf_index_search(q, idx, k=5, n_probe=8)
    assert post.where(F.col("cand_id").isin(victims)).count() == 0
    survivors = emb.where(~F.col("vec_id").isin(victims))
    exact = S.cosine_topk(survivors, q, k=5)
    assert _rows(post) == _rows(exact)


def test_semantic_dedup_over_persisted_ivf_cells(spark, sf_dir, tmp_path):
    """semantic_dedup_ivf (round 12): the SemDeDup election run over
    a persisted IVF index's OWN cell assignments — the N·k assignment
    pass is already paid and stored, so the op costs one cosine per
    row plus the within-cell join. Planted x2-scaled duplicates (IEEE
    scale-invariant direction copies) land in their original's cell
    and must be exactly the doomed set."""
    from group5_spark.extensions.similarity import semantic_dedup_ivf

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    copies = emb.where(F.col("vec_id") % 25 == 3).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias(
            "embedding"
        ),
    )
    n_copies = copies.count()
    assert n_copies > 0
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb.unionByName(copies), idx, n_cells=8)

    surv = semantic_dedup_ivf(spark, idx, threshold=0.95)
    ids = {r.vec_id for r in surv.collect()}
    assert not {i for i in ids if i >= 10000}  # every copy doomed
    assert len(ids) == emb.count()  # every original kept
    # survivors carry the index's own cells (cids are sampled vector
    # ids, not 0..k-1)
    _, centroids = S.ivf_index_params(idx)
    assert {r.cell_id for r in surv.collect()} <= {
        cid for cid, _ in centroids
    }


def _basis_index(spark, tmp_path, name="semidx"):
    """A fully-controlled IVF index: the seed corpus is the four
    scaled basis vectors e1..e4 and n_cells=4, so every resident IS
    its own cell centroid (normalized) and every cosine in the tests
    below is hand-computable."""
    seed = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0]),
            (4, [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    idx = str(tmp_path / name)
    S.ivf_index_init(seed, idx, n_cells=4)
    return idx


def test_semantic_dedup_against_election_matrix(spark, tmp_path):
    """The incremental semantic election, every rule on one batch:
    a τ-neighbor RESIDENT dooms unconditionally (ingest precedence,
    id 101 = 2·e1); a fresh vector under τ to everything survives
    (id 102, cos .894 to its centroid); an intra-batch τ-pair in a
    cell whose resident is NOT τ-near them elects by the keep rule —
    id 103 (cent_sim .894) vs id 104 (cent_sim .919, cos(103,104)
    ≈ .998): keep='central' keeps the centroid-closer 104,
    keep='atypical' keeps 103; and a batch-internal id collision
    (two id-105 rows) resolves to the deterministic smaller-vector
    row BEFORE the election, so the survivor set replays."""
    idx = _basis_index(spark, tmp_path)
    batch = spark.createDataFrame(
        [
            (101, [2.0, 0.0, 0.0, 0.0]),   # x2 copy of resident e1
            (102, [1.0, 2.0, 0.0, 0.0]),   # fresh: cos .894 to e2
            (103, [0.0, 0.0, 2.0, 1.0]),   # pair, cent_sim .894472
            (104, [0.0, 0.0, 7.0, 3.0]),   # pair, cent_sim .919145
            (105, [0.0, 2.0, 1.0, 0.0]),   # id collision: this row
            (105, [5.0, 0.0, 0.0, 0.0]),   # ...would doom via e1
        ],
        "vec_id long, embedding array<double>",
    )
    central = S.semantic_dedup_against(batch, idx, threshold=0.95)
    assert {r.vec_id for r in central.collect()} == {102, 104, 105}
    # the collision kept the smaller-array row (cell e2, fresh), not
    # the 5·e1 row the resident would have doomed
    kept105 = central.where(F.col("vec_id") == 105).collect()
    assert [float(x) for x in kept105[0].embedding] == [0.0, 2.0, 1.0, 0.0]

    atypical = S.semantic_dedup_against(
        batch, idx, threshold=0.95, keep="atypical"
    )
    assert {r.vec_id for r in atypical.collect()} == {102, 103, 105}

    with pytest.raises(ValueError, match="keep must be"):
        S.semantic_dedup_against(batch, idx, keep="nope")


def test_semantic_dedup_against_overlap_modes(spark, tmp_path):
    """on_overlap mirrors drop_contained_against's contract: 'error'
    raises eagerly on a re-fed id, 'drop' applies first-ingest-wins
    (the batch copy vanishes end-to-end while fresh rows elect)."""
    idx = _basis_index(spark, tmp_path)
    batch = spark.createDataFrame(
        [
            (2, [0.0, 9.0, 0.0, 0.0]),     # id already indexed
            (201, [1.0, 2.0, 0.0, 0.0]),   # fresh
        ],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="already in the index"):
        S.semantic_dedup_against(batch, idx)
    surv = S.semantic_dedup_against(batch, idx, on_overlap="drop")
    assert {r.vec_id for r in surv.collect()} == {201}

    with pytest.raises(ValueError, match="on_overlap must be"):
        S.semantic_dedup_against(batch, idx, on_overlap="nope")


def test_semantic_dedup_against_reads_only_batch_cells_files(
    spark, sf_dir, tmp_path
):
    """The scale claim made physical: electing a one-cell batch
    against an 8-cell index touches a strict subset of the index's
    data files — the resident side of the τ-join is file-pruned to
    the batch's own cells, not a full scan filtered late."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfidx")
    S.ivf_index_init(emb.filter(F.col("vec_id") % 5 < 4), idx, n_cells=8)
    batch = (
        emb.filter(F.col("vec_id") % 5 == 4)
        .limit(1)
        .select(
            (F.col("vec_id") + 50000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x.cast("double") * F.lit(-2.0)
            ).alias("embedding"),
        )
    )
    surv = S.semantic_dedup_against(batch, idx, on_overlap="unchecked")
    total = len(snapshot_manifest(idx)["files"])
    touched = {f for f in surv.inputFiles() if "ivfidx" in f}
    assert 0 < len(touched) < total
    assert surv.count() == 1  # a negated vector pairs with nothing
