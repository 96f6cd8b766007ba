"""Persisted LSH index lifecycle: bootstrap → batch append → probe,
as a snapshot-table maintenance job (extensions.dedup lsh_index_*).

The production claim under test: every crawl pays O(batch) index
maintenance + an index-probe near-dup check, and the result is
IDENTICAL to recomputing the corpus index from scratch — plus the
snapshot contract (atomicity, time travel, idempotent streaming
appends) on the index itself.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from group5_spark.catalog import load_table
from group5_spark.extensions import dedup
from group5_spark.medallion.snapshots import (
    snapshot_manifest,
    snapshot_versions,
)
from group5_spark.streaming import jobs


def test_index_probe_matches_derived_index_after_appends(spark, sf_dir, tmp_path):
    """init(corpus0) + append(batch1) must probe identically to an
    index derived fresh from corpus0 ∪ batch1 — appends lose nothing
    relative to a full rebuild."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = docs.filter(F.col("doc_id") % 10 < 6)
    batch1 = docs.filter((F.col("doc_id") % 10 >= 6) & (F.col("doc_id") % 10 < 8))
    batch2 = docs.filter(F.col("doc_id") % 10 >= 8)
    corpus01 = corpus0.unionByName(batch1)
    idx = str(tmp_path / "lshidx")

    v1 = dedup.lsh_index_init(corpus0, idx, shingle_n=1)
    v2 = dedup.lsh_index_append(batch1, idx)
    assert (v1, v2) == (1, 2)

    probed = {
        (r.id_new, r.id_corpus, r.jaccard)
        for r in dedup.near_dups_against_index(
            batch2, corpus01, idx, threshold=0.9
        ).collect()
    }
    derived = {
        (r.id_new, r.id_corpus, r.jaccard)
        for r in dedup.incremental_near_dups(
            batch2, corpus01, shingle_n=1, threshold=0.9
        ).collect()
    }
    assert probed == derived
    assert probed, "testdata should contain cross-boundary near-dups"


def test_append_commit_is_priced_by_the_batch(spark, sf_dir, tmp_path):
    """The append version's NEW files hold exactly bands × |batch|
    rows — corpus signatures are never recomputed (manifest row
    counts are the evidence, not timing)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = docs.filter(F.col("doc_id") % 10 < 6)
    batch1 = docs.filter((F.col("doc_id") % 10 >= 6) & (F.col("doc_id") % 10 < 8))
    idx = str(tmp_path / "lshidx")

    dedup.lsh_index_init(corpus0, idx, shingle_n=1, bands=4)
    dedup.lsh_index_append(batch1, idx)

    rows_v1 = sum(e["rows"] for e in snapshot_manifest(idx, 1)["files"])
    rows_v2 = sum(e["rows"] for e in snapshot_manifest(idx, 2)["files"])
    assert rows_v1 == 4 * corpus0.count()
    assert rows_v2 - rows_v1 == 4 * batch1.count()
    # v2 carries v1's files by reference — a blind append, not a rewrite
    v1_files = {e["path"] for e in snapshot_manifest(idx, 1)["files"]}
    v2_files = {e["path"] for e in snapshot_manifest(idx, 2)["files"]}
    assert v1_files <= v2_files


def test_params_are_pinned_and_non_index_tables_rejected(spark, tmp_path):
    """LSH parameters live in the index's own manifest note; probes
    and appends read them from there, and a snapshot table that was
    not created by lsh_index_init is refused outright."""
    from group5_spark.medallion.snapshots import snapshot_commit

    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], ["doc_id", "text"]
    )
    idx = str(tmp_path / "lshidx")
    dedup.lsh_index_init(
        corpus, idx, num_hashes=8, bands=2, shingle_n=1, hash_fn="xxhash64"
    )
    assert dedup.lsh_index_params(idx) == {
        "id_col": "doc_id", "text_col": "text", "num_hashes": 8,
        "bands": 2, "shingle_n": 1, "hash_fn": "xxhash64",
    }

    plain = str(tmp_path / "not_an_index")
    snapshot_commit(corpus, plain, mode="overwrite")
    with pytest.raises(ValueError, match="not an LSH index"):
        dedup.lsh_index_append(corpus, plain)
    with pytest.raises(ValueError, match="not an LSH index"):
        dedup.lsh_index_params(plain)


def test_index_time_travel_probes_an_earlier_corpus_state(spark, sf_dir, tmp_path):
    """version= probes the index as of an earlier corpus state: pairs
    into documents indexed AFTER that version cannot appear — the
    reproducible-backfill contract."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus0 = docs.filter(F.col("doc_id") % 10 < 6)
    batch1 = docs.filter((F.col("doc_id") % 10 >= 6) & (F.col("doc_id") % 10 < 8))
    batch2 = docs.filter(F.col("doc_id") % 10 >= 8)
    idx = str(tmp_path / "lshidx")
    dedup.lsh_index_init(corpus0, idx, shingle_n=1)
    dedup.lsh_index_append(batch1, idx)

    at_v1 = {
        (r.id_new, r.id_corpus)
        for r in dedup.near_dups_against_index(
            batch2, corpus0.unionByName(batch1), idx, version=1, threshold=0.9
        ).collect()
    }
    batch1_ids = {r.doc_id for r in batch1.select("doc_id").collect()}
    assert not {c for _, c in at_v1} & batch1_ids
    # and v1 probing equals probing corpus0 alone with a derived index
    derived_v1 = {
        (r.id_new, r.id_corpus)
        for r in dedup.incremental_near_dups(
            batch2, corpus0, shingle_n=1, threshold=0.9
        ).collect()
    }
    assert at_v1 == derived_v1


def test_stream_lsh_index_maintenance_exactly_once(spark, tmp_path):
    """A document stream maintains the index: one snapshot append per
    micro-batch, and a checkpoint-replayed batch is skipped (the
    (app_id, batch_id) note dedup) — re-running the drained stream
    adds no versions and no duplicate index rows."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "lshidx")
    dedup.lsh_index_init(corpus, idx, shingle_n=1)

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i, t in ((11, "delta gamma beta alpha"), (12, "nothing alike here")):
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_lsh_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    versions_after = len(snapshot_versions(idx))
    assert versions_after == 2  # init + one micro-batch append

    # the streamed docs are probe-visible
    all_docs = corpus.unionByName(
        spark.createDataFrame(
            [(11, "delta gamma beta alpha"), (12, "nothing alike here")],
            ["doc_id", "text"],
        )
    )
    probe = spark.createDataFrame(
        [(21, "beta alpha delta gamma")], ["doc_id", "text"]
    )
    pairs = {
        (r.id_new, r.id_corpus)
        for r in dedup.near_dups_against_index(
            probe, all_docs, idx, threshold=0.9
        ).collect()
    }
    assert pairs == {(21, 1), (21, 11)}

    # replay with the same checkpoint: drained source → no new batch,
    # and even a forced re-run of batch 0 would be note-deduped
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_lsh_index_maintenance(stream, idx, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(snapshot_versions(idx)) == versions_after


def test_stream_lsh_index_maintenance_denylist(spark, tmp_path):
    """Round-12 VERDICT #2, ANN-index surface: a purged document
    re-fed through LSH index maintenance would re-enter the band
    buckets the purge's merge-delete just cleaned — with
    denylist_path the erased id stays out while fresh docs index; a
    fully-suppressed micro-batch is skipped outright (no empty
    commit)."""
    from group5_spark.medallion.maintenance import snapshot_purge_ids
    from group5_spark.medallion.snapshots import snapshot_read

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "epsilon zeta eta theta")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "lshidx")
    deny = str(tmp_path / "deny")
    dedup.lsh_index_init(corpus, idx, shingle_n=1)

    out = snapshot_purge_ids(
        spark, [1], [(idx, "id")], denylist_path=deny
    )
    assert out["rows_deleted"] > 0 and out["denylisted"] == 1

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.json", "w") as f:
        for i, t in ((1, "alpha beta gamma delta"), (3, "fresh words")):
            f.write(json.dumps({"doc_id": i, "text": t}) + "\n")
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).json(str(src))
    q = (
        jobs.stream_lsh_index_maintenance(
            stream, idx, ckpt, denylist_path=deny
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ids = {r["id"] for r in snapshot_read(spark, idx).collect()}
    assert 1 not in ids and 3 in ids and 2 in ids
    n_versions = len(snapshot_versions(idx))

    # a batch that is ENTIRELY suppressed commits nothing
    src2 = tmp_path / "src2"
    src2.mkdir()
    with open(src2 / "a.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "alpha beta"}) + "\n")
    stream = spark.readStream.schema(schema).json(str(src2))
    q = (
        jobs.stream_lsh_index_maintenance(
            stream, idx, str(tmp_path / "ckpt2"), denylist_path=deny
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(snapshot_versions(idx)) == n_versions


def test_index_survives_compaction_and_rollback(spark, tmp_path):
    """The pinned LSH parameters are TABLE PROPERTIES: ordinary
    snapshot compaction (which the append docstring recommends for
    overlap reclaim) and a rollback must carry them — probing after
    either still works."""
    from group5_spark.medallion.maintenance import compact_snapshot
    from group5_spark.medallion.snapshots import snapshot_rollback

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "zeta eta theta iota")],
        ["doc_id", "text"],
    )
    idx = str(tmp_path / "lshidx")
    dedup.lsh_index_init(corpus, idx, shingle_n=1)
    dedup.lsh_index_append(
        spark.createDataFrame([(3, "delta gamma beta alpha")],
                              ["doc_id", "text"]),
        idx,
    )
    compact_snapshot(spark, idx, force=True)
    assert dedup.lsh_index_params(idx)["shingle_n"] == 1

    probe = spark.createDataFrame(
        [(9, "beta alpha delta gamma")], ["doc_id", "text"]
    )
    all_docs = corpus.unionByName(
        spark.createDataFrame([(3, "delta gamma beta alpha")],
                              ["doc_id", "text"])
    )
    pairs = {
        (r.id_new, r.id_corpus)
        for r in dedup.near_dups_against_index(
            probe, all_docs, idx, threshold=0.9
        ).collect()
    }
    assert pairs == {(9, 1), (9, 3)}

    snapshot_rollback(idx, version=2)
    assert dedup.lsh_index_params(idx)["shingle_n"] == 1


def test_probe_path_mega_bucket_cap(spark, tmp_path):
    """Probe-side mega-bucket guard: a 300-doc boilerplate group in
    the CORPUS puts 300 rows in one index bucket per band — every
    probe doc landing there would fan out 300 candidates. With the
    opt-in cap the hot buckets drop (metrics ride the probe job),
    while probes that hit honest buckets return exactly what the
    uncapped probe returns."""
    from pyspark.sql import Observation

    patho = " ".join(f"b{i}" for i in range(30))
    corpus_rows = [(i, patho) for i in range(300)]
    for j in range(10):  # honest corpus docs with disjoint vocab
        corpus_rows.append((1000 + j, " ".join(f"h{j}w{k}" for k in range(30))))
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    idx = str(tmp_path / "capidx")
    dedup.lsh_index_init(corpus, idx, shingle_n=1)

    # batch: one boilerplate doc + one near-dup of an honest doc
    batch = spark.createDataFrame(
        [
            (5000, patho),
            (5001, " ".join(f"h3w{k}" for k in range(29)) + " extra"),
        ],
        ["doc_id", "text"],
    )
    uncapped = {
        (r.id_new, r.id_corpus)
        for r in dedup.near_dups_against_index(
            batch, corpus, idx, threshold=0.9
        ).collect()
    }
    assert sum(1 for a, b in uncapped if a == 5000) == 300
    assert (5001, 1003) in uncapped

    obs = Observation("probe_cap")
    capped = {
        (r.id_new, r.id_corpus)
        for r in dedup.near_dups_against_index(
            batch, corpus, idx, threshold=0.9,
            max_bucket_size=50, observation=obs,
        ).collect()
    }
    assert capped == {p for p in uncapped if p[0] != 5000}
    assert obs.get["rows_dropped"] > 0  # the hot buckets were cut
