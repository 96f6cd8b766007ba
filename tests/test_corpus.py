"""Corpus-preparation operators (extensions/corpus.py): contamination
detection, contiguous sequence packing, TF-IDF, bigrams.

The registry queries carry the DuckDB oracle gate; these tests pin the
operator-level invariants the oracle can't see — edge cases (1-token
docs), the distributed-prefix-sum ≡ global-window equivalence, and
split-membership properties."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from group5_spark.catalog import load_table
from group5_spark.extensions.corpus import (
    bigram_counts,
    contamination_report,
    pack_sequences,
    tfidf_top_terms,
)
from group5_spark.extensions.splits import hash_split


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_bigram_single_token_doc_is_safe(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "a b a b"), (3, "")], ["doc_id", "text"]
    )
    rows = {r["bigram"]: r["n"] for r in bigram_counts(df, min_count=1).collect()}
    # doc 1 and doc 3 contribute nothing; doc 2 has pairs a-b, b-a, a-b
    assert rows == {"a b": 2, "b a": 1}


def test_pack_sequences_matches_global_window(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    packed = pack_sequences(docs, token_budget=128, n_shards=7)
    naive = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    ).withColumn(
        "cum_before",
        F.sum("n_tokens").over(
            Window.orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        - F.col("n_tokens"),
    ).withColumn("bin_id", F.floor(F.col("cum_before") / 128).cast("bigint"))
    diff = packed.join(naive, "doc_id").filter(
        (packed["cum_before"] != naive["cum_before"])
        | (packed["bin_id"] != naive["bin_id"])
    )
    assert packed.count() == docs.count()
    assert diff.count() == 0


def test_pack_sequences_bins_monotone_in_id_order(spark, sf_dir):
    packed = pack_sequences(_docs(spark, sf_dir), token_budget=256)
    rows = packed.orderBy("doc_id").collect()
    bins = [r["bin_id"] for r in rows]
    assert bins == sorted(bins)
    assert bins[0] == 0
    # each doc starts at the cumulative offset of its predecessors
    cum = 0
    for r in rows[:50]:
        assert r["cum_before"] == cum
        cum += r["n_tokens"]


def test_contamination_only_reports_train_docs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rep = contamination_report(docs, test_frac=0.2, salt="contam")
    split = hash_split(
        docs, "doc_id", {"train": 0.8, "test": 0.2}, salt="contam"
    ).select("doc_id", "split")
    joined = rep.join(split, "doc_id")
    assert joined.filter(F.col("split") != "train").count() == 0
    bad = rep.filter(
        (F.col("n_hit") > F.col("n_shingles")) | (F.col("n_hit") <= 0)
    )
    assert bad.count() == 0


def test_tfidf_topk_shape_and_ordering(spark, sf_dir):
    out = tfidf_top_terms(_docs(spark, sf_dir), k=3)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("term").alias("n_terms"),
        F.max("rnk").alias("max_rnk"),
    )
    assert per_doc.filter("n > 3 OR n != n_terms OR max_rnk > 3").count() == 0
    # rank order must follow score order within each doc
    w = Window.partitionBy("doc_id").orderBy("rnk")
    misordered = out.withColumn(
        "prev_score", F.lag("tfidf").over(w)
    ).filter(F.col("prev_score") < F.col("tfidf"))
    assert misordered.count() == 0


def test_repetition_stats_counts(spark):
    from group5_spark.extensions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b", "s1"), (2, "x y z w", "s1")],
        ["doc_id", "text", "source"],
    )
    rows = {r["doc_id"]: r for r in
            repetition_stats(df, carry_cols=("source",)).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["max_tf"] == 3
    assert rows[1]["max_tf_ratio"] == 0.75
    assert rows[2]["n_distinct"] == 4 and rows[2]["distinct_ratio"] == 1.0
    assert rows[1]["source"] == "s1"


def test_tfidf_scores_positive_for_rare_terms(spark, sf_dir):
    out = tfidf_top_terms(_docs(spark, sf_dir), k=3)
    # a term present in every document has idf = ln(1) = 0; top-ranked
    # terms should carry strictly positive scores on this corpus
    assert out.filter("rnk = 1 AND tfidf <= 0").count() == 0


def test_inverted_index_small_corpus_exact(spark):
    from group5_spark.extensions.corpus import inverted_index

    df = spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a c"),
            (3, "b b b c"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["term"]: (r["df"], r["total_tf"], r["top_docs"])
        for r in inverted_index(df, k=2).collect()
    }
    # df = docs containing term; total_tf = corpus occurrences;
    # postings ranked by in-doc tf desc, doc_id asc, capped at k=2
    assert rows == {
        "a": (2, 3, [1, 2]),
        "b": (2, 4, [3, 1]),
        "c": (2, 2, [2, 3]),
    }


def test_inverted_index_posting_list_is_bounded(spark, sf_dir):
    from group5_spark.extensions.corpus import inverted_index

    docs = _docs(spark, sf_dir)
    out = inverted_index(docs, k=5)
    assert out.filter(F.size("top_docs") > 5).count() == 0
    # every term's df is exact even when the posting list is capped:
    # stopword-ish terms must report df > k while postings stay at k
    capped = out.filter(F.col("df") > 5)
    assert capped.count() > 0
    assert capped.filter(F.size("top_docs") != 5).count() == 0


def test_chunk_documents_windows_and_overlap(spark):
    from group5_spark.extensions.corpus import chunk_documents

    words = " ".join(f"w{i}" for i in range(1, 114))  # 113 tokens
    df = spark.createDataFrame([(1, words)], ["doc_id", "text"])
    got = {
        r["chunk_id"]: r
        for r in chunk_documents(df, chunk_tokens=64, stride=48).collect()
    }
    # ceil((113-64)/48)+1 = 3 chunks; the last covers tokens 97..113
    assert sorted(got) == [0, 1, 2]
    assert [got[i]["n_chunk_tokens"] for i in (0, 1, 2)] == [64, 64, 17]
    c0, c1 = got[0]["chunk_text"].split(" "), got[1]["chunk_text"].split(" ")
    assert c0[0] == "w1" and c0[-1] == "w64"
    assert c1[0] == "w49"  # stride 48: 16 tokens of overlap
    assert c0[48:] == c1[:16]
    assert got[2]["chunk_text"].split(" ")[-1] == "w113"
    # every token appears in at least one chunk
    covered = set(c0) | set(c1) | set(got[2]["chunk_text"].split(" "))
    assert covered == {f"w{i}" for i in range(1, 114)}


def test_chunk_documents_short_and_empty_docs(spark):
    from group5_spark.extensions.corpus import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, " ".join(["x"] * 64))],
        ["doc_id", "text"],
    )
    rows = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc: one short chunk; empty doc: one empty chunk (no doc
    # silently disappears); exactly-one-window doc: one full chunk
    assert [ (r["n_chunk_tokens"], r["chunk_text"]) for r in by_doc[1] ] == [(3, "a b c")]
    assert [ (r["n_chunk_tokens"], r["chunk_text"]) for r in by_doc[2] ] == [(0, "")]
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_chunk_tokens"] == 64
