"""Corpus-preparation operators for LLM training-data pipelines:
train/test contamination detection, contiguous sequence packing, and
TF-IDF term scoring (SURVEY §2 B-7 "beyond-reference" family; parity
target: the reference pipeline (`Assets/Jobs/etl_job.py`) has no
equivalent — these are the
operations a 100 TB pretraining pipeline adds on top).

Scale design:
- Contamination joins on a 56-bit hash of the n-gram, never the
  n-gram string: the shuffle carries 8-byte keys. The test-side
  shingle set is distinct-reduced before the join and is typically
  the small side (test split ≪ train) — Spark broadcasts it.
- Sequence packing needs a *global* running token count, which a
  naive `Window.orderBy(...)` computes on ONE task. Here it is a
  distributed prefix sum: per-shard cumulative sums (parallel) plus
  a tiny shard-offset table (one row per shard) joined back by
  broadcast — the classic two-phase scan, linear at any scale.
- TF-IDF is two hash aggregations (term-per-doc, doc-freq) and one
  broadcast of the global doc count; the per-doc top-k uses a
  rank-window partitioned by term's doc — no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _shingles_sql, portable_hash56_sql
from .splits import hash_split

__all__ = [
    "contamination_report",
    "pack_sequences",
    "tfidf_top_terms",
    "bigram_counts",
    "inverted_index",
    "chunk_documents",
    "token_budget_select",
]


def _doc_shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle_hash) pairs — one row per distinct word n-gram per
    document, the n-gram represented only by its portable 56-bit hash
    (8-byte join keys; the strings never shuffle)."""
    sh = F.expr(_shingles_sql(text_col, n))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .select(
            "id",
            F.expr(portable_hash56_sql("shingle")).alias("shingle_hash"),
        )
    )


def contamination_report(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    test_frac: float = 0.2,
    salt: str = "contam",
) -> DataFrame:
    """Benchmark-contamination check: which *train* documents contain
    word n-grams that also appear in the held-out *test* split.

    The split is derived with :func:`hash_split` (deterministic,
    growth-stable), so the report is reproducible run over run. Output
    is one row per contaminated train document:
    ``(doc_id, n_shingles, n_hit, contamination_pct)``.

    At 100 TB the test side is the small side by construction —
    ``test_frac`` of the corpus, distinct-reduced to unique shingle
    hashes — so Spark's planner broadcasts it and the train side
    never shuffles; otherwise it is one equi-join on an 8-byte key.
    """
    split = hash_split(
        df, id_col, {"train": 1.0 - test_frac, "test": test_frac}, salt=salt
    )
    shingled = _doc_shingle_hashes(split, id_col, text_col, shingle_n)
    # re-attach split by recomputing the hash bucket on the id — a
    # column, not a join (the split is a pure function of the id)
    split_col = hash_split(
        shingled.withColumnRenamed("id", id_col),
        id_col,
        {"train": 1.0 - test_frac, "test": test_frac},
        salt=salt,
    )
    train = split_col.filter(F.col("split") == "train").select(
        F.col(id_col).alias("id"), "shingle_hash"
    )
    test_set = (
        split_col.filter(F.col("split") == "test")
        .select("shingle_hash")
        .distinct()
    )
    hits = (
        train.join(test_set, "shingle_hash", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = train.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, "id", "inner")
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("bigint").alias("n_shingles"),
            F.col("n_hit").cast("bigint").alias("n_hit"),
            F.round(
                F.col("n_hit").cast("double") / F.col("n_shingles"), 6
            ).alias("contamination_pct"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_budget: int = 512,
    n_shards: int = 64,
) -> DataFrame:
    """Contiguous sequence packing: concatenate documents in ``id_col``
    order and cut the stream every ``token_budget`` tokens; each
    document is assigned the bin in which it *starts*.

    Adds ``n_tokens``, ``cum_before`` (exclusive prefix sum of tokens
    in id order) and ``bin_id = floor(cum_before / token_budget)``.

    The prefix sum is distributed: ids are range-bucketed into
    ``n_shards`` shards, each shard computes its local running sum in
    parallel, and shard base offsets (one tiny row per shard) are
    joined back by broadcast. Equivalent to a global ordered window,
    without the single-task bottleneck a global ``Window.orderBy``
    creates at scale.
    """
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tokens"),
    )
    # range-shard on id so shard order == id order (required for the
    # contiguous semantics); span from one tiny max() broadcast row
    bounds = toks.agg(
        F.max(id_col).alias("max_id"), F.min(id_col).alias("min_id")
    )
    sharded = toks.crossJoin(F.broadcast(bounds)).withColumn(
        "shard",
        F.least(
            F.lit(n_shards - 1),
            F.floor(
                (F.col(id_col) - F.col("min_id"))
                * n_shards
                / (F.col("max_id") - F.col("min_id") + 1)
            ),
        ).cast("bigint"),
    )
    intra_w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = sharded.withColumn("intra_cum", F.sum("n_tokens").over(intra_w))
    shard_tot = local.groupBy("shard").agg(
        F.sum("n_tokens").alias("shard_tokens")
    )
    offset_w = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the offsets table has n_shards rows — the single-task window here
    # is over a bounded tiny input, then broadcast back
    offsets = shard_tot.withColumn(
        "shard_offset",
        F.sum("shard_tokens").over(offset_w) - F.col("shard_tokens"),
    ).select("shard", "shard_offset")
    return (
        local.join(F.broadcast(offsets), "shard")
        .withColumn(
            "cum_before",
            (F.col("shard_offset") + F.col("intra_cum") - F.col("n_tokens")),
        )
        .withColumn(
            "bin_id", F.floor(F.col("cum_before") / token_budget).cast("bigint")
        )
        .select(id_col, "n_tokens", "cum_before", "bin_id")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document:
    ``score = tf(term, doc) · ln(N / df(term))``, rounded to 6 so the
    double is engine-canonical (see queries.py determinism rules).

    Two hash aggregations (term counts per doc; document frequency per
    term) plus one 1-row broadcast for N. Ties break on term text, so
    the top-k set is fully deterministic.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    rank_w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(rank_w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col,
            F.col("rnk").cast("bigint").alias("rnk"),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.col("tfidf").cast("double").alias("tfidf"),
        )
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_df: int = 3,
) -> DataFrame:
    """C4-style boilerplate gate: for each document, the fraction of
    its distinct word ``n``-grams that occur in at least ``min_df``
    documents corpus-wide. High fractions mark template/boilerplate
    text (navigation chrome, license banners) that a pretraining
    pipeline down-weights or drops.

    Plan shape at scale: one explode of distinct per-doc shingles
    feeds (a) a doc-frequency hash agg whose ``>= min_df`` survivors
    are broadcast, and (b) a per-doc left join + single hash agg
    counting matched vs total shingles. The shuffled unit is the
    shingle string, never the document body, and the frequent set is
    tiny by construction (frequency threshold), so the join side
    stays broadcastable at any corpus size.
    """
    shingles = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < {n} THEN array()"
        f" ELSE array_distinct(transform("
        f"   sequence(0, size(split({text_col}, ' ')) - {n}),"
        f"   i -> array_join(slice(split({text_col}, ' '), i + 1, {n}), ' ')))"
        f" END"
    )
    sh = df.select(F.col(id_col), F.explode(shingles).alias("sh"))
    frequent = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
        .select("sh", F.lit(True).alias("_freq"))
    )
    return (
        sh.join(F.broadcast(frequent), "sh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.count("_freq").cast("bigint").alias("n_frequent"),
            F.round(F.count("_freq") / F.count(F.lit(1)), 6).alias(
                "boilerplate_frac"
            ),
        )
    )


def bigram_counts(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Corpus bigram table (adjacent word pairs → occurrence counts),
    the building block for n-gram LM stats and collocation mining.

    The pair array is built JVM-side with ``transform(sequence(...))``
    over the token array (no UDF, no self-join); counting is one hash
    aggregation on the bigram string.
    """
    # guard single-token docs: sequence(1, 0) in Spark counts DOWN to
    # [1, 0] rather than yielding an empty array, and element_at(_, 0)
    # throws — so emit array() explicitly when there is no pair
    pairs = F.expr(
        f"CASE WHEN size(split({text_col}, ' ')) < 2 THEN array()"
        f" ELSE transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f"   i -> concat(element_at(split({text_col}, ' '), i), ' ',"
        f"              element_at(split({text_col}, ' '), i + 1))) END"
    )
    return (
        df.select(F.explode(pairs).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .select("bigram", F.col("n").cast("bigint").alias("n"))
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Context-window chunking for training-sequence prep: split each
    document into windows of ``chunk_tokens`` whitespace tokens,
    starting every ``stride`` tokens (``chunk_tokens - stride`` tokens
    of overlap carry context across boundaries — the standard
    fixed-window + stride scheme for LLM pretraining and embedding
    indexing).

    Output: one row per (doc, chunk) with 0-based ``chunk_id``, the
    chunk's exact token count, and the chunk text. A document shorter
    than one window yields exactly one (possibly short) chunk; an
    empty document yields one empty chunk, so no document silently
    disappears from the training set.

    Scale design: pure JVM higher-order functions (split / sequence /
    transform / slice / array_join) under whole-stage codegen plus one
    explode — map-only, ZERO shuffles at any scale, and chunk count is
    bounded by ceil(doc_tokens / stride), never materializing the
    token array more than once per row. No reference analog
    (the reference pipeline has no text-prep layer).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    n = F.size(toks)
    # ceil(max(n - chunk, 0) / stride) + 1 starts, in exact int math
    n_chunks = (
        (F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("bigint") + F.lit(1)
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return base.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Per-term inverted index: exact document frequency, total
    occurrence count, and a BOUNDED posting list — the ``k`` documents
    with the highest in-document term frequency (ties break to the
    lowest document id), as a rank-ordered array.

    Scale design: df/total_tf are plain hash aggregations. The posting
    list deliberately is NOT ``collect_list`` over every matching
    document — a stopword term would accumulate corpus-sized agg state.
    Instead a per-term rank window keeps k rows per term (Spark rewrites
    ``row_number <= k`` to WindowGroupLimit, pruning each map partition
    to k before the shuffle), and only those k rows reach the array
    build. The two term-keyed subplans (stats, postings) hash-partition
    identically, so the join adds no exchange and the Exchange reuse
    rule dedupes the shuffle.
    """
    words = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = words.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc"))
    postings = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .groupBy("term")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rnk", "doc"))),
                lambda s: s["doc"].cast("bigint"),
            ).alias("top_docs")
        )
    )
    return stats.join(postings, "term")


def _budget_boundary(
    df: DataFrame,
    budget: int,
    score_col: str,
    token_col: str,
    id_col: str,
    bins: int,
    max_rebins: int,
):
    """The histogram-walk core of :func:`token_budget_select`: narrow
    the budget boundary to a small row set WITHOUT a global sort.
    Returns ``(above, path, cum)`` where ``above`` is the predicate
    for rows kept outright (strictly better than the final boundary
    bucket), ``path`` the predicate for the boundary bucket that must
    pay the exact cumsum window (None when everything fits outright),
    and ``cum`` the token total already committed above the bucket.

    Each level runs two bounded jobs over the CURRENT bucket only
    (a min/max/sum aggregate and a ≤``bins``-row histogram; level 0's
    bucket is the whole input, exactly the pre-round-9 cost), then the
    driver walks the histogram in prefix order — ``(score DESC)``
    while the bucket spans multiple scores, switching to ``(id ASC)``
    once the bucket is a single-score tie run, which is the same
    global ``(score DESC, id ASC)`` order the window uses. Recursion
    stops as soon as the bucket's token mass is ≤ ~2/``bins`` of the
    corpus total (the documented bound), the bucket degenerates to a
    single ``(score, id)`` point, or ``max_rebins`` levels are spent.
    """
    above = F.lit(False)
    path = F.lit(True)
    cum = 0
    total: int | None = None
    for level in range(max_rebins + 1):
        cur = df.where(path)
        st = cur.agg(
            F.min(score_col).alias("slo"),
            F.max(score_col).alias("shi"),
            F.min(id_col).alias("ilo"),
            F.max(id_col).alias("ihi"),
            F.sum(token_col).alias("toks"),
        ).first()
        if st["slo"] is None:
            return above, None, cum  # empty bucket — nothing to window
        t_cur = int(st["toks"] or 0)
        if total is None:
            total = t_cur
        if cum + t_cur <= budget:
            # the whole (remaining) bucket fits — keep it outright
            return above | path, None, cum + t_cur
        if level and t_cur <= max(1, (2 * total) // bins):
            break  # bound restored: the window input is ≤ ~2/bins
        if float(st["slo"]) != float(st["shi"]):
            key, asc = score_col, False
            lo, hi = float(st["slo"]), float(st["shi"])
        elif st["ilo"] != st["ihi"]:
            # an all-ties score run: within it the global order is
            # id ASC, so an id histogram narrows it the same way —
            # but only a NUMERIC id COLUMN can histogram: the bin
            # arithmetic and the driver's bin walk follow numeric
            # order, which for a string id column diverges from the
            # lexicographic order the exact window uses even when
            # every value happens to parse as a number ("98" > "100"
            # lexicographically). Checking the TYPE, not value
            # castability, keeps all-digit string ids on the safe
            # fall-back too (round-9 ADVICE + round-10 review):
            # window the bucket as-is, the pre-re-bin behavior.
            from pyspark.sql.types import NumericType

            if not isinstance(df.schema[id_col].dataType, NumericType):
                break
            lo, hi = float(st["ilo"]), float(st["ihi"])
            key, asc = id_col, True
        else:
            break  # a single (score, id) point — indivisible
        width = (hi - lo) / bins or 1.0
        bin_col = F.least(
            F.floor((F.col(key) - F.lit(lo)) / F.lit(width)),
            F.lit(bins - 1),
        ).cast("int")
        per_bin = {
            r["_bin"]: r["toks"]
            for r in cur.groupBy(bin_col.alias("_bin"))
            .agg(F.sum(token_col).alias("toks"))
            .collect()
        }
        boundary = None
        for b in range(bins) if asc else range(bins - 1, -1, -1):
            t = int(per_bin.get(b, 0) or 0)
            if cum + t <= budget:
                cum += t
                continue
            boundary = b
            break
        if boundary is None:  # unreachable (cum+t_cur > budget) — guard
            break
        over = (bin_col < boundary) if asc else (bin_col > boundary)
        above = above | (path & over)
        path = path & (bin_col == boundary)
    return above, path, cum


def token_budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    bins: int = 256,
    max_rebins: int = 3,
) -> DataFrame:
    """Quality-ranked selection under a token budget: keep documents
    in ``(score DESC, id ASC)`` order while the running token total
    stays ≤ ``budget`` — the data-mixing step that cuts a curated
    corpus down to a training budget (highest-quality prefix, exact).

    Scale design: the textbook formulation is one global window
    cumsum — a single-task sort at any scale. Here the global order is
    only materialized where it matters: (1) one hash aggregation bins
    documents by score into ≤``bins`` buckets with per-bucket token
    sums; (2) the driver walks the ≤``bins``-row histogram from the
    top to find the BOUNDARY bucket where the cumulative crosses the
    budget (bounded driver state, like the advisor's manifest reads);
    (3) every document above the boundary is kept by a map-only
    filter (no sort, no shuffle); (4) only the boundary bucket pays
    the exact cumsum window. Equal scores always share a bucket, so
    bucket order is consistent with the global order and the prefix
    this selects is bit-identical to the single-window answer.
    Degenerate score distributions (one value dominating) collapse the
    boundary bucket toward the whole input; :func:`_budget_boundary`
    RE-BINS the boundary bucket recursively (by score while it spans
    several, by id once it is a single tie run — the same global
    order) until its token mass is back under ~2/``bins`` of the
    corpus or ``max_rebins`` levels are spent, so the exact window's
    input stays bounded even when every document scores the same.
    """
    above, path, cum = _budget_boundary(
        df, budget, score_col, token_col, id_col, bins, max_rebins
    )
    if path is None:
        return df.where(above)
    kept_above = df.where(above)
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bin_kept = (
        df.where(path)
        .withColumn("_cum", F.sum(token_col).over(w) + F.lit(cum))
        .where(F.col("_cum") <= budget)
        .drop("_cum")
    )
    return kept_above.unionByName(bin_kept)
