"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash (SURVEY §2 B-7).

Scale design:
- Exact dedup is one hash-shuffle on a fingerprint key (never on the
  full text — group on md5, not the document body).
- Jaccard verification is always *blocked*: candidate pairs come from
  a bounded blocking key (LSH band buckets or metadata blocks), never
  an unblocked O(n²) cross join.
- MinHash signatures are computed with built-in xxhash64 over shingle
  arrays — JVM codegen, no Python UDF; banding turns near-dup search
  into an equi-self-join on (band_id, band_hash), which Spark
  executes as one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def portable_hash56_sql(expr_sql: str) -> str:
    """SQL fragment hashing a string expression to a 56-bit BIGINT that
    DuckDB reproduces bit-for-bit: first 14 hex chars of md5, parsed as
    an integer.

    Spark:  cast(conv(substring(md5(x), 1, 14), 16, 10) as bigint)
    DuckDB: CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT)

    Production paths default to xxhash64 (one JVM intrinsic vs md5's
    digest + hex + parse), but md5 mode makes every LSH query exactly
    verifiable against a SQL oracle on another engine — the hash IS the
    semantics for MinHash/SimHash, so a cross-engine check needs a
    cross-engine hash.
    """
    return f"cast(conv(substring(md5({expr_sql}), 1, 14), 16, 10) as bigint)"


def exact_duplicates(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup (hash-groupBy): one row per distinct content with
    the kept (minimum) id and the duplicate count.

    Groups on md5(content) so the shuffle carries 16-byte keys, not
    document bodies — at 100 TB this is the difference between a
    manageable shuffle and moving the corpus.
    """
    return (
        df.select(F.md5(F.col(key_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, key_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id row per distinct content (deterministic, unlike
    dropDuplicates which keeps an arbitrary row)."""
    keep = exact_duplicates(df, key_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def span_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 50,
    hash_keys: bool | None = None,
) -> DataFrame:
    """C4-style SPAN-level exact dedup (Raffel et al. 2020 §2.2 dedup
    repeated three-sentence spans): split each document into
    consecutive ``span_words``-word segments, keep each distinct
    segment's FIRST corpus-wide occurrence (smallest ``(id, position)``)
    and drop every other occurrence, then reassemble the survivors in
    order. Returns ``(id_col, n_spans, kept_spans, deduped_text)`` —
    documents whose every span was seen earlier disappear entirely
    (kept_spans = 0 rows are dropped); documents with NULL ``text_col``
    pass through with ``n_spans = kept_spans = 0`` and NULL text rather
    than silently vanishing in the explode.

    The 50-word default approximates C4's three-SENTENCE span (~17
    words/sentence in English web text). Deduping much shorter spans
    (e.g. 3 words) removes every common trigram corpus-wide and
    mangles natural text — divergence from that default should be
    deliberate.

    This is sub-document dedup — the training-corpus complement to the
    whole-document operators above: boilerplate (headers, nav bars,
    license blocks) repeats across documents that are NOT
    near-duplicates as wholes, so doc-granularity MinHash never
    removes it. The reference dedups whole records only
    (StreamFlow silver `_dedup_latest`); spans are the corpus-scale
    extension.

    Scale design (100 TB):
    - Span building is pure JVM HOFs over the split array
      (sequence → transform → slice): no explode-regroup round trip,
      no Python, whole-stage codegen end to end.
    - First-occurrence election is ``groupBy(span).agg(min(struct(id,
      pos)))`` — partial map-side combine absorbs boilerplate skew (a
      span occurring 10⁷ times collapses to one row per map task,
      where a row_number window would sort the whole group on a
      single reducer). Winners join back as a standard shuffled
      equi-join.
    - ``hash_keys`` swaps the election/join key from the span STRING
      to ``xxhash64(span)`` — an 8-byte shuffle/sort key instead of a
      ~300-byte one at the 50-word default, and the winners side of
      the join carries hashes only. Default (None) auto-enables at
      ``span_words >= 16``, where the key-width saving dominates;
      short-span runs (e.g. the 5-word oracle query) keep exact
      string keys so a SQL oracle can replay the election. Collision
      note: two distinct spans sharing a 64-bit hash are elected as
      one, dropping the later span's occurrences — expectation
      ~n²/2⁶⁵ pairs, i.e. a handful of spans lost per ~10¹⁰ distinct
      spans (100 TB corpus scale); acceptable for dedup (which is
      lossy by intent), switch ``hash_keys=False`` for exactness.
    - Reassembly is one groupBy(doc) + array_sort — linear, no window.
    """
    if hash_keys is None:
        hash_keys = span_words >= 16
    seg = _span_segments(df, text_col, id_col, span_words)
    # the election/join key: the span itself, or its 8-byte hash
    if hash_keys:
        seg = seg.withColumn("_ck", F.xxhash64("chunk"))
        key = "_ck"
    else:
        key = "chunk"
    firsts = seg.select(key, id_col, "seg").groupBy(key).agg(
        F.min(F.struct(id_col, "seg")).alias("first")
    )
    kept = seg.join(firsts, key).where(
        (F.col(id_col) == F.col(f"first.{id_col}"))
        & (F.col("seg") == F.col("first.seg"))
    )
    deduped = kept.groupBy(id_col, "n_spans").agg(
        F.count(F.lit(1)).alias("kept_spans"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "chunk"))),
                lambda x: x["chunk"],
            ),
        ).alias("deduped_text"),
    )
    # NULL text can't be spanned but must not disappear: size(split(
    # NULL)) is NULL, so posexplode above drops the row — surface it
    # explicitly with zero spans instead
    null_text = df.where(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("kept_spans"),
        F.lit(None).cast("string").alias("deduped_text"),
    )
    return deduped.unionByName(null_text)


def _span_segments(
    df: DataFrame, text_col: str, id_col: str, span_words: int
) -> DataFrame:
    """One row per (doc, position, span) for non-NULL text — the
    shared span builder (pure JVM HOFs: split → sequence → transform →
    slice, no explode-regroup round trip, no Python)."""
    arr = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(arr) / F.lit(span_words)).cast("long")
    spans = F.transform(
        F.sequence(F.lit(1), n_spans.cast("int")),
        lambda s: F.concat_ws(
            " ", F.slice(arr, (s - 1) * span_words + 1, span_words)
        ),
    )
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        n_spans.alias("n_spans"),
        F.posexplode(spans).alias("seg", "chunk"),
    )


def _span_hash(portable: bool) -> F.Column:
    """The span fingerprint: xxhash64 in production (one JVM
    intrinsic), or the portable 56-bit md5 hash when a SQL oracle on
    another engine must replay the index bit-for-bit."""
    if portable:
        return F.expr(portable_hash56_sql("chunk"))
    return F.xxhash64("chunk")


def span_index_build(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 50,
    portable: bool = False,
) -> DataFrame:
    """The corpus's distinct span fingerprints — one ``span_hash``
    (xxhash64, 8 bytes) per distinct ``span_words``-word segment.

    This is the persisted half of INCREMENTAL span dedup (the span
    twin of ``lsh_band_buckets``): build once over the ingested
    corpus, write as parquet, and every new crawl batch dedups
    against the index via :func:`span_dedup_incremental` — priced at
    the batch plus one shuffle of 8-byte hashes, never a re-scan of
    the corpus text. Mergeable by construction: the index of a grown
    corpus is ``union().distinct()`` of the old index and the new
    batch's hashes, so ingestion maintains it incrementally too.
    """
    seg = _span_segments(df, text_col, id_col, span_words)
    return seg.select(
        _span_hash(portable).alias("span_hash")
    ).distinct()


def span_dedup_incremental(
    new_df: DataFrame,
    span_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 50,
    portable: bool = False,
) -> DataFrame:
    """Span-dedup a NEW batch against an already-ingested corpus: a
    span survives only if it is absent from ``span_index`` (the
    corpus's :func:`span_index_build` output) AND it is the batch's
    own first occurrence. Returns the same shape as
    :func:`span_dedup` (``id, n_spans, kept_spans, deduped_text``;
    NULL-text rows pass through with zero spans).

    Scale design: the election shuffles the batch's 8-byte span
    hashes; the index anti-join is one shuffled equi-join whose index
    side carries hashes only (8 bytes/span — ~0.3% of the corpus's
    text bytes at the 50-word default), so per-batch cost is priced
    by the batch and the INDEX, never the corpus. Collision odds as
    in :func:`span_dedup` hash mode (~n²/2⁶⁵ — a handful of spans per
    10¹⁰ distinct, acceptable for a lossy-by-intent dedup).
    """
    seg = _span_segments(new_df, text_col, id_col, span_words).withColumn(
        "_ck", _span_hash(portable)
    )
    firsts = seg.select("_ck", id_col, "seg").groupBy("_ck").agg(
        F.min(F.struct(id_col, "seg")).alias("first")
    )
    kept = (
        seg.join(firsts, "_ck")
        .where(
            (F.col(id_col) == F.col(f"first.{id_col}"))
            & (F.col("seg") == F.col("first.seg"))
        )
        .join(
            span_index.select(F.col("span_hash").alias("_ck")),
            "_ck",
            "left_anti",
        )
    )
    deduped = kept.groupBy(id_col, "n_spans").agg(
        F.count(F.lit(1)).alias("kept_spans"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg", "chunk"))),
                lambda x: x["chunk"],
            ),
        ).alias("deduped_text"),
    )
    null_text = new_df.where(F.col(text_col).isNull()).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_spans"),
        F.lit(0).cast("long").alias("kept_spans"),
        F.lit(None).cast("string").alias("deduped_text"),
    )
    return deduped.unionByName(null_text)


def incremental_new_docs(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-corpus incremental dedup: rows of ``new_df`` whose
    normalized-content fingerprint appears nowhere in ``existing_df``
    (the already-ingested corpus), deduped within the batch itself
    (min-id row wins per fingerprint).

    This is the every-crawl operation of a training-data pipeline:
    yesterday's corpus never rewrites; today's batch anti-joins
    against it. Both sides reduce to 32-char md5 fingerprints before
    the join, so the shuffle carries hashes, not documents — and the
    anti-join is an equi-join Spark can run shuffled-hash or
    broadcast (when the *batch* is the small side, Spark broadcasts
    the batch fingerprints against the big historical corpus).
    """
    normalized = F.lower(
        F.trim(F.regexp_replace(F.col(text_col), "\\s+", " "))
    )
    new_fp = new_df.withColumn("fingerprint", F.md5(normalized))
    old_fp = existing_df.select(F.md5(normalized).alias("fingerprint"))
    fresh = new_fp.join(old_fp, "fingerprint", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint").orderBy(id_col)
    return (
        fresh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _shingles_sql(text_col: str, n: int) -> str:
    """SQL fragment for the distinct word n-gram shingle array — the
    single source of truth shared by shingles(), minhash_signatures,
    and the LSH verification step.

    Kept as a SQL string (not Column API) deliberately: embedding a
    parsed F.expr array inside an F.transform Python lambda silently
    mis-binds the lambda's extra literal arguments (observed on
    4.1.2: every xxhash64(s, lit(seed)) collapsed to the same
    seed-independent value), so the minhash path composes the full
    expression as one SQL string.
    """
    return (
        f"array_distinct(transform("
        f"  sequence(0, greatest(size(split({text_col}, ' ')) - {n}, 0)),"
        f"  i -> concat_ws(' ', slice(split({text_col}, ' '), i + 1, {n}))))"
    )


def shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct word n-gram shingle array, via built-in array functions."""
    return F.expr(_shingles_sql(text_col, n))


def cap_group_sizes(
    df: DataFrame,
    key_cols: list[str],
    cap: int,
    observation=None,
    sample_to: int | None = None,
    order_col: str = "id",
) -> DataFrame:
    """Drop every group (by ``key_cols``) with more than ``cap`` rows
    — the mega-bucket guard every blocked pair-generator needs at
    scale (the FAISS `max_codes` / Dataproc-BigTable hot-key
    convention). A boilerplate or stopword-heavy shingle pattern can
    put m documents in one LSH bucket and m² candidate pairs on one
    task; above the cap the bucket is dropped wholesale rather than
    letting one skewed key own the stage. One window count over the
    SAME key the downstream self-join shuffles on — AQE coalesces the
    two exchanges, so the guard adds no extra shuffle.

    ``sample_to=k`` softens the guard (FAISS ``max_codes`` spirit):
    an over-cap group is SAMPLED down to its k hash-first members
    instead of vanishing, so pathological buckets keep partial
    in-bucket recall at a bounded k² pair cost. The sample is
    DETERMINISTIC — rank by ``xxhash64(order_col, keys)`` inside the
    group — so reruns, retries, and the incremental index path all
    keep the same members (a random sample would make near-dup output
    nondeterministic across retries). Groups at or under ``cap`` are
    never touched by either mode.

    Opt-in everywhere (callers default to no cap) so exact oracles
    stay exact. When ``observation`` (a :class:`pyspark.sql.
    Observation`) is passed, the dropped/seen row counts ride on the
    same job as named metrics (``rows_dropped``, ``rows_seen``) — the
    logged evidence of what the cap discarded, with no second pass.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols)
    sized = df.withColumn("_gsz", F.count(F.lit(1)).over(w))
    if sample_to is None:
        keep = F.col("_gsz") <= cap
        if observation is not None:
            sized = sized.observe(
                observation,
                F.sum((~keep).cast("long")).alias("rows_dropped"),
                F.count(F.lit(1)).alias("rows_seen"),
            )
        return sized.filter(keep).drop("_gsz")
    if sample_to > cap:
        raise ValueError(
            f"sample_to ({sample_to}) must be <= cap ({cap}) — a sample "
            "larger than the cap would never engage"
        )
    wr = w.orderBy(
        F.xxhash64(F.col(order_col), *[F.col(c) for c in key_cols]),
        F.col(order_col),  # hash-collision tie-break keeps rank total
    )
    sized = sized.withColumn("_grk", F.row_number().over(wr))
    keep = (F.col("_gsz") <= cap) | (F.col("_grk") <= sample_to)
    if observation is not None:
        sized = sized.observe(
            observation,
            F.sum((~keep).cast("long")).alias("rows_dropped"),
            F.count(F.lit(1)).alias("rows_seen"),
        )
    return sized.filter(keep).drop("_gsz", "_grk")


def jaccard_pairs(
    df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_block_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Blocked word-set Jaccard near-dup pairs.

    Pairs are generated only within ``block_col`` groups (metadata
    blocking — e.g. source or LSH bucket), so the self-join is an
    equi-join Spark shuffles once on the block key; no cross join.
    ``max_block_size`` (opt-in) drops blocks larger than the cap
    before pairing — see :func:`cap_group_sizes`.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    toks = df.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("words"),
    )
    if max_block_size is not None:
        toks = cap_group_sizes(
            toks, ["block"], max_block_size, observation
        )
    a = toks.alias("a")
    b = toks.alias("b")
    pairs = a.join(
        b,
        on=[F.col("a.block") == F.col("b.block"), F.col("a.id") < F.col("b.id")],
    )
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    # filter on the RAW ratio (like the SQL oracle), round only for
    # display — filtering on the rounded value would admit pairs just
    # under the threshold that round up across the boundary
    raw = inter.cast("double") / union
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            raw.alias("_raw"),
        )
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("jaccard"))
    )


def jaccard_pairs_against(
    new_df: DataFrame,
    base_df: DataFrame,
    block_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Blocked Jaccard pairs with AT LEAST ONE endpoint in ``new_df``:
    the new×base cross pairs plus the new-batch-internal pairs — the
    incremental complement of :func:`jaccard_pairs`, which the base
    corpus never re-enters (its internal pairs are already known).

    ``base_df`` is the existing corpus (ids disjoint from the batch).
    Returns (id_a, id_b, jaccard) with id_a < id_b, same contract as
    :func:`jaccard_pairs`.
    """
    def toks(df):
        return df.select(
            F.col(block_col).alias("block"),
            F.col(id_col).alias("id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("words"),
        )

    a, b = toks(new_df).alias("a"), toks(base_df).alias("b")
    inter = F.size(F.array_intersect(F.col("a.words"), F.col("b.words")))
    union = F.size(F.array_union(F.col("a.words"), F.col("b.words")))
    raw = inter.cast("double") / union
    cross = (
        a.join(b, on=[F.col("a.block") == F.col("b.block")])
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            raw.alias("_raw"),
        )
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("jaccard"))
    )
    internal = jaccard_pairs(new_df, block_col, id_col, text_col, threshold)
    return cross.unionByName(internal)


def contained_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_posting_size: int | None = None,
    observation=None,
) -> DataFrame:
    """DIRECTED containment near-dup join: every ordered pair (a, b)
    with ``|Wa ∩ Wb| / |Wa| ≥ threshold`` (word sets), i.e. document
    *a* is mostly inside *b* — the sub-document duplication signal
    Jaccard structurally misses: a quote or boilerplate block embedded
    in a much longer document has containment ~1 but Jaccard ~|a|/|b|,
    so it never crosses a symmetric threshold and MinHash-LSH (which
    approximates Jaccard) rarely even pairs it.

    Scale path: the PPJoin/prefix-filter rule (Chaudhuri et al. 2006;
    Xiao et al. 2008), not blocking. With each document's DISTINCT
    words ranked rarest-first by corpus document frequency (ties by
    word — a total order both engines can replay), any pair with
    containment ≥ τ must share one of *a*'s first
    ``p = |Wa| − floor(τ·|Wa|) + 1`` words (pigeonhole: at most
    ``|Wa| − ceil(τ·|Wa|) < p`` words of *a* are absent from *b*;
    floor rather than ceil keeps ``p`` conservative under float
    rounding). So candidates = *a*'s rarest-``p`` PREFIX exploded and
    equi-joined against the full postings list — the probe side
    carries only rare words, so posting joins stay short — and only
    candidates pay the exact intersection. Recall is EXACT by the
    pigeonhole bound: the output equals the all-pairs formulation
    row-for-row (the registry oracle is the naive all-pairs SQL — the
    hash match proves the pruned plan lost nothing).

    ``max_posting_size`` (opt-in, same contract as
    :func:`cap_group_sizes`): drop postings of words more frequent
    than the cap before the candidate join — a skew guard for
    boilerplate corpora where even a rank-1 "rarest" word is common;
    recall then holds only for pairs sharing a below-cap prefix word,
    with dropped counts riding ``observation``.

    Returns ``(id_a, id_b, containment)`` — directed, ``id_a`` is the
    contained side. NULL-text documents emit nothing on either side.
    Note the Jaccard-family tokenization convention this function
    shares: ``split`` on a single space yields one empty-string token
    for an empty text, so two all-empty documents ARE mutual
    containment-1.0 duplicates (and :func:`drop_contained` keeps
    exactly one of them — the curation-pipeline behavior you want for
    empty pages); the SQL oracle's ``string_split`` agrees.
    """
    idx = containment_index_build(
        df, threshold, id_col, text_col,
        max_posting_size=max_posting_size, observation=observation,
    )
    # candidate generation excludes capped words on BOTH sides (a
    # capped word can never match a prefix row anyway — carrying it
    # into the join would only shuffle dead rows); verification below
    # counts matched (pair, word) posting rows — capped words'
    # postings still count toward intersections, so values stay exact
    cand = (
        idx.where("is_prefix")
        .select(F.col("id").alias("id_a"), "word")
        .join(
            idx.where(~F.col("capped")).select(
                F.col("id").alias("id_b"), "word"
            ),
            on="word",
        )
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # verify from POSTING ROWS (shared :func:`_containment_verify`
    # stage): the rows come straight from the tokenization — no
    # window/df re-rank; verification doesn't need ranks, only
    # membership and |Wa|
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("words"),
        )
        .where(F.col(text_col).isNotNull())
        .where(F.size("words") > 0)
    )
    return _containment_verify(
        cand,
        toks.select("id", F.explode("words").alias("word")),
        toks.select("id", F.size("words").alias("n_words")),
        threshold,
    )


def drop_contained(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The dedup ACTION on :func:`contained_pairs`: remove every
    document τ-contained in a document with MORE distinct words (ties
    broken toward the smaller id, so a mutually-contained
    near-identical pair drops exactly one side). Returns the surviving
    rows of ``df`` unchanged."""
    sizes = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_sid"),
            F.size(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("_n"),
        )
    )
    pairs = contained_pairs(df, threshold, id_col, text_col)
    na = sizes.select(
        F.col("_sid").alias("id_a"), F.col("_n").alias("_na")
    )
    nb = sizes.select(
        F.col("_sid").alias("id_b"), F.col("_n").alias("_nb")
    )
    doomed = (
        pairs.join(na, on="id_a")
        .join(nb, on="id_b")
        .where(
            (F.col("_nb") > F.col("_na"))
            | ((F.col("_nb") == F.col("_na")) & (F.col("id_b") < F.col("id_a")))
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return df.join(doomed, on=id_col, how="left_anti")


def dedup_batch_ids(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One deterministic row per id — smallest ``text_col`` first,
    NULLs last, ties broken by every REMAINING orderable column (so a
    duplicated id carrying byte-identical text but different metadata
    still resolves to the same physical row on every replay — the
    round-11 ADVICE case: without the tie-break, row_number picked an
    arbitrary row and replays could persist different non-text column
    values to the corpus). Columns of non-orderable types (maps,
    nested maps) are excluded from the tie-break; rows identical on
    every orderable column AND differing only in a map column remain
    an arbitrary-but-harmless pick among equals the election treats
    identically. This is the batch-internal collision rule of the
    containment ingestion election (two source files re-crawling the
    same page into one batch). Exposed so a caller that persists the
    batch can dedup BEFORE the persist and hand
    :func:`drop_contained_against` an already-unique frame
    (``assume_unique_ids=True``) — otherwise the election's internal
    dedup window re-shuffles on every subplan reference above the
    cache."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    from pyspark.sql.window import Window as _Window

    def orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(orderable(f.dataType) for f in dt.fields)
        return True

    tiebreak = [
        F.col(f.name).asc_nulls_last()
        for f in df.schema.fields
        if f.name not in (id_col, text_col) and orderable(f.dataType)
    ]
    w = _Window.partitionBy(id_col).orderBy(
        F.col(text_col).asc_nulls_last(), *tiebreak
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def drop_contained_against(
    new_df: DataFrame,
    index: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    on_overlap: str = "error",
    assume_unique_ids: bool = False,
) -> DataFrame:
    """The dedup ACTION on :func:`contained_pairs_incremental` — which
    rows of a crawl batch SURVIVE ingestion against an already-indexed
    corpus: a batch document drops when it is τ-contained in a CORPUS
    document (ingest-order precedence — the old page wins, whatever
    the sizes) or in a batch-mate with MORE distinct words (ties
    toward the smaller id — :func:`drop_contained`'s rule, evaluated
    against the batch AS CRAWLED: a doomed batch-mate still dooms its
    containees, the same chain semantics). NULL-text documents pass
    through: they have no words, containment is undefined for them,
    and a curation pipeline must not lose pages it merely failed to
    extract. This is the per-micro-batch election
    ``streaming.jobs.stream_containment_dedup`` runs, exposed for
    BATCH ingestion pipelines. Returns the surviving rows of
    ``new_df`` unchanged.

    ``on_overlap``: ``"error"`` (default) fails loudly on a batch id
    already in the index (an EAGER check — see
    :func:`contained_pairs_incremental`); ``"drop"`` applies the
    first-ingest-wins re-crawl policy END-TO-END — the overlapping
    batch row is neither probed NOR returned (the already-ingested
    copy is the document of record); ``"unchecked"`` skips the check
    for callers that established disjointness out-of-band (explicit
    opt-out — an actual overlap silently corrupts the election).

    BATCH-INTERNAL id collisions (two source files re-crawling the
    same page into one batch) are resolved HERE, not left as a caller
    precondition — a duplicated id would double-count its posting
    rows exactly like a batch/index overlap, corrupting containment
    values. One row per id survives, chosen deterministically
    (:func:`dedup_batch_ids` — smallest text, NULLs last), so replays
    of the same batch elect identically. A caller that has ALREADY
    run :func:`dedup_batch_ids` (e.g. to dedup before persisting the
    batch, as the streaming job does) passes
    ``assume_unique_ids=True`` and skips the window's shuffle."""
    if on_overlap not in ("error", "drop", "unchecked"):
        raise ValueError(
            f"on_overlap must be 'error', 'drop', or 'unchecked', "
            f"got {on_overlap!r}"
        )
    if not assume_unique_ids:
        new_df = dedup_batch_ids(new_df, id_col, text_col)
    if on_overlap == "drop":
        # drop re-crawls from the SURVIVOR set too, not just the probe
        # input — first-ingest-wins means the batch copy is discarded
        new_df = new_df.join(
            index.select(F.col("id").alias(id_col)).distinct(),
            on=id_col,
            how="left_anti",
        )
    # the election never acts on old-in-new pairs (an ingestion step
    # doesn't retire corpus docs — that's containment_compact's job),
    # so don't generate or verify that direction at all
    pairs = contained_pairs_incremental(
        new_df, index, threshold, id_col, text_col, on_overlap,
        directions=("new_in_old", "new_in_new"),
    )
    batch_ids = new_df.select(F.col(id_col).alias("_bid"))
    sizes = new_df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_sid"),
        F.size(
            F.array_distinct(F.split(F.col(text_col), " "))
        ).alias("_n"),
    )
    # ONE classification pass over the pairs (the probe pipeline
    # appears once in the plan — a union of per-rule branches would
    # replicate the whole candidate+verify subtree per rule): keep
    # pairs whose contained side is a batch doc, LEFT-mark whether the
    # container is a batch-mate, and doom on either rule —
    # contained-in-CORPUS (no mark) drops outright (ingest-order
    # precedence, whatever the sizes); contained-in-batch-mate drops
    # by drop_contained's size/id rule. _nb is non-null whenever _bid2
    # is (a NULL-text doc never appears as a container — it has no
    # posting rows).
    doomed = (
        pairs.join(batch_ids, pairs.id_a == F.col("_bid"))
        .join(
            batch_ids.withColumnRenamed("_bid", "_bid2"),
            pairs.id_b == F.col("_bid2"),
            "left",
        )
        .join(
            sizes.select(
                F.col("_sid").alias("id_a"), F.col("_n").alias("_na")
            ),
            on="id_a",
        )
        .join(
            sizes.select(
                F.col("_sid").alias("id_b"), F.col("_n").alias("_nb")
            ),
            on="id_b",
            how="left",
        )
        .where(
            F.col("_bid2").isNull()
            | (F.col("_nb") > F.col("_na"))
            | (
                (F.col("_nb") == F.col("_na"))
                & (F.col("id_b") < F.col("id_a"))
            )
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return new_df.join(doomed, on=id_col, how="left_anti")


def containment_index_build(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_posting_size: int | None = None,
    observation=None,
) -> DataFrame:
    """The persisted half of INCREMENTAL containment dedup (the
    containment twin of :func:`span_index_build` /
    :func:`lsh_band_buckets`): one row per (document, distinct word)
    — ``(id, word, n_words, is_prefix)`` — where ``is_prefix`` marks
    the document's :func:`contained_pairs` prefix (the
    ``|W| − floor(threshold·|W|) + 1`` corpus-rarest words). Build
    once at ingest, write as parquet; every new crawl batch probes it
    via :func:`contained_pairs_incremental` priced by the batch plus
    the matched postings, never a corpus text re-scan.

    The prefix is valid for ANY probe threshold ≥ the build
    ``threshold``: the pigeonhole bound holds for any
    ``p``-word subset and ``p`` only shrinks as τ grows, so a longer
    stored prefix stays a superset of the needed one — and the build
    threshold is RECORDED in the ``build_tau`` column so
    :func:`contained_pairs_incremental` can enforce the precondition
    instead of trusting a docstring. Verification never reads text
    either — intersection sizes come from the posting rows.

    ``max_posting_size`` / ``observation``: the same opt-in
    over-frequent-word cap as :func:`contained_pairs` (which derives
    its prefix and postings from this function). Capped words are
    FLAGGED (``capped`` column), not dropped: they are excluded from
    prefixes and from candidate-generation joins — the skew the cap
    exists to stop — but their posting rows remain, so intersection
    counts (and therefore containment values) stay exact for every
    pair the candidate stage does surface. Dropped/seen word counts
    ride ``observation`` as observe metrics."""
    toks = (
        corpus.select(
            F.col(id_col).alias("id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("words"),
        )
        .where(F.col(text_col).isNotNull())
        .where(F.size("words") > 0)
    )
    exploded = toks.select(
        "id", F.size("words").alias("n_words"),
        F.explode("words").alias("word"),
    )
    wdf = exploded.groupBy("word").agg(F.count("*").alias("df"))
    if max_posting_size is None:
        wdf = wdf.withColumn("capped", F.lit(False))
    else:
        capped = F.col("df") > max_posting_size
        if observation is not None:
            wdf = wdf.observe(
                observation,
                F.sum(capped.cast("long")).alias("rows_dropped"),
                F.count(F.lit(1)).alias("rows_seen"),
            )
        wdf = wdf.withColumn("capped", capped)
    from pyspark.sql.window import Window

    # capped words sort last so they never consume a prefix slot
    w = Window.partitionBy("id").orderBy("capped", "df", "word")
    prefix_len = (
        F.col("n_words")
        - F.floor(F.lit(float(threshold)) * F.col("n_words"))
        + 1
    )
    return (
        exploded.join(wdf, on="word")
        .withColumn("_rn", F.row_number().over(w))
        .select(
            "id", "word", "n_words",
            ((F.col("_rn") <= prefix_len) & ~F.col("capped")).alias(
                "is_prefix"
            ),
            "capped",
            F.lit(float(threshold)).alias("build_tau"),
        )
    )


def _containment_verify(
    cand: DataFrame,
    words: DataFrame,
    sizes: DataFrame,
    threshold: float,
) -> DataFrame:
    """The shared verification stage behind :func:`contained_pairs`,
    :func:`contained_pairs_incremental`, and
    :func:`containment_compact` — one pipeline, not three hand-synced
    copies: |Wa ∩ Wb| is the count of matched (pair, word) POSTING
    rows (``words`` = one (id, word) row per distinct word, both
    sides' union), divided by ``sizes``' (id, n_words) for the
    contained side, filtered on the RAW ratio and rounded only for
    display. No document ever ships its word array through these
    joins — a fat document is |W| narrow rows."""
    inter = (
        cand.join(
            words.select(F.col("id").alias("id_a"), "word"), on="id_a"
        )
        .join(
            words.select(F.col("id").alias("id_b"), "word"),
            on=["id_b", "word"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    na = sizes.select(
        F.col("id").alias("id_a"), F.col("n_words").alias("_na")
    )
    raw = F.col("_inter").cast("double") / F.col("_na")
    return (
        inter.join(na, on="id_a")
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("containment"))
    )


_ALL_DIRECTIONS = ("new_in_old", "old_in_new", "new_in_new")


def _containment_candidates(
    batch_idx: DataFrame,
    index: DataFrame,
    directions: tuple = _ALL_DIRECTIONS,
) -> DataFrame:
    """The candidate join behind :func:`contained_pairs_incremental`
    (split out so the scale ladder can price candidate VOLUME with the
    exact production plan): a's prefix must hit one of b's UNCAPPED
    postings (pigeonhole; prefixes already exclude capped words).
    ``directions`` selects which of new-in-old / old-in-new /
    new-in-new branches to generate — a caller that discards a
    direction afterwards (the ingestion election never acts on
    old-in-new) saves its whole candidate+verify volume by not
    generating it. Returns distinct ``(id_a, id_b)``."""
    unknown = [d for d in directions if d not in _ALL_DIRECTIONS]
    if unknown or isinstance(directions, str):
        raise ValueError(
            f"unknown directions {unknown or [directions]} — pass a "
            f"tuple of names from {_ALL_DIRECTIONS} (a misspelled name "
            "would silently lose pairs; a bare string would "
            "substring-match)"
        )
    branches = []
    if "new_in_old" in directions:
        open_index = index.where(~F.col("capped"))
        branches.append(
            batch_idx.where("is_prefix")
            .select(F.col("id").alias("id_a"), "word")
            .join(
                open_index.select(F.col("id").alias("id_b"), "word"),
                on="word",
            )
        )
    if "old_in_new" in directions:
        branches.append(
            index.where("is_prefix")
            .select(F.col("id").alias("id_a"), "word")
            .join(
                batch_idx.select(F.col("id").alias("id_b"), "word"),
                on="word",
            )
        )
    if "new_in_new" in directions:
        branches.append(
            batch_idx.where("is_prefix")
            .select(F.col("id").alias("id_a"), "word")
            .join(
                batch_idx.select(F.col("id").alias("id_b"), "word"),
                on="word",
            )
            .where(F.col("id_a") != F.col("id_b"))
        )
    if not branches:
        raise ValueError(
            f"directions must name at least one of {_ALL_DIRECTIONS}"
        )
    cand = branches[0]
    for b in branches[1:]:
        cand = cand.unionByName(b)
    return cand.select("id_a", "id_b").distinct()


def contained_pairs_incremental(
    new_df: DataFrame,
    index: DataFrame,
    threshold: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    on_overlap: str = "error",
    directions: tuple = _ALL_DIRECTIONS,
) -> DataFrame:
    """Containment pairs with AT LEAST ONE endpoint in ``new_df``,
    probed against a PERSISTED :func:`containment_index_build` frame.
    Covers all three directions a crawl batch creates — a new doc
    contained in a corpus doc (quote of an old page), a corpus doc
    contained in a new doc (new page engulfs an old one), and
    new-internal pairs — and equals the full :func:`contained_pairs`
    restriction to those pairs row-for-row (the registry oracle is
    the naive SQL over the union). ``threshold`` must be ≥ the
    index's recorded ``build_tau`` for the stored prefixes to stay
    recall-complete — ENFORCED here (ValueError), not just
    documented; the index frame carries its build threshold precisely
    so a mis-dialed probe fails loudly instead of silently losing
    pairs. Capped index words (``capped``) are excluded from
    candidate joins but their posting rows still count toward
    intersections, so containment VALUES are always exact.

    Batch ids must be DISJOINT from the index's — an overlapping id
    would put its posting rows in the verification union twice (batch
    ∪ index), double-counting intersections (containment values up to
    2.0, false pairs crossing the threshold). Also ENFORCED, per
    ``on_overlap``: ``"error"`` (default) raises ValueError naming a
    sample of the colliding ids — NOTE this mode runs an EAGER Spark
    action (distinct + semi-join + limit collect) at call time, in an
    otherwise fully-lazy function: the check must decide before the
    plan is handed back, and the id-column semi-join it pays is an
    order below the posting joins the probe runs anyway. Callers that
    build plans speculatively or probe in a tight loop have two lazy
    alternatives: ``"drop"`` anti-joins the overlapping batch rows
    away INSIDE the returned plan (the re-crawl upsert policy: the
    already-ingested copy wins — what
    ``streaming.jobs.stream_containment_dedup`` wants; it enforces
    the policy against the full corpus id set itself and passes
    ``"drop"`` here so the invariant is re-asserted for free in the
    probe plan instead of paying an eager check per micro-batch), and
    ``"unchecked"`` skips the check entirely for callers that have
    ALREADY established disjointness out-of-band (the scale ladder
    builds its batch ids from a reserved range; a caller that just
    anti-joined the batch itself) — with ``"unchecked"`` an
    overlapping id silently corrupts containment values, so it is an
    explicit opt-out, never a default.

    Priced by the batch: candidates are (batch prefix ⋈ index
    postings) ∪ (index prefix rows ⋈ batch postings) — rare-word
    posting joins on both sides — and verification counts
    intersections from the POSTING ROWS of candidate pairs (one
    (pair, word) join-and-count per side), so neither the corpus
    text nor its non-candidate postings are ever touched beyond the
    word-keyed equi-joins. ``directions`` restricts which pair
    directions are generated AND verified (default all three) — the
    ingestion election (:func:`drop_contained_against`) never acts on
    old-in-new, so skipping it there removes that direction's whole
    candidate+verify volume instead of discarding it post-join."""
    if on_overlap not in ("error", "drop", "unchecked"):
        raise ValueError(
            f"on_overlap must be 'error', 'drop', or 'unchecked', "
            f"got {on_overlap!r}"
        )
    # MAX over the column: an index grown by appends (e.g. the
    # streaming job) may carry several build generations, and every
    # stored prefix must be long enough for this probe
    tau_max = index.agg(F.max("build_tau")).first()[0]
    if tau_max is not None and threshold < float(tau_max):
        raise ValueError(
            f"probe threshold {threshold} is below the index's build "
            f"threshold {float(tau_max)} — the stored prefixes are "
            f"too short for this probe to be recall-complete; rebuild "
            f"the index at the lower threshold "
            f"(containment_index_build)"
        )
    index_ids = index.select("id").distinct()
    if on_overlap == "drop":
        new_df = new_df.join(
            index_ids.select(F.col("id").alias(id_col)),
            on=id_col,
            how="left_anti",
        )
    elif on_overlap == "error":
        clash = sorted(
            {
                r["id"]
                for r in new_df.select(F.col(id_col).alias("id"))
                .distinct()
                .join(index_ids, on="id")
                .limit(5)
                .collect()
            }
        )
        if clash:
            raise ValueError(
                f"batch ids overlap the containment index's (sample: "
                f"{clash}) — an overlapping id double-counts its "
                f"posting rows and corrupts containment values; drop "
                f"or re-route re-crawled ids before probing "
                f"(on_overlap='drop' applies first-ingest-wins)"
            )
    batch_idx = containment_index_build(
        new_df, threshold, id_col, text_col
    )
    cand = _containment_candidates(batch_idx, index, directions)
    # verify from posting rows: |Wa ∩ Wb| = matched (pair, word) count
    return _containment_verify(
        cand,
        batch_idx.select("id", "word").unionByName(
            index.select("id", "word")
        ),
        batch_idx.select("id", "n_words")
        .unionByName(index.select("id", "n_words"))
        .distinct(),
        threshold,
    )


def containment_compact(
    spark,
    corpus_path: str,
    index_path: str,
    new_ids: DataFrame | None = None,
    threshold: float | None = None,
    id_col: str = "doc_id",
    dv_threshold: float | None = None,
    since_version: int | None = None,
) -> dict:
    """OFFLINE corpus compaction for containment-superseded documents
    — the action path for the old-in-new pairs the streaming ingest
    (:func:`streaming.jobs.stream_containment_dedup`) reports but
    never acts on: a re-crawl that collects an EXPANDED page appends
    the new page (it survives — it is not contained in anything) while
    the engulfed old page sits in the corpus forever. This job retires
    every corpus document τ-contained in one of the ``new_ids``
    documents and keeps the containment index consistent in the same
    run.

    Everything is computed from the INDEX POSTING ROWS — the corpus
    text is never read: candidates are (old prefix rows ⋈ new
    documents' uncapped postings) by the same pigeonhole rule as
    :func:`contained_pairs` (recall exact), verification counts
    matched (pair, word) posting rows, and the doomed set is the
    distinct contained-side ids. ``threshold`` defaults to the
    index's recorded ``build_tau`` (max across append generations)
    and must be ≥ it — the same enforcement as
    :func:`contained_pairs_incremental`.

    Deletion runs through the snapshot layer's MERGE
    (``maintenance.snapshot_merge`` with WHEN MATCHED DELETE / WHEN
    NOT MATCHED IGNORE — the id-SET sibling of
    ``maintenance.snapshot_delete``'s scalar predicates): file-level
    pruning from manifest min/max + bloom stats, so retiring a
    handful of engulfed pages from a 100 TB corpus rewrites (or, with
    ``dv_threshold``, sidecar-masks) only the files those ids live
    in, under OCC, one commit per table. CORPUS FIRST, then index:
    the doomed set is derived from the index, so a crash between the
    two commits leaves a state where re-running the job recomputes
    the SAME doomed set (its posting rows are still indexed), no-ops
    the corpus merge, and completes the index cleanup — self-healing,
    whereas index-first would orphan the corpus rows unfindably.

    ``new_ids``: one-column DataFrame (``id_col``) naming the
    already-ingested documents to treat as the engulfing candidates —
    typically the ids appended since the last compaction (the
    streaming job's recent batches). For the SCHEDULED form pass
    ``since_version=`` instead: the candidate set is then derived as
    the corpus ids at the CURRENT head minus the ids at that version,
    so a cron'd compaction needs no id bookkeeping of its own. The
    version to pass is the ``head_version`` the PREVIOUS run returned
    — the corpus snapshot its derivation actually read — NOT the
    version its merge committed: the merge version's lineage already
    contains any docs the stream appended concurrently during that
    run, and seeding from it would skip them forever (their engulfed
    old pages would never retire). ``head_version`` rides every
    return, including the nothing-doomed early exits, precisely so
    the scheduler always has the next seed. ``since_version=0`` (the
    before-the-table-existed version) makes the FULL corpus at the
    pinned head the window — the bootstrap form. Deriving it HERE, at
    the same manifest read that pins ``head_version``, is what makes
    bootstrap safe under concurrent stream commits: a caller that
    read the corpus itself and passed the ids as ``new_ids`` could
    pin a LATER head between its read and this function's, leaving
    the concurrently-appended docs outside every window once the
    seed advances past them.

    Doom rules: a doc contained in a WINDOW doc it predates retires
    outright (the container is newer); a pair WITHIN the window (an
    old page and the expanded re-crawl that engulfs it can land in
    the same compaction window) carries no order information, so it
    resolves by :func:`drop_contained`'s size/id rule — more distinct
    words wins, ties toward the smaller id, exactly one of a
    mutually-contained pair survives. A doc contained only in
    NON-window docs is never touched (those pairs were resolved at
    their own ingest or compaction time). Returns ``{doomed,
    head_version, corpus, index}`` (merge result dicts; ``doomed`` is
    the retired doc count).
    """
    from group5_spark.medallion.maintenance import snapshot_merge
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    if (new_ids is None) == (since_version is None):
        raise ValueError(
            "pass exactly one of new_ids= (explicit engulfing-candidate "
            "ids) or since_version= (derive them from the corpus "
            "versions appended since)"
        )
    # pin the derivation snapshot FIRST: everything at or before this
    # version is covered by this run; the caller seeds the next run
    # with it, so a doc appended between here and this run's merge
    # commit lands in the NEXT run's candidate window instead of
    # falling between the two
    head_version = snapshot_manifest(corpus_path)["version"]
    if new_ids is None:
        new_ids = snapshot_read(
            spark, corpus_path, version=head_version
        ).select(id_col)
        if since_version:
            # since_version=0 = the empty pre-table state: the whole
            # pinned head IS the window, no base snapshot to diff
            new_ids = new_ids.join(
                snapshot_read(spark, corpus_path, version=since_version)
                .select(id_col),
                on=id_col,
                how="left_anti",
            )
    idx = snapshot_read(spark, index_path)
    tau_max = idx.agg(F.max("build_tau")).first()[0]
    if threshold is None:
        if tau_max is None:
            return {
                "doomed": 0,
                "head_version": head_version,
                "corpus": None,
                "index": None,
            }
        threshold = float(tau_max)
    elif tau_max is not None and threshold < float(tau_max):
        raise ValueError(
            f"compaction threshold {threshold} is below the index's "
            f"build threshold {float(tau_max)} — the stored prefixes "
            f"are too short for this probe to be recall-complete"
        )
    nids = new_ids.select(F.col(id_col).alias("id")).distinct()
    new_idx = idx.join(nids, on="id", how="left_semi")
    # the contained side is EVERY indexed doc, not just the pre-window
    # corpus: two docs of the SAME window (an old page and the
    # expanded re-crawl that engulfs it, ingested hours apart but
    # compacted together) must still resolve — excluding window ids
    # from the contained side would leak the engulfed one forever
    # (old-in-old pairs are never probed by any later run)
    cand = (
        idx.where("is_prefix")
        .select(F.col("id").alias("id_a"), "word")
        .join(
            new_idx.where(~F.col("capped")).select(
                F.col("id").alias("id_b"), "word"
            ),
            on="word",
        )
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = _containment_verify(
        cand,
        idx.select("id", "word"),
        idx.select("id", "n_words").distinct(),
        threshold,
    )
    # doom rule: contained-in-a-NEWER-doc retires outright (the
    # container is in the window, the contained doc predates it);
    # WITHIN-window pairs carry no order information, so they resolve
    # by drop_contained's size/id rule — the same tie-break every
    # other containment election uses, keeping exactly one of a
    # mutually-contained pair
    sizes = idx.select("id", "n_words").distinct()
    a_new = nids.select(
        F.col("id").alias("id_a"), F.lit(True).alias("_anew")
    )
    doomed = (
        pairs.join(a_new, on="id_a", how="left")
        .join(
            sizes.select(
                F.col("id").alias("id_a"), F.col("n_words").alias("_na")
            ),
            on="id_a",
        )
        .join(
            sizes.select(
                F.col("id").alias("id_b"), F.col("n_words").alias("_nb")
            ),
            on="id_b",
        )
        .where(
            F.col("_anew").isNull()
            | (F.col("_nb") > F.col("_na"))
            | (
                (F.col("_nb") == F.col("_na"))
                & (F.col("id_b") < F.col("id_a"))
            )
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
        .persist()
    )
    try:
        n_doomed = doomed.count()
        if not n_doomed:
            return {
                "doomed": 0,
                "head_version": head_version,
                "corpus": None,
                "index": None,
            }
        note = {"op": "containment_compact", "threshold": threshold}
        if since_version is not None:
            note["since_version"] = since_version

        def padded(table_path: str, key: str) -> DataFrame:
            # the merge contract wants the full table schema on the
            # source (inserts could need it); this merge never inserts
            # (NOT MATCHED ignore) or updates, so every non-key column
            # is a typed NULL that is never read
            ids = doomed.select(F.col(id_col).alias(key))
            tbl = snapshot_read(spark, table_path).limit(0)
            return ids.select(
                *[
                    F.col(key).alias(c)
                    if c == key
                    else F.lit(None).cast(t).alias(c)
                    for c, t in tbl.dtypes
                ]
            )

        corpus_res = snapshot_merge(
            spark,
            corpus_path,
            padded(corpus_path, id_col),
            keys=[id_col],
            when_matched="delete",
            when_not_matched="ignore",
            dv_threshold=dv_threshold,
            note=note,
        )
        index_res = snapshot_merge(
            spark,
            index_path,
            padded(index_path, "id"),
            keys=["id"],
            when_matched="delete",
            when_not_matched="ignore",
            dv_threshold=dv_threshold,
            note=note,
        )
    finally:
        doomed.unpersist()
    return {
        "doomed": n_doomed,
        "head_version": head_version,
        "corpus": corpus_res,
        "index": index_res,
    }


DEFAULT_COMPACTION_SEED_TAG = "containment-compaction-seed"


def containment_compact_scheduled(
    spark,
    corpus_path: str,
    index_path: str,
    seed_tag: str = DEFAULT_COMPACTION_SEED_TAG,
    threshold: float | None = None,
    id_col: str = "doc_id",
    dv_threshold: float | None = None,
    bootstrap: str = "full",
) -> dict:
    """ZERO-BOOKKEEPING scheduled form of :func:`containment_compact`
    (round-11 VERDICT #2): the ``since_version=`` seed the next run
    needs is persisted as a snapshot TAG on the corpus table itself,
    so a cron line is literally
    ``pipeline.py snapshot compact-containment --table_path <corpus>
    --index-path <index>`` with no state of its own. Tags are the
    right store for the seed — a tag IS a persisted name→version ref,
    and :func:`medallion.snapshots.snapshot_expire` always keeps a
    tagged manifest and its file closure, so retention can never
    delete the very version the next compaction must diff against.

    Each run: read the seed tag → run
    ``containment_compact(since_version=seed)`` (candidates = corpus
    ids at the current head minus the ids at the seed — everything the
    stream appended since the last run) → move the tag to the
    ``head_version`` the run pinned. The tag moves on EVERY run,
    including nothing-doomed ones (``head_version`` rides every
    return precisely for this), so idle periods don't re-scan old
    windows. Crash-safety: the tag moves only AFTER both merge
    commits; a crash anywhere re-runs with the old seed, recomputes a
    superset window, finds the already-retired docs gone from the
    index (no posting rows — they can't be re-doomed and can't doom
    others), retires whatever the crashed run missed, and THEN
    advances the tag — idempotent, self-healing, same argument as the
    corpus-first commit order inside :func:`containment_compact`.

    First run (no seed tag yet), per ``bootstrap``: ``"full"``
    (default) treats the ENTIRE corpus as the candidate window — a
    one-time full containment election (within-window size/id rule
    everywhere) that clears any engulfed pages accumulated before the
    schedule existed; ``"skip"`` plants the tag at the current head
    without compacting — for deployments that started the schedule
    with the stream and know no old-in-new debt exists. Returns the
    :func:`containment_compact` dict plus ``{"seed": <previous seed
    version or None>, "bootstrap": <mode or None>}``. A corpus table
    that doesn't exist yet returns ``{"doomed": 0, "head_version":
    None, ...}`` without planting a tag when EITHER table doesn't
    exist yet — the cron may fire before the stream's first commit,
    or inside the crash window where the corpus landed but the index
    commit didn't (corpus-first order); the run after the replay
    heals still covers every corpus version."""
    from pathlib import Path as _Path

    from group5_spark.medallion.snapshots import (
        _current_version,
        snapshot_tag,
        snapshot_tags,
    )

    if bootstrap not in ("full", "skip"):
        raise ValueError(
            f"bootstrap must be 'full' or 'skip', got {bootstrap!r}"
        )
    if not _current_version(_Path(corpus_path)) or not _current_version(
        _Path(index_path)
    ):
        # either table missing = nothing to compact. The INDEX-absent
        # case is a real crash window, not just a fresh deployment:
        # the stream commits corpus first, so its very first batch can
        # die between the two commits and leave corpus-without-index
        # for the cron to find. Return without planting or advancing
        # the seed tag — the next run (after the stream's replay
        # heals the index) bootstraps or resumes normally, and no
        # corpus version escapes a window.
        return {
            "doomed": 0,
            "head_version": None,
            "corpus": None,
            "index": None,
            "seed": None,
            "bootstrap": None,
        }
    seed = snapshot_tags(corpus_path).get(seed_tag)
    if seed is None:
        if bootstrap == "skip":
            head = snapshot_tag(corpus_path, seed_tag, overwrite=False)
            return {
                "doomed": 0,
                "head_version": head,
                "corpus": None,
                "index": None,
                "seed": None,
                "bootstrap": "skip",
            }
        # since_version=0 = full-corpus window derived INSIDE
        # containment_compact at its own pinned head_version — reading
        # the corpus here and passing new_ids would let a concurrent
        # stream commit land between this read and compact's manifest
        # pin, and the seed tag (placed at compact's head) would then
        # advance past docs no window ever examined
        res = containment_compact(
            spark,
            corpus_path,
            index_path,
            threshold=threshold,
            id_col=id_col,
            dv_threshold=dv_threshold,
            since_version=0,
        )
        res["bootstrap"] = "full"
    else:
        res = containment_compact(
            spark,
            corpus_path,
            index_path,
            threshold=threshold,
            id_col=id_col,
            dv_threshold=dv_threshold,
            since_version=seed,
        )
        res["bootstrap"] = None
    snapshot_tag(
        corpus_path, seed_tag, version=res["head_version"], overwrite=True
    )
    res["seed"] = seed
    return res


def incremental_components(
    prior_labels: DataFrame,
    new_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Merge NEW near-dup pairs into an EXISTING ``(id, comp)``
    component assignment without re-reading the historical pair graph.

    Correctness: a prior component's labels form a star contraction
    (every member points at the component's min id), and contracting
    a connected subgraph preserves connectivity — so running min-label
    propagation over (contraction edges ∪ new pairs) yields exactly
    the components of (historical ∪ new) edges. Work per refresh is
    proportional to |prior vertices| + |new pairs| per round, and the
    contracted graph's diameter is ≤ 2 + the new-pair path length —
    NOT the historical graph's, so old deep clusters never slow a
    refresh. Returns ``(id, comp)`` covering every id in either input.
    """
    contraction = prior_labels.select(
        F.col("id").alias(id_a), F.col("comp").alias(id_b)
    )
    edges = contraction.unionByName(new_pairs.select(id_a, id_b))
    return connected_components(edges, id_a, id_b, max_iter)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash signature per document: for seed i, min over shingles of
    hash(shingle, i). Pure built-ins → codegen, no UDF.

    ``hash_fn="xxhash64"`` (default) is the fast production hash;
    ``"md5"`` selects the 56-bit portable hash (seed mixed in via
    ``concat(shingle, ':', seed)``) whose signatures a DuckDB oracle
    reproduces exactly — see :func:`portable_hash56_sql`.
    """
    if hash_fn == "md5":
        def seeded(seed: int) -> str:
            return portable_hash56_sql(f"concat(s, ':', {seed})")
    elif hash_fn == "xxhash64":
        def seeded(seed: int) -> str:
            return f"xxhash64(s, {seed})"
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    # materialize the shingle array ONCE: inlining _shingles_sql into
    # each signature expression re-runs the split/slice/concat pipeline
    # num_hashes times per row (Catalyst does not CSE across the
    # projection) — measured 3.5x slower at 16 hashes
    shingled = df.select(
        F.col(id_col).alias("id"),
        F.expr(_shingles_sql(text_col, shingle_n)).alias("_sh"),
    )
    sig_cols = [
        F.expr(f"array_min(transform(_sh, s -> {seeded(seed)}))").alias(
            f"mh_{seed}"
        )
        for seed in range(num_hashes)
    ]
    return shingled.select("id", *sig_cols)


def lsh_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    observation=None,
    sample_bucket_to: int | None = None,
) -> DataFrame:
    """The LSH *index rows* for a corpus: one ``(id, band, bucket)``
    row per document per band (documents sharing any (band, bucket)
    are near-dup candidates).

    This is the persistable half of MinHash-LSH: write these rows to
    a snapshot table partitioned/bucketed by ``(band, bucket)`` and
    every future batch can probe the corpus WITHOUT recomputing its
    signatures — see :func:`incremental_near_dups`. At 100 TB the
    index is ~bands × 16 bytes per doc, and a probe is an equi-join
    on the bucket key, never a corpus text scan.

    ``max_bucket_size`` (opt-in, off by default so oracle paths stay
    exact) drops any (band, bucket) with more rows — the mega-bucket
    guard for boilerplate/stopword shingle patterns whose m-member
    bucket would otherwise emit m² candidates; see
    :func:`cap_group_sizes` for the metric contract.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n, hash_fn=hash_fn)

    def bucket_col(b: int) -> F.Column:
        members = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        if hash_fn == "md5":
            return F.expr(
                portable_hash56_sql(f"concat_ws('|', {', '.join(members)})"))
        return F.xxhash64(*[F.col(m) for m in members])

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                bucket_col(b).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    out = sigs.select("id", F.explode(band_structs).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    if max_bucket_size is not None:
        out = cap_group_sizes(
            out, ["band", "bucket"], max_bucket_size, observation,
            sample_to=sample_bucket_to,
        )
    return out


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    observation=None,
    sample_bucket_to: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs (shingle → minhash → band →
    bucket-join → verify).

    Signatures are split into ``bands``; documents sharing any band
    hash become candidates (one explode + one equi-self-join on the
    band bucket — the classic scalable plan). Candidates are verified
    with true word-set Jaccard. Deterministic: fixed hash seeds; with
    ``hash_fn="md5"`` the whole pipeline (signatures, band buckets,
    verified pairs) is reproducible in DuckDB SQL for oracle gating.
    ``max_bucket_size`` (opt-in) caps candidate generation per
    (band, bucket) — see :func:`lsh_band_buckets`; recall on pairs
    outside the dropped mega-buckets is unchanged because every
    band's bucket votes independently.
    """
    buckets = lsh_band_buckets(
        df, id_col, text_col, num_hashes, bands, shingle_n, hash_fn,
        max_bucket_size=max_bucket_size, observation=observation,
        sample_bucket_to=sample_bucket_to)

    a = buckets.alias("a")
    b = buckets.alias("b")
    candidates = (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    words = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, shingle_n).alias("sh"),
    )
    # filter on the RAW ratio (like jaccard_pairs and the SQL oracle),
    # round only for display
    raw = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    verified = (
        candidates.join(words.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(words.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= threshold)
        .select("id_a", "id_b", F.round("_raw", 6).alias("jaccard"))
    )
    return verified


def incremental_near_dups(
    new_df: DataFrame,
    corpus_df: DataFrame,
    corpus_index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    observation=None,
    sample_bucket_to: int | None = None,
) -> DataFrame:
    """Near-duplicates of a NEW batch against an EXISTING corpus using
    the corpus's persisted LSH band-bucket index — the every-crawl
    near-dup operation, priced by the batch, not the corpus.

    ``corpus_index`` is the :func:`lsh_band_buckets` output for the
    corpus (typically ``snapshot_read`` of an index table maintained
    by appending each ingested batch's buckets). When None it is
    derived from ``corpus_df`` — correct, but that recomputes corpus
    signatures, which is exactly what the persisted index avoids at
    scale.

    Plan shape at 100 TB: the batch's buckets (bands × |batch| rows)
    equi-join the index on (band, bucket) — Spark broadcasts the
    batch side; the corpus TEXT is read only for candidate ids (the
    verify join prunes the scan). Nothing ever enumerates
    batch × corpus.

    ``max_bucket_size`` (opt-in) caps the INDEX side per (band,
    bucket) before the probe join — the probe-path mega-bucket guard:
    an m-doc boilerplate bucket in the index turns every batch doc
    that lands in it into m candidates, so one hot bucket prices the
    whole probe. The batch side is already bounded by the batch.
    ``sample_bucket_to=k`` keeps a deterministic k-member sample of an
    over-cap bucket instead of dropping it (partial recall inside
    pathological buckets at ≤ k candidates per probe doc). See
    :func:`cap_group_sizes` for the dropped/seen metric contract.

    Returns ``(id_new, id_corpus, jaccard)`` pairs at/above
    ``threshold``.
    """
    if corpus_index is None:
        corpus_index = lsh_band_buckets(
            corpus_df, id_col, text_col, num_hashes, bands, shingle_n, hash_fn)
    if max_bucket_size is not None:
        corpus_index = cap_group_sizes(
            corpus_index, ["band", "bucket"], max_bucket_size, observation,
            sample_to=sample_bucket_to,
        )
    new_buckets = lsh_band_buckets(
        new_df, id_col, text_col, num_hashes, bands, shingle_n, hash_fn)

    n, c = new_buckets.alias("n"), corpus_index.alias("c")
    candidates = (
        n.join(
            c,
            on=[
                F.col("n.band") == F.col("c.band"),
                F.col("n.bucket") == F.col("c.bucket"),
            ],
        )
        .select(
            F.col("n.id").alias("id_new"), F.col("c.id").alias("id_corpus")
        )
        .distinct()
    )

    new_sh = new_df.select(
        F.col(id_col).alias("id_new"),
        shingles(text_col, shingle_n).alias("sh_new"),
    )
    corp_sh = corpus_df.select(
        F.col(id_col).alias("id_corpus"),
        shingles(text_col, shingle_n).alias("sh_corpus"),
    )
    raw = (
        F.size(F.array_intersect("sh_new", "sh_corpus")).cast("double")
        / F.size(F.array_union("sh_new", "sh_corpus"))
    )
    return (
        candidates.join(new_sh, "id_new")
        .join(corp_sh, "id_corpus")
        .withColumn("_raw", raw)
        .filter(F.col("_raw") >= threshold)
        .select("id_new", "id_corpus", F.round("_raw", 6).alias("jaccard"))
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph via
    iterative min-label propagation: every vertex converges to the
    minimum id in its component (the canonical representative).

    Returns ``(id, comp)`` for every id appearing in ``pairs``.

    Scale design: each round is one equi-join (edges × labels) + one
    min-aggregate — both shuffle on the vertex id, no cross join, no
    driver-side graph. Rounds needed = component diameter, and
    near-dup clusters are shallow (dozens of docs, diameter ≤ a few),
    so convergence is fast; ``localCheckpoint`` truncates the plan
    lineage each round so the DAG stays O(1) per iteration (on a real
    cluster point ``spark.sparkContext.setCheckpointDir`` at durable
    storage and swap in ``checkpoint`` for executor-loss resilience).
    Convergence is detected with a single scalar aggregate per round
    (count of changed labels), not a data collect.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("comp").alias("dst_comp")
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
            .select(F.col("src").alias("id"), "nbr_comp")
        )
        stepped = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.col("comp").alias("comp_prev"),
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = stepped.agg(
            F.sum((F.col("comp") != F.col("comp_prev")).cast("long"))
        ).first()[0]
        labels = stepped.select("id", "comp")
        if not changed:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds max_iter)"
    )


def simhash_bits(hash_fn: str) -> int:
    """Signature width per hash: xxhash64 gives 64 bits, the portable
    md5 hash 56 (14 hex chars)."""
    return 56 if hash_fn == "md5" else 64


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit (56-bit in md5 mode) SimHash per document from word-level
    hashing.

    Bit b of the signature is the sign of Σ_tokens (±1 per token,
    + if bit b of hash(token) is set). Expressed entirely with
    built-in higher-order array functions (transform/aggregate/filter)
    — stays in codegen; no Python. Token hashes are computed once and
    reused across all bit positions.
    """
    bits = simhash_bits(hash_fn)
    tok_hash = (
        portable_hash56_sql("t") if hash_fn == "md5" else "xxhash64(t)"
    )
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform(split({text_col}, ' '), t -> {tok_hash})").alias(
            "_hs"
        ),
    )
    return hashed.select(
        "id",
        F.expr(
            f"""
            aggregate(
              transform(sequence(0, {bits - 1}), b ->
                CASE WHEN aggregate(
                  _hs,
                  0L,
                  (acc, h) -> acc + CASE WHEN (shiftright(h, b) & 1L) = 1L
                                    THEN 1L ELSE -1L END
                ) > 0 THEN shiftleft(1L, b) ELSE 0L END),
              0L, (acc, v) -> acc | v)
            """
        ).alias("simhash"),
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs blocked on ``max_hamming + 1`` disjoint
    signature segments.

    Pigeonhole guarantee: two signatures within Hamming distance ≤
    ``max_hamming`` differ in at most ``max_hamming`` of the
    ``max_hamming + 1`` disjoint bit segments, so they agree
    exactly on at least one — candidate generation is a segment-value
    equi-self-join with FULL recall at the advertised threshold.
    (A fixed 4-quarter split only guarantees distance ≤ 3; wider
    thresholds automatically use more, narrower segments.)
    Blocking keeps the self-join an equi-join on the segment value;
    ``max_hamming + 1`` candidate rows per doc is the recall price.
    """
    bits = simhash_bits(hash_fn)
    if not 0 <= max_hamming <= bits // 2 - 1:
        raise ValueError(
            f"max_hamming must be in [0, {bits // 2 - 1}], got {max_hamming}")
    n_blocks = max_hamming + 1
    width = bits // n_blocks
    segs = []
    for q in range(n_blocks):
        start = q * width
        w = bits - start if q == n_blocks - 1 else width
        mask = (1 << w) - 1
        segs.append(
            F.struct(
                F.lit(q).alias("q"),
                F.expr(f"shiftright(simhash, {start}) & {mask}L").alias("qv"),
            )
        )
    sigs = simhash(df, id_col, text_col, hash_fn=hash_fn)
    quarters = sigs.select(
        "id",
        "simhash",
        F.explode(F.array(*segs)).alias("qq"),
    ).select("id", "simhash", F.col("qq.q").alias("q"), F.col("qq.qv").alias("qv"))
    a = quarters.alias("a")
    b = quarters.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.q") == F.col("b.q"),
                F.col("a.qv") == F.col("b.qv"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias(
                "hamming"
            ),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------
# Persisted LSH index maintenance (snapshot append job)
# --------------------------------------------------------------------
# The every-crawl production loop for near-dup detection at 100 TB:
#
#   v1 = lsh_index_init(corpus, idx_path, ...)        # once
#   for each ingested batch:
#       pairs = near_dups_against_index(batch, corpus, idx_path)
#       lsh_index_append(batch, idx_path)             # O(batch) work
#
# The index is an ordinary snapshot table of (id, band, bucket) rows,
# so it inherits the whole lakehouse contract for free: atomic commits
# (a crashed append is invisible), time travel (probe the index as of
# any corpus version), optimistic concurrency, and expire/compact
# maintenance. Each append computes signatures for the NEW batch only —
# the corpus is never re-shingled — which is the difference between
# O(batch) and O(corpus) per crawl.
#
# LSH parameters ARE the index semantics: probing a 4-band index with
# 8-band query signatures silently returns garbage candidates. The
# parameters are therefore pinned in the init commit's note and every
# append/probe validates against them instead of trusting call sites.

#: note key under which the index's LSH parameters are pinned
_LSH_NOTE_KEY = "lsh_params"


def _lsh_params(
    id_col: str, text_col: str, num_hashes: int, bands: int,
    shingle_n: int, hash_fn: str,
) -> dict:
    return {
        "id_col": id_col, "text_col": text_col, "num_hashes": num_hashes,
        "bands": bands, "shingle_n": shingle_n, "hash_fn": hash_fn,
    }


def lsh_index_params(index_path: str, version: int | None = None) -> dict:
    """The LSH parameters pinned at :func:`lsh_index_init` time —
    metadata-only (one manifest read, no Spark). ``version=`` reads
    that version's note, keeping time-travel probes self-consistent
    if the index is ever re-initialized with different parameters."""
    from group5_spark.medallion.snapshots import snapshot_manifest

    try:
        note = snapshot_manifest(index_path, version).get("note") or {}
    except FileNotFoundError:
        note = {}
    params = note.get(_LSH_NOTE_KEY)
    if not params:
        raise ValueError(
            f"{index_path} is not an LSH index table (no {_LSH_NOTE_KEY!r} "
            "note; was it created by lsh_index_init?)"
        )
    return params


def lsh_index_init(
    corpus_df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> int:
    """Bootstrap the persisted LSH index for ``corpus_df`` as a
    snapshot table: one (id, band, bucket) row per document per band.
    Returns the committed version.

    One full-corpus signature pass — the only one the index's
    lifetime ever needs; every subsequent crawl pays
    :func:`lsh_index_append` (batch-sized) instead.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    params = _lsh_params(
        id_col, text_col, num_hashes, bands, shingle_n, hash_fn)
    buckets = lsh_band_buckets(
        corpus_df, id_col, text_col, num_hashes, bands, shingle_n, hash_fn)
    return snapshot_commit(
        buckets,
        index_path,
        mode="overwrite",
        stats_cols=["band", "bucket"],
        note={_LSH_NOTE_KEY: params, "op": "lsh_index_init"},
    )


def lsh_index_append(
    new_df: DataFrame,
    index_path: str,
    extra_note: dict | None = None,
) -> int:
    """Append one ingested batch's LSH rows to the persisted index —
    the incremental maintenance job. Returns the committed version.

    Cost is O(batch): signatures are computed for ``new_df`` only and
    the commit is a blind snapshot append (no read-modify-write, no
    ``expected_parent`` — concurrent batch appends serialize through
    the chain claim and never conflict). Parameters come from the
    index's own pinned note, so a drifted call site cannot poison the
    index with incompatible signatures.

    Re-appending an id adds duplicate index rows, not wrong results:
    probes deduplicate candidates before verification
    (:func:`incremental_near_dups` ``.distinct()``); reclaim the space
    with ordinary snapshot compaction if batches can overlap.
    """
    from group5_spark.medallion.snapshots import snapshot_commit

    params = lsh_index_params(index_path)
    buckets = lsh_band_buckets(
        new_df,
        params["id_col"], params["text_col"], params["num_hashes"],
        params["bands"], params["shingle_n"], params["hash_fn"],
    )
    return snapshot_commit(
        buckets,
        index_path,
        mode="append",
        stats_cols=["band", "bucket"],
        note={
            _LSH_NOTE_KEY: params,
            "op": "lsh_index_append",
            **(extra_note or {}),
        },
    )


def near_dups_against_index(
    new_df: DataFrame,
    corpus_df: DataFrame,
    index_path: str,
    version: int | None = None,
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
    observation=None,
) -> DataFrame:
    """Near-duplicates of ``new_df`` against the corpus, probing the
    PERSISTED index at ``index_path`` (latest version by default;
    ``version=`` probes the index as of an earlier corpus state — the
    reproducible-backfill path).

    All LSH parameters come from the index's pinned note, so the
    batch's probe signatures are bucket-compatible by construction.
    ``corpus_df`` must be the corpus the index (version) describes —
    it is only read to verify candidate pairs' true Jaccard, and the
    candidate semi-set prunes that scan. ``max_bucket_size`` (opt-in)
    drops over-full index buckets before the probe join — see
    :func:`incremental_near_dups`.
    """
    from group5_spark.medallion.snapshots import (
        snapshot_manifest,
        snapshot_read,
    )

    # pin the version once: params and the index read must describe
    # the same state (a concurrent re-init with different banding
    # landing between the two resolutions would otherwise probe new
    # buckets with old-parameter signatures)
    try:
        version = snapshot_manifest(index_path, version)["version"]
    except FileNotFoundError:
        raise ValueError(
            f"{index_path} is not an LSH index table (no snapshot "
            "manifest found)"
        ) from None
    params = lsh_index_params(index_path, version=version)
    index = snapshot_read(new_df.sparkSession, index_path, version=version)
    return incremental_near_dups(
        new_df,
        corpus_df,
        corpus_index=index,
        id_col=params["id_col"],
        text_col=params["text_col"],
        num_hashes=params["num_hashes"],
        bands=params["bands"],
        shingle_n=params["shingle_n"],
        threshold=threshold,
        hash_fn=params["hash_fn"],
        max_bucket_size=max_bucket_size,
        observation=observation,
    )
