"""Text-analysis operators: token counting, quality scoring,
language ID, document fingerprinting (SURVEY §2 B-7).

Everything here is built-in `pyspark.sql.functions` — JVM-side,
whole-stage-codegen'd, no Python in the hot path. At 100 TB these are
embarrassingly parallel map-only transforms: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword
# language-ID heuristic. Fixed and ordered: ties resolve by this
# priority (en first), deterministically.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.col(text) if isinstance(text, str) else text, " ")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    """Token counting: whitespace-split size."""
    return df.withColumn(out, F.size(tokens(text_col)))


def _marker_count(text_col: str, markers: tuple[str, ...]) -> Column:
    in_list = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter(split({text_col}, ' '), x -> x IN ({in_list})))"
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: token count, mean token length, stopword
    ratio, alpha ratio. All ratios ROUND(x, 6) doubles (oracle
    determinism, see queries.py header)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    compact = F.regexp_replace(F.col(text_col), " ", "")
    alpha_only = F.regexp_replace(F.col(text_col), "[^a-zA-Z ]", "")
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("n_chars_obs", n_chars)
        .withColumn(
            "mean_token_len",
            F.round(F.length(compact).cast("double") / n_tokens, 6),
        )
        .withColumn(
            "stopword_ratio",
            F.round(
                _marker_count(text_col, STOPWORDS).cast("double") / n_tokens, 6
            ),
        )
        .withColumn(
            "alpha_ratio",
            F.round(F.length(alpha_only).cast("double") / n_chars, 6),
        )
    )


def language_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Language ID via marker-word counts with fixed-priority argmax.

    A real deployment would use fastText/CLD3; this keeps the exact
    same Spark plumbing (map-only, codegen) with a transparent,
    oracle-checkable heuristic.
    """
    counts = {lang: _marker_count(text_col, m) for lang, m in LANG_MARKERS.items()}
    out_df = df
    for lang, c in counts.items():
        out_df = out_df.withColumn(f"score_{lang}", c)
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("unknown")
    # Build the when-chain in reverse so earlier languages win ties.
    for lang in reversed(langs):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out_df.withColumn(out, pred)


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: MD5 of whitespace-normalized, lowercased
    text. Stable across engines (standard MD5 hex)."""
    normalized = F.lower(F.trim(F.regexp_replace(F.col(text_col), "\\s+", " ")))
    return df.withColumn(out, F.md5(normalized))


# PII patterns written in the regex subset Java (Spark) and RE2
# (DuckDB, Go) share: character classes, bounded repeats, \b, \d —
# no lookaround, no backreferences. Order matters: emails are
# redacted before IPs/phones so an address never half-matches the
# digit patterns.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out: str = "redacted"
) -> DataFrame:
    """PII scrubbing for training corpora: redact emails, IPv4
    addresses, and phone-shaped numbers, and count each category
    (the counts feed per-source PII-rate dashboards; the redacted
    text replaces the original downstream).

    Pure ``regexp_count``/``regexp_replace`` — JVM-side, codegen'd,
    map-only: zero shuffle at any scale. Counts are taken on the
    original text *before* any replacement so categories don't mask
    each other; replacements then apply in PII_PATTERNS order.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, token)
    return df.select("*", *counts, redacted.alias(out))


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    min_count: int = 1,
) -> DataFrame:
    """Self-supervised unigram language-model score per document: the
    corpus's own token frequencies become the model, and each doc is
    scored by its mean token log-probability. Degenerate/gibberish
    text scores far below fluent text — the classic cheap proxy for
    perplexity-based quality filtering when no external LM is
    available.

    Plan shape (scale-first):
    - one explode → two hash aggregations: per-(doc, term) TF and the
      global vocabulary. Shuffled rows are token *types*, not token
      instances.
    - the vocabulary (bounded by distinct terms, further truncated by
      ``min_count``) broadcasts back onto the per-doc TF rows — no
      doc-sized shuffle for the scoring join.
    - out-of-vocabulary terms (possible only when ``min_count > 1``)
      get a floor log-prob of ``ln(0.5) - ln(total)`` (Laplace-ish
      half-count), so truncating the broadcast never drops tokens.

    Both engines compute ``ln(tf_global) - ln(total)`` (not
    ``ln(tf/total)``) so the floating-point expression trees are
    identical before the final ROUND.
    """
    keys = [id_col, *carry_cols]
    toks = df.select(
        *keys,
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(*keys, "term").agg(F.count(F.lit(1)).alias("tfd"))
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tfg"))
    total_df = vocab.agg(F.sum("tfg").alias("n_total"))
    kept = vocab.filter(F.col("tfg") >= min_count) if min_count > 1 else vocab
    scored = (
        tf.join(F.broadcast(kept), "term", "left")
        .crossJoin(F.broadcast(total_df))
        .withColumn(
            "logp",
            F.when(
                F.col("tfg").isNotNull(),
                F.log(F.col("tfg")) - F.log(F.col("n_total")),
            ).otherwise(F.log(F.lit(0.5)) - F.log(F.col("n_total"))),
        )
    )
    return scored.groupBy(*keys).agg(
        F.sum("tfd").cast("bigint").alias("n_tokens"),
        F.round(F.sum(F.col("tfd") * F.col("logp")) / F.sum("tfd"), 6).alias(
            "avg_logprob"
        ),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition metrics, Gopher-rule style: the
    most-frequent-unigram fraction (``max_tf_ratio``) and the
    distinct-token fraction (``distinct_ratio``) — the two cheapest
    signals of boilerplate/degenerate text in a pretraining corpus.

    Explode → two hash aggregations (term-per-doc, then per-doc max) —
    the same shuffle shape as TF-IDF; at 100 TB the shuffled rows are
    (doc, term) pairs, bounded by corpus token *types* per doc, never
    raw token instances. ``carry_cols`` ride through the group keys
    (they must be functionally dependent on ``id_col`` — metadata like
    source/lang), which costs nothing and avoids a doc-sized join-back.
    """
    keys = [id_col, *carry_cols]
    toks = df.select(
        *keys, F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = toks.groupBy(*keys, "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy(*keys).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.max("tf").cast("bigint").alias("max_tf"),
        F.round(F.max("tf") / F.sum("tf"), 6).alias("max_tf_ratio"),
        F.round(F.count(F.lit(1)) / F.sum("tf"), 6).alias("distinct_ratio"),
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram language-model score per document:
    ``p(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·c(w2)/N`` with the corpus as
    its own model — one order of context above
    :func:`unigram_logprob`, so templated/boilerplate text (fluent
    unigrams, repetitive transitions) separates from genuinely varied
    prose. The unigram interpolation term keeps every observed bigram
    finite (c(w2) > 0 always when the corpus is the model).

    Plan shape: bigram construction is a map-only ``zip_with`` over
    the split array; the explode feeds two hash aggregations (per-doc
    bigram TF, global bigram counts) whose shuffled rows are bigram
    *types*; the global bigram and unigram tables broadcast back onto
    the per-doc TF rows. At 100 TB the bigram vocabulary is the big
    broadcast — truncate it by min count exactly as unigram_logprob
    does and let the interpolation term absorb the tail.

    Both engines evaluate ``ln(λ·(c12/c1) + (1−λ)·(c2/N))`` with
    identical parenthesization, so the doubles agree bit-for-bit
    before the final ROUND(…, 6).
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
    )
    n = F.size(ws)
    # greatest(..., 0): an empty/1-token doc has no bigrams — slice
    # with a negative length would throw, the oracle's RANGE() simply
    # yields nothing, so clamp to the same "no rows" behavior
    pairs = F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        df.select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    tf = bg.groupBy(id_col, "w1", "w2").agg(F.count(F.lit(1)).alias("tfd"))
    bvocab = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))

    toks = df.select(F.explode(ws).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = uni.agg(F.sum("c").alias("n_total"))

    scored = (
        tf.join(F.broadcast(bvocab), ["w1", "w2"])
        .join(
            F.broadcast(
                uni.select(F.col("term").alias("w1"), F.col("c").alias("c1"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "logp",
            F.log(
                F.lit(lam) * (F.col("c12") / F.col("c1"))
                + F.lit(1.0 - lam) * (F.col("c2") / F.col("n_total"))
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("tfd").cast("bigint").alias("n_bigrams"),
        F.round(F.sum(F.col("tfd") * F.col("logp")) / F.sum("tfd"), 6).alias(
            "avg_logprob"
        ),
    )


def classifier_weights(d: int = 64, bias: float = -0.35) -> tuple[list[float], float]:
    """A deterministic 'pretrained' linear model for the hashed-n-gram
    scorer: weight j = ((j*37 + 11) mod 21 - 10) / 10 ∈ [-1.0, 1.0].
    Stands in for fastText-style trained weights (training happens
    offline; SERVING at corpus scale is the Spark problem); both
    engines parse the same decimal literals, so scores replay
    exactly."""
    return [((j * 37 + 11) % 21 - 10) / 10.0 for j in range(d)], bias


def load_classifier_weights(path: str) -> tuple[list[float], float]:
    """Load exported linear-classifier weights from a JSON file of
    shape ``{"weights": [w0, ..., w_{d-1}], "bias": b}`` — the bridge
    that lets a REAL offline-trained model (e.g. a fastText quality
    classifier's hashed-bucket projection) ride the same zero-UDF
    codegen path as the synthetic stand-in: training happens wherever
    it happens; serving at corpus scale is one Spark scan with the
    weights inlined as an expression literal. Floats round-trip
    exactly (``json`` parses to IEEE doubles, ``repr`` in the SQL
    literal preserves them), so a file-loaded model scores
    bit-identically to the same weights passed in memory."""
    import json as _json

    with open(path) as fh:
        model = _json.load(fh)
    try:
        weights = [float(w) for w in model["weights"]]
        bias = float(model["bias"])
    except (KeyError, TypeError, ValueError) as exc:
        raise ValueError(
            f"{path} is not a classifier weights file: expected JSON "
            f'{{"weights": [...], "bias": x}} ({exc})'
        ) from exc
    if not weights:
        raise ValueError(f"{path} has an empty weights vector")
    return weights, bias


def hashed_ngram_score(
    df: DataFrame,
    weights: list[float] | str,
    bias: float | None = None,
    text_col: str = "text",
    out: str = "score",
) -> DataFrame:
    """FastText-shaped linear text classifier INFERENCE, zero UDFs:
    features are the document's DISTINCT word unigrams+bigrams hashed
    into ``len(weights)`` buckets (portable 56-bit hash, so a SQL
    oracle on another engine replays the exact bucket ids); the score
    is the bias plus the sum of the bucket weights, folded over the
    SORTED feature list (a canonical fold order makes the IEEE sum
    bit-identical across engines), rounded to 6.

    Scale design: the weight table rides as a broadcast expression
    literal (d doubles — a hashed linear model is kilobytes at any
    corpus size) and the whole scorer is one map-only whole-stage-
    codegen projection: classifying 100 TB is exactly one scan. This
    is the quality-classifier step of a pretraining pipeline (e.g.
    CCNet/GPT-3-style quality filtering) expressed as columnar
    expressions rather than a per-row model call.

    ``weights`` may be the in-memory list or a PATH to an exported
    JSON weights file (``{"weights": [...], "bias": x}`` — see
    :func:`load_classifier_weights`); with a file, ``bias`` defaults
    to the file's value (an explicit ``bias=`` overrides it).
    """
    from .dedup import _shingles_sql, portable_hash56_sql

    if isinstance(weights, str):
        weights, file_bias = load_classifier_weights(weights)
        if bias is None:
            bias = file_bias
    if bias is None:
        raise ValueError(
            "bias is required when weights are passed in memory"
        )
    d = len(weights)
    w_arr = "array(" + ", ".join(f"{w!r}D" for w in weights) + ")"
    feats = (
        f"array_sort(array_distinct(concat("
        f"  filter(split({text_col}, ' '), x -> x != ''),"
        f"  {_shingles_sql(text_col, 2)})))"
    )
    h = portable_hash56_sql("t")
    score = (
        f"round({bias!r}D + aggregate({feats}, 0.0D,"
        f" (acc, t) -> acc + element_at({w_arr}, "
        f"cast(pmod({h}, {d}) as int) + 1)), 6)"
    )
    return df.withColumn(out, F.expr(score))
