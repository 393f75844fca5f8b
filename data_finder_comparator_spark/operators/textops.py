"""Text analysis operators over the ``documents`` table.

North-star extensions (BASELINE.json): language-ID, quality scoring,
token counting, document fingerprinting. All pure built-in column
expressions (split/filter/size/regexp — JVM codegen, no UDFs), designed
so the DuckDB oracle can compute the identical value: counts are
integers, no float thresholds.

At 100 TB these are embarrassingly parallel map-side transforms — no
shuffle at all unless aggregated; the expensive part is the scan, so
they belong fused into one pass (one ``select`` computing all signals)
rather than one job per signal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import norm_key

# marker stopwords per language for the n-gram/stopword heuristic.
# Deliberately tiny and fixed: the operator contract is "deterministic
# heuristic", not linguistics; the oracle recomputes the same scores.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "los", "y", "que", "en"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")


def tokens(col: str) -> Column:
    """Whitespace tokenization with empty-token removal."""
    return F.filter(F.split(F.lower(F.col(col)), r"\s+"), lambda t: t != "")


def token_count(col: str) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_token_count(col: str) -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("long")


def bpe_ish_piece_count(col: str) -> Column:
    """Token-piece count under a BPE-ish segmentation regex: runs of
    letters, runs of digits, or single other non-space chars — an
    upper-bound proxy for subword token counts."""
    return F.regexp_count(F.col(col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast(
        "long"
    )


def marker_hits(col: str, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t))).cast("long")


def lang_guess(col: str) -> Column:
    """argmax over per-language marker-hit counts, deterministic
    tiebreak on language code ascending — a chained CASE (first lang
    whose hits are >= all others wins), trivially mirrored in the
    oracle SQL."""
    langs = sorted(LANG_MARKERS)  # de, en, es, fr, zh
    hits = {lang: marker_hits(col, LANG_MARKERS[lang]) for lang in langs}
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = hits[lang] >= hits[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def quality_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass quality/statistics projection (fused scan)."""
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        token_count(text_col).alias("n_tokens"),
        distinct_token_count(text_col).alias("n_types"),
        bpe_ish_piece_count(text_col).alias("n_pieces"),
        F.length(norm_key(F.col(text_col))).cast("long").alias("n_alnum_chars"),
        marker_hits(text_col, STOPWORDS).alias("n_stopwords"),
        lang_guess(text_col).alias("lang_guess"),
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 8) -> DataFrame:
    """Winnowing-lite content fingerprint: min and max md5 over the
    k-gram shingle set plus the shingle count — an order-independent,
    portable content signature (collision-resistant enough for
    candidate pre-filtering; not cryptographic identity).

    Entirely map-side: the shingle set never leaves the row (array
    expressions — no explode, no shuffle), so at scale this is exactly
    one pass over the corpus with zero exchanges."""
    n = norm_key(F.col(text_col))
    hashes = F.expr(
        f"array_distinct(transform(sequence(1, length(_n) - {k - 1}),"
        f" i -> md5(substring(_n, i, {k}))))"
    )
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"), n.alias("_n"))
        .filter(F.length("_n") >= k)
        .withColumn("_h", hashes)
        .select(
            "doc_id",
            F.array_min("_h").alias("fp_min"),
            F.array_max("_h").alias("fp_max"),
            F.size("_h").cast("long").alias("n_shingles"),
        )
    )


def scrub_hot_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    span: int = 3,
    cache_registry: list | None = None,
) -> DataFrame:
    """C4-style duplicate-span REMOVAL (the scrub `duplicate_spans`
    only diagnoses): drop from every document each token covered by any
    ``span``-gram that occurs in >= ``min_docs`` distinct documents.

    Deterministic, order-free semantics (a token is removed iff SOME
    hot gram covers it — no left-to-right scan state), so the whole
    transform is expressible as joins/aggregations in ANY engine:

    1. grams:   (doc, start_pos, gram) from the whitespace token list;
    2. hot:     grams with count(DISTINCT doc) >= min_docs (equi-join
                back, never a broadcast of the corpus vocabulary);
    3. covered: each hot start marks positions [start, start+span-1];
    4. output per doc: token count, removed count, and the md5 of the
       surviving tokens joined by single spaces (portable fingerprint
       of the cleaned text — the full text column stays available by
       joining back on doc_id in a pipeline).

    Scale: every stage keys on doc_id or gram — the same fan-out /
    hash-agg shapes as `duplicate_spans`; per-doc state is bounded by
    the token count, and the hot-gram table is corpus-frequency-sized
    (tiny after the >=min_docs filter). ``base`` (the tokenized corpus,
    three consumers) and ``grams`` (the span explode, two consumers)
    persist via the repo's ``cache_registry`` contract so one call
    tokenizes and explodes once, not 4x/2x; the caller unpersists the
    registry entries after its action.
    """
    def _track(frame: DataFrame) -> DataFrame:
        if cache_registry is None:
            return frame
        frame = frame.persist()
        cache_registry.append(frame)
        return frame

    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = _track(
        df.select(F.col(id_col).cast("long").alias("doc_id"), toks.alias("_t"))
    )
    tok_pos = base.select(
        "doc_id", F.posexplode("_t").alias("pos", "tok")
    )
    grams = _track(
        base.filter(F.size("_t") >= span)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(_t) - {span}),"
                    f" j -> struct(j AS start, array_join(slice(_t, j + 1, {span}), ' ') AS gram))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.start", "g.gram")
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(hot, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (span - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    kept = tok_pos.join(covered, ["doc_id", "pos"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )
    # totals come from size(_t) on the UN-exploded rows — the exploded
    # re-aggregation would pay a token-cardinality hash agg just to
    # recover a count each source row already carries. Zero-token docs
    # are therefore included (n_tokens 0, cleaned_md5 of '').
    totals = base.select(
        "doc_id", F.size("_t").cast("long").alias("n_tokens")
    )
    empty_md5 = F.md5(F.lit(""))
    return (
        totals.join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("cleaned_md5"), empty_md5).alias("cleaned_md5"),
        )
    )
