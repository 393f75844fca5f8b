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
