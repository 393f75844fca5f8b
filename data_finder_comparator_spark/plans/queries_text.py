"""Text-analysis query family over the documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import (
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    quality_signals,
)
from ..sources.parquet import load_table
from .catalog import query

_NORM = "regexp_replace(lower(text), '[^a-z0-9]', '', 'g')"


def _duck_hits(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return (
        r"len(list_filter(string_split_regex(lower(text), '\s+'),"
        f" x -> x <> '' AND list_contains([{inlist}], x)))"
    )


def _duck_lang_case() -> str:
    langs = sorted(LANG_MARKERS)
    case = f"'{langs[-1]}'"
    for lang in reversed(langs[:-1]):
        conds = " AND ".join(
            f"h_{lang} >= h_{other}" for other in langs if other != lang
        )
        case = f"CASE WHEN {conds} THEN '{lang}' ELSE {case} END"
    return case


_QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''))) AS BIGINT) AS n_types,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_pieces,
         CAST(length({_NORM}) AS BIGINT) AS n_alnum_chars,
         CAST({_duck_hits(STOPWORDS)} AS BIGINT) AS n_stopwords,
         {", ".join(f"{_duck_hits(LANG_MARKERS[lang])} AS h_{lang}" for lang in sorted(LANG_MARKERS))}
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_types, n_pieces, n_alnum_chars, n_stopwords,
       {_duck_lang_case()} AS lang_guess
FROM base
"""


@query("text_quality_signals", oracle=_QUALITY_ORACLE)
def text_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused one-scan projection: char/token/type/piece counts,
    alnum-char count, stopword hits, heuristic language guess."""
    docs = load_table(spark, sf_dir, "documents")
    return quality_signals(docs, "doc_id", "text")


_LANG_ACCURACY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, lang,
         {", ".join(f"{_duck_hits(LANG_MARKERS[lang])} AS h_{lang}" for lang in sorted(LANG_MARKERS))}
  FROM documents
),
guessed AS (
  SELECT lang, {_duck_lang_case()} AS lang_guess FROM base
)
SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
FROM guessed GROUP BY lang, lang_guess
"""


@query("lang_id_confusion", oracle=_LANG_ACCURACY_ORACLE)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the
    labeled lang column (the corpus is synthetic word-soup, so this
    measures the machinery, not linguistics)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = quality_signals(docs, "doc_id", "text").select("doc_id", "lang_guess")
    return (
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang")
        .join(sig, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


_FINGERPRINT_ORACLE = f"""
WITH sh AS (
  SELECT DISTINCT doc_id, md5(substr(n, unnest(range(1, len(n) - 6)), 8)) AS h
  FROM (SELECT doc_id, {_NORM} AS n FROM documents)
  WHERE len(n) >= 8
)
SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max,
       CAST(count(DISTINCT h) AS BIGINT) AS n_shingles
FROM sh GROUP BY doc_id
"""


@query("doc_fingerprints", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return doc_fingerprint(docs, "doc_id", "text", k=8)
