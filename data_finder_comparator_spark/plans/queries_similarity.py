"""Similarity-search query family over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import cosine, cosine_topk, lsh_bucketed_topk
from ..sources.parquet import load_table
from .catalog import query

# DuckDB double-precision cosine with the same formula/rounding as the
# Spark side: dot / sqrt(norm_a * norm_b), rounded to 6 dp.
_DUCK_COS = (
    "round(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))"
    " / sqrt(list_dot_product(CAST(p.embedding AS DOUBLE[]), CAST(p.embedding AS DOUBLE[]))"
    " * list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))), 6)"
)

_ANN_ORACLE = f"""
WITH scored AS (
  SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, {_DUCK_COS} AS cos_sim
  FROM embeddings p CROSS JOIN embeddings c
  WHERE p.vec_id % 25 = 0 AND p.vec_id <> c.vec_id
)
SELECT probe_id, cand_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY probe_id
                               ORDER BY cos_sim DESC, cand_id) AS rnk
  FROM scored
) WHERE rnk <= 5
"""


@query("ann_cosine_topk", oracle=_ANN_ORACLE)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per probe (every 25th vector) — the
    exact baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"),
        F.col("embedding").alias("vec_p"),
    )
    cands = emb.select(
        F.col("vec_id").cast("long").alias("cand_id"),
        F.col("embedding").alias("vec_c"),
    )
    return cosine_topk(probes, cands, k=5)


_NEARDUP_ORACLE = f"""
SELECT p.vec_id AS vec_a, c.vec_id AS vec_b, {_DUCK_COS} AS cos_sim
FROM embeddings p CROSS JOIN embeddings c
WHERE p.vec_id < c.vec_id AND {_DUCK_COS} >= 0.35
"""


@query("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos >= 0.35 on this
    synthetic corpus; production would use ~0.95 on real embeddings).
    Threshold applied on the 6-dp rounded value so the cut is
    engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").cast("long").alias("vec_a"), F.col("embedding").alias("vec_p"))
    b = emb.select(F.col("vec_id").cast("long").alias("vec_b"), F.col("embedding").alias("vec_c"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", F.round(cosine("vec_p", "vec_c"), 6))
        .filter(F.col("cos_sim") >= 0.35)
        .select("vec_a", "vec_b", "cos_sim")
    )


# LSH-bucketed ANN: the scale path. No SQL oracle (the md5-derived
# hyperplanes are not portably expressible in DuckDB 1.0 — no hex->int
# conversion); correctness is pinned by tests/test_similarity.py, which
# checks bucket determinism and recall against the brute-force oracle
# query above. Driver records a rows-only check.
@query("ann_lsh_topk")
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").cast("long").alias("probe_id"),
        F.col("embedding").alias("vec_p"),
    )
    cands = emb.select(
        F.col("vec_id").cast("long").alias("cand_id"),
        F.col("embedding").alias("vec_c"),
    )
    return lsh_bucketed_topk(probes, cands, k=5, n_planes=4, n_tables=4, dim=64)
