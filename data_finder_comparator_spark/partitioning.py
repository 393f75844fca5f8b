"""Partitioning policy helpers.

Spark sizes scan parallelism by input bytes, which is exactly wrong for
small-input/large-compute operators (a 2 MB documents file that explodes
into millions of shingles, a thin probe table about to cross-join a
broadcast side, a mapInPandas doing per-row Python work). Those need an
EXPLICIT partition count: a bare ``repartition(col)`` is subject to AQE
partition coalescing, which sees the small pre-fan-out bytes and merges
everything back into one partition — defeating the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_partitions(df: DataFrame) -> int:
    """Partition count for a fan-out repartition: the session's default
    parallelism (cores in local mode, total executor cores on a
    cluster). Explicit, so AQE honors it instead of size-coalescing."""
    return df.sparkSession.sparkContext.defaultParallelism


def zorder_key(col_a, col_b, bits: int = 8):
    """Morton (z-order) interleave of two pre-gridded integer columns
    (each in [0, 2^bits)): bit i of ``col_a`` lands at position 2i, of
    ``col_b`` at 2i+1. Pure integer shifts/masks — identical in any
    engine — built as an unrolled sum so whole-stage codegen sees one
    flat arithmetic expression.

    This is the layout primitive behind multi-dimensional data
    clustering (Delta/Iceberg OPTIMIZE ZORDER): range-partitioning or
    sorting files by the z-key keeps BOTH dimensions locally tight in
    every file, so min/max file statistics prune scans filtered on
    either column — where a lexicographic (a, b) sort only prunes on
    the leading column.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(col_a.cast("long"), i) % 2, 2 * i)
            + F.shiftleft(F.shiftright(col_b.cast("long"), i) % 2, 2 * i + 1)
        )
    return z


def zorder_layout_stats(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    bucket_bits: int = 6,
) -> DataFrame:
    """Grid two numeric columns onto a 2^bits equi-width lattice
    (min/max-scaled, the histogram-bin arithmetic), z-interleave, and
    aggregate per leading-``bucket_bits`` z-bucket: row count plus the
    min/max of BOTH grid coordinates. The per-bucket ranges are the
    file-statistics a z-ordered write would produce — tight on both
    dimensions simultaneously, which is the whole point; a query
    filtering either column prunes most buckets.

    One scan + a one-row bounds broadcast + a bucket-keyed hash agg:
    nothing here is local-mode-only, and the same key feeds
    ``repartitionByRange(z)`` on the write path at scale.
    """
    from pyspark.sql import functions as F

    grid = F.lit((1 << bits) - 1)
    bounds = df.agg(
        F.min(col_a).alias("a_mn"),
        F.max(col_a).alias("a_mx"),
        F.min(col_b).alias("b_mn"),
        F.max(col_b).alias("b_mx"),
    )

    def scaled(c: str, mn: str, mx: str):
        span = F.col(mx) - F.col(mn)
        return (
            F.when(span == 0, F.lit(0))
            .otherwise(
                F.least(
                    F.floor(((F.col(c) - F.col(mn)) / span) * (1 << bits)),
                    grid,
                )
            )
            .cast("long")
        )

    gridded = df.crossJoin(F.broadcast(bounds)).select(
        scaled(col_a, "a_mn", "a_mx").alias("ga"),
        scaled(col_b, "b_mn", "b_mx").alias("gb"),
    )
    z = zorder_key(F.col("ga"), F.col("gb"), bits=bits)
    return (
        gridded.withColumn("bucket", F.shiftright(z, 2 * bits - bucket_bits))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("ga").cast("long").alias("a_lo"),
            F.max("ga").cast("long").alias("a_hi"),
            F.min("gb").cast("long").alias("b_lo"),
            F.max("gb").cast("long").alias("b_hi"),
        )
    )
