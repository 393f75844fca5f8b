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
