"""Interval (range) containment join — chunked equi-join formulation.

Spark has no native range/interval join: a naive ``a.ts BETWEEN w.lo
AND w.hi`` join plans as BroadcastNestedLoopJoin (or a cartesian), an
O(|W|·|P|) scan that dies long before 100 TB. The scalable formulation
maps both sides onto a fixed time grid and equi-joins on the grid cell:

- every point lands in exactly ONE chunk (``epoch_micros div step``);
- every interval is exploded to the chunks it overlaps
  (``sequence(start_chunk, end_chunk)`` — fanout ``len/step + 1`` rows);
- the join is a plain shuffle/broadcast HASH join on the chunk id with
  the exact containment predicate evaluated inside the join, and needs
  no post-distinct because a (interval, point) pair can only meet in
  the point's single chunk.

Pick ``chunk_seconds`` near the typical interval length: much smaller
explodes the interval side, much larger piles unrelated points into
each cell. Both failure modes degrade gracefully (still an equi-join,
AQE splits skewed cells); the window for "good" is wide.

This is the standard bucketized range-join strategy described for
Spark-family engines; same shape as the q-gram/band blocking used by
``operators/fuzzy_join`` — replace "string band" with "time cell".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    chunk_seconds: int = 1800,
) -> DataFrame:
    """Inner-join ``points`` into half-open intervals
    ``[start_col, end_col)``: returns every (interval row × contained
    point row), all columns from both sides (names must be disjoint).

    Zero-length / inverted intervals match nothing (half-open empty
    set) and are pruned before the explode; callers wanting them back
    as zero-match rows should left-join this result to the interval
    table (see ``purchase_window_stats``).

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ; NTZ is resolved via
    the session zone on both sides, so cell assignment stays mutually
    consistent whatever the zone. The containment predicate compares
    the original values — chunking only routes, it never decides.
    """
    overlap = set(intervals.columns) & set(points.columns)
    if overlap:
        raise ValueError(f"column names must be disjoint, both sides have: {sorted(overlap)}")
    step_us = int(chunk_seconds) * 1_000_000
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_iv_chunk",
        F.explode(
            F.expr(
                f"sequence(unix_micros(cast({start_col} as timestamp)) div {step_us}, "
                f"(unix_micros(cast({end_col} as timestamp)) - 1) div {step_us})"
            )
        ),
    )
    pt = points.withColumn(
        "_pt_chunk", F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {step_us}")
    )
    joined = iv.join(
        pt,
        (F.col("_iv_chunk") == F.col("_pt_chunk"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col)),
    )
    return joined.drop("_iv_chunk", "_pt_chunk")
