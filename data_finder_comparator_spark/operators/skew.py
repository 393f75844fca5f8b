"""Skew mitigation utilities.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these are the explicit techniques for the cases AQE can't see —
a skewed *aggregation* key, or a shuffle join whose hot keys are known
to dwarf a task before adaptive stats exist (the classic power-law
user_id / hot-shingle case at 100 TB).

Both are pure DataFrame compositions and provably result-identical to
their unsalted forms (tests/test_extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_cols: list[str], n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt): hash of the full row.
    Deterministic (no rand()) so retried tasks re-salt identically —
    nondeterministic salts break exactly-once under task retry."""
    return F.pmod(F.hash(*[F.col(c) for c in df_cols]), F.lit(n_salt))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: aggregate on
    (key, salt) first — hot keys split across n_salt reducers — then
    combine the partials per key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max} (the re-aggregatable functions: phase 2
    sums partial sums/counts and min/maxes partial min/maxes).
    ``count`` follows SQL count(col) semantics — non-null values of
    the named column — matching the unsalted aggregate exactly.
    """
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1 = [
        getattr(F, fn)(col).alias(out) for out, (col, fn) in aggs.items()
    ]
    partial = (
        df.withColumn("_salt", _salt(df.columns, n_salt))
        .groupBy(*keys, "_salt")
        .agg(*phase1)
    )
    phase2 = [
        recombine[fn](out).alias(out) for out, (_, fn) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*phase2)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join with a salted key: the skewed side gets a per-row
    salt, the small side is replicated n_salt times, and the join runs
    on (key, salt) — hot keys spread over n_salt tasks instead of one.
    Use when the small side is too big to broadcast but the skewed
    side's hot keys would blow a single reducer.

    Only join types that never emit unmatched SMALL-side rows are
    valid: an unmatched small-side key exists in all n_salt replicas,
    so right/full outer would emit it n_salt times instead of once."""
    safe = {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti", "cross"}
    if how.replace("_", "").lower() not in safe:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "small-side rows would appear once per salt replica"
        )
    s = skewed.withColumn("_salt", _salt(skewed.columns, n_salt))
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return s.join(r, [*on, "_salt"], how).drop("_salt")
