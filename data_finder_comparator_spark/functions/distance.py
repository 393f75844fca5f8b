"""Distance primitives for the similarity join (F2 in SURVEY.md §2.4).

The reference implements a pure-Python O(m*n) DP Levenshtein
(/root/reference/main.py:169-194). Spark has the same unit-cost edit
distance built in (``F.levenshtein``), JVM-side and codegen'd; since
Spark 3.5 a threshold argument early-exits the DP and returns -1 when
the distance exceeds it — the per-pair analogue of the reference's
threshold check, but O(m*threshold) instead of O(m*n).

``length_band_ok`` is the standard similarity-join pruning predicate:
levenshtein(a, b) >= abs(len(a) - len(b)), so pairs outside the length
band can never be within threshold and are never scored. This is what
keeps the candidate pairing from being a full cross product at scale
(cf. the compressed-index similarity-join literature, PAPERS.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def length_band_ok(a: Column, b: Column, threshold: int) -> Column:
    """True iff the pair can possibly be within *threshold* edits."""
    return F.abs(F.length(a) - F.length(b)) <= F.lit(threshold)


def levenshtein_within(a: Column, b: Column, threshold: int) -> Column:
    """Edit distance with early exit: value in [0, threshold], or -1 if
    the true distance exceeds *threshold*."""
    return F.levenshtein(a, b, threshold)
