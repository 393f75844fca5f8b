"""Key normalization (operator F1 in SURVEY.md §2.4).

The reference normalizes both sides of every distance computation with
``re.sub(r'[^a-zA-Z0-9]', '', s.lower())`` (/root/reference/main.py:171-172)
— lowercase, then strip every non-alphanumeric. Distances are computed
on the normalized form while returned match values stay original.

Expressed as built-in column functions so it stays inside whole-stage
codegen (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Equivalent DuckDB expression for oracle SQL (keep in sync):
#   regexp_replace(lower(x), '[^a-z0-9]', '', 'g')
NORM_SQL = "regexp_replace(lower({col}), '[^a-z0-9]', '', 'g')"


def norm_key(col: Column | str) -> Column:
    """lowercase + strip non-alphanumerics; the canonical key form every
    similarity operator scores against."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-z0-9]", "")
