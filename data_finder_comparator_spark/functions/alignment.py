"""Per-character alignment + diff-splice visualization functions.

These are the only operators in the engine that genuinely need Python:
Spark has a built-in Levenshtein *distance* but nothing that returns
the reference's alignment artifacts. Both run as Arrow-batched pandas
UDFs (vectorized transfer, per-batch Python loop — never per-row serde).

Parity targets (re-implemented from observed behavior, not copied):

* ``visual_alignment`` reproduces the reference's
  ``visual_levenshtein_distance`` (/root/reference/main.py:24-70): full
  DP matrix, then a greedy FORWARD walk emitting 1 per matching char
  and 0 per edit, preferring substitution, then deletion, then
  insertion, reading the post-advance cell d[i+1][j+1]
  (main.py:58-67). Quirks preserved: the walk stops when either
  normalized string is exhausted, so trailing unmatched characters
  emit no symbols; symbols describe NORMALIZED strings.
* ``diff_splices`` reproduces ``visualise_differences`` +
  ``get_splices_with_indices`` (/root/reference/main.py:130-166,
  :290-300): grow a 2+-char window from each position of s1, search it
  in the not-yet-consumed suffix of s2, record matched splices, then
  interleave them with s2's unmatched gaps as (flag, text) segments.
  The reference's regex-injection bug (raw key text used as a pattern,
  main.py:146) is fixed intentionally (SURVEY.md §2.11): plain
  substring search, same semantics for metacharacter-free inputs.
* The legacy ``old_visual_levenshtein_distance``
  (/root/reference/main.py:73-127) is dead code and intentionally not
  reproduced (SURVEY.md §2.4 F4).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NORM_RE = re.compile(r"[^a-z0-9]")


def _norm(s: str) -> str:
    return _NORM_RE.sub("", s.lower())


def _dp_matrix(a: str, b: str) -> list[list[int]]:
    m, n = len(a), len(b)
    d = [list(range(n + 1))] + [[i] + [0] * n for i in range(1, m + 1)]
    for i in range(1, m + 1):
        ca = a[i - 1]
        row, prev = d[i], d[i - 1]
        for j in range(1, n + 1):
            if ca == b[j - 1]:
                row[j] = prev[j - 1]
            else:
                row[j] = 1 + min(prev[j], row[j - 1], prev[j - 1])
    return d


def visual_alignment(s: str, t: str) -> tuple[int, list[int]]:
    """(distance, symbols): 1 = chars aligned equal, 0 = edit position.

    Walks the matrix forward exactly like the reference: on a mismatch
    the branch whose post-move cell cost is one above the pre-move cell
    wins, tested in the order substitution, deletion, insertion.
    """
    a, b = _norm(s or ""), _norm(t or "")
    d = _dp_matrix(a, b)
    sym: list[int] = []
    i = j = 0
    while i < len(a) and j < len(b):
        if a[i] == b[j]:
            sym.append(1)
            i += 1
            j += 1
            continue
        here = d[i + 1][j + 1]
        if here == d[i][j] + 1:  # substitution
            sym.append(0)
            i += 1
            j += 1
        elif here == d[i + 1][j] + 1:  # deletion from s
            sym.append(0)
            i += 1
        elif here == d[i][j + 1] + 1:  # insertion from t
            sym.append(0)
            j += 1
    return d[len(a)][len(b)], sym


def _greedy_matches(s1: str, s2: str) -> tuple[list[str], list[list[int]]]:
    """Greedy common-substring scan (reference main.py:130-166 with the
    regex bug fixed): from each unconsumed s1 position, extend a window
    starting at 2 chars while it still occurs in s2's unconsumed
    suffix; commit the last hit and advance the s2 cursor past it."""
    matches: list[str] = []
    spans: list[list[int]] = []
    floor = 0
    skip = 0
    for idx in range(len(s1)):
        if skip:
            skip -= 1
            continue
        step = 1
        if idx + step == len(s1):
            break
        window = s1[idx : idx + step + 1]
        last: tuple[int, int] | None = None
        while True:
            pos = s2.find(window, floor)
            if pos >= 0:
                skip += 1
                last = (pos, pos + len(window))
                step += 1
                if idx + step == len(s1):
                    if last is not None:
                        matches.append(s2[last[0] : last[1]])
                        spans.append([last[0], last[1]])
                        floor = last[1]
                    break
                window = s1[idx : idx + step + 1]
            else:
                if last is not None:
                    matches.append(s2[last[0] : last[1]])
                    spans.append([last[0], last[1]])
                    floor = last[1]
                break
    return matches, spans


def diff_splices(s1: str, s2: str) -> list[tuple[int, str]]:
    """Ordered (flag, text) segmentation of s2: flag 1 = substring
    matched from s1, flag 0 = unmatched gap (reference main.py:290-300;
    red/plain runs in the GUI). Degenerate no-match inputs yield one
    unmatched segment covering s2."""
    s1, s2 = s1 or "", s2 or ""
    matches, spans = _greedy_matches(s1, s2)
    if not spans:
        return [(0, s2)] if s2 else []
    out: list[tuple[int, str]] = []
    if spans[0][0] != 0:
        out.append((0, s2[: spans[0][0]]))
    for k, text in enumerate(matches):
        out.append((1, text))
        if k != len(matches) - 1:
            out.append((0, s2[spans[k][1] : spans[k + 1][0]]))
    if spans[-1][1] != len(s2):
        out.append((0, s2[spans[-1][1] :]))
    return out


# ---------------------------------------------------------------------------
# pandas UDF wrappers (Arrow-batched)
# ---------------------------------------------------------------------------

ALIGNMENT_TYPE = T.StructType(
    [
        T.StructField("dist", T.IntegerType()),
        T.StructField("sym", T.ArrayType(T.IntegerType())),
    ]
)

SPLICES_TYPE = T.ArrayType(
    T.StructType(
        [T.StructField("flag", T.IntegerType()), T.StructField("text", T.StringType())]
    )
)


@F.pandas_udf(ALIGNMENT_TYPE)
def alignment_udf(s: pd.Series, t: pd.Series) -> pd.DataFrame:
    res = [visual_alignment(a, b) for a, b in zip(s, t)]
    return pd.DataFrame({"dist": [r[0] for r in res], "sym": [r[1] for r in res]})


@F.pandas_udf(SPLICES_TYPE)
def splices_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    return pd.Series([diff_splices(a, b) for a, b in zip(s1, s2)])
