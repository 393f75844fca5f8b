"""Property-based equivalence for the text-curation operators vs
driver-side pure-Python references on randomized corpora (hypothesis).

The oracle-parity suite pins scrub_hot_spans on the fixed corpora;
these properties hunt the edges those corpora don't reach — repeated
grams inside ONE document (count_distinct vs count), overlapping hot
spans, spans at document boundaries, hot grams covering a whole
document — and assert the distributed answer equals the reference
exactly."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocabulary so 3-grams collide across docs often (hot grams are
# the interesting case); varied doc lengths hit the <span boundary
_DOC = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=9
)
_CORPUS = st.lists(_DOC, min_size=1, max_size=7)


def _ref_scrub(corpus: list[list[str]], min_docs: int, span: int):
    """Order-free reference: a token is removed iff some hot gram
    covers it; hot = gram in >= min_docs DISTINCT docs."""
    grams = {}  # gram -> set(doc)
    for d, toks in enumerate(corpus):
        for j in range(len(toks) - span + 1):
            grams.setdefault(" ".join(toks[j : j + span]), set()).add(d)
    hot = {g for g, docs in grams.items() if len(docs) >= min_docs}
    out = {}
    for d, toks in enumerate(corpus):
        covered = set()
        for j in range(len(toks) - span + 1):
            if " ".join(toks[j : j + span]) in hot:
                covered.update(range(j, j + span))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[d] = (
            len(toks),
            len(toks) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS, min_docs=st.integers(1, 3))
def test_scrub_hot_spans_matches_reference(spark, corpus, min_docs):
    from data_finder_comparator_spark.operators.textops import scrub_hot_spans

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_md5)
        for r in scrub_hot_spans(df, min_docs=min_docs, span=3).collect()
    }
    assert got == _ref_scrub(corpus, min_docs, 3)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=_CORPUS)
def test_token_entropy_matches_reference(spark, corpus):
    from data_finder_comparator_spark.operators.textops import token_entropy

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy_nats)
        for r in token_entropy(df).collect()
    }
    want = {}
    for d, toks in enumerate(corpus):
        if not toks:
            continue  # zero-token docs drop out
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        n = len(toks)
        clogc = sum(round(c * math.log(c), 6) for c in counts.values())
        want[d] = (n, len(counts), round(math.log(n) - clogc / n, 6))
    assert got == want


# -- xlsx lite codec: grid round-trip property (r12) -------------------
#
# The r12 review found three silent holes in the vendored codec (longs
# past 2^53 rounding through float, date/Decimal TypeErrors, invalid
# XML for non-finite floats). This property hunts the rest of that
# space: ANY grid of supported cell values must round-trip through
# write_grid/read_grid under the documented value mapping, including
# XML metacharacters, whitespace-significant strings, huge exact ints
# and ragged rows.

_CELL = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63) + 1, max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates
            # xlsx cannot carry most C0 controls even escaped; the
            # codec's _ooxml_encode handles them via _xHHHH_ escapes,
            # which this property exercises through printable + a few
            # controls below
        ),
        max_size=12,
    ),
)
_GRID = st.lists(
    st.lists(_CELL, min_size=0, max_size=5), min_size=1, max_size=6
)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(grid=_GRID)
def test_xlsx_grid_roundtrip_property(tmp_path_factory, grid):
    from data_finder_comparator_spark.sources.xlsx_lite import (
        read_grid,
        write_grid,
    )

    d = tmp_path_factory.mktemp("xlsx_prop")
    p = str(d / "g.xlsx")
    write_grid(p, grid)
    back = read_grid(p)

    # expected: None cells skipped on write (trailing Nones shorten
    # rows; the reader re-densifies to the widest written row);
    # ints exact at any magnitude; floats by repr; '' cells are
    # written as inline strings and read back as ''
    def cells(g):
        out = {}
        for i, row in enumerate(g):
            for j, v in enumerate(row):
                if v is None:
                    continue
                out[(i, j)] = v
        return out

    want = cells(grid)
    got = cells(back)
    assert set(got) == set(want)
    for k, v in want.items():
        g = got[k]
        if isinstance(v, bool):
            assert g is True or g is False
            assert g == v
        elif isinstance(v, int):
            assert isinstance(g, int) and g == v  # exact past 2^53 too
        elif isinstance(v, float):
            # repr round-trips doubles exactly ('5.0' keeps the float
            # form, so integral floats still parse as float and compare
            # equal; exponent forms parse as float directly)
            assert g == v
        else:
            assert g == v


# ---------------------------------------------------------------------------
# r18: the HTML extraction inverse property the html_text_extract
# oracle relies on — for ARBITRARY document text, escaping + wrapping
# in the driver row's page shape and extracting must return exactly
# (title, collapsed-body + footer blocks, block count). Pure-kernel
# (no Spark), so hypothesis can hammer the edges the real corpus
# never reaches: entity-looking fragments ("&amp", "&#65;"), inert
# escaped markup ("</script>"), control whitespace, unicode
# whitespace (NBSP must NOT collapse — the class is pinned ASCII),
# and all-whitespace bodies (the empty block must drop).
# ---------------------------------------------------------------------------

_HTML_CHARS = st.characters(
    codec="utf-8",
    categories=("L", "N", "P", "S", "Zs"),
    include_characters=" \t\n\r\f\x0b&<>\"'/;#x\xa0",
)
_HTML_TEXT = st.text(_HTML_CHARS, min_size=0, max_size=120)


@given(doc_id=st.integers(min_value=0, max_value=10**9), text=_HTML_TEXT)
@settings(max_examples=300, deadline=None)
def test_html_extract_inverse_property(doc_id, text):
    import html as _html
    import re as _re

    from data_finder_comparator_spark.operators.html_extract import (
        html_block_text,
    )

    esc = _html.escape(text, quote=False)  # same &, <, > set the row escapes
    page = (
        f"<html><head><title>doc {doc_id}</title>"
        "<style>p { margin: 0 }</style></head>"
        "<body><script>if (1 < 2) { boiler(); }</script>"
        f"<p>{esc}</p><!-- boilerplate comment -->"
        f"<div>footer {doc_id}</div></body></html>"
    )
    title, out, n = html_block_text(page)
    body = _re.sub("[ \t\n\r\f\x0b]+", " ", text).strip(" ")
    blocks = [b for b in (body, f"footer {doc_id}") if b]
    assert title == f"doc {doc_id}"
    assert out == "\n".join(blocks)
    assert n == len(blocks)
