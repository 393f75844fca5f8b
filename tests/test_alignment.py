"""Golden + property tests for the alignment/diff UDF surface
(SURVEY.md §5.2). Expected values derive from the reference semantics
(/root/reference/main.py:24-70, :130-166, :290-300)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from data_finder_comparator_spark.functions.alignment import (
    diff_splices,
    visual_alignment,
)

KEYS = st.text(
    alphabet="abcXYZ019 -/()+", min_size=0, max_size=24
)


def test_reference_inline_pair():
    # the reference's own test hint (main.py:132)
    dist, sym = visual_alignment("CH-S09FTXD-BL/SC", "CH-S09FTXAL-SC")
    # normalized: chs09ftxdblsc vs chs09ftxalsc
    assert dist == 2
    assert len(sym) <= len("chs09ftxdblsc")
    assert sym[:8] == [1] * 8  # common prefix 'chs09ftx' aligns
    assert 0 in sym


def test_equal_after_normalization_is_exact():
    dist, sym = visual_alignment("CH-S12FTXD white", "ch s12 ftxd-WHITE")
    assert dist == 0
    assert sym == [1] * len("chs12ftxdwhite")


def test_empty_and_punct_only():
    assert visual_alignment("", "")[0] == 0
    assert visual_alignment("!!!", "???") == (0, [])
    d, sym = visual_alignment("abc", "")
    assert d == 3 and sym == []  # walk emits nothing when one side empty


@given(KEYS, KEYS)
@settings(max_examples=300, deadline=None)
def test_alignment_distance_matches_dp_properties(a, b):
    import re

    na = re.sub(r"[^a-z0-9]", "", a.lower())
    nb = re.sub(r"[^a-z0-9]", "", b.lower())
    d_ab, sym = visual_alignment(a, b)
    d_ba, _ = visual_alignment(b, a)
    assert d_ab == d_ba  # symmetry
    assert d_ab >= abs(len(na) - len(nb))  # length lower bound
    assert d_ab <= max(len(na), len(nb))  # upper bound
    assert (d_ab == 0) == (na == nb)
    # symbols never exceed the shorter normalized side by construction
    assert len(sym) <= max(len(na), len(nb))
    if na == nb:
        assert sym == [1] * len(na)


@given(KEYS, KEYS)
@settings(max_examples=300, deadline=None)
def test_splices_reassemble_s2(a, b):
    """Interleaved (flag, text) segments must concatenate back to s2 —
    the invariant behind the reference's red/plain GUI rendering."""
    segs = diff_splices(a, b)
    assert "".join(text for _, text in segs) == b
    for flag, _ in segs:
        assert flag in (0, 1)


def test_splices_metacharacters_no_injection():
    # reference bug (main.py:146): '(' in the key crashes re.search;
    # fixed by substring search — must not raise and must still match
    segs = diff_splices("a(b+c)", "xx a(b+c) yy")
    assert "".join(t for _, t in segs) == "xx a(b+c) yy"
    assert any(flag == 1 and "(b+c" in t for flag, t in segs)


def test_splices_known_example():
    segs = diff_splices("abcdef", "XXabcYYdef")
    # greedy: 'abc' matched, then 'def' matched, gaps preserved
    flags = [f for f, _ in segs]
    texts = [t for _, t in segs]
    assert (1, "abc") in segs
    assert texts[0] == "XX" and flags[0] == 0
    assert "".join(texts) == "XXabcYYdef"


# ---------------------------------------------------------------------------
# xlsx codec property test (pure python, no Spark session needed)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**52), max_value=2**52),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=20),
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(_cell, min_size=1, max_size=6), min_size=1, max_size=8))
def test_xlsx_grid_roundtrip_property(tmp_path_factory, rows):
    """write_grid -> read_grid preserves every cell: numbers come back
    as floats with exact values (repr round-trip), strings/bools/Nones
    verbatim; ragged rows pad with None."""
    from data_finder_comparator_spark.sources.xlsx_lite import read_grid, write_grid

    path = str(tmp_path_factory.mktemp("xlsxprop") / "t.xlsx")
    write_grid(path, rows)
    got = read_grid(path)
    width = max(len(r) for r in rows)
    for i, row in enumerate(rows):
        for j in range(width):
            want = row[j] if j < len(row) else None
            have = got[i][j] if i < len(got) and j < len(got[i]) else None
            if isinstance(want, bool) or want is None or isinstance(want, str):
                assert have == want, (i, j, want, have)
            else:  # int/float -> float cell, exact value
                assert have is not None and float(want) == have, (i, j, want, have)
