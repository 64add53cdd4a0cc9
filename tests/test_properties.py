"""Property-based spot checks (SURVEY.md §5.4) — hypothesis over the
pure-Python parser twin (same regexes/arithmetic as the Spark
expressions, asserted equal in test_parsing.py), so these run without
JVM round-trips per example."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from challenge8_movies_etl_spark.queries_udf import parse_dollars_py


@settings(max_examples=300, deadline=None)
@given(st.integers(100, 999), st.integers(0, 9))
def test_million_roundtrip(a, d):
    assert parse_dollars_py(f"${a}.{d} million") == (a + d / 10) * 1e6


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 9), st.integers(0, 9))
def test_billion_roundtrip(a, d):
    assert parse_dollars_py(f"${a}.{d} billion") == (a + d / 10) * 1e9


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 999), st.integers(0, 999), st.integers(0, 999))
def test_comma_roundtrip(a, b, c):
    s = f"${a},{b:03d},{c:03d}"
    assert parse_dollars_py(s) == float(a * 1_000_000 + b * 1_000 + c)


@settings(max_examples=200, deadline=None)
@given(st.integers(100, 999), st.integers(0, 9), st.integers(1, 99))
def test_citation_and_range_invariance(a, d, cite):
    """Citations never change the parse; a range parses to its upper
    bound (the reference's documented assumptions)."""
    base = parse_dollars_py(f"${a}.{d} million")
    assert parse_dollars_py(f"${a}.{d} million[{cite}]") == base
    assert parse_dollars_py(f"$1.0-{a}.{d} million") == base


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghij $.,", max_size=30))
def test_garbage_never_raises(s):
    out = parse_dollars_py(s)
    assert out is None or out >= 0


def _grid_pairs(pts, cell, radius2):
    """Pure-Python twin of q_spatial_join's 3x3 grid probe."""
    from collections import defaultdict
    cells = defaultdict(list)
    for i, (x, y) in enumerate(pts):
        cells[(int(x // cell), int(y // cell))].append(i)
    out = set()
    for i, (x, y) in enumerate(pts):
        cx, cy = int(x // cell), int(y // cell)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for j in cells.get((cx + dx, cy + dy), ()):
                    if i < j:
                        px, py = pts[j]
                        if (x - px) ** 2 + (y - py) ** 2 <= radius2:
                            out.add((i, j))
    return out


def _brute_pairs(pts, radius2):
    return {(i, j) for i in range(len(pts)) for j in range(i + 1, len(pts))
            if (pts[i][0] - pts[j][0]) ** 2
            + (pts[i][1] - pts[j][1]) ** 2 <= radius2}


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 400), st.integers(0, 400)),
                min_size=2, max_size=40))
def test_grid_probe_is_lossless(raw):
    """3x3 neighbor-cell probing finds EXACTLY the brute-force pairs
    whenever radius <= cell width (the q_spatial_join invariant),
    including points exactly on cell boundaries."""
    pts = [(x / 10, y / 10) for x, y in raw]  # 0.1 granularity, 0..40
    assert _grid_pairs(pts, cell=5.0, radius2=4.0) == _brute_pairs(pts, 4.0)
