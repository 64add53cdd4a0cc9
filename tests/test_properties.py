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


# ---------------------------------------------------------------------------
# Round-4 algorithm cores: pure-Python twins of the SQL/window forms,
# property-tested against brute force (same arithmetic as the queries;
# engine equality is separately proven by the DuckDB oracles).
# ---------------------------------------------------------------------------


def _skyline_windows(points):
    """Twin of q_skyline's sort-filter form: survive iff cents beats
    every strictly-higher-freq row and ties the same-freq max."""
    out = []
    for f, c in points:
        best_higher = max((c2 for f2, c2 in points if f2 > f), default=-1)
        best_same = max(c2 for f2, c2 in points if f2 == f)
        if c > best_higher and c == best_same:
            out.append((f, c))
    return sorted(set(out))


def _skyline_brute(points):
    def dominated(p):
        return any(q[0] >= p[0] and q[1] >= p[1] and q != p for q in points)
    return sorted({p for p in points if not dominated(p)})


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=30))
def test_skyline_window_form_equals_dominance_bruteforce(points):
    """The two-window-max formulation is exactly the Pareto frontier,
    including duplicate points and per-dimension ties."""
    assert _skyline_windows(points) == _skyline_brute(points)


def _islands_rank_trick(ids):
    """Twin of q_gaps_islands: group key = id - rank."""
    from collections import Counter
    runs = Counter()
    for rank, i in enumerate(sorted(ids), start=1):
        runs[i - rank] += 1
    return sorted(runs.values(), reverse=True)


def _islands_brute(ids):
    s = sorted(ids)
    runs, cur = [], 1
    for a, b in zip(s, s[1:]):
        if b == a + 1:
            cur += 1
        else:
            runs.append(cur)
            cur = 1
    runs.append(cur)
    return sorted(runs, reverse=True)


@settings(max_examples=300, deadline=None)
@given(st.sets(st.integers(0, 200), min_size=1, max_size=60))
def test_islands_rank_trick_equals_run_scan(ids):
    assert _islands_rank_trick(ids) == _islands_brute(ids)


def _changepoint_nscaled(xs):
    """Twin of q_changepoint: argmax of num^2/(t(n-t)),
    num = s_t(n-t) - (S-s_t)t; ties -> earliest t."""
    n, S = len(xs), sum(xs)
    best, s = None, 0
    for t in range(1, n):
        s += xs[t - 1]
        num = s * (n - t) - (S - s) * t
        stat = num * num / (t * (n - t))
        if best is None or stat > best[0] + 1e-12:
            best = (stat, t)
    return best[1]


def _changepoint_brute(xs):
    """Direct between-segment sum-of-squares maximization."""
    n = len(xs)
    best = None
    mean = sum(xs) / n
    for t in range(1, n):
        left, right = xs[:t], xs[t:]
        ml, mr = sum(left) / t, sum(right) / (n - t)
        stat = t * (ml - mean) ** 2 + (n - t) * (mr - mean) ** 2
        if best is None or stat > best[0] + 1e-9:
            best = (stat, t)
    return best[1]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 50), min_size=3, max_size=40))
def test_changepoint_nscaled_equals_anova_bruteforce(xs):
    """The integer n-scaled statistic picks the same split as the
    direct between-segment ANOVA decomposition (they are proportional:
    num^2/(t(n-t)) = n * SS_between)."""
    assert _changepoint_nscaled(xs) == _changepoint_brute(xs)


def test_lsh_signature_invariances():
    """Random-hyperplane signatures are scale-invariant (positive
    scaling never flips a sign bit) and antipodal vectors flip every
    decisively-signed bit — the geometric contract of cosine LSH."""
    from challenge8_movies_etl_spark.queries_lsh import _SIGNS

    import random
    rng = random.Random(7)
    for trial in range(50):
        v = [rng.uniform(-1, 1) for _ in range(64)]
        projs = [sum(s * x for s, x in zip(signs, v)) for signs in _SIGNS]
        bits = [p >= 0 for p in projs]
        scaled = [[p * 3.5 >= 0 for p in projs],
                  [sum(s * (2.0 * x) for s, x in zip(signs, v)) >= 0
                   for signs in _SIGNS]]
        for sb in scaled:
            assert sb == bits
        neg_bits = [sum(s * (-x) for s, x in zip(signs, v)) >= 0
                    for signs in _SIGNS]
        for b, nb, p in zip(bits, neg_bits, projs):
            if abs(p) > 1e-12:
                assert b != nb


def _weighted_median_lower(vals_weights):
    """Twin of q_weighted_percentile: first value (sorted) whose
    doubled cumulative weight reaches the total."""
    total = sum(w for _, w in vals_weights)
    cw = 0
    for v, w in sorted(vals_weights):
        cw += w
        if 2 * cw >= total:
            return v
    raise AssertionError("unreachable")


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 100), st.integers(1, 20)),
                min_size=1, max_size=40))
def test_weighted_median_dominance(vals_weights):
    """Lower-bound weighted median: >= half the weight at/below, and
    strictly below it strictly less than half."""
    m = _weighted_median_lower(vals_weights)
    total = sum(w for _, w in vals_weights)
    at_or_below = sum(w for v, w in vals_weights if v <= m)
    below = sum(w for v, w in vals_weights if v < m)
    assert 2 * at_or_below >= total
    assert 2 * below < total


def _morton_interleave(x, y, bits=12):
    """Twin of queries_ml._interleave_sql's unrolled arithmetic."""
    z = 0
    for b in range(bits):
        z += ((x >> b) & 1) << (2 * b)
        z += ((y >> b) & 1) << (2 * b + 1)
    return z


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 4095), st.integers(0, 4095))
def test_morton_interleave_is_invertible(x, y):
    """The unrolled integer Morton code is a bijection on the grid —
    de-interleaving recovers (x, y) exactly."""
    z = _morton_interleave(x, y)
    rx = sum(((z >> (2 * b)) & 1) << b for b in range(12))
    ry = sum(((z >> (2 * b + 1)) & 1) << b for b in range(12))
    assert (rx, ry) == (x, y)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.booleans()),
                min_size=1, max_size=60))
def test_km_log_sum_matches_direct_product(events):
    """Kaplan-Meier via 8dp-rounded log terms (the q_survival_km
    construction) stays within 1e-5 of the direct product."""
    import math
    from collections import Counter

    d = Counter()
    c = Counter()
    for t, ev in events:
        c[t] += 1
        if ev:
            d[t] += 1
    ts = sorted(c)
    total = sum(c.values())
    # risk set at t: everyone with duration >= t
    direct, logsum, n_at_risk = 1.0, 0.0, total
    for t in ts:
        if d[t] < n_at_risk and d[t] > 0:
            frac = (n_at_risk - d[t]) / n_at_risk
            direct *= frac
            logsum += round(math.log(frac), 8)
        n_at_risk -= c[t]
    assert abs(direct - math.exp(logsum)) < 1e-5
