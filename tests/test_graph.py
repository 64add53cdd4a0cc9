"""PageRank operator + query semantics: mass conservation, hub
dominance on a known topology, and determinism across partitionings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from challenge8_movies_etl_spark.operators.graph import pagerank
from challenge8_movies_etl_spark.registry import QUERIES, load_all
from challenge8_movies_etl_spark.queries_graph import q_graph_pagerank
from tests.conftest import SF_SMOKE

load_all()


def _star_edges(spark, n_leaves=6):
    # undirected star: hub 0 <-> leaves 1..n
    rows = [(0, i) for i in range(1, n_leaves + 1)]
    rows += [(i, 0) for i in range(1, n_leaves + 1)]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def test_star_hub_dominates(spark):
    ranks = {r["node"]: float(r["rank"])
             for r in pagerank(_star_edges(spark), iterations=5).collect()}
    hub = ranks.pop(0)
    assert all(hub > v for v in ranks.values())
    # leaves are symmetric -> identical ranks (exact decimals)
    assert len(set(ranks.values())) == 1
    # damped PageRank conserves mass up to per-node rounding
    assert math.isclose(hub + sum(ranks.values()), 1.0, abs_tol=1e-6)


def test_pagerank_partition_invariant(spark):
    e = _star_edges(spark, 5)
    a = sorted(map(tuple, pagerank(e, 4).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7), 4).collect()))
    assert a == b


def test_query_topk_shape(spark):
    rows = q_graph_pagerank(spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert {r["kind"] for r in rows} <= {"customer", "supplier"}
    prs = [r["pr"] for r in rows]
    assert prs == sorted(prs, reverse=True)
    assert all(p > 0 for p in prs)


def test_triangles_match_brute_force(spark):
    """Degree-oriented wedge counting must agree with a naive Python
    recount over the same thresholded co-occurrence edge set, and the
    smoke graph must be non-degenerate (some, not all, nodes in
    triangles)."""
    from challenge8_movies_etl_spark.queries_graph import q_graph_triangles
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    n_parts = ps.select("l_partkey").distinct().count()
    pa, pb = ps.alias("pa"), ps.alias("pb")
    edges = [(r["u"], r["v"]) for r in
             (pa.join(pb, (F.col("pa.l_partkey") == F.col("pb.l_partkey"))
                      & (F.col("pa.l_suppkey") < F.col("pb.l_suppkey")))
              .groupBy(F.col("pa.l_suppkey").alias("u"),
                       F.col("pb.l_suppkey").alias("v"))
              .agg(F.count("*").alias("shared"))
              .filter(F.col("shared") * 1000 >= 75 * n_parts)).collect()]
    adj: dict[int, set] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    want: dict[int, int] = {}
    for u, v in edges:
        for w in adj[u] & adj[v]:  # each triangle seen via all 3 edges
            want[w] = want.get(w, 0) + 1  # -> per-node count x1 each
    got = {r["node"]: r["n_tri"] for r in
           q_graph_triangles(spark, SF_SMOKE).collect()}
    assert got == want
    assert len(got) > 0 and len(got) < len(adj) + 1


def test_components_partition_nodes(spark):
    """Components partition the node set: sizes sum to n, labels are
    the component minima, extents are consistent, and every block-ring
    node is reachable from its component label (spot invariant)."""
    from tests.conftest import SF_SMOKE

    rows = QUERIES["q_graph_components"](spark, SF_SMOKE).collect()
    assert rows
    n = (spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
         .filter("c_custkey % 10 = 0").count())
    assert sum(r["size"] for r in rows) == n
    labels = [r["component"] for r in rows]
    assert labels == sorted(labels)
    for r in rows:
        assert r["component"] == r["min_node"]
        assert r["min_node"] <= r["max_node"]
        assert 1 <= r["size"] <= n


def test_components_rounds_suffice_on_long_ring(spark):
    """Pointer doubling must close a single ring whose diameter ~ n/2:
    every node of one 50-block ring lands in ONE component (the case
    plain label propagation would need 25 rounds for; doubling needs
    ~6)."""
    from tests.conftest import SF_SMOKE

    rows = QUERIES["q_graph_components"](spark, SF_SMOKE).collect()
    # at sf0.001 the %10 filter leaves a single sub-50 block ring:
    # exactly one component of size n
    if sum(r["size"] for r in rows) <= 50:
        assert len(rows) == 1


def test_label_propagation_two_cliques(spark):
    """Two triangles joined by one bridge edge must resolve to two
    communities labeled by each clique's minimum node, matching an
    independent pure-python recompute of the same deterministic rule
    (self-vote mode, min-label tie-break)."""
    from challenge8_movies_etl_spark.operators.graph import (
        label_propagation)

    und = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12), (2, 10)]
    e = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    edges = spark.createDataFrame(e, "src long, dst long")

    def py_lpa(edges_list, iters):
        from collections import Counter, defaultdict
        nb = defaultdict(list)
        for s, d in edges_list:
            nb[d].append(s)
        lab = {v: v for v in nb}
        for _ in range(iters):
            new = {}
            for v in lab:
                c = Counter(lab[u] for u in nb[v])
                c[lab[v]] += 1
                best = min(c, key=lambda k: (-c[k], k))
                new[v] = best
            lab = new
        return lab

    for iters in (1, 2, 3):
        got = {r.node: r.label
               for r in label_propagation(edges, iters).collect()}
        assert got == py_lpa(e, iters), f"iteration {iters}"
    final = py_lpa(e, 3)
    assert sorted(set(final.values())) == [0, 10]


def test_textrank_matches_python_pagerank(spark):
    """Top-15 TextRank keywords on the smoke fixture must match an
    independent python PageRank over the same adjacency graph (plain
    float arithmetic — the engine's 10dp decimal discipline differs
    from float error only far below the 8dp output rounding)."""
    from collections import defaultdict

    import pandas as pd

    from challenge8_movies_etl_spark.queries_graph import (
        q_textrank_keywords)
    from tests.conftest import SF_SMOKE

    pdf = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    cnts = defaultdict(int)
    for text in pdf.text:
        t = text.split(" ")
        for a, b in zip(t, t[1:]):
            if a != b:
                cnts[(min(a, b), max(a, b))] += 1
    total, n_pairs = sum(cnts.values()), len(cnts)
    und = [p for p, c in cnts.items() if c * n_pairs > total]
    nb = defaultdict(set)
    for a, b in und:
        nb[a].add(b)
        nb[b].add(a)
    n = len(nb)
    rank = {w: 1.0 / n for w in sorted(nb)}
    for _ in range(5):
        rank = {w: 0.15 / n + 0.85 * sum(rank[u] / len(nb[u])
                                         for u in sorted(nb[w]))
                for w in sorted(nb)}
    # round BEFORE ordering: the engine's scores are 8dp-quantized, so
    # order ties must break on the quantized value + word, not on
    # float summation noise
    expect = sorted(((w, round(s, 8)) for w, s in rank.items()),
                    key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [(r.word, r.score)
           for r in q_textrank_keywords(spark, SF_SMOKE).collect()]
    assert [w for w, _ in got] == [w for w, _ in expect]
    for (_, gs), (_, es) in zip(got, expect):
        assert abs(gs - es) < 1e-6
    assert len({s for _, s in got}) > 1, "ranks must differentiate"


def test_hits_matches_python_twin(spark):
    """Top-10 hubs/authorities must match an independent python HITS
    with the same L1 normalization and 10dp per-step quantization."""
    from collections import defaultdict

    import pandas as pd

    from challenge8_movies_etl_spark.queries_graph import (
        _HITS_ITERS, q_graph_hits)
    from tests.conftest import SF_SMOKE

    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    edges = sorted({(int(r.o_custkey), int(r.l_suppkey))
                    for r in m.itertuples()})
    out_, in_ = defaultdict(list), defaultdict(list)
    for c, s in edges:
        out_[c].append(s)
        in_[s].append(c)

    def l1norm(raw):
        t = sum(raw.values())
        return {k: round(v / t, 10) for k, v in raw.items()}

    h = {c: 1.0 for c in out_}
    for _ in range(_HITS_ITERS):
        a = l1norm({s: sum(h[c] for c in in_[s]) for s in in_})
        h = l1norm({c: sum(a[s] for s in out_[c]) for c in out_})

    rows = q_graph_hits(spark, SF_SMOKE).collect()
    for role, scores in (("hub", h), ("authority", a)):
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = [(r.node, r.score) for r in rows if r.role == role]
        assert [n for n, _ in got] == [n for n, _ in expect], role
        for (_, gs), (_, es) in zip(got, expect):
            assert abs(gs - round(es, 8)) < 1e-7


def _smoke_bipartite_edges(spark):
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    pairs = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select((F.col("o_custkey") * 2).alias("c"),
                     (F.col("l_suppkey") * 2 + 1).alias("s"))
             .distinct().collect())
    und = {(r["c"], r["s"]) for r in pairs}
    return und | {(s, c) for c, s in und}


def test_sssp_matches_python_bellman_ford(spark):
    from challenge8_movies_etl_spark.queries_graph import q_graph_sssp
    from challenge8_movies_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    ps = {(r["l_partkey"], r["l_suppkey"])
          for r in li.select("l_partkey", "l_suppkey").distinct().collect()}
    from collections import defaultdict
    shared = defaultdict(int)
    by_part = defaultdict(list)
    for p, s in ps:
        by_part[p].append(s)
    for p, ss in by_part.items():
        ss = sorted(set(ss))
        for i, u in enumerate(ss):
            for v in ss[i + 1:]:
                shared[(u, v)] += 1
    edges = {}
    for (u, v), c in shared.items():
        w = c % 7 + 1
        edges.setdefault(u, []).append((v, w))
        edges.setdefault(v, []).append((u, w))
    src = min(edges)
    dist = {src: 0}
    for _ in range(4):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in edges[u]:
                if d + w < nxt.get(v, 1 << 60):
                    nxt[v] = d + w
        dist = nxt
    got = {r["node"]: r["dist"]
           for r in q_graph_sssp(spark, SF_SMOKE).collect()}
    assert got == dist
    assert got[src] == 0


def test_kcore_matches_python_peeling(spark):
    from challenge8_movies_etl_spark.queries_graph import (
        _KCORE_K, _KCORE_ROUNDS, q_graph_kcore)

    e = _smoke_bipartite_edges(spark)
    for _ in range(_KCORE_ROUNDS):
        from collections import Counter
        deg = Counter(u for u, _ in e)
        keep = {n for n, d in deg.items() if d >= _KCORE_K}
        e = {(u, v) for u, v in e if u in keep and v in keep}
    from collections import Counter
    deg = Counter(u for u, _ in e)
    rows = q_graph_kcore(spark, SF_SMOKE).collect()
    got = {r["node"]: r["deg"] for r in rows}
    assert got == dict(deg)
    # survivors are a strict, non-empty subgraph of the smoke graph
    assert 0 < len(got)
    kinds = {r["kind"] for r in rows}
    assert kinds <= {"customer", "supplier"}


def test_random_walks_follow_md5_choices(spark):
    """Every step must move along a real edge, to exactly the neighbor
    the md5 counter selects in dst-sorted order — the python twin
    recomputes the whole walk set from hashlib."""
    import hashlib

    from challenge8_movies_etl_spark.queries_graph import (
        _WALK_SEEDS, _WALK_STEPS, q_graph_random_walks)

    e = _smoke_bipartite_edges(spark)
    nbrs = {}
    for u, v in sorted(e):
        nbrs.setdefault(u, []).append(v)
    seeds = sorted({u for u, _ in e if u % 2 == 0})[:_WALK_SEEDS]
    expect = set()
    for w in seeds:
        node = w
        expect.add((w, 0, node))
        for t in range(1, _WALK_STEPS + 1):
            ns = nbrs[node]
            h = hashlib.md5(f"{w}:{t}:{node}".encode()).hexdigest()
            node = ns[int(h[:8], 16) % len(ns)]
            expect.add((w, t, node))
    got = {(r["walk_id"], r["step"], r["node"])
           for r in q_graph_random_walks(spark, SF_SMOKE).collect()}
    assert got == expect


def test_betweenness_matches_python_brandes(spark):
    """Top-20 must equal a python twin running the same depth-capped
    Brandes accumulation with identical 10dp quantization."""
    from collections import defaultdict

    from challenge8_movies_etl_spark.queries_graph import (
        _BC_DEPTH, _BC_SOURCES, q_graph_betweenness)

    e = _smoke_bipartite_edges(spark)
    adj = defaultdict(set)
    for u, v in e:
        adj[u].add(v)
    seeds = sorted({u for u, _ in e if u % 2 == 0})[:_BC_SOURCES]
    acc = defaultdict(float)
    for s in seeds:
        layers = [{s: 1}]
        seen = {s}
        for _ in range(_BC_DEPTH):
            nxt = defaultdict(int)
            for u, sig in layers[-1].items():
                for v in adj[u]:
                    if v not in seen:
                        nxt[v] += sig
            layers.append(dict(nxt))
            seen |= set(nxt)
        delta = {v: 0.0 for v in layers[_BC_DEPTH]}
        for k in range(_BC_DEPTH - 1, 0, -1):
            dk = {}
            for v, sig in layers[k].items():
                tot = 0.0
                for w in sorted(adj[v]):
                    if w in layers[k + 1]:
                        tot += round((sig / layers[k + 1][w])
                                     * (1.0 + delta[w]), 10)
                dk[v] = tot
            for v, d in dk.items():
                acc[v] += round(d, 10)
            delta = dk
    expect = sorted(((round(bc, 6) + 0.0, n) for n, bc in acc.items()),
                    key=lambda t: (-t[0], t[1]))[:20]
    got = [(r["betweenness"], r["node"])
           for r in q_graph_betweenness(spark, SF_SMOKE).collect()]
    # float association: python sums in sorted-w order, spark in
    # arbitrary order — both quantize terms to 10dp first, so sums of
    # the same terms agree exactly after the decimal accumulation
    assert got == expect
    # in a bipartite graph the suppliers bridge customer pairs: the
    # top broker must be a supplier
    assert got[0][1] % 2 == 1


def test_closeness_matches_python_bfs(spark):
    """Harmonic closeness must equal a pure-python bounded BFS from
    the same top-degree sources over the same co-occurrence graph."""
    from collections import deque

    from challenge8_movies_etl_spark.queries_graph import (
        _CLOSE_HOPS, _CLOSE_SOURCES)
    from challenge8_movies_etl_spark.registry import QUERIES
    from tests.conftest import SF_SMOKE

    rows = {r["source"]: r
            for r in QUERIES["q_graph_closeness"](spark, SF_SMOKE)
            .collect()}
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet") \
        .select("l_partkey", "l_suppkey").distinct().collect()
    by_part = {}
    for r in li:
        by_part.setdefault(r["l_partkey"], set()).add(r["l_suppkey"])
    adj = {}
    for supps in by_part.values():
        for u in supps:
            for v in supps:
                if u != v:
                    adj.setdefault(u, set()).add(v)
    deg = {u: len(vs) for u, vs in adj.items()}
    srcs = sorted(deg, key=lambda u: (-deg[u], u))[:_CLOSE_SOURCES]
    assert sorted(rows) == sorted(srcs)
    for s in srcs:
        seen = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if seen[u] >= _CLOSE_HOPS:
                continue
            for v in adj.get(u, ()):
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        h = sum(1.0 / d for d in seen.values() if d > 0)
        assert abs(rows[s]["harmonic"] - round(h, 6)) < 1e-6
        assert rows[s]["n1"] == deg.get(s, 0)


def _topk_backbone_edges(spark):
    """Python twin of the top-5000 co-occurrence backbone at SF_SMOKE."""
    from collections import Counter
    rows = (spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
            .select("l_partkey", "l_suppkey").distinct().collect())
    by_part = {}
    for r in rows:
        by_part.setdefault(r.l_partkey, []).append(r.l_suppkey)
    shared = Counter()
    for supps in by_part.values():
        ss = sorted(set(supps))
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                shared[(ss[i], ss[j])] += 1
    ranked = sorted(shared.items(), key=lambda kv: (-kv[1], kv[0]))
    return [uv for uv, _ in ranked[:5000]]


def test_clustering_coeff_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    edges = _topk_backbone_edges(spark)
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        t = sum(1 for a in nbrs for b in nbrs
                if a < b and b in adj.get(a, ()))
        expect[n] = (d, t, round(2.0 * t / (d * (d - 1)), 6) + 0.0
                     if d >= 2 else 0.0)
    out = QUERIES["q_graph_clustering_coeff"](spark, SF_SMOKE).collect()
    assert out, "non-empty at smoke scale"
    for r in out:
        d, t, c = expect[r["node"]]
        assert (r["d"], r["n_tri"]) == (d, t)
        assert abs(r["coeff"] - c) < 1e-9
        assert 0.0 <= r["coeff"] <= 1.0
    # ordered by coeff desc, node asc
    keys = [(-r["coeff"], r["node"]) for r in out]
    assert keys == sorted(keys)


def test_assortativity_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    import math
    edges = _topk_backbone_edges(spark)
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    js = [(deg[u], deg[v]) for u, v in edges]
    js += [(dk, dj) for dj, dk in js[:len(edges)]]
    m = len(js)
    sjk = sum(j * k for j, k in js)
    sj = sum(j for j, _ in js)
    sk = sum(k for _, k in js)
    sjj = sum(j * j for j, _ in js)
    skk = sum(k * k for _, k in js)
    vx, vy = m * sjj - sj * sj, m * skk - sk * sk
    r = QUERIES["q_graph_assortativity"](spark, SF_SMOKE).collect()[0]
    assert r["m"] == m
    if vx > 0 and vy > 0:
        expect = round((m * sjk - sj * sk)
                       / math.sqrt(float(vx) * float(vy)), 6) + 0.0
        assert abs(r["assortativity"] - expect) < 1e-9
        assert -1.0 - 1e-9 <= r["assortativity"] <= 1.0 + 1e-9
    else:
        # regular backbone (sf0.001 is the complete K10): pinned NULL
        assert r["assortativity"] is None


def test_modularity_bounds_and_nontrivial(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    r = QUERIES["q_graph_modularity"](spark, SF_SMOKE).collect()[0]
    assert r["m"] > 0
    assert 1 <= r["n_communities"] <= 25  # TPC-H nations
    assert -0.5 - 1e-9 <= r["q_modularity"] <= 1.0


def test_modularity_matches_python_twin(spark):
    from challenge8_movies_etl_spark.registry import QUERIES
    edges = _topk_backbone_edges(spark)
    nation = {r.s_suppkey: r.s_nationkey for r in
              spark.read.parquet(f"{SF_SMOKE}/supplier.parquet")
              .select("s_suppkey", "s_nationkey").collect()}
    m = len(edges)
    deg = {}
    e_in = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
        if nation[u] == nation[v]:
            e_in[nation[u]] = e_in.get(nation[u], 0) + 1
    d_c = {}
    for node, d in deg.items():
        d_c[nation[node]] = d_c.get(nation[node], 0) + d
    num = sum(4 * m * e_in.get(c, 0) - dc * dc for c, dc in d_c.items())
    q = num / (4.0 * m * m)
    r = QUERIES["q_graph_modularity"](spark, SF_SMOKE).collect()[0]
    assert r["m"] == m
    assert r["n_communities"] == len(d_c)
    assert abs(r["q_modularity"] - (round(q, 6) + 0.0)) < 1e-9
