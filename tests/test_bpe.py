"""q_bpe_train — semantic checks beyond the DuckDB oracle agreement."""

from __future__ import annotations

from challenge8_movies_etl_spark.registry import QUERIES, load_all
from tests.conftest import SF_SMOKE

load_all()


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference with the SAME double-replace apply
    semantics as the query (module docstring of queries_bpe)."""
    toks = {("|" + "".join(c + "|" for c in w)): n
            for w, n in word_counts.items()}
    out = []
    for it in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for rep, n in toks.items():
            ts = [t for t in rep.split("|") if t]
            for a, b in zip(ts, ts[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        (t1, t2), cnt = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((it, t1, t2, t1 + t2, cnt))
        pat, rep2 = f"|{t1}|{t2}|", f"|{t1}{t2}|"
        nxt: dict[str, int] = {}
        for rep, n in toks.items():
            r = rep.replace(pat, rep2).replace(pat, rep2)
            nxt[r] = nxt.get(r, 0) + n
        toks = nxt
    return out


def test_bpe_train_matches_python_reference(spark):
    rows = [(r["it"], r["t1"], r["t2"], r["merged"], r["cnt"])
            for r in QUERIES["q_bpe_train"](spark, SF_SMOKE).collect()]
    rows.sort()

    docs = (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
            .select("text").collect())
    wc: dict[str, int] = {}
    for r in docs:
        for w in r["text"].split(" "):
            if w and w.isalpha() and w.islower():
                wc[w] = wc.get(w, 0) + 1
    assert rows == _python_bpe(wc, 5)


def test_bpe_merge_counts_nonincreasing(spark):
    """Max pair frequency is non-increasing across BPE iterations."""
    rows = sorted(QUERIES["q_bpe_train"](spark, SF_SMOKE).collect(),
                  key=lambda r: r["it"])
    assert len(rows) == 5
    cnts = [r["cnt"] for r in rows]
    assert all(a >= b for a, b in zip(cnts, cnts[1:])), cnts
    assert len({(r["t1"], r["t2"]) for r in rows}) == 5
    for r in rows:
        assert r["merged"] == r["t1"] + r["t2"]


def test_unigram_min_cost_brute_force():
    """DP equals exhaustive enumeration over every segmentation for
    all words up to length 6 over a 3-letter alphabet (covers every
    piece-boundary interaction), and differs from greedy longest-match
    where a locally longest piece blocks a cheaper split."""
    from itertools import product

    from challenge8_movies_etl_spark.queries_bpe import (
        _uni_cost, unigram_min_cost)

    def brute(w):
        if not w:
            return 0
        best = 10**12
        for j in (1, 2, 3):
            if j <= len(w):
                best = min(best, _uni_cost(w[:j]) + brute(w[j:]))
        return best

    for m in range(1, 7):
        for tup in product("the", repeat=m):
            w = "".join(tup)
            assert unigram_min_cost(w) == brute(w), w

    # 'ather': greedy eats 'at'(90)+'he'(90)+'r'(60)=240; optimal is
    # 'a'(60)+'the'(100)+'r'(60)=220
    assert unigram_min_cost("ather") == 220


def test_unigram_oracle_precondition_max_word_len():
    """The SQL oracle unrolls the DP to 8 positions; pin the corpus
    precondition that no token exceeds 8 chars (at the smoke scale;
    the sf0.01/0.1 sweeps enforce it end-to-end via the hash)."""
    import duckdb

    from tests.conftest import SF_SMOKE
    con = duckdb.connect()
    (mx,) = con.execute(
        f"SELECT max(length(w)) FROM (SELECT unnest(string_split("
        f"text, ' ')) AS w FROM read_parquet("
        f"'{SF_SMOKE}/documents.parquet'))").fetchone()
    assert mx <= 8
