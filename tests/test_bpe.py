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
