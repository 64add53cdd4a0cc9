"""Category I — UDF / UDAF / UDTF surface.

The reference's analog: ``parse_dollars`` and the row-wise
``df.apply(..., axis=1)`` lambdas (challenge.py≈L160-170 [R]) —
arbitrary-Python scalar functions are a required capability even though
the engine implements the hot paths natively (queries_functions.py).

Cost model made explicit here: the row-at-a-time UDF crosses the
Python↔JVM boundary per batch with pickled rows; the pandas_udf ships
Arrow record batches (~10-100x faster). Both produce identical values —
q_udf_scalar emits the two side by side and the oracle checks both
against the native parse_dollars SQL.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.parsing import parse_dollars_sql
from .functions.synth import MONEY_SYNTH
from .registry import query
from .sources.fixtures import load_table

# Python twin of functions/parsing.py::parse_dollars_col — same regexes,
# same first-match-wins order, same float arithmetic (IEEE identical).
_CITE = re.compile(r"\[\d+\]")
_RANGE = re.compile(r"\$\s*\d+\.?\d*\s*[-–—]\s*")
_MILL = re.compile(r"\$\s*(\d+\.?\d*)\s*million")
_BILL = re.compile(r"\$\s*(\d+\.?\d*)\s*billion")
_COMMA = re.compile(r"\$\s*(\d{1,3}(?:,\d{3})+)")


def parse_dollars_py(s: str | None) -> float | None:
    if s is None:
        return None
    c = _RANGE.sub("$", _CITE.sub("", s))
    m = _MILL.search(c)
    if m:
        return float(m.group(1)) * 1e6
    b = _BILL.search(c)
    if b:
        return float(b.group(1)) * 1e9
    k = _COMMA.search(c)
    if k:
        return float(k.group(1).replace(",", ""))
    return None


@query(
    "q_udf_scalar",
    oracle=f"""
    SELECT o_orderkey, raw_money,
           {parse_dollars_sql('raw_money')} AS parsed_udf,
           {parse_dollars_sql('raw_money')} AS parsed_arrow
    FROM (SELECT o_orderkey, {MONEY_SYNTH} AS raw_money FROM orders)
    """,
)
def q_udf_scalar(spark, sf_dir):
    """parse_dollars through BOTH Python UDF paths (row-at-a-time and
    Arrow-vectorized pandas_udf), proving the UDF surface produces the
    exact values of the native expression (same oracle as
    q_dollar_parse). The native form remains the hot-path default."""
    plain_udf = F.udf(parse_dollars_py, T.DoubleType())

    @F.pandas_udf(T.DoubleType())
    def arrow_udf(s: pd.Series) -> pd.Series:
        return s.map(parse_dollars_py)

    o = load_table(spark, sf_dir, "orders")
    synth = o.selectExpr("o_orderkey", f"{MONEY_SYNTH} AS raw_money")
    return synth.select(
        "o_orderkey", "raw_money",
        plain_udf("raw_money").alias("parsed_udf"),
        arrow_udf("raw_money").alias("parsed_arrow"),
    )


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice) AS median_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_udaf_grouped(spark, sf_dir):
    """Grouped EXACT median via a pandas grouped-aggregate UDF.

    Spark's native exact median requires a full sort per group
    (percentile) — the pandas_udf grouped-agg form demonstrates the
    custom-UDAF path the reference's df.apply aggregations would need.
    Exactness matters: percentile_approx would not hash-match DuckDB's
    median. Even-count groups average the two middle values — identical
    float op in pandas and DuckDB.
    """
    @F.pandas_udf(T.DoubleType())
    def exact_median(s: pd.Series) -> float:
        return float(s.median())

    # Spark disallows mixing grouped-agg pandas UDFs with native
    # aggregates in one agg(), so the count rides the same UDF path.
    @F.pandas_udf(T.LongType())
    def exact_count(s: pd.Series) -> int:
        return len(s)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        exact_median("o_totalprice").alias("median_price"),
        exact_count("o_totalprice").alias("n"),
    )


@query(
    "q_udtf",
    oracle="""
    SELECT d.doc_id, d.toks[gs.i] AS token, gs.i AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d
    JOIN range(1, 100000) gs(i) ON gs.i <= len(d.toks)
    """,
)
def q_udtf(spark, sf_dir):
    """Python UDTF (Spark 4 arrow-optimized): text -> (token, position)
    rows via LATERAL join — the table-function generalization of the
    reference's clean_movie record-to-rows reshaping."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: bigint")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield tok, i + 1

    import uuid as _uuid
    sfx = _uuid.uuid4().hex[:8]
    spark.udtf.register(f"tokenize_udtf_{sfx}", Tokenize)
    d = load_table(spark, sf_dir, "documents")
    view = f"documents_udtf_{sfx}"
    d.createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT d.doc_id, t.token, t.pos
        FROM {view} d, LATERAL tokenize_udtf_{sfx}(d.text) t
    """)


@query(
    "q_cogroup_asof",
    oracle="""
    WITH thr AS (
      SELECT t.event_type, k.k AS thr_k,
             TIMESTAMP '2024-01-01' + INTERVAL (k.k * 7) DAY AS thr_ts,
             (k.k + 1) * 10 AS thr
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(0, 4)) AS k) k
    )
    SELECT e.event_type, t.thr_k, t.thr,
           count(*) AS n_events,
           cast(coalesce(sum(CASE WHEN e.value > t.thr THEN 1 END), 0)
                as bigint) AS n_above
    FROM events e ASOF JOIN thr t
      ON e.event_type = t.event_type AND e.ts >= t.thr_ts
    GROUP BY e.event_type, t.thr_k, t.thr
    ORDER BY e.event_type, t.thr_k
    """,
)
def q_cogroup_asof(spark, sf_dir):
    """Cogrouped applyInPandas — the per-key two-sided pandas surface
    (`df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`): each
    event_type's events and its 5-row threshold schedule meet in ONE
    pandas callback that runs merge_asof (latest threshold at or
    before each event) and returns the per-(type, threshold-epoch)
    aggregate — the canonical Spark-docs shape for per-key as-of
    enrichment when the right-side logic is genuinely frame-wise.
    The declarative twins (q_join_asof / q_join_asof_nearest) remain
    the scale path for plain as-of joins; THIS surface is for when
    the per-key merge needs imperative pandas logic.

    Hash discipline: thresholds and counts are all integers; the only
    float op is the value>thr comparison of a parquet double against
    an int — deterministic on both engines. The oracle runs DuckDB's
    native ASOF JOIN against the identical generated schedule.

    Scale: cogroup shuffles both sides once on the key; each pandas
    call sees one key's rows. Skewed keys bound the batch — for a
    100 TB skewed key, pre-aggregate or salt before the cogroup
    (q_agg_salted pattern); output here is O(keys × epochs)."""
    import datetime as dt

    e = load_table(spark, sf_dir, "events")
    # the schedule side derives from the same cached events frame —
    # project its key under a NEW name (fresh exprId) so the cogroup
    # doesn't trip the ambiguous-self-join check; cogroup matches
    # grouping keys positionally, names may differ
    types = (e.select(F.col("event_type").alias("et")).distinct())
    thr = (types.crossJoin(F.broadcast(
              spark.range(5).select(F.col("id").alias("thr_k"))))
           .select("et", "thr_k",
                   (F.lit(dt.datetime(2024, 1, 1))
                    + F.make_interval(days=F.col("thr_k") * 7))
                    .alias("thr_ts"),
                   ((F.col("thr_k") + 1) * 10).alias("thr")))

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(columns=["event_type", "thr_k", "thr",
                                         "n_events", "n_above"])
        left = left.sort_values("ts")
        right = right.sort_values("thr_ts")
        m = pd.merge_asof(left, right, left_on="ts", right_on="thr_ts",
                          direction="backward")
        g = (m.groupby(["thr_k", "thr"], as_index=False)
             .agg(n_events=("value", "size"),
                  n_above=("value", lambda v: int(
                      (v > m.loc[v.index, "thr"]).sum()))))
        g.insert(0, "event_type", left["event_type"].iloc[0])
        return g

    out = (e.select("event_type", "ts", "value").groupBy("event_type")
           .cogroup(thr.groupBy("et"))
           .applyInPandas(merge, "event_type string, thr_k bigint, "
                                 "thr bigint, n_events bigint, "
                                 "n_above bigint"))
    return out.orderBy("event_type", "thr_k")


# ---------------------------------------------------------------------------
# q_burst_detect — two-state burst DP over daily series (applyInPandas)
# ---------------------------------------------------------------------------

# Deterministic burst injection (the q_diff_in_diff discipline: a known
# effect the detector must recover): days 10-14 of every type's series
# gain 3x the base rate. Rates/penalty derive integer-only from the
# series itself, so the whole DP is exact int64 arithmetic.
_BURST_LO, _BURST_HI = 10, 14

_BURST_ORACLE = f"""
WITH RECURSIVE raw AS (
  SELECT event_type, cast(ts as date) AS d, cast(count(*) as bigint) AS x0
  FROM events GROUP BY 1, 2
),
idxd AS (
  SELECT event_type, d, x0,
         row_number() OVER (PARTITION BY event_type ORDER BY d) AS idx,
         cast(sum(x0) OVER (PARTITION BY event_type)
              // count(*) OVER (PARTITION BY event_type) as bigint) AS r0
  FROM raw
),
days AS (
  SELECT event_type, d, idx, r0,
         x0 + CASE WHEN idx BETWEEN {_BURST_LO} AND {_BURST_HI}
                   THEN 3 * r0 ELSE 0 END AS x
  FROM idxd
),
em AS (
  SELECT event_type, d, idx, x, r0,
         (x - r0) * (x - r0) AS e0,
         (x - 2 * r0) * (x - 2 * r0) AS e1,
         r0 * r0 AS gam
  FROM days
),
dp AS (
  SELECT event_type, idx, x, e0 AS c0, e1 + gam AS c1, gam
  FROM em WHERE idx = 1
  UNION ALL
  SELECT e.event_type, e.idx, e.x,
         least(dp.c0, dp.c1) + e.e0,
         least(dp.c0 + dp.gam, dp.c1) + e.e1,
         dp.gam
  FROM dp JOIN em e
    ON e.event_type = dp.event_type AND e.idx = dp.idx + 1
),
labeled AS (
  SELECT event_type, idx, x,
         CASE WHEN c1 < c0 THEN 1 ELSE 0 END AS burst,
         c0, c1
  FROM dp
),
isl AS (
  SELECT event_type, idx,
         idx - row_number() OVER (PARTITION BY event_type
                                  ORDER BY idx) AS grp
  FROM labeled WHERE burst = 1
),
runs AS (
  SELECT event_type, count(*) AS run_len
  FROM isl GROUP BY event_type, grp
)
SELECT l.event_type,
       cast(count(*) as bigint) AS n_days,
       cast(sum(l.burst) as bigint) AS n_burst_days,
       cast(coalesce((SELECT max(run_len) FROM runs r
                      WHERE r.event_type = l.event_type), 0) as bigint)
         AS longest_burst,
       cast(min(CASE WHEN l.burst = 1 THEN l.idx END) as bigint)
         AS first_burst_day,
       cast(max(CASE WHEN l.idx = (SELECT max(idx) FROM labeled x
                                   WHERE x.event_type = l.event_type)
                     THEN least(l.c0, l.c1) END) as bigint) AS final_cost
FROM labeled l
GROUP BY l.event_type
ORDER BY l.event_type
"""


@query("q_burst_detect", oracle=_BURST_ORACLE)
def q_burst_detect(spark, sf_dir):
    """Burst detection on daily event series — Kleinberg's two-state
    automaton with integer squared-error emissions: state 0 emits at
    the base rate r0 (= integer mean), state 1 at 2*r0, entering a
    burst costs an integer penalty r0² (big enough that a single noisy
    day never opens a burst at smoke-scale rates); each day is labeled by the
    cheaper forward-DP prefix state. A known burst (+3*r0 on days
    10-14) is injected deterministically, and the detector must
    recover exactly that window (test-pinned, the q_diff_in_diff
    injected-effect discipline). The per-series DP runs in
    applyInPandas over the bounded daily relation — the declared
    python surface for sequential state machines SQL can't vectorize —
    while the oracle replays the identical integer recursion as a
    RECURSIVE CTE carrying both state costs as columns, so even a
    stateful python operator is value-hash-checked.

    Scale: the fact scan collapses to |types| x |days| first; the UDF
    sees only bounded series (one Arrow batch per type). Everything
    is int64-exact; no float ever enters the DP."""
    import numpy as np

    e = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window as W
    raw = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
           .agg(F.count("*").cast("long").alias("x0")))
    wt = W.partitionBy("event_type")
    idxd = raw.select(
        "event_type", "d", "x0",
        F.row_number().over(wt.orderBy("d")).alias("idx"),
        (F.sum("x0").over(wt) / F.count("*").over(wt))
        .cast("long").alias("r0"))
    days = idxd.select(
        "event_type", "idx", "r0",
        (F.col("x0") + F.when(F.col("idx").between(_BURST_LO, _BURST_HI),
                              3 * F.col("r0")).otherwise(0)).alias("x"))

    schema = ("event_type string, idx long, x long, burst int, "
              "c0 long, c1 long")

    def dp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("idx")
        x = pdf.x.to_numpy(dtype=np.int64)
        r0 = int(pdf.r0.iloc[0])
        gam = r0 * r0
        c0 = c1 = 0
        rows = []
        for i, xi in enumerate(x, start=1):
            e0, e1 = (int(xi) - r0) ** 2, (int(xi) - 2 * r0) ** 2
            if i == 1:
                c0, c1 = e0, e1 + gam
            else:
                c0, c1 = (min(c0, c1) + e0,
                          min(c0 + gam, c1) + e1)
            rows.append((pdf.event_type.iloc[0], i, int(xi),
                         int(c1 < c0), c0, c1))
        return pd.DataFrame(rows, columns=["event_type", "idx", "x",
                                           "burst", "c0", "c1"])

    labeled = (days.groupBy("event_type").applyInPandas(dp, schema)
               .persist())
    isl = (labeled.filter(F.col("burst") == 1)
           .select("event_type", "idx",
                   (F.col("idx") - F.row_number().over(
                       wt.orderBy("idx"))).alias("grp")))
    runs = (isl.groupBy("event_type", "grp")
            .agg(F.count("*").alias("run_len"))
            .groupBy("event_type")
            .agg(F.max("run_len").alias("longest")))
    last = labeled.groupBy("event_type").agg(F.max("idx").alias("mi"))
    fin = (labeled.join(last, "event_type")
           .filter(F.col("idx") == F.col("mi"))
           .select("event_type",
                   F.least("c0", "c1").alias("final_cost")))
    return (labeled.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_days"),
                 F.sum("burst").cast("long").alias("n_burst_days"),
                 F.min(F.when(F.col("burst") == 1, F.col("idx")))
                 .cast("long").alias("first_burst_day"))
            .join(runs, "event_type", "left")
            .join(fin, "event_type")
            .select("event_type", "n_days", "n_burst_days",
                    F.coalesce(F.col("longest"), F.lit(0)).cast("long")
                    .alias("longest_burst"),
                    "first_burst_day",
                    F.col("final_cost").cast("long").alias("final_cost"))
            .orderBy("event_type"))
