"""Category K — q_flagship_etl: the full Movies-ETL pipeline
re-expressed Spark-first over the fixture tables.

Mirrors the reference's extract_transform_load stages
(challenge.py≈L60-210 [R], SURVEY.md §3.1) one-for-one:

  reference stage                     │ here
  ────────────────────────────────────┼─────────────────────────────────
  extract wiki JSON / kaggle CSV      │ parquet scans of orders (the
                                      │ messy "wiki side" is synthesized
                                      │ deterministically — synth.py)
  wiki keep-filter (director present, │ filter(director NOT NULL AND
    imdb link, no episodes) ≈L72-76   │   n_episodes IS NULL)
  clean_movie alt-titles map ≈L12-22  │ F.create_map + element_at
  imdb_id regex extract ≈L82-85       │ regexp_extract(url, tt\\d{7})
  drop_duplicates(imdb_id) ≈L85       │ row_number()=1 per imdb_id
                                      │   (deterministic: min movie_id)
  parse $ / dates / runtime ≈L90-132  │ functions/parsing.py builders
  kaggle casts+zero-fills ≈L134-144   │ when/otherwise casts
  inner merge on key ≈L146-150        │ equi join (AQE picks strategy)
  outlier row drop ≈L152-154          │ datediff compound predicate
  conditional fills ≈L160-170         │ when(kaggle==0, wiki)
  ratings pivot + left join ≈L187-195 │ explicit-values pivot + left
                                      │   join + fillna(0)
  final 31-col projection ≈L172-185   │ 25-col aliased projection

Single lazy DataFrame graph end-to-end: Catalyst fuses the whole wiki
side (synth → filter → regex parses) into one codegen'd stage over the
parquet scan; only the dedup window, the join, and the pivot shuffle.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .functions.parsing import (
    parse_date_multiformat_col,
    parse_date_multiformat_spark_sql,
    parse_date_multiformat_sql,
    parse_dollars_col,
    parse_dollars_spark_sql,
    parse_dollars_sql,
    parse_runtime_col,
    parse_runtime_spark_sql,
    parse_runtime_sql,
)
from .functions.synth import (
    DATE_SYNTH_DUCK,
    DATE_SYNTH_SPARK,
    DIRECTOR_SYNTH,
    EPISODES_SYNTH,
    IMDB_URL_SYNTH,
    MONEY_SYNTH,
    RUNTIME_SYNTH,
)
from .queries_aggs import EVENT_TYPES
from .registry import query
from .sources.fixtures import load_table

_EVT_CASES = ", ".join(
    f"count(CASE WHEN event_type = '{v}' THEN 1 END) AS evt_{v}"
    for v in EVENT_TYPES
)

_FLAGSHIP_ORACLE = rf"""
WITH wiki_raw AS (
  SELECT o_orderkey AS movie_id,
         'Movie ' || cast(o_orderkey as string) AS title,
         {DIRECTOR_SYNTH} AS director,
         {EPISODES_SYNTH} AS n_episodes,
         {IMDB_URL_SYNTH} AS url,
         {MONEY_SYNTH} AS box_office_str,
         {DATE_SYNTH_DUCK} AS release_date_str,
         {RUNTIME_SYNTH} AS runtime_str
  FROM orders
),
wiki_kept AS (
  SELECT * FROM wiki_raw
  WHERE director IS NOT NULL AND url IS NOT NULL AND n_episodes IS NULL
),
wiki_parsed AS (
  SELECT movie_id, title, director, url, box_office_str,
         release_date_str, runtime_str,
         regexp_extract(url, '(tt\d{{7}})', 1) AS imdb_id,
         {parse_dollars_sql('box_office_str')} AS box_office_wiki,
         {parse_date_multiformat_sql('release_date_str')} AS release_ts_wiki,
         {parse_runtime_sql('runtime_str')} AS runtime_wiki,
         'Pelicula ' || cast(movie_id as string) AS alt_title_es,
         'Film ' || cast(movie_id as string) AS alt_title_fr
  FROM wiki_kept
),
wiki AS (
  SELECT * FROM wiki_parsed
  QUALIFY row_number() OVER (PARTITION BY imdb_id ORDER BY movie_id) = 1
),
kaggle AS (
  SELECT o_orderkey AS kaggle_id,
         o_orderstatus AS status,
         o_totalprice AS revenue,
         o_orderpriority AS priority,
         CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE o_totalprice END
           AS budget_kaggle,
         o_orderdate AS release_date_kaggle,
         CASE WHEN o_orderkey % 11 = 0 THEN 0
              ELSE o_orderkey % 180 + 60 END AS runtime_kaggle
  FROM orders
),
merged AS (
  SELECT * FROM wiki JOIN kaggle ON wiki.movie_id = kaggle.kaggle_id
  WHERE date_diff('day', cast(release_ts_wiki as date),
                  cast(release_date_kaggle as date)) <= 350
),
filled AS (
  SELECT *,
         CASE WHEN budget_kaggle = 0 THEN box_office_wiki
              ELSE budget_kaggle END AS budget_filled,
         CASE WHEN runtime_kaggle = 0 THEN runtime_wiki
              ELSE runtime_kaggle END AS runtime_filled,
         movie_id % 150 AS user_key
  FROM merged
),
ratings AS (
  SELECT user_id, {_EVT_CASES} FROM events GROUP BY user_id
)
SELECT f.movie_id, f.imdb_id, f.url, f.title, f.director,
       f.alt_title_es, f.alt_title_fr,
       f.box_office_str, f.box_office_wiki,
       f.budget_kaggle, f.budget_filled,
       f.release_date_str,
       cast(cast(f.release_ts_wiki as date) as string) AS release_date_wiki,
       f.release_date_kaggle,
       f.runtime_str, f.runtime_wiki, f.runtime_kaggle, f.runtime_filled,
       f.status, f.revenue, f.priority, f.user_key,
       coalesce(r.evt_click, 0) AS evt_click,
       coalesce(r.evt_view, 0) AS evt_view,
       coalesce(r.evt_purchase, 0) AS evt_purchase,
       coalesce(r.evt_signup, 0) AS evt_signup,
       coalesce(r.evt_error, 0) AS evt_error
FROM filled f LEFT JOIN ratings r ON f.user_key = r.user_id
"""


# Spark-dialect single-text form of the same pipeline. Rationale
# (round 5, profiled): building the pipeline through the Column API
# costs ~0.34 s of py4j round-trips per fresh build at sf0.1 — the
# dominant scale-INVARIANT term in the flagship bench median (exec is
# ~0.75 s and data-scaled). One spark.sql() call moves all parsing
# into the JVM (~10 ms) and yields the IDENTICAL optimized plan: the
# wiki/kaggle self-join stays hand-eliminated (one scan), the
# row_number dedup still triggers WindowGroupLimit, and the ratings
# conditional-agg left-join is unchanged. The Column-API builders
# (parse_*_col) remain the API surface for C-category queries.
_EVT_CASES_SPARK = ", ".join(
    f"coalesce(count(CASE WHEN event_type = '{v}' THEN 1 END), 0)"
    f" AS evt_{v}" for v in EVENT_TYPES
)

_FLAGSHIP_SPARK_SQL = rf"""
WITH wiki_raw AS (
  SELECT o_orderkey AS movie_id,
         'Movie ' || cast(o_orderkey as string) AS title,
         {DIRECTOR_SYNTH} AS director,
         {EPISODES_SYNTH} AS n_episodes,
         {IMDB_URL_SYNTH} AS url,
         {MONEY_SYNTH} AS box_office_str,
         {DATE_SYNTH_SPARK} AS release_date_str,
         {RUNTIME_SYNTH} AS runtime_str,
         o_orderstatus AS status,
         o_totalprice AS revenue,
         o_orderpriority AS priority,
         CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE o_totalprice END
           AS budget_kaggle,
         o_orderdate AS release_date_kaggle,
         cast(CASE WHEN o_orderkey % 11 = 0 THEN 0
                   ELSE o_orderkey % 180 + 60 END as bigint)
           AS runtime_kaggle
  FROM orders
),
wiki_kept AS (
  SELECT * FROM wiki_raw
  WHERE director IS NOT NULL AND url IS NOT NULL AND n_episodes IS NULL
),
wiki_parsed AS (
  SELECT movie_id, title, director, url, box_office_str,
         release_date_str, runtime_str,
         status, revenue, priority, budget_kaggle,
         release_date_kaggle, runtime_kaggle,
         regexp_extract(url, '(tt\\d{{7}})', 1) AS imdb_id,
         {parse_dollars_spark_sql('box_office_str')} AS box_office_wiki,
         {parse_date_multiformat_spark_sql('release_date_str')}
           AS release_ts_wiki,
         {parse_runtime_spark_sql('runtime_str')} AS runtime_wiki,
         element_at(map('es', 'Pelicula ' || cast(movie_id as string),
                        'fr', 'Film ' || cast(movie_id as string)),
                    'es') AS alt_title_es,
         element_at(map('es', 'Pelicula ' || cast(movie_id as string),
                        'fr', 'Film ' || cast(movie_id as string)),
                    'fr') AS alt_title_fr
  FROM wiki_kept
),
wiki AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY imdb_id
                                 ORDER BY movie_id) AS _rn
    FROM wiki_parsed)
  WHERE _rn = 1
),
filled AS (
  SELECT *,
         CASE WHEN budget_kaggle = 0 THEN box_office_wiki
              ELSE budget_kaggle END AS budget_filled,
         CASE WHEN runtime_kaggle = 0 THEN runtime_wiki
              ELSE runtime_kaggle END AS runtime_filled,
         movie_id % 150 AS user_key
  FROM wiki
  WHERE datediff(cast(release_date_kaggle as date),
                 cast(release_ts_wiki as date)) <= 350
),
ratings AS (
  SELECT user_id, {_EVT_CASES_SPARK} FROM events GROUP BY user_id
)
SELECT f.movie_id, f.imdb_id, f.url, f.title, f.director,
       f.alt_title_es, f.alt_title_fr,
       f.box_office_str, f.box_office_wiki,
       f.budget_kaggle, f.budget_filled,
       f.release_date_str,
       cast(cast(f.release_ts_wiki as date) as string)
         AS release_date_wiki,
       f.release_date_kaggle,
       f.runtime_str, f.runtime_wiki, f.runtime_kaggle, f.runtime_filled,
       f.status, f.revenue, f.priority, f.user_key,
       coalesce(r.evt_click, 0) AS evt_click,
       coalesce(r.evt_view, 0) AS evt_view,
       coalesce(r.evt_purchase, 0) AS evt_purchase,
       coalesce(r.evt_signup, 0) AS evt_signup,
       coalesce(r.evt_error, 0) AS evt_error
FROM filled f LEFT JOIN ratings r ON f.user_key = r.user_id
"""


@query("q_flagship_etl", oracle=_FLAGSHIP_ORACLE)
def q_flagship_etl(spark, sf_dir):
    """The flagship end-to-end pipeline (SURVEY.md §2.K) — also the
    driver's ``entry()`` smoke query at sf0.001. Executed as one
    Spark SQL text (_FLAGSHIP_SPARK_SQL) for a ~0.3 s/build lower
    planning constant; the Column-API construction of the same
    pipeline lives in q_flagship_etl_df below (tested equal)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_FLAGSHIP_SPARK_SQL)


def q_flagship_etl_df(spark, sf_dir):
    """Column-API construction of the flagship (the original form,
    kept as the DataFrame-surface twin; tests assert it returns the
    identical rows as the SQL text)."""
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    # -- wiki side: synthesize messy records, filter, clean, parse ------
    # The reference (and the oracle SQL) build wiki and kaggle as two
    # relations and inner-join them on the shared key. Both are 1:1
    # projections of the SAME orders scan here, so the engine applies
    # self-join elimination: the kaggle-side typed columns (status/
    # revenue/budget/dates) ride the same projection and the wiki
    # keep-filter subsets rows — row-for-row identical to the join the
    # oracle executes, with one scan and zero join exchange. Measured
    # ~2x flagship wall time at sf0.1; at 100 TB it removes the
    # pipeline's biggest shuffle. The engine's join surface is
    # exercised by the eight D-category queries and the ratings
    # left-join below.
    wiki_raw = orders.selectExpr(
        "o_orderkey AS movie_id",
        "'Movie ' || cast(o_orderkey as string) AS title",
        f"{DIRECTOR_SYNTH} AS director",
        f"{EPISODES_SYNTH} AS n_episodes",
        f"{IMDB_URL_SYNTH} AS url",
        f"{MONEY_SYNTH} AS box_office_str",
        f"{DATE_SYNTH_SPARK} AS release_date_str",
        f"{RUNTIME_SYNTH} AS runtime_str",
        # kaggle side (the inner-merge partner, self-join-eliminated)
        "o_orderstatus AS status",
        "o_totalprice AS revenue",
        "o_orderpriority AS priority",
        "CASE WHEN o_orderkey % 7 = 0 THEN 0.0 ELSE o_totalprice END"
        " AS budget_kaggle",
        "o_orderdate AS release_date_kaggle",
        "cast(CASE WHEN o_orderkey % 11 = 0 THEN 0"
        " ELSE o_orderkey % 180 + 60 END as bigint) AS runtime_kaggle",
    )
    wiki_kept = wiki_raw.filter(
        F.col("director").isNotNull()
        & F.col("url").isNotNull()
        & F.col("n_episodes").isNull()
    )
    # clean_movie's alt_titles fold: a real MapType column, projected
    # back to scalar columns for the oracle compare (SURVEY.md §2.C map row)
    alt_titles = F.create_map(
        F.lit("es"), F.concat(F.lit("Pelicula "), F.col("movie_id").cast("string")),
        F.lit("fr"), F.concat(F.lit("Film "), F.col("movie_id").cast("string")),
    )
    wiki_parsed = wiki_kept.select(
        "movie_id", "title", "director", "url", "box_office_str",
        "release_date_str", "runtime_str",
        "status", "revenue", "priority", "budget_kaggle",
        "release_date_kaggle", "runtime_kaggle",
        F.regexp_extract("url", r"(tt\d{7})", 1).alias("imdb_id"),
        parse_dollars_col("box_office_str").alias("box_office_wiki"),
        parse_date_multiformat_col("release_date_str").alias("release_ts_wiki"),
        parse_runtime_col("runtime_str").alias("runtime_wiki"),
        alt_titles.alias("alt_titles"),
    ).withColumns({
        "alt_title_es": F.element_at("alt_titles", "es"),
        "alt_title_fr": F.element_at("alt_titles", "fr"),
    }).drop("alt_titles")
    # deterministic dedup: keep min movie_id per imdb_id. row_number +
    # WindowGroupLimit beat both the keep-set semi-join and a
    # min(struct(payload)) argmin here (measured at sf0.1): Spark's
    # WindowGroupLimit pre-filters each partition to its per-key top-1
    # BEFORE the exchange, so the shuffle already carries ~unique rows.
    wiki = (wiki_parsed
            .withColumn("_rn", F.row_number().over(
                W.partitionBy("imdb_id").orderBy("movie_id")))
            .filter(F.col("_rn") == 1).drop("_rn"))

    # -- outlier drop (the Holiday/From-Here-to-Eternity row) -----------
    merged = wiki.filter(
        F.datediff(F.to_date("release_date_kaggle"), F.to_date("release_ts_wiki"))
        <= 350
    )

    # -- conditional fills (fill_missing_kaggle_data analog) ------------
    filled = merged.withColumns({
        "budget_filled": F.when(F.col("budget_kaggle") == 0,
                                F.col("box_office_wiki"))
                          .otherwise(F.col("budget_kaggle")),
        "runtime_filled": F.when(F.col("runtime_kaggle") == 0,
                                 F.col("runtime_wiki"))
                           .otherwise(F.col("runtime_kaggle")),
        "user_key": F.col("movie_id") % 150,
    })

    # -- ratings analog: per-user event counts + left join + fillna 0 ---
    # expressed as single-pass conditional aggregation (one shuffle)
    # rather than .pivot() (two-phase, two shuffles); same wide result.
    # The .pivot() operator itself is exercised by q_pivot.
    ratings = events.groupBy("user_id").agg(*[
        F.count(F.when(F.col("event_type") == v, 1)).alias(v)
        for v in EVENT_TYPES
    ])
    filled = filled.join(ratings, filled.user_key == ratings.user_id, "left")

    return filled.select(
        "movie_id", "imdb_id", "url", "title", "director",
        "alt_title_es", "alt_title_fr",
        "box_office_str", "box_office_wiki",
        "budget_kaggle", "budget_filled",
        "release_date_str",
        F.col("release_ts_wiki").cast("date").cast("string")
        .alias("release_date_wiki"),
        "release_date_kaggle",
        "runtime_str", "runtime_wiki", "runtime_kaggle", "runtime_filled",
        "status", "revenue", "priority", "user_key",
        *[F.coalesce(F.col(v), F.lit(0)).alias(f"evt_{v}")
          for v in EVENT_TYPES],
    )
