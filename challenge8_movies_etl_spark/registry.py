"""Query registry — the single source of truth for the driver contract.

Every operator in SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on identical parquet.
``__spark_entry__.py`` re-exports ``QUERIES`` / ``ORACLE`` verbatim.

Hash-stability conventions (SURVEY.md §2 / §7.3), applied throughout:

- alias every computed column identically on both sides;
- sums/avgs of doubles go through ``decimal(30,10)`` so the result is
  exact and order-independent (double summation order differs between
  Spark partial aggs and DuckDB — see functions/hashsafe.py);
- every float produced by genuinely-float multi-step math (stddev,
  cosine) is ``round(x, 4)`` on both sides;
- BUT when a quantity has exact decimal granularity (an integer-cent
  sum divided by a power-of-ten-friendly count), round at or beyond
  its IDENTITY precision: the true value then never sits on a round()
  half-boundary, where Spark (BigDecimal HALF_UP over the exact
  binary expansion) and DuckDB (multiply + nearbyint) disagree on the
  SAME double. q_quantile_normalize hit this at sf0.1 (bucket means
  are multiples of 0.01/200; 26.04115 rounded 26.0412 vs 26.0411) —
  the dual-scale sweep is the detector for this class;
- every top-k carries a deterministic tie-break key;
- dedup is expressed as DISTINCT or group-by+min, never a row-arbitrary
  ``dropDuplicates``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``; attach
    the DuckDB oracle SQL when the semantics are SQL-expressible (omit →
    the driver records a weaker rows-only check)."""
    def deco(fn):
        if name in QUERIES and QUERIES[name].__module__ != fn.__module__:
            # a silent overwrite across modules re-defines an already-
            # shipped qid's semantics (bit us in round 4: a new module
            # re-registered q_markov_transitions over the round-2 one)
            raise ValueError(
                f"query {name!r} already registered by "
                f"{QUERIES[name].__module__}; duplicate in {fn.__module__}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn
    return deco


# The driver's per-round correctness pass evaluates exactly the first 50
# registry entries in dict order (verified: CORRECTNESS_r03.json keys ==
# registry[:50] of the r3 registry).  To rotate driver coverage across the
# whole registry, _DRIVER_PRIORITY pins the front of the dict each round:
# first any query whose latest driver row is red (q_math_funcs, r1 hash-fail,
# fixed since), then the SURVEY §2 categories I/J/K that have never received
# a driver row, then the remaining never-driver-sampled queries in registry
# order.  DRIVER_COVERAGE.md tracks the sampled/never-sampled ledger.
_DRIVER_PRIORITY: tuple[str, ...] = (
    # round-9 rotation (DRIVER_COVERAGE.md; VERDICT r8 item 3): no
    # reds exist after r8 (50/50 green), so all 50 slots go to
    # never-driver-sampled queries from the 84-strong pool (the r8
    # verdict corrected DRIVER_COVERAGE's 82 miscount), in VERDICT
    # r8 priority order: (a) the two queries that lost their r8
    # slots to late additions, (b) the 20 round-8 post-rotation
    # registrations (interchange-format wave, crawl/eval/pipeline
    # additions, ML/stats close wave — q_geoip_lookup carries the
    # round-9 map-side-combine rewrite, so its first driver row
    # exercises the new plan), then (c) 28 of the r7
    # stats/timeseries/analytics tail in registry order. The 34
    # remaining never-sampled queue for r10, closing the union at
    # the r10 rotation.
    # --- (a) lost their r8 slots ---
    "q_dedup_threshold_curve", "q_quantile_normalize",
    # --- (b) round-8 post-rotation registrations ---
    "q_recrawl_schedule", "q_bleu", "q_snippet_extract",
    "q_token_budget_mix", "q_deletion_vectors", "q_hilbert_layout",
    "q_zip_extract", "q_avro_extract", "q_protobuf_extract",
    "q_cbor_extract", "q_image_exif", "q_gif_decode",
    "q_adaboost_stumps", "q_tost_equivalence", "q_sprt",
    "q_parquet_footer_stats", "q_randomized_response",
    "q_successive_halving", "q_geoip_lookup", "q_bitemporal_asof",
    # --- (c) r7 stats/timeseries/analytics tail, registry order ---
    "q_chao1_richness", "q_embed_random_projection",
    "q_pps_systematic", "q_attribution_linear", "q_cohort_ltv",
    "q_skyline", "q_weighted_percentile", "q_temporal_join",
    "q_gaps_islands", "q_markov_attribution", "q_huber_regression",
    "q_capture_recapture", "q_seasonal_decompose", "q_mann_kendall",
    "q_kendall_tau", "q_theil_sen", "q_spearman_corr",
    "q_haar_wavelet", "q_ohlc_bars", "q_max_drawdown",
    "q_runs_test", "q_poisson_dispersion", "q_burst_detect",
    "q_array_setops", "q_table_fingerprint", "q_k_anonymity",
    "q_agg_string", "q_shuffle_deterministic",
)


def load_all() -> None:
    """Import every module that registers queries (idempotent), then
    reorder the registry so ``_DRIVER_PRIORITY`` occupies the front of
    the dict (the driver evaluates the first 50 entries per round)."""
    from . import queries_llm  # noqa: F401
    from . import queries_search  # noqa: F401
    from . import queries_pipeline  # noqa: F401
    from . import queries_incremental  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_timeseries  # noqa: F401
    from . import queries_graph  # noqa: F401
    from . import queries_udf  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import etl  # noqa: F401
    from . import queries_core  # noqa: F401
    from . import queries_functions  # noqa: F401
    from . import queries_joins  # noqa: F401
    from . import queries_aggs  # noqa: F401
    from . import queries_windows  # noqa: F401
    from . import queries_ml  # noqa: F401
    from . import queries_curation  # noqa: F401
    from . import queries_stats  # noqa: F401
    from . import queries_eval  # noqa: F401
    from . import queries_lsh  # noqa: F401
    from . import queries_pq  # noqa: F401
    from . import queries_bpe  # noqa: F401
    from . import queries_audio  # noqa: F401
    from . import queries_video  # noqa: F401
    from . import queries_pysource  # noqa: F401
    from . import queries_weaksup  # noqa: F401
    from . import queries_calibration  # noqa: F401
    from . import queries_substring  # noqa: F401
    from . import queries_nmf  # noqa: F401
    from . import queries_crawl  # noqa: F401
    from . import queries_formats  # noqa: F401

    front = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    for d, keys in ((QUERIES, front + rest),
                    (ORACLE, [n for n in front + rest if n in ORACLE])):
        reordered = {n: d[n] for n in keys}
        d.clear()
        d.update(reordered)
