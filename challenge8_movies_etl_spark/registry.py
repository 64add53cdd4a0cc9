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
    # round-7 rotation (DRIVER_COVERAGE.md; VERDICT r6 item 1): no
    # reds exist, so the front is (a) queries NEW or semantics-
    # changed in round 7 (WARC, zstd 4-codec rotation, A-law, the
    # four sketch companions, the seq-packing first-bin and utf8
    # empty-text fixes), then (b) the never-driver-sampled mass in
    # VERDICT r6 priority order: the round-6 crawl wave first, the
    # unigram tokenizer + palette PNG, the causal/experimentation
    # family, then codec/graph/eval/stream never-sampled members.
    # --- (a) round-7 new / changed ---
    "q_warc_extract", "q_warcgz_extract", "q_warc_cdx_fetch",
    "q_robots_decide", "q_http_dechunk", "q_url_frontier",
    "q_xml_sitemap", "q_prf_expansion", "q_doremi_reweight",
    "q_distinct_ngrams", "q_json_quarantine", "q_batch_padding",
    "q_preference_pairs", "q_loop_detect",
    "q_text_decompress", "q_audio_decode_alaw",
    "q_percentile_check", "q_sketch_reagg_check",
    "q_hll_intersection_check", "q_similarity_ann_check",
    "q_seq_packing", "q_text_utf8_validate",
    # --- (b) round-6 crawl wave (never sampled) ---
    "q_url_parse", "q_archive_extract", "q_quality_gopher",
    "q_html_extract", "q_pii_luhn", "q_blocklist_match",
    # --- tokenizer / palette (never sampled) ---
    "q_unigram_segment", "q_multimodal_decode_palette",
    # --- causal / experimentation family (never sampled) ---
    "q_diff_in_diff", "q_attribution_shapley", "q_cuped",
    "q_uplift_qini", "q_propensity_match", "q_iv_wald",
    "q_regression_discontinuity", "q_offpolicy_ips", "q_offpolicy_dr",
    "q_dbscan", "q_decision_stump",
    # --- codec tails (never sampled) ---
    "q_multimodal_decode_chroma422", "q_multimodal_decode_png16",
    # --- graph / topic / weak-supervision (never sampled) ---
    "q_graph_components", "q_graph_label_prop", "q_graph_kcore",
    "q_topic_nmf", "q_weak_supervision",
    # --- calibration / eval metrics (never sampled) ---
    "q_calibration_ece", "q_conformal_threshold",
    # (q_stream_topk / q_stream_backfill / q_coverage_select wait for
    # the r8 front — the round-7 crawl additions took their slots)
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

    front = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(front)]
    for d, keys in ((QUERIES, front + rest),
                    (ORACLE, [n for n in front + rest if n in ORACLE])):
        reordered = {n: d[n] for n in keys}
        d.clear()
        d.update(reordered)
