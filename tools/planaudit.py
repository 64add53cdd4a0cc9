"""Plan audit: physical-plan statistics for every registered query.

Writes PLANS.md — per query: shuffle-exchange count, broadcast-exchange
count, parquet scan count, whole-stage-codegen span count, and flags
(cartesian product, row-wise Python eval in a non-UDF-surface query).
The complement to tests/test_plans.py's hard gates: the gates pin the
queries where a specific shape is the contract; this report makes the
whole registry's plan posture reviewable at a glance.

Usage: python tools/planaudit.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# queries whose PLAN legitimately contains driver-side iteration
# (localCheckpoint / persist boundaries truncate the visible plan) or
# streaming machinery (no single batch plan)
ITERATIVE = {"q_dedup_clusters", "q_graph_pagerank", "q_graph_bfs",
             "q_graph_components", "q_bpe_train", "q_bpe_apply",
             "q_kmeans"}
STREAMING = {"q_stream_replay_tumbling", "q_stream_join_static",
             "q_stream_stream_join", "q_stream_stateful_counter",
             "q_stream_dedup", "q_stream_backfill",
             "q_stream_late_data", "q_pysource_stream",
             "q_stream_update_mode", "q_stream_outer_join",
             "q_stream_cdc_apply"}
# the mandated row-wise UDF surface — PythonUDF/Arrow eval expected
UDF_SURFACE = {"q_udf_scalar", "q_udaf_grouped", "q_udtf",
               "q_multimodal_meta", "q_multimodal_framesample",
               "q_multimodal_decode",  # declared Arrow decode surface
               "q_quality_pipeline",
               "q_wordpiece_encode",  # declared pandas-UDF tokenizer
               "q_image_dedup_exact",  # mapInPandas payload synthesis
               "q_multimodal_decode_color",  # Arrow color-decode surface
               "q_multimodal_decode_progressive",  # Annex-G decode
               "q_audio_decode",  # Arrow WAV/PCM decode surface
               "q_video_framestats",  # Arrow Y4M decode surface
               "q_audio_vad",  # Arrow decode + numpy RLE surface
               # PQ family: declared Arrow encode kernels (the pure-
               # expression form exceeds janino's 64 KB codegen limit —
               # queries_pq.py module docstring)
               "q_pq_encode", "q_pq_ann", "q_pq_recall", "q_ivfpq_ann",
               "q_audio_pitch",  # Arrow decode + int64 autocorrelation
               "q_video_scenecut",  # Arrow Y4M decode + luma diff
               "q_multimodal_decode_png",  # Arrow PNG decode surface
               "q_isotonic_pav",  # applyInPandas PAV on pooled profiles
               "q_observe_metrics",  # CollectMetrics + local result
               "q_cogroup_asof",  # cogrouped applyInPandas surface
               "q_burst_detect",  # applyInPandas DP on bounded series
               "q_dtw_distance",  # applyInPandas DP on bounded pairs
               "q_image_phash",  # Arrow DCT pHash surface (ninth wave)
               "q_audio_resample",  # Arrow decode + boxcar decimation
               # round-6 declared Arrow surfaces (codec long tail +
               # crawl front door + PAV boundary check + packing)
               "q_multimodal_decode_palette",  # PLTE expansion decode
               "q_multimodal_decode_png16",  # 16-bit PNG decode
               "q_multimodal_decode_adam7",  # interlaced decode+probes
               "q_multimodal_decode_chroma422",  # 4:2:2/4:4:0 decode
               "q_audio_decode_float",  # IEEE-float32 WAV decode
               "q_audio_decode_mulaw",  # G.711 companding decode
               "q_text_decompress",  # gzip/bz2/xz sniff-decompress
               "q_archive_extract",  # ustar walk
               "q_text_utf8_validate",  # UTF-8 maximal-subpart DFA
               "q_isotonic_check",  # applyInPandas PAV boundary blocks
               "q_seq_packing",  # per-shard next-fit applyInPandas
               "q_unigram_segment",  # per-distinct-word Viterbi DP
               "q_video_chroma422",  # Arrow C422 Y4M decode surface
               "q_blocklist_match",  # Aho-Corasick automaton surface
               # round-7 declared Arrow surfaces (the real crawl
               # record stack + G.711 A-law)
               "q_warc_extract",  # WARC/1.0 record walk
               "q_warcgz_extract",  # member-per-record .warc.gz
               "q_warc_cdx_fetch",  # CDX index + slice fetch
               "q_http_dechunk",  # WARC+HTTP chunked 3-layer stack
               "q_robots_decide",  # RFC 9309 parse + evaluate
               "q_audio_decode_alaw",  # G.711 A-law companding decode
               # round-8 declared Arrow surfaces: WET/WAT derivation,
               # revisit dedup, RFC 9309 wildcard matching (python
               # pattern engine), robots-aware frontier composition,
               # and the interchange-format codec wave
               "q_wet_extract", "q_wat_extract", "q_warc_revisit",
               "q_robots_wildcard", "q_frontier_robots",
               "q_zip_extract",  # ZIP central-directory walk
               "q_avro_extract",  # Avro OCF decode
               "q_protobuf_extract",  # protobuf wire-format decode
               "q_cbor_extract",  # CBOR RFC 8949 decode
               "q_image_exif",  # TIFF/EXIF IFD walk
               "q_gif_decode",  # GIF LZW + interlace decode
               "q_rle_bitpack",  # parquet RLE/bit-packed hybrid codec
               "q_delta_binary_packed",  # parquet delta codec surface
               # knn planner's Arrow centroid-assignment kernel
               # (operators/pq.py fixed-order numpy path)
               "q_knn_join_blocked",
               # round-11: distributed footer walk — binaryFile +
               # pyarrow metadata API (one task per footer) is
               # necessarily a Python/Arrow surface, plus the aligned
               # slice writer (VERDICT r10 item 5)
               "q_parquet_footer_stats"}


def audit(spark, qid, fn, sf_dir):
    df = fn(spark, sf_dir)
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    n_ex = len(re.findall(r"^\(\d+\) Exchange$", p, re.M))
    n_bc = len(re.findall(r"^\(\d+\) BroadcastExchange$", p, re.M))
    n_scan = len(re.findall(r"^\(\d+\) Scan ", p, re.M))
    # AQE pre-execution formatted plans carry no codegen annotation;
    # the dedicated codegen explain mode reports the subtree count
    pc = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen"))
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", pc)
    n_wsc = int(m.group(1)) if m else 0
    flags = []
    if "CartesianProduct" in p:
        flags.append("cartesian")
    if ("BatchEvalPython" in p or "ArrowEvalPython" in p
            or "FlatMapGroupsInPandas" in p or "MapInPandas" in p):
        flags.append("python")
    return n_ex, n_bc, n_scan, n_wsc, flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from challenge8_movies_etl_spark.registry import QUERIES, load_all
    from challenge8_movies_etl_spark.session import get_spark

    load_all()
    spark = get_spark("planaudit", shuffle_partitions=8)
    # static plans: with AQE on, explain defers codegen/broadcast
    # decisions to runtime and reports nothing useful pre-execution.
    # The non-adaptive plan is the conservative upper bound (AQE only
    # ever coalesces partitions / demotes shuffles to broadcasts at
    # runtime); the plan-shape GATES run on the default AQE session
    # (tests/test_plans.py), this report is the static review.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    rows, problems = [], []
    for qid in sorted(QUERIES):
        if qid in STREAMING:
            rows.append((qid, "—", "—", "—", "—", "streaming machinery"))
            continue
        try:
            n_ex, n_bc, n_scan, n_wsc, flags = audit(
                spark, qid, QUERIES[qid], args.sf)
        except Exception as ex:  # noqa: BLE001
            rows.append((qid, "?", "?", "?", "?", f"ERROR {ex}"))
            problems.append(qid)
            continue
        note = []
        if qid in ITERATIVE:
            note.append("iterative (driver loop; plan shown is final step)")
        if "cartesian" in flags:
            note.append("CARTESIAN")
            # dims-only cross joins are the one sanctioned case
            if qid not in {"q_cross_join"}:
                problems.append(qid)
        if "python" in flags:
            note.append("python-eval")
            if qid not in UDF_SURFACE:
                problems.append(qid)
        rows.append((qid, n_ex, n_bc, n_scan, n_wsc, "; ".join(note)))

    out = ["# PLANS — physical-plan audit (auto-generated by "
           "tools/planaudit.py; do not edit)",
           "",
           f"Scale factor dir: `{args.sf}`. Columns: shuffle Exchanges / "
           "BroadcastExchanges / parquet Scans / WholeStageCodegen spans.",
           "Python eval outside the declared UDF surface and cartesian "
           "products outside dims-only q_cross_join are build failures. "
           "Plans are STATIC (AQE disabled for the audit): runtime AQE "
           "only improves on these (partition coalescing, shuffle->"
           "broadcast demotion), so shuffle counts are upper bounds.",
           "",
           "| query | shuffles | broadcasts | scans | codegen | notes |",
           "|---|---|---|---|---|---|"]
    for r in rows:
        out.append("| " + " | ".join(str(x) for x in r) + " |")
    out.append("")
    out.append(f"Queries audited: {len(rows)}; flagged: "
               f"{sorted(set(problems)) or 'none'}")
    (REPO / "PLANS.md").write_text("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(rows)} queries; "
          f"flagged: {sorted(set(problems)) or 'none'})")
    if problems:
        sys.exit(1)


if __name__ == "__main__":
    main()
