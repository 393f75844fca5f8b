#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count() action — full plan runs,
nothing collected to the driver). A warmup pass on the smallest SF
primes the JVM so measured numbers are steady-state.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_finder_comparator_spark.plans.catalog import QUERIES  # noqa: E402
from data_finder_comparator_spark.session import get_spark  # noqa: E402

# Headline set: flagship + the scale-sensitive operators. Extend as
# operators land; keep stable across rounds for comparability.
HEADLINE = [
    "fuzzy_join_tiers",
    "fuzzy_join_docs",
    "fuzzy_topk",
    "pricing_summary",
    "revenue_by_nation",
    "topk_orders_per_priority",
    "sessionize_events",
    "asof_latest_order",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "fuzzy_tier_assembly",
    "text_quality_signals",
    "doc_repetition",
    "vocab_top_tokens",
    "doc_fingerprints",
    "multimodal_features",
    "streaming_window_counts",
    # round 2 additions (r1 set above unchanged for comparability)
    "alignment_pairs",
    "streaming_watermarked_counts",
    "salted_segment_stats",
    "excel_folder_roundtrip",
    "csv_folder_roundtrip",
    "multimodal_frame_sample",
    "streaming_first_seen",
    "ann_sq8_rerank_topk",
    "corpus_curation_pipeline",
    "bucketed_order_revenue",
    "dedup_clusters",
    "purchase_window_stats",
    "streaming_purchase_attribution",
    "props_json_stats",
    "stratified_sample",
    "table_version_diff",
    "ivf_kmeans_centroids",
    "tfidf_top_terms",
    "session_type_cooccurrence",
    "lang_robust_length_stats",
    "doc_token_chunks",
    "decontaminate_overlap",
    "pii_redaction",
    # round 4 additions
    "streaming_session_counts",
    "streaming_enriched_segments",
    "multimodal_wav_decode",
    "deterministic_shuffle",
    "sequence_packing",
    # round 5 additions
    "alignment_dist",
    "streaming_fuzzy_tiers",
    "line_dedup_stats",
    "source_domain_caps",
    "mixture_token_budget",
    "duplicate_spans",
    "orc_folder_roundtrip",
    "partitioned_lang_roundtrip",
    "event_funnel",
    "streaming_dedup_events",
    "hourly_gapfill",
    "orders_grouping_sets",
    "hll_distinct_sketch",
    "cms_heavy_hitters",
    "bloom_decontaminate",
    "rolling_user_activity",
    "histogram_quantiles",
    # round 6 additions
    "hll_merge_shards",
    # round 7 additions (grouped_histogram_quantiles and
    # bloom_merge_shards retired to the pytest-only registry in r13 —
    # displaced by the code-changed returns excel_folder_roundtrip /
    # lakehouse_datasource_snapshot per the rotation rule)
    "scrub_hot_spans",
    "cluster_canonical",
    "grouped_hll_by_lang",
    "inverted_index",
    "pcm_resample_layout",
    # round 8 additions (the registry's final three — saturation bound)
    "gram_tfidf_cosine_topk",
    "weighted_reservoir_sample",
    # round 11 additions (registry grew 99 -> 101 on verdict orders)
    "lakehouse_merge_roundtrip",
    # round 12: registry back to its sustainable 99 — four variants
    # retired to the pytest-only registry (cms_merge_shards,
    # hll_register_stream, events_cube dropped from this list;
    # fuzzy_join_docs_band was never listed here), two verdict-ordered
    # net-new registrations added
    "lakehouse_datasource_snapshot",
    "semantic_dedup",
    # round 13: the build-in-query ANN forms (ivf_pq_topk,
    # ann_lsh_topk — the former previously listed here) retired to the
    # pytest-only registry; their driver slots and headline entries
    # now carry the persisted-index build+serve roundtrips
    "ivf_pq_build_serve_roundtrip",
    "ann_lsh_build_serve_roundtrip",
    # r13: the DSv2 filter-pushdown reader's driver row
    "lakehouse_pushdown_snapshot",
    # r14: the DSv2 STREAM source's driver row (checkpoint-accelerated
    # catch-up below the expiry cutoff + the dirty-history refusal)
    "lakehouse_stream_roundtrip",
    # r15: the maintenance plane (optimize raced vs delete + expiry +
    # vacuum), the ANN freshness lifecycle, and the three free-slot
    # rows (CDC feed, additive schema evolution, restore)
    "lakehouse_maintenance_roundtrip",
    "ann_audit_lifecycle",
    "lakehouse_cdc_changes",
    "lakehouse_schema_evolution",
    "lakehouse_restore_roundtrip",
    # r16: exactly-once streaming ingest INTO the lakehouse, and
    # clustered compaction with the planned-files skipping proof
    "lakehouse_stream_ingest",
    "lakehouse_clustered_compaction",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    spark = get_spark(app_name="bench")
    names = [n for n in HEADLINE if n in QUERIES]
    extra = [n for n in sorted(QUERIES) if n not in HEADLINE]
    names += [n for n in extra if os.environ.get("SPARK_GRAFT_BENCH_ALL")]

    # Warmup: run the first query once on the smoke SF to JIT the stack.
    try:
        QUERIES[names[0]](spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass

    # Steady-state timing: best of three warm runs per query — the host
    # is shared, and single-shot timings swing 2-4x on interference
    # (measured: identical code, back-to-back full-suite runs 50.9s vs
    # 65.1s); min of three is the steady-state estimator and stays
    # honest (every run executes the full plan; nothing is cached
    # between runs).
    timings: dict[str, float] = {}
    for name in names:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # operators persist() intermediates consumed twice within one
            # query; drop them so runs are independent and no query is
            # billed for a predecessor's cached state
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(payload))
    _archive(payload)
    # The driver captures only a 2000-char TAIL of stdout; with 99
    # queries the full contract line is ~3.5 KB, so its head (the
    # metric/value fields) gets cut and the driver records
    # parsed:null (observed in BENCH_r08/BENCH_r09). Emit a LAST line
    # that always fits: same contract shape, slowest queries inline
    # while they fit, the rest in the self-archive the line points to.
    print(json.dumps(_compact_payload(payload), separators=(",", ":")))
    spark.stop()


def _compact_payload(payload: dict, budget: int = 1800) -> dict:
    timings = payload["queries"]
    out = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "n_queries": len(timings),
        "queries_full": "bench_history/ (self-archived per-query timings)",
        "queries": {},
    }
    for name in sorted(timings, key=lambda n: -timings[n]):
        out["queries"][name] = timings[name]
        if len(json.dumps(out, separators=(",", ":"))) > budget:
            del out["queries"][name]
            break
    return out


def _archive(payload: dict, here: str | None = None) -> None:
    """Self-archive the per-query dict to bench_history/r{N}.json —
    the driver's BENCH_r{N}.json capture has truncated the stdout JSON
    line before (r4 recorded only trailing log noise), which made
    round-over-round per-query regression diffs unrecoverable. The
    round number comes from $SPARK_GRAFT_ROUND when set, else one past
    the newest BENCH_r*.json the driver has recorded here. ``here``
    overrides the repo root (tests)."""
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd is None:
        seen = [
            int(m.group(1))
            for f in os.listdir(here)
            if (m := re.fullmatch(r"BENCH_r(\d+)\.json", f))
        ]
        rnd = str(max(seen, default=0) + 1)
    hist = os.path.join(here, "bench_history")
    os.makedirs(hist, exist_ok=True)
    # non-default scale factors archive under a suffixed name so a
    # cross-SF sweep can't clobber the round's headline sf0.1 archive
    sf = payload.get("sf")
    suffix = "" if sf in (None, 0.1) else f"_sf{sf}"
    with open(os.path.join(hist, f"r{int(rnd)}{suffix}.json"), "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")


if __name__ == "__main__":
    main()
