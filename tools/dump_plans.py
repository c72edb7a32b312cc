#!/usr/bin/env python
"""Regenerate docs/PLANS.md: the formatted physical plans of the
representative headline queries, as evidence for the scale claims in
docs/SCALE.md (pushdown reaching the scan, broadcasts, WindowGroupLimit,
partial aggregation, narrow Python stages).  Run from the repo root:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beam_scala_examples_spark.queries import QUERIES  # noqa: E402
from beam_scala_examples_spark.session import get_spark  # noqa: E402

# query -> the one-line claim its plan evidences
SHOWCASE = {
    "q16_tornado_months": "filter + column pruning pushed into the parquet scan",
    "q20_join_default": "dim join broadcasts; fact side never shuffles",
    "q05_autocomplete": "per-key top-K limit pushed below the shuffle (WindowGroupLimit)",
    "q09_max_lane_flow": "two-level slide-bucket arg-max, all HashAggregate partial/final",
    "q07_tfidf": "scalar broadcast forced, vocabulary join left to AQE size estimates",
    "dedup_minhash_pairs": "LSH band bucket self-join — candidate pairs, never all-pairs",
    "sim_ivf_topk": "centroids/probes broadcast; corpus never shuffles for a join",
    "events_asof_click": "as-of join as one exchange + running-last window, no join operator",
    "emb_random_projection": "map-only array-expression pipeline, zero exchanges",
    "events_user_activity_7d": "RANGE frame over the pre-aggregated user-day relation",
    "events_scd2": "single keyed exchange feeding the lead() window",
    "star_volume_by_nation": "star join: dims broadcast, fact chain shuffles on keys",
    "dedup_fuzzy_pairs": "blocking equi-join bounds edit distance to within-block pairs",
    "dq_report": "all row rules in one conditional-agg scan per table",
    "dedup_simhash_pairs": "Hamming-LSH band bucket self-join — candidates, never all-pairs",
    "data_corpus_build": "filter→dedup→split→pack as one plan; semi joins on doc_id only",
    "star_copurchase_triangles": "degree-ordered wedge join, Σ out-deg² bounded",
    "data_global_shuffle": "one hash exchange + per-shard sort — no global single-node sort",
    "text_bm25_topk": "query-term stats broadcast; integer micro-scores ride TakeOrdered",
    "events_asof_snapshot": "as-of bound pushed to the scan; rank-1 rides WindowGroupLimit",
    "emb_pca_top_component": (
        "cov/eigenvector built once and localCheckpoint'ed (the DIM²-row cut"
        " — multi-referenced branches read the materialization, not the"
        " corpus), so the final plan is the checkpoint scan itself"
    ),
    "dedup_minhash_band_sweep": "one signature relation, three bucketings — sweep in one plan",
    "star_clv_pareto": "ntile over the per-customer aggregate; O(10) report windows",
    "text_top_terms_per_doc": "per-doc keyword rank rides WindowGroupLimit",
    "text_heavy_hitters": "CMS sketch ≤ D×W rows broadcast to the probe join",
    "star_pareto_frontier": "banded skyline: windows partitioned by band, then survivors only",
    "events_value_mad_outliers": "histogram-median windows over aggregated rows; med/mad broadcast",
    "star_item_similarity": "co-partitioned basket self-join; per-part top-K via WindowGroupLimit",
    "text_lm_score": "vocabulary join hint-free (AQE decides); ln(N) is the only broadcast",
    "text_lm_bigram_score": "surprisal computed on the O(distinct-bigrams) model relation",
    "data_contrastive_triplets": "shingle-join candidates; rank-1 picks ride WindowGroupLimit",
    "star_part_communities": "persisted edge list reused across LPA rounds; vote rank-1 partial",
    "events_ab_test": "fact scanned once; arms collapse to 2 rows, report to one",
    "star_open_orders_daily": "sweep line: O(orders) deltas, one window over O(days)",
    "sim_adc_topk": "broadcast queries vs int8 corpus codes; top-k rides WindowGroupLimit",
    "events_time_weighted_value": "one user_id exchange; lead() inside the per-user sort",
    "events_next_purchase": "forward as-of: one exchange + running-last, no join operator",
    "sim_pq_topk": "ADC scan: broadcast LUT over exploded codes; exact re-rank on the shortlist only",
    "sim_ivfpq_topk": "IVFADC: probes+LUT broadcast; scored relation is slim integers end to end",
    "text_bpe_encode": "all-JVM string ops; vocab join back hint-free; no Python anywhere",
    "dedup_lsh_novelty": "bucket-min aggregate + one equi-join back — Σ|bucket| rows, no square",
    "events_nearest_purchase": "two as-of exchanges (backward+forward), closer match wins",
    "sim_ivfpq_trained_topk": "trained cells + PQ codes: centroids/probes/LUT broadcast, slim ints shuffle",
    "dedup_lsh_novelty_vote": "r-of-b vote: Σ|bucket|² candidate self-join + per-(doc,earlier) band count",
    "text_gopher_filter": "rule verdicts in one pass; n-gram legs partial-agg then join on doc_id",
    "q20_join_default_cogroup": "CoGBK twin: bucketed cogroup — 256 Arrow calls, not one per key",
    "sim_ivf_probe_sweep": "one ranked candidate relation (checkpointed) feeds every probe budget",
    "dq_k_anonymity": "one QI hash aggregate; 1-row risk share broadcast back onto the report",
    "data_pack_sequences": (
        "sharded prefix sum: data-row window partitions on (source,"
        " __prefix_shard); carry window sorts O(shards) totals, never rows"
    ),
    "data_mixture_order": "sharded row_number (hash-range shards) + broadcast weight join",
    "multimodal_decode_bmp": "render + REAL BMP parse: two Arrow mapInPandas, zero exchanges",
    "multimodal_decode_wav": "render + REAL RIFF walk: two Arrow mapInPandas, zero exchanges",
    "text_gopher_filter_full": "full 8-family rule chain; construction + parse in one codegen pass",
    "sim_pq_rerank_sweep": "one ADC ranking + one max-budget exact pass feed every budget",
    "dedup_normalized": "canonical form in one codegen pass; grouping on its md5, text never shuffles",
    "text_line_dedup": "line-md5 explode → owner count → md5 join-back; line text never shuffles",
    "dedup_span_pairs": "stride-1 span fingerprints: owner-count aggregate, never all-pairs",
    "dedup_span_runs": "islands row_number partitions on (doc_id, __prefix_shard); runs are O(runs) aggregates",
    "sim_range_search_ivf": "radius filter applied only inside probed trained cells; centroids/probes broadcast",
    "data_curriculum_order": "map-only phase/order keys on top of the per-source percentile ECDF",
    "text_ccnet_buckets": "per-source surprisal terciles via histogram-ECDF windows over aggregated rows",
    "text_langid_kappa": "kappa from the O(langs²) confusion aggregate; exact integer cross-products",
    "text_quality_calibration": "keep-rate curve from one quality-score histogram aggregate",
    "sim_ivfpq_trained_rerank": "one cell-restricted ADC scan (checkpointed) feeds every re-rank budget",
    "text_bpe_fertility": "O(sources) aggregate over the per-doc counts the BPE join already makes",
    "multimodal_resize_bmp": "render + real parse-flip-stride resize: two Arrow mapInPandas, zero exchanges",
    "multimodal_resample_wav": "render + real chunk-walk decimation: two Arrow mapInPandas, zero exchanges",
    "multimodal_sample_y4m": "render + real FRAME-marker walk, skipped frames never read: two Arrow mapInPandas",
    "text_winnow_fingerprints": "window-min selection as scan-stage array codegen; O(selected) rows shuffle",
    "text_winnow_pairs": "print-keyed self-join bounded by winnowing density — candidates, never all-pairs",
    "text_winnow_regions": "positional prints join on print value; islands window on (pair, diagonal)",
    "text_winnow_coverage": "interval-union islands over O(regions) rows; token counts ride the scan",
    "dq_hll_by_day": "grouped HLL: one map-side-combined aggregate to O(days × 1024) slim rows",
    "dq_hll_cumulative": "running register-max over the day grid — merge-only, corpus never rescanned",
    "dq_profile_events_sketch": "stacked per-column registers in ONE aggregate; no expand multi-distinct",
    "multimodal_phash_pairs": "render+hash Arrow passes feed an entropy-gated 16-bit band self-join",
    "multimodal_phash_novelty_verified": "bucket candidates verified at Hamming ≤ 3 — never all-pairs",
    "multimodal_phash_components": "pointer-jumping CC over verified pairs; checkpointed label rounds",
    "sim_rrf_fusion": "rank fusion: union + aggregate + WindowGroupLimit — no corpus rescan",
    "multimodal_scene_cuts": "render + FRAME-stride SAD walk: two Arrow mapInPandas, zero exchanges",
    "sim_prf_expand_ivf": "PRF served through trained IVF: broadcast cell probe restricts the corpus leg",
    "dq_value_quantiles_by_type": "grouped log-bin counters + one rank-walk window per group — no exact-percentile reshuffle",
    "dq_value_quantiles_cumulative": "percentile curve by running counter SUM over the day grid — merge-only",
    "dq_heavy_users_rollup": "per-day CMS blocks summed into a range sketch; probes join O(depth × width) rows",
    "data_corpus_build_copyaware": "coverage gate composes as one more doc_id semi join before packing",
    "text_quality_nb_classify": "sparse NB: O(vocab×2) model joins; ONE Window; class constants ride a 2-row broadcast",
    "sample_dsir_weights": "bucket LMs are O(1024) rows broadcast; per-doc weights in one map-side-combined aggregate",
    "sample_dsir_resample": "Gumbel-top-K rides TakeOrdered — per-partition top-K, never a global sort",
    "dq_hll_overlap": "pairwise register algebra over O(types²×1024) rows — cost independent of the event count",
}


def plan_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-dump", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# Physical plans — evidence for docs/SCALE.md",
        "",
        f"Generated by `python tools/dump_plans.py` at `{sf_dir}`",
        "(plan *shapes* are SF-independent; AQE numbers are not).",
        "Mechanical assertions for these shapes live in",
        "`tests/test_plans.py` — this file is the human-readable twin.",
        "",
    ]
    for name, claim in SHOWCASE.items():
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Claim:** {claim}.")
        out.append("")
        out.append("```")
        out.append(plan_str(QUERIES[name](spark, sf_dir)).rstrip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(SHOWCASE)} plans)")


if __name__ == "__main__":
    main()
