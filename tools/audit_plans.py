"""Dump `explain("formatted")` for the headline queries (PLANS.md source).

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from go_muse_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "rollup_1h", "gapfill_zero_1h", "muse_topk_1h", "muse_grouped_1h",
    "minhash_near_dups", "embedding_near_dups", "cosine_topk",
    "topk_abs_score", "ann_ivf_topk", "asof_click_view",
    "asof_click_view_bucketed", "corpus_prep",
    "sessionize_8h", "interval_click_attrib", "stratified_sample",
    "counter_rate_1h", "muse_over_chunks_1h",
    "m4_1d", "ewma_1h", "zscore_24h", "corr_traffic_value",
    "rollup_dims", "tfidf_top3", "twa_1h", "state_dur_1d",
    "funnel_vcp", "cohort_1d", "lttb_1d", "uniques_1h", "hist_value_1d",
    "split_docs", "dod_delta_1d", "coverage_1h",
    "cusum_1h", "acf_1h", "instant_snapshot", "histq_1d",
    "alert_episodes_2h", "contaminated_docs", "pack_512",
    "seasonal_profile", "mad_outliers", "ngram_diversity",
    "unigram_logprob", "session_window_8h", "kmeans_step",
    "gaps_6h", "state_transitions",
    "boilerplate_4w", "latency_1d", "brown_1h", "sax_1d", "sax_motifs",
    "rollquant_24h", "seasonal_anomaly", "mixture_sample", "predict_1h",
    "burn_rate", "changes_24h", "repetition_ratio", "funnel_latency",
    "markov_transitions", "muse_multi_1h",
    # round-5 continuation families
    "dq_events", "hampel_25_1h", "period_detect_1h", "cdc_1h_tier",
    "zorder_audit", "bm25_topk", "keyness_src", "bloom_prefilter",
    "mase_24h", "markov_entropy", "ess_1h", "shape_24h",
    "survival_sessions", "skew_advisor", "fleet_quantile_1h",
    "dod_cost_1h", "burstiness", "source_overlap",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark(cpus=4, app="plan-audit")
    qm = entrymod._raw_queries()
    for name in names:
        print(f"##### {name}")
        qm[name](spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
