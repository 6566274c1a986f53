#!/usr/bin/env python3
"""Join two graft.Bench JSON artifacts (sf0.1 and the synthesized sf1) into
the SCALING.md section-3 table: per-query wall-time ratio vs the query's
algorithmic class expectation. Pure stdlib; reads the full-precision
BENCH_*.json files that Bench persists (not the truncated driver capture).

Usage: scaling_report.py BENCH_SF01_r7.json BENCH_SF1_r7.json
"""
import json
import sys

# class -> (label, expected_ratio_note, flag_threshold)
CLASSES = {
    "linear": ("linear scan/agg/join", "≲10×", 15.0),
    "nlogn": ("sort/window/top-k", "≲13×", 18.0),
    "cand": ("candidate-bounded dedup", "≲10×", 15.0),
    "quad": ("quadratic-by-design", "≲100×", 130.0),
    "annq": ("fixed-query-set ANN", "≲10×", 15.0),
    "iter": ("iterative (rounds×linear)", "≲13×", 20.0),
    "commit": ("commit-bound", "≪10×", 10.0),
}

QUERY_CLASS = {
    "q01_pricing_summary": "linear", "q02_filter_project": "linear",
    "q03_topk_join_agg": "nlogn", "q04_region_revenue": "linear",
    "q05_anti_join": "linear", "q06_semi_join": "linear",
    "q07_flag_joinback": "linear", "q08_validate_rejected": "linear",
    "q09_validate_valid": "linear", "q10_merge_upsert": "commit",
    "q11_dedup_keep_first": "nlogn", "q12_group_topk": "nlogn",
    "q13_window_rank": "nlogn", "q14_running_sum": "nlogn",
    "q15_hourly_agg": "linear", "q16_values_not_exists": "linear",
    "q17_union_distinct": "linear", "q18_except": "linear",
    "q19_intersect": "linear", "q20_token_stats": "linear",
    "q21_lang_quality": "linear", "q22_fingerprint": "linear",
    "q23_exact_dedup": "linear", "q24_minhash_neardup": "cand",
    "q25_ngram_jaccard": "cand", "q26_ann_topk": "annq",
    "q27_cosine_neardup": "quad", "q28_simhash_neardup": "cand",
    "q29_lsh_ann": "annq", "q30_ivf_ann": "annq",
    "q31_sessions": "nlogn", "q32_catalog_insert": "commit",
    "q33_asof_join": "nlogn", "q34_token_chunks": "linear",
    "q35_collapse_repeats": "linear", "q36_top_token_ratio": "linear",
    "q37_salted_join": "linear", "q38_json_extract": "linear",
    "q39_asof_forward": "nlogn", "q40_asof_nearest": "nlogn",
    "q41_rollup_agg": "linear", "q42_pivot_status": "nlogn",
    "q43_range_band_join": "nlogn", "q44_percentiles": "nlogn",
    # q46 blocks by (lang, source): block COUNT is fixed, so a 10x corpus
    # makes blocks 10x larger and pairs 100x — quadratic-by-design like
    # q27; its scale path is q24/q28 (LSH/SimHash banding)
    "q45_stratified_sample": "linear", "q46_levenshtein_pairs": "quad",
    "q47_dedup_clusters": "iter", "q48_table_changes": "commit",
    "q49_tfidf_topterms": "linear", "q50_pii_scrub": "linear",
    "q51_cube_agg": "linear", "q52_moving_avg": "nlogn",
    "q53_json_ingest": "linear", "q54_orc_roundtrip": "linear",
    "q55_window_lag_lead": "nlogn", "q56_unpivot": "nlogn",
    "q57_sql_merge": "commit", "q58_cdf_percommit": "commit",
    "q59_distinct_counts": "linear", "q60_sql_delete": "commit",
    "q61_sql_update": "commit", "q62_skipping_scan": "commit",
    "q63_metadata_agg": "commit", "q64_decontaminate": "linear",
    "q65_sequence_pack": "nlogn", "q66_mixture_sample": "nlogn",
    "q67_dv_delete": "commit", "q68_sql_insert": "commit",
    "q69_freq_tokens": "linear", "q70_convert": "commit",
    "q71_grouping_sets": "linear", "q72_variant": "linear",
    "q73_repetition_quality": "linear",
    "q74_shuffle_shard": "nlogn",
    "q75_scd2_fold": "nlogn",
    "q76_interval_join": "linear", "q77_vocab_build": "nlogn",
    "q78_embed_quantize": "linear",
    "q79_funnel": "nlogn", "q80_gapfill": "nlogn",
    "q81_profile": "linear", "q82_bloom_join": "linear",
    "q83_incremental_mv": "commit", "q84_c4_filter": "linear",
    "q85_para_dedup": "linear",
    # q86: within-cell pairs grow quadratically at FIXED nCentroids
    # (scale knob: nCentroids ~ n) — classified by its bench config
    "q86_semdedup": "quad",
    "q87_pagerank": "iter", "q88_bpe_train": "iter",
    "q89_lm_score": "linear", "q90_embed_stats": "linear",
    "q91_conditional_merge": "commit", "q92_sync_merge": "commit",
    "q93_left_interval_join": "linear", "q94_weighted_sample": "nlogn",
    "q95_expectations": "linear", "q96_bm25": "linear",
    "q97_hybrid_rrf": "linear",
    # grid-cell equi-join: pairs grow with per-cell density — linear in
    # rows at fixed time density, pair-output-bound like the band join
    "q98_interval_join": "linear",
    # one broadcast anti-join scan of the corpus
    "q99_embed_decontam": "linear",
    # two count scans + the q66 window sampler
    "q100_temperature_mix": "nlogn",
    # fixed query set broadcast over the coded corpus: one linear pass
    "q101_pq_ann": "linear",
    # cell equi-join prunes to nProbe/nCells of the codes per query
    "q102_ivfpq_ann": "linear",
    # q89 scoring + per-lang ntile window
    "q103_ccnet_buckets": "nlogn",
    # first run pays the linear index build; steady state is
    # query-side posting joins over a fixed query set
    "q104_bm25_indexed": "linear",
    # canonicalize map + exact-dedup window + domain-cap window
    "q105_url_curation": "nlogn",
    # two shuffles (by fingerprint, by doc) + bounded per-doc windows —
    # duplicated-span mass is candidate-bounded like the gram joins
    "q106_substring_dedup": "cand",
    # codegen'd map-only scoring pass, plan-asserted no-Exchange
    "q107_hash_classifier": "linear",
    # one explode + hash-agg of integer count statistics
    "q108_nb_train": "linear",
    # latest-change-per-key reduce + full-outer merge commit
    "q109_apply_changes": "commit",
}


def load(path):
    with open(path) as f:
        d = json.loads(f.read())
    qs = dict(d["queries"])
    qs.update({k: v for k, v in d.get("extras", {}).items()
               if k.endswith("_sec")})
    return qs


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    rows, flagged = [], []
    for name in sorted(set(a) & set(b)):
        t0, t1 = a[name], b[name]
        if t0 <= 0 or t1 <= 0:
            rows.append((name, t0, t1, None, "FAILED"))
            flagged.append(name)
            continue
        ratio = t1 / t0
        cls = QUERY_CLASS.get(name, "linear" if name.startswith("q") else "linear")
        label, exp, thresh = CLASSES[cls]
        note = label
        if ratio > thresh:
            note += "  **OVER**"
            flagged.append(name)
        rows.append((name, t0, t1, ratio, f"{note} ({exp})"))
    print("| query | sf0.1 s | sf1 s | ratio | class (expected) |")
    print("|---|---|---|---|---|")
    for name, t0, t1, ratio, note in rows:
        r = f"{ratio:.1f}×" if ratio else "—"
        print(f"| {name} | {t0:.2f} | {t1:.2f} | {r} | {note} |")
    ta = sum(v for k, v in a.items() if k.startswith("q") and v > 0)
    tb = sum(v for k, v in b.items() if k.startswith("q") and v > 0)
    print(f"\nbattery totals: sf0.1 {ta:.1f} s -> sf1 {tb:.1f} s "
          f"({tb / ta:.1f}x for 10x data)")
    if flagged:
        print("flagged:", ", ".join(flagged))
    else:
        print("flagged: none")


if __name__ == "__main__":
    main()
