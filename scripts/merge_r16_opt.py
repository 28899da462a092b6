#!/usr/bin/env python3
"""Merge the round-16 OPTIMIZATION bench record (r16_opt_local column).

Min-merge policy: a run only contributes to a query's record if it ran
that query's FINAL round-16 code — min-merging across code versions
would attribute one version's timing to another. Provenance:

  run A  bench_r16/baseline_runA.json  pre-optimization (commit 5b004ff)
  run B  bench_r16/opt_runB.json       post batch-1/2 (commit 90028c5)
  run C  bench_r16/opt_runC.json       final code (commit 62f2cee+)

  batch-3 changes (only C + their isolated run are valid): x38, x230,
  x44, x178, x3, x74, x35, x33, x161 (fan-outs committed 0fcc2f1) and
  x239 (driver-side squaring, 62f2cee).
  batch-1/2 changes (B, C + final-code isolated runs valid): the fan-out
  / window queries and every consumer of the shared builders they touch
  (itemContexts, minhashNearDups, verifyWithStringJaccard, docBands,
  cleanDeduped) — enumerated conservatively below as ANY query that is
  not provably untouched; for untouched queries A also counts.

Isolated min-of-4+ values measured on final code this session (stdout
artifacts; bench JSONs under /tmp are not durable, so the numbers are
inlined here with their provenance):
"""
import json
import sys

ISOLATED_FINAL = {
    # batch-1 final code (post 5be5405)
    "x99_suffix_dedup": 2.758,
    "x238_icws_weighted_minhash": 2.842,
    "x212_bradley_terry": 1.896,
    # post-projection/window subset (final code for these)
    "x127_pca_power": 1.870,
    "x101_item_pagerank": 2.740,
    "x180_hits": 3.163,
    "x85_item_pmi": 1.495,
    "x114_triangle_count": 2.002,
    "x120_label_propagation": 2.453,
    # batch-2 subset (final code)
    "x27_segment_dedup": 2.348,
    "x201_allpairs_prefix": 3.670,
    "x22_clean_corpus": 0.387,
    "x167_curation_pipeline": 0.947,
    "x2_dedup_minhash": 0.094,
    "x306_effective_rank": 1.514,
    "x321_boxcox": 0.662,
    "x215_silhouette": 2.200,
    # graph-family subset (final code)
    "x290_ktruss": 2.681, "x323_hyperball_anf": 3.302,
    "x223_modularity": 2.203, "x199_conductance": 1.847,
    "x140_kcore": 2.231, "x170_hashmin_cc": 1.874,
    "x139_khop_reach": 1.741, "x263_harmonic_centrality": 1.355,
    "x278_rich_club": 1.332, "x270_bcubed_eval": 3.315,
    # batch-3 isolated run (final code)
    "x74_tokenizer_fertility": 3.085, "x35_bpe_apply": 2.896,
    "x33_bpe_train": 2.466, "x230_self_bleu": 2.466,
    "x178_rake_keywords": 2.186, "x44_bigram_lm": 2.100,
    "x161_fd_discovery": 1.573, "x38_dup_spans": 1.340,
    "x3_dedup_simhash": 0.994,
    # x239 driver-side squaring (final code)
    "x239_markov_attribution": 2.000,
    # x178 after the fan-out REVERT (final code, isolated min-of-4)
    "x178_rake_keywords": 1.652,
}

# second isolated adjudication subset on final code (bench JSON artifact);
# min-merged into the pinned values (x178's row there predates its revert;
# the post-revert min is pinned above)
try:
    for k, v in json.load(
            open("bench_r16/iso_final_tail.json"))["queries"].items():
        if k != "x178_rake_keywords":
            ISOLATED_FINAL[k] = min(v, ISOLATED_FINAL.get(k, v))
except FileNotFoundError:
    pass

# queries whose code changed in batch 3 / x239: run B is INVALID for them
# (x178's batch-3 fan-out was REVERTED — its final code equals the
# original, so A/B stay valid for it and it is not listed here)
BATCH3 = {
    "x38_dup_spans", "x230_self_bleu", "x44_bigram_lm",
    "x3_dedup_simhash", "x74_tokenizer_fertility",
    "x35_bpe_apply", "x33_bpe_train", "x161_fd_discovery",
    "x239_markov_attribution",
}

# queries whose code (or a shared builder they consume) changed in
# batch 1/2: run A is INVALID for them. Everything touching documents
# dedup builders, itemContexts, embeddings fan-outs, or the x127/x212
# rewrites.
BATCH12 = {
    "x99_suffix_dedup", "x238_icws_weighted_minhash", "x127_pca_power",
    "x212_bradley_terry", "x206_link_prediction", "x180_hits",
    "x27_segment_dedup", "x201_allpairs_prefix", "x306_effective_rank",
    "x321_boxcox", "x215_silhouette",
    # minhashNearDups / verifyWithStringJaccard / docBands / cleanDeduped
    "x2_dedup_minhash", "x22_clean_corpus", "x167_curation_pipeline",
    "x31_dup_clusters", "x34_dup_clusters_star", "x270_bcubed_eval",
    "x47_minhash_incremental", "x192_dedup_recall_eval",
    "x0_shared_stage_build", "x43_cluster_canonical", "x66_source_overlap",
    "x77_source_novelty_curve", "x88_leakage_safe_split",
    "x71_soft_dedup_weights", "x39_semdedup", "x187_lsh_planner",
    # itemContexts consumers (graph + stats families)
    "x85_item_pmi", "x101_item_pagerank", "x114_triangle_count",
    "x120_label_propagation", "x139_khop_reach", "x140_kcore",
    "x155_random_walks", "x162_assoc_rules", "x170_hashmin_cc",
    "x183_degree_mixing", "x199_conductance", "x223_modularity",
    "x263_harmonic_centrality", "x278_rich_club", "x290_ktruss",
    "x323_hyperball_anf", "x300_trending_items",
}


def main():
    a = json.load(open("bench_r16/baseline_runA.json"))["queries"]
    b = json.load(open("bench_r16/opt_runB.json"))["queries"]
    c = json.load(open("bench_r16/opt_runC.json"))["queries"]
    names = set(a) | set(b) | set(c)
    merged = {}
    for q in sorted(names):
        cands = []
        if q in BATCH3:
            cands = [c.get(q)]
        elif q in BATCH12:
            cands = [b.get(q), c.get(q)]
        else:
            cands = [a.get(q), b.get(q), c.get(q)]
        if q in ISOLATED_FINAL:
            cands.append(ISOLATED_FINAL[q])
        vals = [v for v in cands if v is not None]
        if vals:
            merged[q] = round(min(vals), 3)
    total = round(sum(merged.values()), 1)
    print(json.dumps({"n": len(merged), "total_s": total}))
    out = {"queries": merged, "total_s": total, "n_queries": len(merged)}
    with open("bench_r16/r16_opt_merged.json", "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    # before/after table for the report: run A vs merged
    pre = json.load(open("bench_r16/baseline_runA.json"))["queries"]
    rows = sorted(((pre.get(q), merged[q], q) for q in merged
                   if pre.get(q)), key=lambda r: -(r[0] - r[1]))
    print("top improvements (runA -> merged):")
    for p, m, q in rows[:30]:
        print(f"  {p:6.2f} -> {m:6.2f}  ({m - p:+5.2f})  {q}")
    print(f"runA total {round(sum(pre.values()),1)} -> merged {total}")


if __name__ == "__main__":
    sys.exit(main())
