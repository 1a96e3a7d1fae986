#!/usr/bin/env python3
"""Emit the OPTIMIZATION_r20.md per-query checklist table from the three
full-suite windows (base32 / after-batch-1 / final). Status column encodes
this round's action per query."""
import json
import sys

OPTIMIZED = {
    "q_ann_pq": "OPTIMIZED (PqDtab+AdcSum, -39% solo)",
    "q_ann_ivfpq": "OPTIMIZED (PqDtab+AdcSum+probeCids)",
    "q_ann_ivfpq_res": "OPTIMIZED (PqDtab+AdcSum+probeCids)",
    "q_ann_refined": "OPTIMIZED (AdcSum)",
    "q_ann_ivf": "OPTIMIZED (probeCids, -24% solo)",
    "q_pagerank": "OPTIMIZED (checkpoint cadence 1->5)",
    "q_bfs": "OPTIMIZED (per-hop union checkpoint dropped)",
}
EXAMINED = {
    "q_image_dedup": "examined; boundary-walk rewrite measured+REJECTED",
    "q_audio_dedup": "examined; boundary-walk rewrite measured+REJECTED",
    "q_video_dedup": "examined; boundary-walk rewrite measured+REJECTED",
    "q_multimodal_features": "examined; rides the rejected-walk family",
    "q_ann_lsh": "adjudicated NOISE (solo 0.569 < r19 floor; plan pinned)",
    "q_tpch_q2": "adjudicated NOISE (solo 0.533; plan pinned)",
    "q_dedup_minhash": "sf1 A/B evidence (r19 packing confirmed at scale)",
    "q_dedup_containment": "sf1 A/B evidence (1.41x at sf1)",
    "q_dedup_cluster": "sf1 A/B evidence (2.08x at sf1)",
    "q_dedup_keep_best": "sf1 A/B evidence (1.15x at sf1)",
    "q_curate_pipeline": "sf1 A/B evidence (2.15x at sf1)",
    "q_training_batches": "sf1 A/B evidence (curate-substage-bound)",
}
NOISE14 = ["q_tpch_q8", "q_tpch_q9", "q_tpch_q20", "q_kmeans", "q_l_diversity",
           "q_inverted_index", "q_outliers", "q_peak_concurrency",
           "q_repeated_spans", "q_skew_join_salted", "q_join_broadcast",
           "q_drift_psi", "q_entity_resolve", "q_lm_score"]

def main(base_p, after_p, final_p):
    base = json.load(open(base_p))["queries"]
    after = json.load(open(after_p))["queries"]
    final = json.load(open(final_p))["queries"]
    print("| query | base32 | mid | final | r20 status |")
    print("|---|---|---|---|---|")
    for q in sorted(base):
        st = OPTIMIZED.get(q) or EXAMINED.get(q)
        if not st and q in NOISE14:
            st = "re-pinned NOISE (item 8 table)"
        if not st:
            st = "untouched; r19 floor/shape audit stands"
        # tokens() kernel rides every text query: mark the big consumers
        print(f"| {q} | {base[q]:.2f} | {after.get(q, float('nan')):.2f} | "
              f"{final.get(q, float('nan')):.2f} | {st} |")

if __name__ == "__main__":
    main(*sys.argv[1:4])
