#!/usr/bin/env python3
"""Assemble BENCH_pq_recall_r17.json from the RecallAb logs.

Two runs per SF this round: run A (first residual implementation,
bias as a broadcast tuple-keyed map) and run B (bias as a column on
the driver-built probe-pairs frame — the committed code). Recall is
deterministic and bit-identical across A/B (asserted here); walls are
reported from B with the A walls kept as the same-session A-B
evidence for the bias-column fix.

Usage: tools/pq_recall_artifact.py OUT.json sf10A sf10B sf100A sf100B
"""
import json, sys


def parse(path):
    rows = [json.loads(l) for l in open(path) if l.startswith("{")]
    return {
        "header": rows[0], "train": rows[1],
        "nprobe_curve": [r for r in rows if "nprobe" in r and "k_cand" not in r],
        "kcand_sweep": [r for r in rows if "k_cand" in r and "pq_res_refined_recall" in r],
        "raw_refined_anchor": next(r for r in rows if "pq_raw_refined_recall" in r),
    }


def recall_fields(rs):
    return [{k: v for k, v in r.items() if not k.endswith("_sec")} for r in rs]


def main():
    out, sf10a, sf10b, sf100a, sf100b = sys.argv[1:6]
    a10, b10, a100, b100 = parse(sf10a), parse(sf10b), parse(sf100a), parse(sf100b)
    for a, b, tag in [(a10, b10, "sf10"), (a100, b100, "sf100")]:
        assert recall_fields(a["nprobe_curve"]) == recall_fields(b["nprobe_curve"]), \
            f"{tag}: A/B recall diverged - bias refactor changed results"
        assert recall_fields(a["kcand_sweep"]) == recall_fields(b["kcand_sweep"])
    artifact = {
        "metric": "pq_recall_r17",
        "what": ("r16 verdict items 1+6: residual (IVFADC) encoding landed "
                 "(Pq.trainCodebooksResidual/topKResidual/topKRefinedResidual, decomposed "
                 "A/D/bias ADC tables) and measured at the SAME production parameters as "
                 "BENCH_pq_recall_r16.json (kc=1024, m=8, ksub=256, k=10, 100 probes, "
                 "maxTrainRows=100k) against the same exact bounded-probe ground truth, with "
                 "raw-code rows re-measured same-session. kCand sweep extended to 300k/1000k "
                 "(item 6). Recall determinism: run A and run B (bias-column refactor between "
                 "them) produced bit-identical recall at both SFs - asserted by this script."),
        "sf10": {"config": b10["header"], "train_sec": b10["train"],
                 "nprobe_curve": b10["nprobe_curve"], "kcand_sweep_res_refined": b10["kcand_sweep"],
                 "raw_refined_anchor": b10["raw_refined_anchor"]},
        "sf100": {"config": b100["header"], "train_sec": b100["train"],
                  "nprobe_curve": b100["nprobe_curve"], "kcand_sweep_res_refined": b100["kcand_sweep"],
                  "raw_refined_anchor": b100["raw_refined_anchor"]},
        "findings": {
            "raw_adc_lift": ("residual lifts raw-ADC recall@10 at nprobe=256 from 0.199 to 0.225 "
                "(sf10) and 0.147 to 0.198 (sf100) - real (+13%/+35% relative) but FAR below "
                "published IVFADC gains; the r16 hypothesis 'materially above the saturation' "
                "is REFUTED at these magnitudes, and the cause is measured, not guessed - see "
                "variance_capture"),
            "refined_lift": ("residual candidates beat raw at equal kCand: 0.850 vs 0.813 (sf10) "
                "and 0.816 vs 0.758 (sf100) at kCand=100k=1000, same session. The extended sweep "
                "locates the knee: recall MEETS the IVF ceiling at kCand=3000 (sf10: 0.868 vs "
                "0.871) and kCand=10000 (sf100: 0.918 vs 0.924). Raw-code refinement never met "
                "the ceiling in r16. The r16 hypothesis 'reach 0.8 at kCand well below 100k' is "
                "also refuted: 0.8 still needs ~100k candidates on this data"),
            "variance_capture": {
                "probe": ("numpy diagnostic on /tmp/sf10 embeddings (60k rows, unit-normalized): "
                          "k=1024 Lloyd x3 on a 50k sample, then mean ||x - C(cell)||^2 on 20k "
                          "held-out rows"),
                "mean_residual_sq_norm": 0.8023, "variance_captured_by_kc1024": 0.1977,
                "per_dim_variance": "~= 1/64 uniformly (near-isotropic)",
                "reading": ("the coarse quantizer removes only 19.8% of the energy on these "
                    "near-isotropic synthetic embeddings, so residual codes face 80% of the "
                    "raw problem at identical m/ksub bytes - the bounded lift is an information "
                    "fact about the DATA, not an implementation defect (the spec pins the "
                    "decomposed-LUT ADC against a driver brute-force recompute per emitted row). "
                    "On manifold-structured real embeddings coarse cells capture far more "
                    "variance and the residual advantage widens toward the published numbers.")},
            "bias_column_ab": {
                "question": ("run A shipped the per-(probe,cell) bias as a broadcast "
                    "Map[(Long,Int),Double]; per-candidate-row tuple+boxing allocations were "
                    "suspected when pq_res walls grew with nprobe while pq_raw stayed flat"),
                "a_pq_res_sec_sf100_by_nprobe": None, "b_pq_res_sec_sf100_by_nprobe": None,
                "verdict": None},
        },
    }
    aw = [r["pq_res_sec"] for r in a100["nprobe_curve"]]
    bw = [r["pq_res_sec"] for r in b100["nprobe_curve"]]
    ab = artifact["findings"]["bias_column_ab"]
    ab["a_pq_res_sec_sf100_by_nprobe"] = aw
    ab["b_pq_res_sec_sf100_by_nprobe"] = bw
    ratios = [round(b / a, 2) for a, b in zip(aw, bw)]
    ab["b_over_a_by_nprobe"] = ratios
    wins = sum(1 for r in ratios if r < 0.9)
    losses = sum(1 for r in ratios if r > 1.1)
    if wins >= 3 and losses == 0:
        ab["verdict"] = f"B/A = {ratios}: adopted on a same-session win"
    elif losses >= 3 and wins == 0:
        ab["verdict"] = f"B/A = {ratios}: the column form REGRESSED - investigate"
    else:
        ab["verdict"] = (f"B/A = {ratios} across nprobe 32/64/128/256: MIXED - single-rep "
            "points in a session whose probes swung 2-3x cannot separate this; the column "
            "form is kept on the structural argument (strictly fewer per-row allocations, "
            "one less broadcast) with NO perf claim recorded")
    json.dump(artifact, open(out, "w"), indent=1)
    print("wrote", out)
    print(ab["verdict"])


if __name__ == "__main__":
    main()
