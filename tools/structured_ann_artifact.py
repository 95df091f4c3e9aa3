#!/usr/bin/env python3
"""Assemble BENCH_ann_structured_r18.json — the r17 verdict's top
item: the same RecallAb / LshRecallAb harnesses, same production
parameters (kc=1024, m=8, ksub=256, k=10, 100 probes,
maxTrainRows=100k), re-run on PLANTED-CLUSTER structured embeddings
(graft.StructuredEmbeddings: 600 clusters on the unit sphere,
per-cluster scale, sigma=0.09), next to the r17 isotropic numbers so
each chooser branch's data-dependence is measured, not predicted.

Usage: tools/structured_ann_artifact.py OUT.json sfs10.log sfs100.log \
         lsh_sfs10.log varcap_structured.json varcap_isotropic.json
"""
import json, sys


def parse_recall(path):
    rows = [json.loads(l) for l in open(path) if l.startswith("{")]
    return {
        "config": rows[0], "train_sec": rows[1],
        "nprobe_curve": [r for r in rows if "nprobe" in r and "k_cand" not in r],
        "kcand_sweep_res_refined": [r for r in rows if "k_cand" in r
                                    and "pq_res_refined_recall" in r],
        "raw_refined_anchor": next(r for r in rows if "pq_raw_refined_recall" in r),
    }


def parse_lsh(path):
    rows = [json.loads(l) for l in open(path) if l.startswith("{")]
    return {"config": rows[0], "sweep": rows[1:]}


def main():
    out = sys.argv[1]
    s10 = parse_recall(sys.argv[2])
    s100 = parse_recall(sys.argv[3])
    lsh = parse_lsh(sys.argv[4])
    vc_s = json.loads(open(sys.argv[5]).read().strip().splitlines()[-1])
    vc_i = json.loads(open(sys.argv[6]).read().strip().splitlines()[-1])

    # r17 isotropic baselines, same harness + parameters
    r17 = json.load(open("BENCH_pq_recall_r17.json"))
    lsh17 = json.load(open("BENCH_lsh_recall_r17.json"))

    def curve(d, key):
        return {str(r["nprobe"]): r[key] for r in d["nprobe_curve"]}

    iso10, iso100 = r17["sf10"], r17["sf100"]
    cmp = {
        "variance_captured_kc1024": {"structured": vc_s["variance_captured"],
                                     "isotropic": vc_i["variance_captured"]},
        "ivf_recall_by_nprobe": {
            "structured_200k": curve(s10, "ivf_recall"),
            "isotropic_200k": curve(iso10, "ivf_recall"),
            "structured_2M": curve(s100, "ivf_recall"),
            "isotropic_2M": curve(iso100, "ivf_recall")},
        "pq_raw_adc_recall_by_nprobe": {
            "structured_200k": curve(s10, "pq_raw_recall"),
            "isotropic_200k": curve(iso10, "pq_raw_recall"),
            "structured_2M": curve(s100, "pq_raw_recall"),
            "isotropic_2M": curve(iso100, "pq_raw_recall")},
        "pq_res_adc_recall_by_nprobe": {
            "structured_200k": curve(s10, "pq_res_recall"),
            "isotropic_200k": curve(iso10, "pq_res_recall"),
            "structured_2M": curve(s100, "pq_res_recall"),
            "isotropic_2M": curve(iso100, "pq_res_recall")},
        "res_refined_kcand_sweep": {
            "structured_200k": {str(r["k_cand"]): r["pq_res_refined_recall"]
                                for r in s10["kcand_sweep_res_refined"]},
            "isotropic_200k": {str(r["k_cand"]): r["pq_res_refined_recall"]
                               for r in iso10["kcand_sweep_res_refined"]},
            "structured_2M": {str(r["k_cand"]): r["pq_res_refined_recall"]
                              for r in s100["kcand_sweep_res_refined"]},
            "isotropic_2M": {str(r["k_cand"]): r["pq_res_refined_recall"]
                             for r in iso100["kcand_sweep_res_refined"]}},
        "lsh_sweep": {
            "structured_200k": [{k: r[k] for k in
                                 ("bits", "bands", "bits_per_band", "lsh_recall", "lsh_sec")}
                                for r in lsh["sweep"]],
            "isotropic_200k": lsh17["sweep"],
            "exact_sec": {"structured": lsh["config"]["exact_sec"],
                          "isotropic": lsh17["config"]["exact_sec"]}},
    }
    artifact = {
        "metric": "ann_structured_r18",
        "what": ("r17 verdict top item: ground the ANN chooser (SURVEY row 55d) on "
                 "structured embeddings. graft.StructuredEmbeddings plants 600 clusters "
                 "on the unit sphere (hashed Box-Muller, per-cluster scale in [0.6,1.4], "
                 "sigma=0.09, dim=64); RecallAb + LshRecallAb re-run at the SAME "
                 "production parameters as the r17 isotropic session (kc=1024, m=8, "
                 "ksub=256, k=10, 100 probes, maxTrainRows=100k, 200k/2M vectors). "
                 "Isotropic comparators are r17-session numbers (context-matched: "
                 "recall is deterministic; walls compared only in-session)."),
        "generator": {"n_clusters": 600, "sigma": 0.09, "dim": 64,
                      "per_cluster_scale": "[0.6, 1.4]",
                      "variance_capture_probe": vc_s},
        "structured_200k": s10,
        "structured_2M": s100,
        "structured_lsh_200k": lsh,
        "comparison": cmp,
        "findings": {},  # filled by the builder after reading the numbers
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print("wrote", out)
    print(json.dumps(cmp["variance_captured_kc1024"]))
    for sec in ("ivf_recall_by_nprobe", "pq_raw_adc_recall_by_nprobe",
                "pq_res_adc_recall_by_nprobe", "res_refined_kcand_sweep"):
        print(sec, json.dumps(cmp[sec]))


if __name__ == "__main__":
    main()
