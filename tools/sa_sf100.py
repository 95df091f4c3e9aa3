#!/usr/bin/env python3
"""Round-18 optional point (VERDICT r17 item 5): the suffix-array
family at sf100 — one more decade on the repo's most complex operator.

Reuses the r17 excluded-families harness (`excluded_sf30.py:run_one`:
isolated fresh JVM per family, dual host-speed probes, event logs for
tasktail.py, disk guard at 10 GB free, wall cap) and its locked
methodology: the sf10 comparator is RE-MEASURED in this same session
so the sf10→sf100 ratio is drawn within one host epoch. The editdist
family stays excluded at sf100 on the r17 measured arithmetic
(~60 GB projected spill vs ~60 GB free — BENCH_excluded_families_
sf30_r17.json `next`).

Predicted from the measured sf10→sf30 sub-linear law (2.49× at 3×
data): sf100 ≈ 25–30 min. Wall cap 3600 s — a capped run still
records its event-log shape.

Usage: tools/sa_sf100.py OUT_JSON
"""
import json, os, shutil, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from excluded_sf30 import run_one, EVDIR  # noqa: E402

RUNS = [
    ("sa_sf10_gc_r18",  "/tmp/sf10",  "q_dup_passages,q_dup_spans_sa", 1500),
    ("sa_sf100_gc_r18", "/tmp/sf100", "q_dup_passages,q_dup_spans_sa", 3600),
]


def main():
    out_json = sys.argv[1]
    os.makedirs(EVDIR, exist_ok=True)
    session_free = shutil.disk_usage("/").free // 1024
    results = {}
    for tag, sf_dir, qs, cap in RUNS:
        results[tag] = run_one(tag, sf_dir, qs, cap)
        with open(out_json, "w") as f:
            json.dump({"metric": "sa_family_sf100_r18",
                       "session_start_free_gb": round(session_free/1024/1024, 1),
                       "editdist_sf100": ("excluded on measured arithmetic: "
                                          "~60 GB projected spill vs ~60 GB free "
                                          "(BENCH_excluded_families_sf30_r17.json)"),
                       "runs": results}, f, indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
