#!/usr/bin/env python3
"""Round-18 follow-on to the sf100 SA residency story: does
`spark.rdd.compress=true` shrink the LIVE checkpoint working set
enough to fit sf100 under this container's disk guard?

Motivation (BENCH_sa_sf100_gc_r18.json): with dead classes bounded,
the kill is ~38 GB of live rdd blocks — position-table UnsafeRows of
five numeric columns, exactly the payload LZ4 eats. rdd.compress
applies to serialized-on-disk block bytes only (in-memory
deserialized blocks are untouched), so the expected trade is disk
footprint vs a CPU sliver on spill/read.

Claims discipline: footprint and completion are epoch-independent
(this session ran the comparator uncompressed three times: sf10 peak
5.7-6.2 GB, sf100 killed at 50-52 GB); WALLS here are recorded, not
claimed - the passages isolated band measured 124-292 s within one
session (BENCH_movers_r18.json), and this run may share the host
with an untimed oracle compare.

Usage: tools/sa_compress_ab.py OUT_JSON
"""
import json, os, shutil, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
import excluded_sf30  # noqa: E402

RUNS = [
    ("sa_sf10_rddcomp_r18",  "/tmp/sf10",  "q_dup_passages,q_dup_spans_sa", 1500),
    ("sa_sf100_rddcomp_r18", "/tmp/sf100", "q_dup_passages,q_dup_spans_sa", 3600),
]


def main():
    out_json = sys.argv[1]
    os.environ["JVM_EXTRA"] = os.environ.get("JVM_EXTRA", "") + \
        " -Dspark.rdd.compress=true"
    os.makedirs(excluded_sf30.EVDIR, exist_ok=True)
    session_free = shutil.disk_usage("/").free // 1024
    results = {}
    for tag, sf_dir, qs, cap in RUNS:
        results[tag] = excluded_sf30.run_one(tag, sf_dir, qs, cap)
        with open(out_json, "w") as f:
            json.dump({"metric": "sa_rdd_compress_ab_r18",
                       "conf": "spark.rdd.compress=true (JVM_EXTRA)",
                       "uncompressed_comparators_same_session": {
                           "sf10_peak_gb": [6.2, 5.7, 5.7],
                           "sf100": "killed at 51.7/50.0/51.9 GB peak "
                                    "(BENCH_sa_sf100*_r18.json)"},
                       "session_start_free_gb": round(session_free/1024/1024, 1),
                       "runs": results}, f, indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
