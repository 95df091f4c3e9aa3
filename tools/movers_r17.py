#!/usr/bin/env python3
"""Cross-round bench adjudication r17 vs r16 — the FIRST pair where
both sides carry host_speed (single-thread) AND host_speed_mt
(32-process) probes, so the two normalizations can finally be
compared (r15's core shard showed them diverging 2x; the mt probe
was added for exactly this moment).

For the common queries: total ratio raw, st-normalized, and
mt-normalized; per-query normalized movers beyond 1.5x in either
direction, using the normalizer matching the workload (32-thread
queries -> mt) but reporting both.

Usage: tools/movers_r17.py R17.json R16.json OUT.json
"""
import json, sys


def main():
    r17 = json.load(open(sys.argv[1]))
    r16 = json.load(open(sys.argv[2]))
    q17, q16 = r17["queries"], r16["queries"]
    common = sorted(set(q17) & set(q16))
    t17 = sum(q17[q] for q in common)
    t16 = sum(q16[q] for q in common)
    st = (r17["host_speed"], r16["host_speed"])
    mt = (r17["host_speed_mt"], r16["host_speed_mt"])
    raw = t17 / t16
    st_norm = raw / (st[0] / st[1]) if all(st) else None
    mt_norm = raw / (mt[0] / mt[1]) if all(mt) else None
    movers = {}
    for q in common:
        r = q17[q] / q16[q] if q16[q] > 0 else None
        if r is None:
            continue
        rn = r / (mt[0] / mt[1]) if all(mt) else r
        if rn > 1.5 or rn < 1 / 1.5:
            movers[q] = {"r16_sec": q16[q], "r17_sec": q17[q], "raw_ratio": round(r, 2),
                         "mt_normalized": round(rn, 2),
                         "st_normalized": round(r / (st[0] / st[1]), 2) if all(st) else None}
    out = {
        "common_queries": len(common),
        "total_r17_sec": round(t17, 1), "total_r16_sec": round(t16, 1),
        "raw_ratio": round(raw, 3),
        "host_speed_st": {"r17": st[0], "r16": st[1]},
        "host_speed_mt": {"r17": mt[0], "r16": mt[1]},
        "st_normalized_ratio": round(st_norm, 3) if st_norm else None,
        "mt_normalized_ratio": round(mt_norm, 3) if mt_norm else None,
        "movers_over_1p5x_mt_normalized": movers,
    }
    json.dump(out, open(sys.argv[3], "w"), indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "movers_over_1p5x_mt_normalized"}))
    print("movers:", list(movers))


if __name__ == "__main__":
    main()
