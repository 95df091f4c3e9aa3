#!/usr/bin/env python3
"""Per-stage task-time distributions from a Spark event log — the
r16 sf30 attempt observed the SA doubling loop serialized on a
4-of-32-thread task tail and could not tell straggler SHAPE from host
epoch noise (BENCH_excluded_families_sf30_r16.json). Walls normalize
by host probes; shapes don't — this extracts them.

For each stage (ordered by submission): task count, wall
(last finish − first launch), total task seconds, busy fraction
(task-sec / (32·wall)) — the "were the other 28 threads idle"
number — plus p50/p90/max task seconds and the top-4 task durations.

Usage: tools/tasktail.py EVENTLOG_FILE [min_wall_sec]
Prints one JSON object; feed into the round artifact.
"""
import json, os, sys


def lines_of(path):
    """A plain event log file, or a Spark 4 rolling log DIRECTORY
    (events_1_appid, events_2_appid, ... concatenated in order)."""
    if os.path.isdir(path):
        parts = sorted((f for f in os.listdir(path) if f.startswith("events_")),
                       key=lambda f: int(f.split("_")[1]))
        for p in parts:
            yield from open(os.path.join(path, p))
    else:
        yield from open(path)


def main():
    path = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    stages = {}   # stageId -> dict
    names = {}
    for line in lines_of(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue  # truncated tail of a killed run
        t = ev.get("Event")
        if t == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            names[si["Stage ID"]] = si["Stage Name"].split("\n")[0][:90]
        elif t == "SparkListenerTaskEnd":
            key = ev["Stage ID"]
            ti = ev["Task Info"]
            d = stages.setdefault(key, {"tasks": [], "launch": [], "finish": []})
            d["tasks"].append((ti["Finish Time"] - ti["Launch Time"]) / 1000.0)
            d["launch"].append(ti["Launch Time"])
            d["finish"].append(ti["Finish Time"])
    out = []
    for sid in sorted(stages):
        d = stages[sid]
        ts = sorted(d["tasks"])
        wall = (max(d["finish"]) - min(d["launch"])) / 1000.0
        if wall < min_wall:
            continue
        total = sum(ts)
        out.append({
            "stage": sid, "name": names.get(sid, "?"),
            "n_tasks": len(ts), "wall_sec": round(wall, 1),
            "task_sec_total": round(total, 1),
            "busy_frac_32t": round(total / (32 * wall), 3) if wall else None,
            "p50": round(ts[len(ts) // 2], 1),
            "p90": round(ts[int(len(ts) * 0.9)], 1) if ts else None,
            "top4": [round(x, 1) for x in ts[-4:]],
        })
    # the headline: how much of the log's span sits in low-parallelism
    # stages (busy_frac < 0.25 — effectively <=8 of 32 threads)
    span = sum(s["wall_sec"] for s in out)
    tail = sum(s["wall_sec"] for s in out if s["busy_frac_32t"] is not None
               and s["busy_frac_32t"] < 0.25)
    print(json.dumps({
        "event_log": path, "stages_over_min_wall": out,
        "sum_stage_wall_sec": round(span, 1),
        "low_parallelism_wall_sec": round(tail, 1),
        "low_parallelism_share": round(tail / span, 3) if span else None,
    }, indent=1))


if __name__ == "__main__":
    main()
