#!/usr/bin/env python3
"""Round-17 carried debt (VERDICT r15 item 7 / r16 item 2): the sf30
scale points for the two bench-excluded families — suffix-array
(q_dup_passages + q_dup_spans_sa) and edit-distance
(q_dedup_editdist + q_dedup_editdist_auto).

Methodology (locked by the r16 artifact's own notes):
- IN-SUITE vs ISOLATED walls are different universes: every point in
  this artifact is an isolated fresh-JVM run, and the sf10 comparator
  points are RE-MEASURED in this same session so the sf10→sf30 ratio
  is drawn within one host epoch.
- One family per JVM (the SA extents build ages a JVM enough to
  inflate co-resident queries; the sharded harness learned this in
  r12/r13).
- host_speed + host_speed_mt probes before each run (reused from
  bench_sharded.py) so a reader can normalize cross-artifact.
- Spark event logs ON for every run: the r16 sf30 attempt observed a
  4-of-32-thread task tail in the SA doubling loop and could not tell
  straggler-shape from epoch noise. Per-stage task-time distributions
  (parsed offline from the event log) answer the SHAPE question.
- Disk guard: editdist sf30 peak spill brackets 60-180 GB from the
  sf10 profile while the container has ~60 GB free — the run is
  killed (and the peak recorded) if free disk drops under 10 GB.
  A disk-guard kill IS the measured answer to the sf100-exclusion
  question, not a failed measurement.
- Wall caps per run: a capped run records the partial + its event log
  (the task distribution up to the cap is still the shape evidence).

Usage: tools/excluded_sf30.py OUT_JSON
"""
import json, os, shutil, subprocess, sys, time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_sharded import host_speed_probe, host_speed_probe_mt

EVDIR = "/tmp/eventlog_r17"
RUNS = [
    # (tag, sf_dir, queries_csv, wall_cap_sec)
    ("sa_sf10",       "/tmp/sf10", "q_dup_passages,q_dup_spans_sa",        1500),
    ("editdist_sf10", "/tmp/sf10", "q_dedup_editdist,q_dedup_editdist_auto", 1800),
    ("sa_sf30",       "/tmp/sf30", "q_dup_passages,q_dup_spans_sa",        4500),
    ("editdist_sf30", "/tmp/sf30", "q_dedup_editdist,q_dedup_editdist_auto", 4500),
]
MIN_FREE_KB = 10 * 1024 * 1024  # kill threshold: 10 GB free


def free_kb():
    return shutil.disk_usage("/").free // 1024


def run_one(tag, sf_dir, qs, cap):
    evdir = os.path.join(EVDIR, tag)
    os.makedirs(evdir, exist_ok=True)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_BENCH_ITERS="1",
               JVM_EXTRA=(os.environ.get("JVM_EXTRA", "") +
                          " -Dspark.eventLog.enabled=true "
                          f"-Dspark.eventLog.dir=file://{evdir} "
                          "-Dspark.eventLog.compress=false"))
    speed, _ = host_speed_probe()
    speed_mt, _ = host_speed_probe_mt()
    start_free = free_kb()
    print(f"[{tag}] start (host_speed {speed}s, mt {speed_mt}s, "
          f"free {start_free//1024//1024} GB)", flush=True)
    t0 = time.time()
    out_f = open(f"/tmp/{tag}_r17.log", "w")
    proc = subprocess.Popen([os.path.join(REPO, "tools/runjvm.sh"),
                             "graft.Bench", qs],
                            env=env, stdout=out_f, stderr=subprocess.STDOUT)
    min_free, killed = start_free, None
    while proc.poll() is None:
        time.sleep(10)
        f = free_kb()
        min_free = min(min_free, f)
        wall = time.time() - t0
        if f < MIN_FREE_KB:
            killed = f"disk_guard: free fell to {f} KB"
        elif wall > cap:
            killed = f"wall_cap: exceeded {cap} s"
        if killed:
            proc.kill()
            proc.wait()
            break
    wall = round(time.time() - t0, 1)
    out_f.close()
    lines = [l for l in open(f"/tmp/{tag}_r17.log") if l.startswith("{")]
    queries = next((json.loads(l)["queries"] for l in lines
                    if '"metric":"queries_full"' in l), None)
    errors = next((json.loads(l)["errors"] for l in lines
                   if '"metric":"errors"' in l), None)
    rec = {"sf_dir": sf_dir, "wall_sec": wall, "rc": proc.returncode,
           "killed": killed, "host_speed": speed, "host_speed_mt": speed_mt,
           "queries": queries, "errors": errors,
           # spill footprint: free disk at run start minus the minimum
           # observed during the run (10 s poll - a sub-10 s spike can
           # slip through; the editdist sf10 profile ramps over minutes)
           "peak_disk_used_above_start_gb": round((start_free - min_free)
                                                  / 1024 / 1024, 1),
           "min_free_gb": round(min_free / 1024 / 1024, 1),
           "event_log_dir": evdir}
    print(f"[{tag}] done: wall {wall}s killed={killed} "
          f"queries={queries} min_free={rec['min_free_gb']}GB "
          f"peak_spill={rec['peak_disk_used_above_start_gb']}GB", flush=True)
    return rec


def main():
    out_json = sys.argv[1]
    os.makedirs(EVDIR, exist_ok=True)
    session_free = free_kb()
    results = {}
    for tag, sf_dir, qs, cap in RUNS:
        results[tag] = run_one(tag, sf_dir, qs, cap)
        with open(out_json, "w") as f:
            json.dump({"metric": "excluded_families_sf30_r17",
                       "session_start_free_gb": round(session_free/1024/1024, 1),
                       "runs": results}, f, indent=1)
    print(f"wrote {out_json}", flush=True)


if __name__ == "__main__":
    main()
