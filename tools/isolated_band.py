#!/usr/bin/env python3
"""Isolated fresh-JVM band measurement for one (or a few) queries —
the pre-adjudication evidence the movers reviews keep re-deriving:
q_text_fingerprint and q_dedup_ngram have measured isolated bands that
settle their in-suite oscillations on sight; this tool records the
same for any query. min-of-N fresh JVMs, dual host-speed probes per
rep (bench-discipline rules: min-of-N is the comparator in noisy
epochs; in-suite and isolated walls are different universes — compare
this band only to other ISOLATED numbers).

Usage: tools/isolated_band.py SF_DIR QUERY[,QUERY2] N OUT.json
"""
import json, os, subprocess, sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(repo, "tools"))
from bench_sharded import host_speed_probe, host_speed_probe_mt  # noqa: E402


def main():
    sf_dir, queries, n, out = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
    reps = []
    for i in range(n):
        st, ck1 = host_speed_probe()
        mt, ck2 = host_speed_probe_mt()
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
                   SPARK_GRAFT_BENCH_ITERS="1")
        r = subprocess.run([os.path.join(repo, "tools/runjvm.sh"), "graft.Bench", queries],
                           env=env, capture_output=True, text=True)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        full = next((json.loads(l) for l in lines if '"metric":"queries_full"' in l), None)
        rep = {"rep": i, "host_speed": st if ck1 else None,
               "host_speed_mt": mt if ck2 else None,
               "queries": full["queries"] if full else None,
               "rc": r.returncode}
        if full is None:
            rep["stderr_tail"] = r.stderr[-500:]
        reps.append(rep)
        print(json.dumps(rep), flush=True)
    walls = {}
    for q in queries.split(","):
        vals = [r["queries"][q] for r in reps if r["queries"] and q in r["queries"]]
        walls[q] = {"reps_sec": [round(v, 2) for v in vals],
                    "min_sec": round(min(vals), 2) if vals else None,
                    "max_sec": round(max(vals), 2) if vals else None}
    artifact = {"metric": "isolated_band", "sf_dir": sf_dir, "n_reps": n,
                "context": ("fresh JVM per rep, SPARK_GRAFT_BENCH_ITERS=1, dual host-speed "
                            "probes per rep; compare only to other ISOLATED numbers"),
                "band": walls, "reps": reps}
    json.dump(artifact, open(out, "w"), indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
