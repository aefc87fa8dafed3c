"""Run the full device bench matrix sequentially and record BENCH JSON.

Each metric is a fresh subprocess of bench.py (isolated compile caches and
device state); results are appended to the output JSON file as a list of
the one-line JSON records bench.py prints.

Usage: python scripts/bench_matrix.py [out.json] [metric ...]
"""
import json
import os
import subprocess
import sys
import time

METRICS = [
    ("msm", {"CTT_BENCH_METRIC": "msm", "CTT_BENCH_N": "65536"}),
    ("ntt", {"CTT_BENCH_METRIC": "ntt", "CTT_BENCH_N": "65536"}),
    ("pairing", {"CTT_BENCH_METRIC": "pairing"}),
    ("eip4844_commit", {"CTT_BENCH_METRIC": "eip4844_commit"}),
    ("eip4844_commit_batch", {"CTT_BENCH_METRIC": "eip4844_commit_batch"}),
    ("eip4844_verify", {"CTT_BENCH_METRIC": "eip4844_verify"}),
    ("eip4844_verify_blob_batch",
     {"CTT_BENCH_METRIC": "eip4844_verify_blob_batch"}),
    ("msm_2^20", {"CTT_BENCH_METRIC": "msm", "CTT_BENCH_N": "1048576",
                  "CTT_BENCH_REPS": "2"}),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r04_full.json"
    only = set(sys.argv[2:])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    done = {r["metric_key"] for r in results if "metric_key" in r}
    for key, env in METRICS:
        if only and key not in only:
            continue
        if key in done:
            print(f"skip {key} (already recorded)", flush=True)
            continue
        e = dict(os.environ)
        e.update(env)
        t0 = time.time()
        print(f"=== {key} ===", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.join(root, "bench.py")],
            env=e, capture_output=True, text=True, timeout=1800)
        tail = "\n".join(p.stderr.strip().splitlines()[-6:])
        print(tail, flush=True)
        rec = {"metric_key": key, "wall_s": round(time.time() - t0, 1),
               "rc": p.returncode}
        if p.returncode == 0 and p.stdout.strip():
            rec.update(json.loads(p.stdout.strip().splitlines()[-1]))
        else:
            rec["error"] = tail[-500:]
        results.append(rec)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
