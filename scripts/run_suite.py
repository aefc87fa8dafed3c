"""Per-file test runner with timings -> TESTRUN_r05.txt (the committed
green-run evidence VERDICT r4 asked for). Runs each test file in its own
process (isolates the XLA-CPU segfault blast radius) under a timeout."""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FILES = sorted(f for f in os.listdir(os.path.join(REPO, "tests"))
               if f.startswith("test_") and f.endswith(".py"))
TIMEOUT = int(os.environ.get("CTT_SUITE_TIMEOUT", "2400"))
out_path = os.path.join(REPO, os.environ.get("CTT_SUITE_OUT",
                                             "TESTRUN_r05.txt"))
results = []
t_all = time.time()
for f in FILES:
    t0 = time.time()
    try:
        p = subprocess.run(
            [sys.executable, "-m", "pytest", f"tests/{f}", "-q",
             "-o", "addopts=", "-p", "no:cacheprovider"],
            cwd=REPO, capture_output=True, text=True, timeout=TIMEOUT + 60)
    except subprocess.TimeoutExpired:
        results.append(f"TIMEOUT    {TIMEOUT:7d}s  {f}")
        print(results[-1], flush=True)
        continue
    dt = time.time() - t0
    tail = [ln for ln in p.stdout.strip().splitlines() if ln][-1] \
        if p.stdout.strip() else "(no output)"
    status = "PASS" if p.returncode == 0 else f"FAIL(rc={p.returncode})"
    line = f"{status:10s} {dt:7.1f}s  {f:32s} {tail}"
    print(line, flush=True)
    results.append(line)
    if p.returncode != 0:
        err = (p.stdout + p.stderr)[-3000:]
        results.append("  ---- tail ----")
        results.extend("  " + ln for ln in err.splitlines()[-40:])

with open(out_path, "w") as fh:
    fh.write(f"# Test run: {time.strftime('%Y-%m-%d %H:%M:%S')}  "
             f"(per-file isolation, wall {time.time()-t_all:.0f}s)\n")
    fh.write(f"# host: 2-CPU box, JAX_PLATFORMS=cpu, 8 virtual devices\n")
    fh.write("\n".join(results) + "\n")
print("wrote", out_path)
