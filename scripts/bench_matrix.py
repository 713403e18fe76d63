"""Full-scale CLI matrix: every parameter set at its reference scale
(VERDICT r4 item 5; mirrors the reference CI proving all four sets e2e —
/root/reference/.github/workflows/CI.yml:95-185).

For each set (rs256@2048, rs256-sd@384, rs256-db@576, mdl1@1792) this runs
gen-fixtures -> zksetup -> prove -> show -> verify through the real CLI
entry points, recording wall-clock + peak RSS per phase into
BENCH_MATRIX.json.  Each set runs in a SUBPROCESS so JAX/native caches and
RSS are isolated per set.

Run:  python scripts/bench_matrix.py [--sets rs256-sd,rs256-db,mdl1]
      [--skip-existing]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, resource, sys, time
sys.path.insert(0, {root!r})
from crescent_tpu import cli

name = {name!r}
phases = {{}}
for phase in ("gen-fixtures", "zksetup", "prove", "show", "verify"):
    t0 = time.time()
    rc = cli.main([phase, "--name", name])
    dt = time.time() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    phases[phase] = {{"seconds": round(dt, 1), "peak_rss_gb": round(rss, 2),
                      "rc": rc}}
    print(f"[{{name}}] {{phase}}: {{dt:.1f}}s rc={{rc}} rss={{rss:.2f}}GB",
          flush=True)
    if rc != 0:
        break
print("PHASES_JSON:" + json.dumps(phases), flush=True)
"""


def run_set(name: str) -> dict:
    code = CHILD.format(root=ROOT, name=name)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=ROOT, timeout=7200,
    )
    out = proc.stdout
    sys.stdout.write(out)
    sys.stdout.write(proc.stderr[-2000:] if proc.returncode else "")
    phases = {}
    for line in out.splitlines():
        if line.startswith("PHASES_JSON:"):
            phases = json.loads(line[len("PHASES_JSON:"):])
    return {
        "phases": phases,
        "total_seconds": round(time.time() - t0, 1),
        "rc": proc.returncode,
    }


def main() -> int:
    os.chdir(ROOT)
    sets = ["rs256", "rs256-sd", "rs256-db", "mdl1"]
    if "--sets" in sys.argv:
        sets = sys.argv[sys.argv.index("--sets") + 1].split(",")
    out_path = "BENCH_MATRIX.json"
    results = {}
    if "--skip-existing" in sys.argv and os.path.exists(out_path):
        results = json.load(open(out_path)).get("sets", {})
    for name in sets:
        if name in results and results[name].get("rc") == 0:
            print(f"[{name}] cached result, skipping")
            continue
        print(f"=== {name} ===", flush=True)
        results[name] = run_set(name)
        with open(out_path, "w") as f:
            json.dump(
                {"generated_unix": int(time.time()), "sets": results}, f,
                indent=1,
            )
    bad = [n for n, r in results.items() if r.get("rc") != 0]
    print(f"matrix done; failures: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
