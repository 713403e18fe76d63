"""Reference-scale rs256 benchmark: gen-fixtures -> zksetup -> prove ->
show -> verify at max_cred_len=2048 (the reference default,
/root/reference/creds/src/prep_inputs.rs:24), recording per-phase
wall-clock and peak RSS into BENCH_RS256_2048.json at the repo root.

Drives the real CLI entry points (python -m crescent_tpu.cli ...) in-process
so the numbers are the user-facing path, not a trimmed harness.

Run:  python scripts/bench_rs256_2048.py  [--fresh]
"""

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crescent_tpu import cli  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(root)
    if "--fresh" in sys.argv:
        import shutil

        shutil.rmtree("test-vectors/rs256", ignore_errors=True)
    results = {"name": "rs256", "max_cred_len": 2048, "phases": {}}
    final_rc = 0
    for phase in ("gen-fixtures", "zksetup", "prove", "show", "verify"):
        t0 = time.time()
        rc = cli.main([phase, "--name", "rs256"])
        dt = time.time() - t0
        results["phases"][phase] = {
            "seconds": round(dt, 1),
            "peak_rss_gb": round(rss_gb(), 2),
            "rc": rc,
        }
        print(f"[bench_rs256_2048] {phase}: {dt:.1f}s rc={rc} "
              f"peak_rss={rss_gb():.2f}GB", flush=True)
        if rc != 0:
            final_rc = rc
            break
    # confirm the config really is at reference scale
    try:
        cfg = json.load(open("test-vectors/rs256/config.json"))
        if "max_cred_len" in cfg:
            results["max_cred_len"] = cfg["max_cred_len"]
    except (OSError, ValueError):
        pass
    with open("BENCH_RS256_2048.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    return final_rc


if __name__ == "__main__":
    sys.exit(main())
