"""Reference-scale rs256 benchmark: gen-fixtures -> zksetup -> prove ->
show -> verify at max_cred_len=2048 (the reference default,
/root/reference/creds/src/prep_inputs.rs:24), recording per-phase
wall-clock and peak RSS into BENCH_RS256_2048.json at the repo root.

Drives the real CLI entry points (python -m crescent_tpu.cli ...) in-process
so the numbers are the user-facing path, not a trimmed harness.

Run:  python scripts/bench_rs256_2048.py  [--fresh] [--reps N] [--skip-setup]

--skip-setup reuses existing test-vectors/rs256 fixtures + zksetup cache
(the setup phases keep their previously recorded timings if
BENCH_RS256_2048.json exists) and re-times only prove/show/verify.

--reps N (default 1) repeats the prove/show/verify phases N times and
records the median (plus every sample), per the medians-of-N methodology
the round-3 review asked for; setup phases always run once.
"""

import json
import os
import resource
import statistics
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
    reps = 1
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    results = {"name": "rs256", "max_cred_len": 2048, "reps": reps,
               "phases": {}}
    phases = ("gen-fixtures", "zksetup", "prove", "show", "verify")
    if "--skip-setup" in sys.argv and os.path.exists(
        "test-vectors/rs256/cache/prover_params.bin"
    ):
        phases = ("prove", "show", "verify")
        try:
            prev = json.load(open("BENCH_RS256_2048.json"))
            for ph in ("gen-fixtures", "zksetup"):
                if ph in prev.get("phases", {}):
                    results["phases"][ph] = prev["phases"][ph]
        except (OSError, ValueError):
            pass
    final_rc = 0
    for phase in phases:
        n = reps if phase in ("prove", "show", "verify") else 1
        samples = []
        rc = 0
        for i in range(n):
            t0 = time.time()
            rc = cli.main([phase, "--name", "rs256"])
            dt = time.time() - t0
            samples.append(round(dt, 1))
            print(f"[bench_rs256_2048] {phase}[{i + 1}/{n}]: {dt:.1f}s "
                  f"rc={rc} peak_rss={rss_gb():.2f}GB", flush=True)
            if rc != 0:
                break
        results["phases"][phase] = {
            "seconds": round(statistics.median(samples), 1),
            "samples": samples,
            "peak_rss_gb": round(rss_gb(), 2),
            "rc": rc,
        }
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
