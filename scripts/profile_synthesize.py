"""Profile the rs256@2048 witness synthesis (host Python) — round-5 perf
item 2b.  Runs frontend.synthesize under cProfile plus wall-clock phases
for is_satisfied and the COO build.  CPU-only; safe to run while the TPU
is busy.

Usage: python scripts/profile_synthesize.py [--profile]
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from crescent_tpu.credentials.circuits import JWTFrontend  # noqa: E402
from crescent_tpu.credentials.prep_inputs import (  # noqa: E402
    parse_config,
    prepare_prover_inputs,
)


def main():
    base = "test-vectors/rs256"
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    config = parse_config(open(f"{base}/config.json").read())
    token = open(f"{base}/token.jwt").read().strip()
    issuer_pem = open(f"{base}/issuer.pub").read()
    prover_inputs, prover_aux, _ = prepare_prover_inputs(config, token, issuer_pem)
    synth_inputs = dict(prover_inputs)
    for k, v in prover_aux.items():
        synth_inputs.setdefault(k, v)

    fe = JWTFrontend()
    t0 = time.time()
    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        r1cs, assignment, _io = fe.synthesize(config, synth_inputs)
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(40)
        print(s.getvalue())
    else:
        r1cs, assignment, _io = fe.synthesize(config, synth_inputs)
    t_synth = time.time() - t0
    print(f"synthesize: {t_synth:.2f}s  vars={r1cs.num_vars} cons={len(r1cs.constraints)}")

    t0 = time.time()
    ok = r1cs.is_satisfied(assignment)
    print(f"is_satisfied: {time.time()-t0:.2f}s -> {ok}")

    from crescent_tpu.models.groth16 import _r1cs_coo

    # _coo_cache was built by is_satisfied's native path; time a rebuild
    if hasattr(r1cs, "_coo_cache"):
        del r1cs._coo_cache
    t0 = time.time()
    coo = _r1cs_coo(r1cs)
    nnz = sum(len(r[0]) for r in coo)
    print(f"coo build: {time.time()-t0:.2f}s  nnz={nnz}")

    from crescent_tpu.models.groth16 import _domain_for, _matvec_evals_u64
    from crescent_tpu.native import backend as nb

    dom = _domain_for(r1cs)
    t0 = time.time()
    zu = nb.ints_to_u64([x % r1cs.field for x in assignment])
    print(f"ints_to_u64(z): {time.time()-t0:.2f}s  n={len(assignment)}")
    t0 = time.time()
    a, b, c = _matvec_evals_u64(r1cs, zu, dom)
    print(f"matvec_u64 x3: {time.time()-t0:.2f}s  dom={dom.n}")


if __name__ == "__main__":
    main()
