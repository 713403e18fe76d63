"""crescent-tpu: TPU-native zero-knowledge credential framework.

Capabilities of microsoft/crescent-credentials (JWT/mDL proofs of possession
with selective disclosure, range proofs, device binding, unlinkable
re-showing), rebuilt idiomatically for TPUs: JAX/XLA/Pallas limb-kernels for
all prover-side field/curve/NTT/MSM work, host-exact Python for pairings and
protocol glue.  See SURVEY.md for the reference layer map this tracks.
"""

import os as _os

import jax as _jax

# Persistent compilation cache: our integer limb graphs are expensive for XLA
# to compile (hundreds of fused loops), and shapes repeat across runs.
_cache_dir = _os.environ.get(
    "CRESCENT_TPU_JAX_CACHE", _os.path.expanduser("~/.cache/crescent_tpu_jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # cache is best-effort; never block math on it
    pass

__version__ = "0.1.0"
