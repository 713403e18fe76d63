"""Groth16 zkSNARK on TPU: setup, prove, verify, rerandomize.

TPU-native equivalent of the reference fork forks/groth16/ (ark-groth16 0.4 +
Crescent's additions):
  * `setup`   — per-circuit SRS from toxic randomness (generator.rs):
                QAP evaluations at tau on host (barycentric Lagrange), all
                group elements via batched fixed-base muls on TPU.
  * `prove`   — QAP witness map (r1cs_to_qap.rs) as coset NTTs + the 4 big
                MSMs (prover.rs) on TPU.  This is the headline BASELINE.json
                metric ("Groth16 prove wall-clock (rs256)").
  * `verify`  — 3 pairings on host (verifier.rs; ms-scale, interop-critical).
  * `prepare_inputs` / `verify_with_prepared_inputs` — the split verifier API
    (verifier.rs:25,44) Crescent's show protocol needs so it can substitute a
    *commitment* to the public-input MSM.
  * `rerandomize_proof` — BKSV20 fig.1 unlinkable rerandomization
    (prover.rs:227-255): A' = r1*A, B' = (1/r1)*B + r2*delta_g2,
    C' = C + r1*r2*A.

Scalars at the API boundary are Python ints (exact); points are host affine
tuples.  Device mirrors of the SRS tables are cached on first use.
"""

from __future__ import annotations

import os
import random
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.curves import BN254G2, BN254_G1, AffinePoint, G2Point
from ..core.fields import BN254_FR as R
from ..core.fields import Fr
from ..core import pairing as pr
from ..ops import limb, ntt
from ..ops.ec import JPoints, get_curve_ctx, get_g2_ctx
from ..ops.limb import NLIMB, U32
from ..ops.msm import MSM, get_g2_msm, get_msm
from ..native import backend as nb
from ..utils.trace import timed

G1 = BN254_G1
G2 = BN254G2


def _native_ok() -> bool:
    """Host C++ backend enabled?  It is the fast path for SRS generation and
    the sparse-matrix host half of prove (the reference runs these on CPU via
    rayon/asm — forks/groth16/src/generator.rs, halo2curves asm)."""
    return os.environ.get("CRESCENT_NATIVE", "1") == "1" and nb.available()


def _sharded_prove():
    """(ShardedMSM g1, ShardedMSM g2) when multi-chip prove is enabled:
    CRESCENT_SHARDED=1 with >= 2 visible devices.  The 4 G1 MSMs and the G2
    MSM shard over the point axis with all-gather bucket combination
    (parallel/sharded_msm.py); NTTs stay replicated (they are < 10% of
    prove — shard via parallel/sharded_ntt.py when they dominate)."""
    import os

    if os.environ.get("CRESCENT_SHARDED", "0") != "1":
        return None
    if len(jax.devices()) < 2:
        return None
    global _SHARDED_CACHE
    if _SHARDED_CACHE is None:
        from ..ops.ec import get_g2_ctx
        from ..parallel.sharded_msm import ShardedMSM, make_mesh

        mesh = make_mesh()
        # window width: 8 is the TPU sweet spot; the CPU-backend dryrun sets
        # 4 (bucket-plane work per fold shrinks 7x, and XLA:CPU executes the
        # limb graphs near-serially, so plane size is the wall-clock)
        c = int(os.environ.get("CRESCENT_SHARDED_C", "8"))
        _SHARDED_CACHE = (
            ShardedMSM(get_curve_ctx(G1), mesh, c=c, lanes=16),
            ShardedMSM(get_g2_ctx(), mesh, c=c, lanes=16),
        )
    return _SHARDED_CACHE


_SHARDED_CACHE = None
_SHARDED_H_CACHE: dict = {}


def _sharded_h_pipeline(dom):
    """ShardedHPipeline for this domain on the active sharded-prove mesh."""
    key = (dom.ctx.modulus, dom.n)
    if key not in _SHARDED_H_CACHE:
        from ..parallel.sharded_ntt import ShardedHPipeline

        mesh = _SHARDED_CACHE[0].mesh
        _SHARDED_H_CACHE[key] = ShardedHPipeline(
            dom.ctx.modulus, dom.n, mesh, Fr.multiplicative_generator
        )
    return _SHARDED_H_CACHE[key]


def _native_msm_prove() -> bool:
    """Use the native host MSM inside `prove` when JAX is running on CPU
    (tests / no accelerator).  On TPU the device MSM kernels are the path."""
    env = os.environ.get("CRESCENT_PROVE_MSM", "auto")
    if env == "native":
        return _native_ok()
    if env == "device":
        return False
    return _native_ok() and jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# R1CS container
# ---------------------------------------------------------------------------

@dataclass
class R1CS:
    """Rank-1 constraint system over a prime field (default BN254 Fr).

    Variables are indexed [1, instance..., witness...]; index 0 is the
    constant one.  `num_instance` counts the constant, matching arkworks'
    `num_instance_variables` convention (circom r1cs header layout).
    Each constraint is (A_row, B_row, C_row): lists of (var_idx, coeff).
    """

    num_instance: int
    num_witness: int
    constraints: list
    field: int = R

    @property
    def num_vars(self) -> int:
        return self.num_instance + self.num_witness

    def is_satisfied(self, z) -> bool:
        """z: list of ints, or an (nv, 4) u64 standard-form array (the
        witness-program replay's native output)."""
        F = self.field
        nc = len(self.constraints)
        if isinstance(z, np.ndarray) and not _native_ok():
            z = [int.from_bytes(row.tobytes(), "little") for row in
                 np.ascontiguousarray(z, dtype="<u8")]
        if _native_ok() and (nc > 512 or isinstance(z, np.ndarray)):
            # native path: 3 COO matvecs + one elementwise a*b-c check.
            # The pure-Python loop below was ~10 s of the rs256@2048 prove.
            zu = z if isinstance(z, np.ndarray) else nb.ints_to_u64(
                [x % F for x in z]
            )
            evs = [
                nb.coo_matvec(F, rows, cols, coeffs, zu, nc)
                for rows, cols, coeffs in _r1cs_coo(self)
            ]
            ab = nb.vec_op(F, "mul", evs[0], evs[1])
            return not nb.vec_op(F, "sub", ab, evs[2]).any()
        for a_row, b_row, c_row in self.constraints:
            a = sum(c * z[i] for i, c in a_row) % F
            b = sum(c * z[i] for i, c in b_row) % F
            c = sum(co * z[i] for i, co in c_row) % F
            if a * b % F != c:
                return False
        return True


def dummy_circuit(log_size: int, rng: random.Random, num_public: int = 1):
    """a*b multiplication-chain circuit akin to the reference's DummyCircuit
    (creds/benches/proof_benchmark.rs:24, rangeproof.rs:446): configurable
    size, first `num_public` product outputs are public inputs.

    Returns (r1cs, full_assignment z)."""
    n_cons = (1 << log_size) - 2
    a = rng.randrange(R)
    b = rng.randrange(R)
    # witness: w0 = a, w1 = b, then w_{k} = w_{k-1} * b for each constraint
    z = [1]
    pubs = []
    wits = [a, b]
    cur = a
    products = []
    for _ in range(n_cons):
        cur = cur * b % R
        products.append(cur)
    pubs = products[:num_public]
    wits += products[num_public:]
    # variable indexing: [1, pubs..., a, b, rest...]
    idx_of_product = {}
    k = 1 + num_public
    var_a, var_b = k, k + 1
    k += 2
    for j, p in enumerate(products):
        if j < num_public:
            idx_of_product[j] = 1 + j
        else:
            idx_of_product[j] = k
            k += 1
    cons = []
    prev = var_a
    for j in range(n_cons):
        out = idx_of_product[j]
        cons.append(([(prev, 1)], [(var_b, 1)], [(out, 1)]))
        prev = out
    r1cs = R1CS(1 + num_public, 2 + (n_cons - num_public), cons)
    z = [1] + pubs + [a, b] + products[num_public:]
    assert r1cs.is_satisfied(z)
    return r1cs, z


# ---------------------------------------------------------------------------
# Keys and proofs
# ---------------------------------------------------------------------------

@dataclass
class VerifyingKey:
    """Matches the fork's VerifyingKey (forks/groth16/src/data_structures.rs:31-44),
    which adds delta_g1 vs upstream ark — the show protocol commits hidden
    inputs against it."""

    alpha_g1: AffinePoint
    beta_g2: G2Point
    gamma_g2: G2Point
    delta_g1: AffinePoint
    delta_g2: G2Point
    gamma_abc_g1: list  # length num_instance

    def prepare(self) -> "PreparedVerifyingKey":
        return PreparedVerifyingKey(
            vk=self,
            alpha_beta=pr.pairing(self.alpha_g1, self.beta_g2),
        )


@dataclass
class PreparedVerifyingKey:
    vk: VerifyingKey
    alpha_beta: object  # Fq12


@dataclass
class ProvingKey:
    vk: VerifyingKey
    beta_g1: AffinePoint
    delta_g1: AffinePoint
    a_query: list        # A_i(tau)*G1, len num_vars
    b_g1_query: list     # B_i(tau)*G1, len num_vars
    b_g2_query: list     # B_i(tau)*G2, len num_vars
    h_query: list        # tau^i Z(tau)/delta * G1, len domain_size-1
    l_query: list        # (beta A_i + alpha B_i + C_i)/delta * G1 (witness)
    _dev: dict = field(default_factory=dict, repr=False)

    def device_table(self, name: str, msm_obj: MSM):
        """Cache Montgomery-form device arrays for an SRS table."""
        if name not in self._dev:
            pts = getattr(self, name)
            P = msm_obj.ctx.points_to_device(pts)
            valid = jnp.asarray([0 if p is None else 1 for p in pts], dtype=U32)
            self._dev[name] = (P.x, P.y, valid)
        return self._dev[name]

    def native_g2_table(self) -> "np.ndarray":
        """Cache the (n,16) u64 layout of b_g2_query for the native G2 MSM
        (the per-prove conversion was ~350 MB of bigint->bytes churn)."""
        key = "b_g2_query:u64"
        if key not in self._dev:
            self._dev[key] = nb.g2_to_u64(self.b_g2_query)
        return self._dev[key]


@dataclass
class Proof:
    a: AffinePoint
    b: G2Point
    c: AffinePoint


# ---------------------------------------------------------------------------
# QAP helpers (host, exact)
# ---------------------------------------------------------------------------

def _domain_for(r1cs: R1CS) -> ntt.NTTDomain:
    need = len(r1cs.constraints) + r1cs.num_instance
    n = 1
    while n < need:
        n *= 2
    return ntt.get_domain(R, n)


def _lagrange_coeffs_at(dom: ntt.NTTDomain, t: int) -> list[int]:
    """L_j(t) for all j: (Z(t)/N) * w^j / (t - w^j)."""
    n, w = dom.n, dom.w
    zt = (pow(t, n, R) - 1) % R
    factor = zt * pow(n, -1, R) % R
    wj = 1
    nums, dens = [], []
    for j in range(n):
        nums.append(factor * wj % R)
        dens.append((t - wj) % R)
        wj = wj * w % R
    # batch invert dens
    inv = _batch_inv_host(dens)
    return [nums[j] * inv[j] % R for j in range(n)]


def _batch_inv_host(xs: list[int]) -> list[int]:
    prefix = [1]
    for x in xs:
        prefix.append(prefix[-1] * x % R)
    total = pow(prefix[-1], -1, R)
    out = [0] * len(xs)
    for i in range(len(xs) - 1, -1, -1):
        out[i] = total * prefix[i] % R
        total = total * xs[i] % R
    return out


def _r1cs_coo(r1cs: R1CS):
    """COO triples (rows, cols, coeffs_u64) per matrix A/B/C, cached on the
    instance.  Shared by the QAP-at-tau evaluation (setup) and the Az/Bz/Cz
    matvec (prove) — the reference's r1cs_to_qap.rs walks the same sparse
    structure."""
    coo = getattr(r1cs, "_coo_cache", None)
    if coo is None:
        from array import array

        F = r1cs.field
        # memoized coefficient bytes: R1CS coefficients repeat heavily
        # (1, F-1, powers of two from bit recompositions, SHA constants),
        # so a dict lookup replaces most of the 9.8M to_bytes calls the
        # old per-term list-append build paid (~8 s at rs256@2048)
        cbytes: dict[int, bytes] = {}
        coo = []
        for k in range(3):
            rows = array("I")
            cols = array("I")
            buf = bytearray()
            for j, cons in enumerate(r1cs.constraints):
                row = cons[k]
                if not row:
                    continue
                rows.extend([j] * len(row))
                for i, co in row:
                    cols.append(i)
                    b = cbytes.get(co)
                    if b is None:
                        b = (co % F).to_bytes(32, "little")
                        cbytes[co] = b
                    buf += b
            coo.append(
                (
                    np.frombuffer(rows, dtype=np.uint32),
                    np.frombuffer(cols, dtype=np.uint32),
                    np.frombuffer(bytes(buf), dtype="<u8").reshape(-1, 4),
                )
            )
        r1cs._coo_cache = coo
    return coo


def _qap_evals_at_t(r1cs: R1CS, dom: ntt.NTTDomain, t: int):
    """A_i(t), B_i(t), C_i(t) per variable, with libsnark-style identity rows
    for instance variables (forks/groth16/src/r1cs_to_qap.rs semantics)."""
    nv = r1cs.num_vars
    nc = len(r1cs.constraints)
    if _native_ok():
        zt = (pow(t, dom.n, R) - 1) % R
        factor = zt * pow(dom.n, -1, R) % R
        L = nb.lagrange_at(R, dom.w, t, factor, dom.n)
        outs = []
        for rows, cols, coeffs in _r1cs_coo(r1cs):
            outs.append(nb.coo_matvec(R, cols, rows, coeffs, L, nv))
        A, B, C = (nb.u64_to_ints(o) for o in outs)
        L_tail = nb.u64_to_ints(L[nc : nc + r1cs.num_instance])
        for i in range(r1cs.num_instance):
            A[i] = (A[i] + L_tail[i]) % R
        return A, B, C
    L = _lagrange_coeffs_at(dom, t)
    A = [0] * nv
    B = [0] * nv
    C = [0] * nv
    for j, (ar, br, cr) in enumerate(r1cs.constraints):
        lj = L[j]
        for i, co in ar:
            A[i] = (A[i] + co * lj) % R
        for i, co in br:
            B[i] = (B[i] + co * lj) % R
        for i, co in cr:
            C[i] = (C[i] + co * lj) % R
    for i in range(r1cs.num_instance):
        A[i] = (A[i] + L[nc + i]) % R
    return A, B, C


def _matvec_evals(r1cs: R1CS, z: list[int], dom: ntt.NTTDomain):
    """Domain evaluations a=Az, b=Bz, c=Cz (+ identity rows), host-exact."""
    n = dom.n
    nc = len(r1cs.constraints)
    if _native_ok():
        zu = nb.ints_to_u64([x % R for x in z])
        outs = []
        for rows, cols, coeffs in _r1cs_coo(r1cs):
            outs.append(nb.coo_matvec(R, rows, cols, coeffs, zu, n))
        a, b, c = (nb.u64_to_ints(o) for o in outs)
        for i in range(r1cs.num_instance):
            a[nc + i] = z[i] % R
        return a, b, c
    a = [0] * n
    b = [0] * n
    c = [0] * n
    for j, (ar, br, cr) in enumerate(r1cs.constraints):
        a[j] = sum(co * z[i] for i, co in ar) % R
        b[j] = sum(co * z[i] for i, co in br) % R
        c[j] = sum(co * z[i] for i, co in cr) % R
    for i in range(r1cs.num_instance):
        a[nc + i] = z[i]
    return a, b, c


# ---------------------------------------------------------------------------
# Fixed-base batched scalar muls (device)
# ---------------------------------------------------------------------------

def fixed_base_mul(base, scalars: list[int], g2: bool = False) -> list:
    """[k*base for k in scalars].  Native windowed fixed-base when the C++
    backend is up (SRS generation is a host-side one-time cost, exactly as in
    the reference generator.rs); batched TPU double-and-add otherwise."""
    if not scalars:
        return []
    if _native_ok():
        ks = [s % G2.n for s in scalars] if g2 else [s % G1.n for s in scalars]
        if g2:
            return nb.fixed_base_g2(base, ks)
        return nb.fixed_base("bn254_g1", base, ks)
    ctx = get_g2_ctx() if g2 else get_curve_ctx(G1)
    P1 = ctx.points_to_device([base])
    n = len(scalars)
    npad = 1 << (n - 1).bit_length() if n > 1 else 1  # shape-bucket compiles
    es = ctx.fctx.elem_shape
    P = JPoints(
        jnp.broadcast_to(P1.x[0], (npad,) + es),
        jnp.broadcast_to(P1.y[0], (npad,) + es),
        jnp.broadcast_to(P1.z[0], (npad,) + es),
    )
    padded = [s % ctx.n for s in scalars] + [0] * (npad - n)
    kl = jnp.asarray(limb.ints_to_limbs(padded))
    return ctx.points_to_host(ctx.scalar_mul(kl, P))[:n]


def _setup_device_enabled() -> bool:
    """Route the SRS fixed-base batches through the TPU gather/madd pipeline
    (ops/fixed_base.py).  'auto'/'1' = on TPU backends, '0' = never,
    'force' = any backend (tests exercise the exact program on CPU XLA)."""
    v = os.environ.get("CRESCENT_SETUP_TPU", "auto")
    if v == "0":
        return False
    if v == "force":
        return True
    return jax.default_backend() == "tpu"


def _qap_evals_at_t_u64(r1cs: R1CS, dom: ntt.NTTDomain, t: int):
    """Native-array variant of _qap_evals_at_t: (A, B, C) as (nv, 4) u64
    standard-form arrays (no Python-int materialization — feeds the device
    fixed-base scalar planes directly)."""
    assert _native_ok()
    nv = r1cs.num_vars
    nc = len(r1cs.constraints)
    zt = (pow(t, dom.n, R) - 1) % R
    factor = zt * pow(dom.n, -1, R) % R
    L = nb.lagrange_at(R, dom.w, t, factor, dom.n)
    outs = []
    for rows, cols, coeffs in _r1cs_coo(r1cs):
        outs.append(nb.coo_matvec(R, cols, rows, coeffs, L, nv))
    A, B, C = outs
    ninst = r1cs.num_instance
    # libsnark identity rows for instance variables (tiny: ninst elements)
    Ai = nb.u64_to_ints(A[:ninst])
    Lt = nb.u64_to_ints(L[nc : nc + ninst])
    A[:ninst] = nb.ints_to_u64([(a + l) % R for a, l in zip(Ai, Lt)])
    return A, B, C


def _setup_scalar_planes(A, B, C, ninst: int, alpha: int, beta: int, d_inv: int):
    """Device linear combination (beta*A + alpha*B + C) over all variables
    and its delta^-1-scaled witness tail — the generator's scalar prep
    (generator.rs) without per-element Python bigints.  Returns
    (gamma_abc (ninst,16), l_scalars (nv-ninst,16)) u16 standard-form."""
    fr = get_curve_ctx(G1).fr
    Au = limb.upload_limbs(limb.u64_to_limbs(A))
    Bu = limb.upload_limbs(limb.u64_to_limbs(B))
    Cu = limb.upload_limbs(limb.u64_to_limbs(C))
    cb = jnp.asarray(fr.to_mont_host([beta])[0])
    ca = jnp.asarray(fr.to_mont_host([alpha])[0])
    cd = jnp.asarray(fr.to_mont_host([d_inv])[0])

    @jax.jit
    def lin(Au, Bu, Cu):
        lc = fr.add_mod(
            fr.add_mod(
                fr.mont_mul(Au, jnp.broadcast_to(cb, Au.shape)),
                fr.mont_mul(Bu, jnp.broadcast_to(ca, Bu.shape)),
            ),
            Cu,
        )
        l = fr.mont_mul(
            lc[ninst:], jnp.broadcast_to(cd, (lc.shape[0] - ninst, NLIMB))
        )
        return lc[:ninst].astype(jnp.uint16), l.astype(jnp.uint16)

    abc, l = lin(Au, Bu, Cu)
    return np.asarray(jax.device_get(abc)), np.asarray(jax.device_get(l))


def _setup_fixed_base_device(r1cs, dom, alpha, beta, delta, t):
    """Both SRS fixed-base batches on the device pipeline; returns
    (g1_all, g2_all) ArrayPointVecs ordered exactly like the host path's
    concatenated scalar lists in setup()."""
    from ..ops.fixed_base import FixedBaseMSM

    ninst = r1cs.num_instance
    nv = r1cs.num_vars
    zt = (pow(t, dom.n, R) - 1) % R
    d_inv = pow(delta, -1, R)
    with timed("Groth16::setup qap_evals_at_t (native, arrays)"):
        A, B, C = _qap_evals_at_t_u64(r1cs, dom, t)
    with timed("Groth16::setup scalar prep (device)"):
        abc16, l16 = _setup_scalar_planes(A, B, C, ninst, alpha, beta, d_inv)
        h_u64 = nb.powers(R, t, zt * d_inv % R, dom.n - 1)
        A16 = limb.u64_to_limbs(A)
        B16 = limb.u64_to_limbs(B)
        h16s = limb.u64_to_limbs(h_u64)
        tail16 = limb.ints_to_limbs([alpha, beta, delta]).astype(np.uint16)
        sc_g1 = np.concatenate(
            [A16, B16, h16s, l16, abc16, tail16], axis=0
        )
        sc_g2 = np.concatenate(
            [B16, limb.ints_to_limbs([beta, 1, delta]).astype(np.uint16)],
            axis=0,
        )
    ctx1 = get_curve_ctx(G1)
    ctx2 = get_g2_ctx()
    fb1 = FixedBaseMSM(ctx1)
    fb2 = FixedBaseMSM(ctx2)
    # dispatch G1 then G2 before fetching either: the programs queue on the
    # device in order, so the G1 result download overlaps the G2 compute
    # (and the G2 table build/upload overlaps the G1 compute) instead of
    # running back-to-back with synchronous fetches
    with timed(f"Groth16::setup fixed-base G1 dispatch ({sc_g1.shape[0]} pts)"):
        t1 = fixed_base_mul(G1.generator, fb1.table_scalars())
        h1 = fb1.dispatch(t1, sc_g1)
    with timed(f"Groth16::setup fixed-base G2 dispatch ({sc_g2.shape[0]} pts)"):
        t2 = fixed_base_mul(G2.generator(), fb2.table_scalars(), g2=True)
        h2 = fb2.dispatch(t2, sc_g2)
    with timed("Groth16::setup fixed-base G1 fetch"):
        g1_all = fb1.fetch(h1)
    with timed("Groth16::setup fixed-base G2 fetch"):
        g2_all = fb2.fetch(h2)
    assert nv + nv + (dom.n - 1) + (nv - ninst) + ninst + 3 == len(g1_all)
    return g1_all, g2_all


# ---------------------------------------------------------------------------
# Setup / Prove / Verify
# ---------------------------------------------------------------------------

def setup(r1cs: R1CS, rng: random.Random) -> ProvingKey:
    """Generate the per-circuit SRS (reference: forks/groth16/src/generator.rs)."""
    # gamma = 1 exactly as the reference generator (forks/groth16/src/
    # generator.rs:28) — groth16rand's committed-input algebra relies on it
    # (the -(acc_r+z)*G correction on proof.c cancels e(k*delta_g1, gamma_g2)
    # only when gamma == 1).
    alpha, beta, delta, t = (rng.randrange(1, R) for _ in range(4))
    gamma = 1
    with timed("Groth16::setup domain"):
        dom = _domain_for(r1cs)
    ninst = r1cs.num_instance
    nv = r1cs.num_vars
    if (
        _setup_device_enabled()
        and _native_ok()
        and 3 * nv + dom.n
        >= int(os.environ.get("CRESCENT_SETUP_TPU_MIN", str(1 << 14)))
    ):
        # QAP-scale SRS: both fixed-base batches on the device pipeline,
        # results stay in array form end-to-end (ArrayPointVec tables
        # serialize as byte views — no Python-int materialization)
        g1_all, g2_all = _setup_fixed_base_device(
            r1cs, dom, alpha, beta, delta, t
        )
        with timed("Groth16::setup key assembly"):
            nh = dom.n - 1
            a_query = g1_all[:nv]
            b_g1_query = g1_all[nv : 2 * nv]
            h_query = g1_all[2 * nv : 2 * nv + nh]
            l_query = g1_all[2 * nv + nh : 2 * nv + nh + (nv - ninst)]
            gamma_abc_g1 = g1_all[2 * nv + nh + (nv - ninst) : -3].to_list()
            alpha_g1, beta_g1, delta_g1 = (g1_all[i] for i in range(-3, 0))
            b_g2_query = g2_all[:nv]
            beta_g2, gamma_g2, delta_g2 = (g2_all[i] for i in range(-3, 0))
            vk = VerifyingKey(
                alpha_g1, beta_g2, gamma_g2, delta_g1, delta_g2, gamma_abc_g1
            )
        return ProvingKey(
            vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query,
            h_query, l_query,
        )
    with timed("Groth16::setup qap_evals_at_t"):
        A, B, C = _qap_evals_at_t(r1cs, dom, t)
    zt = (pow(t, dom.n, R) - 1) % R
    g_inv = pow(gamma, -1, R)
    d_inv = pow(delta, -1, R)

    with timed("Groth16::setup scalar prep"):
        gamma_abc = [(beta * A[i] + alpha * B[i] + C[i]) * g_inv % R for i in range(ninst)]
        l_scalars = [
            (beta * A[i] + alpha * B[i] + C[i]) * d_inv % R
            for i in range(ninst, r1cs.num_vars)
        ]
        if _native_ok():
            h_scalars = nb.u64_to_ints(nb.powers(R, t, zt * d_inv % R, dom.n - 1))
        else:
            h_scalars = [pow(t, i, R) * zt * d_inv % R for i in range(dom.n - 1)]

    g = G1.generator
    g2 = G2.generator()
    # one batched fixed-base mul per group (a single compiled program each)
    nv = r1cs.num_vars
    with timed(f"Groth16::setup fixed-base G1 ({3 * nv + dom.n} pts)"):
        g1_all = fixed_base_mul(
            g, A + B + h_scalars + l_scalars + gamma_abc + [alpha, beta, delta]
        )
    a_query, rest = g1_all[:nv], g1_all[nv:]
    b_g1_query, rest = rest[: nv], rest[nv:]
    h_query, rest = rest[: len(h_scalars)], rest[len(h_scalars):]
    l_query, rest = rest[: len(l_scalars)], rest[len(l_scalars):]
    gamma_abc_g1, rest = rest[: ninst], rest[ninst:]
    alpha_g1, beta_g1, delta_g1 = rest
    with timed(f"Groth16::setup fixed-base G2 ({nv} pts)"):
        g2_all = fixed_base_mul(g2, B + [beta, gamma, delta], g2=True)
    b_g2_query = g2_all[:nv]
    beta_g2, gamma_g2, delta_g2 = g2_all[nv:]

    vk = VerifyingKey(alpha_g1, beta_g2, gamma_g2, delta_g1, delta_g2, gamma_abc_g1)
    return ProvingKey(vk, beta_g1, delta_g1, a_query, b_g1_query, b_g2_query, h_query, l_query)


_H_PIPE_CACHE: dict = {}


def _h_pipeline(dom: ntt.NTTDomain):
    """ONE jitted program for the whole h(x) pipeline: Montgomery
    conversion, 3x (iNTT -> coset scale -> NTT), pointwise (ab - c)/Z,
    coset iNTT and de-Montgomery.  The per-call version dispatched ~20
    separate programs through the axon tunnel; the round-3 trace showed the
    phase costing 187-1344 s against ~2 s of butterfly kernel time —
    pure dispatch/transfer overhead this fusion removes."""
    key = (dom.ctx.modulus, dom.n)
    if key not in _H_PIPE_CACHE:
        ctx = dom.ctx
        g = Fr.multiplicative_generator
        g_inv = pow(g, -1, R)
        zinv = pow(dom.vanishing_on_coset(g), -1, R)
        zinv_m = jnp.asarray(ctx.to_mont_host([zinv])[0])
        one_std = jnp.asarray(limb.ints_to_limbs([1]))[0]
        n_inv = dom.n_inv_mont

        # every big table is a jit ARGUMENT: captured device arrays embed
        # as HLO constants and the 2^21 program blew the tunnel's
        # remote-compile body limit (HTTP 413)
        tables = (
            dom.perm,
            tuple(dom.tw_fwd),
            tuple(dom.tw_inv),
            dom._coset_powers(g),
            dom._coset_powers(g_inv),
        )

        @jax.jit
        def run(a, b, c, perm, tf, ti, pows, ipows):
            am, bm, cm = ctx.to_mont(a), ctx.to_mont(b), ctx.to_mont(c)

            def fwd(x):
                return ntt.transform_limb_major(ctx, x, perm, tf, None)

            def inv(x):
                return ntt.transform_limb_major(ctx, x, perm, ti, n_inv)

            def coset_fwd(x):
                return fwd(ntt.elemwise_mont_mul(ctx, inv(x), pows))

            prod = ctx.sub_mod(
                ntt.elemwise_mont_mul(ctx, coset_fwd(am), coset_fwd(bm)),
                coset_fwd(cm),
            )
            hc = ntt.elemwise_mont_mul(
                ctx, prod, jnp.broadcast_to(zinv_m, prod.shape)
            )
            hm = ntt.elemwise_mont_mul(ctx, inv(hc), ipows)
            # de-Montgomery on device (mont_mul by standard-form 1), then
            # narrow to u16: halves the tunnel download
            h_std = ntt.elemwise_mont_mul(
                ctx, hm, jnp.broadcast_to(one_std, hm.shape)
            )
            return h_std.astype(jnp.uint16)

        _H_PIPE_CACHE[key] = (run, tables)
    return _H_PIPE_CACHE[key]


def _matvec_evals_u64(r1cs: R1CS, zu: "np.ndarray", dom: ntt.NTTDomain):
    """Native-backend Az/Bz/Cz as (dom.n, 4) u64 arrays, identity rows
    included — no Python-int materialization (round-5 data-path cleanup:
    the ints round-trip cost ~10 s at rs256@2048)."""
    nc = len(r1cs.constraints)
    outs = [
        nb.coo_matvec(R, rows, cols, coeffs, zu, dom.n)
        for rows, cols, coeffs in _r1cs_coo(r1cs)
    ]
    outs[0][nc : nc + r1cs.num_instance] = zu[: r1cs.num_instance]
    return outs


def _compute_h_device(r1cs: R1CS, zu: "np.ndarray", dom: ntt.NTTDomain):
    """TPU fused h(x): native u64 matvec -> u16 limb view -> one-jit NTT
    pipeline.  Returns the FULL-length (dom.n, 16) device u16 standard-form
    h array (callers slice [: dom.n - 1]); never materializes Python ints."""
    with timed("prove::matvec Az/Bz/Cz"):
        a, b, c = _matvec_evals_u64(r1cs, zu, dom)
    with timed(f"prove::NTT h(x) (domain 2^{dom.n.bit_length() - 1})"):
        run, tables = _h_pipeline(dom)
        h16 = run(
            limb.upload_limbs(limb.u64_to_limbs(a)),
            limb.upload_limbs(limb.u64_to_limbs(b)),
            limb.upload_limbs(limb.u64_to_limbs(c)),
            *tables,
        )
        assert not np.asarray(jax.device_get(h16[-1])).any(), (
            "h degree bound violated (unsatisfied R1CS?)"
        )
    return h16


def _compute_h(r1cs: R1CS, z: list[int], dom: ntt.NTTDomain) -> list[int]:
    """h(x) = (A(x)B(x) - C(x)) / Z(x) via coset NTTs on TPU."""
    ctx = dom.ctx
    with timed("prove::matvec Az/Bz/Cz"):
        a, b, c = _matvec_evals(r1cs, z, dom)
    with timed(f"prove::NTT h(x) (domain 2^{dom.n.bit_length() - 1})"):
        if jax.default_backend() == "tpu":
            # standard-form u16 uploads; everything else fused in one jit
            run, tables = _h_pipeline(dom)
            h16 = run(
                limb.upload_limbs(limb.ints_to_limbs(a)),
                limb.upload_limbs(limb.ints_to_limbs(b)),
                limb.upload_limbs(limb.ints_to_limbs(c)),
                *tables,
            )
            h_ints = limb.limbs_to_ints(np.asarray(jax.device_get(h16)))
        else:
            am = jnp.asarray(ctx.to_mont_host(a))
            bm = jnp.asarray(ctx.to_mont_host(b))
            cm = jnp.asarray(ctx.to_mont_host(c))
            g = Fr.multiplicative_generator
            ac = dom.coset_ntt(dom.intt(am), g)
            bc = dom.coset_ntt(dom.intt(bm), g)
            cc = dom.coset_ntt(dom.intt(cm), g)
            prod = ctx.sub_mod(ntt.elemwise_mont_mul(ctx, ac, bc), cc)
            zinv = pow(dom.vanishing_on_coset(g), -1, R)
            zinv_m = jnp.asarray(ctx.to_mont_host([zinv])[0])
            hc = ntt.elemwise_mont_mul(
                ctx, prod, jnp.broadcast_to(zinv_m, prod.shape)
            )
            h = dom.coset_intt(hc, g)
            h_ints = ctx.from_mont_host(np.asarray(jax.device_get(h.astype(jnp.uint16))))
    assert h_ints[-1] == 0, "h degree bound violated (unsatisfied R1CS?)"
    return h_ints[:-1]


def _msm_problem(pk: ProvingKey, name: str, scalars: list[int], msm_obj: MSM):
    px, py, valid = pk.device_table(name, msm_obj)
    n = len(scalars)
    sc = limb.upload_limbs(limb.ints_to_limbs([s % R for s in scalars]))
    return (px[:n], py[:n], valid[:n], sc)


def prove(
    pk: ProvingKey,
    r1cs: R1CS,
    z,
    rng: random.Random,
    r: Optional[int] = None,
    s: Optional[int] = None,
) -> Proof:
    """Groth16 prove (reference forks/groth16/src/prover.rs):
    QAP witness map (NTT) + 4 MSMs, all on TPU.

    z: full assignment — list of ints, or an (nv, 4) u64 standard-form
    array (witness-program replay output; saves all int conversions)."""
    r = rng.randrange(R) if r is None else r
    s = rng.randrange(R) if s is None else s
    zu_in = None
    if isinstance(z, np.ndarray):
        zu_in = z
        z = None  # materialized lazily only if a fallback path needs ints

    def _zlist():
        nonlocal z
        if z is None:
            z = nb.u64_to_ints(zu_in)
        return z
    dom = _domain_for(r1cs)
    shard = _sharded_prove()
    # Sharded-prove compiles bypass the persistent compilation cache
    # entirely: jaxlib reproducibly segfaults BOTH serializing
    # (put_executable) and deserializing (get_executable, in a
    # long-lived high-RSS process) multi-device executables.  The
    # process-wide bypass installed at package import handles this for
    # every multi-device compile; the scoped guard is the fallback if
    # the jax-internals patch could not install (utils/compile_cache.py).
    from ..utils import compile_cache as _ccache
    from contextlib import nullcontext

    guard = (
        nullcontext
        if shard is None or _ccache.MULTIDEVICE_BYPASS_INSTALLED
        else _ccache.no_compile_cache
    )
    # Device-fused data path (TPU + native backend): witness/matvec/h stay in
    # u64/u16 array form end-to-end — no Python-int round-trips between the
    # native matvec, the h pipeline and the MSM fold (round-5 perf item 2).
    use_dev_h = (
        shard is None
        and not _native_msm_prove()
        and _native_ok()
        and jax.default_backend() == "tpu"
        and os.environ.get("CRESCENT_PROVE_FUSED", "1") == "1"
    )
    zu = h16 = h = None
    if shard is not None and dom.n >= 4 * len(jax.devices()) ** 2:
        # multi-chip h(x): every length-N transform through the four-step
        # sharded NTT (one all_to_all each) instead of replicated NTTs
        with timed("prove::matvec Az/Bz/Cz"):
            a, b, c = _matvec_evals(r1cs, _zlist(), dom)
        with timed(f"prove::NTT h(x) sharded (domain 2^{dom.n.bit_length() - 1})"), guard():
            pipe = _sharded_h_pipeline(dom)
            h_full = pipe.compute_h(a, b, c)
            assert h_full[-1] == 0, "h degree bound violated (unsatisfied R1CS?)"
            h = h_full[:-1]
    elif use_dev_h:
        zu = zu_in if zu_in is not None else nb.ints_to_u64([x % R for x in z])
        h16 = _compute_h_device(r1cs, zu, dom)
    else:
        h = _compute_h(r1cs, _zlist(), dom)

    if shard is not None:
        smsm_g1, smsm_g2 = shard
        zr = [x % R for x in _zlist()]
        with timed(f"prove::MSMs sharded x{smsm_g1.mesh.devices.size} ({r1cs.num_vars} vars)"), guard():
            az = smsm_g1.run_host(zr, pk.a_query)
            bz1 = smsm_g1.run_host(zr, pk.b_g1_query)
            hq = smsm_g1.run_host(h, pk.h_query)
            lw = smsm_g1.run_host(zr[r1cs.num_instance :], pk.l_query)
            if _native_ok():
                # G2 stays on the host backend (the reference keeps G2 on
                # CPU too); the sharded Fq2 program costs far more compile
                # time than it saves at current sizes
                bz2 = nb.msm_g2(zr, pk.b_g2_query)
            else:
                bz2 = smsm_g2.run_host(zr, pk.b_g2_query)
    elif _native_msm_prove():
        with timed(f"prove::MSMs native ({r1cs.num_vars} vars)"):
            zr = [x % R for x in _zlist()]
            az = nb.msm("bn254_g1", zr, pk.a_query)
            bz1 = nb.msm("bn254_g1", zr, pk.b_g1_query)
            hq = nb.msm("bn254_g1", h, pk.h_query)
            lw = nb.msm("bn254_g1", zr[r1cs.num_instance :], pk.l_query)
            bz2 = nb.msm_g2(zr, pk.b_g2_query)
    else:
        msm_g1 = get_msm(G1)
        msm_g2 = get_g2_msm()

        fused = os.environ.get("CRESCENT_PROVE_FUSED", "1") == "1"
        with timed(f"prove::MSMs G1 device ({r1cs.num_vars} vars)"):
            fold_res = None
            if fused:
                # ONE compiled chunk-scan program for all 4 G1 MSMs: the
                # z-scalar plane uploads once and is shared by the a/b1/l
                # problems (l is a device slice)
                if h16 is not None:
                    # u64 witness plane + on-device h: zero int round-trips
                    zsc = limb.upload_limbs(limb.u64_to_limbs(zu))
                    nh = dom.n - 1
                    hsc = h16[:nh].astype(U32)
                else:
                    zsc = limb.upload_limbs(
                        limb.ints_to_limbs([x % R for x in _zlist()])
                    )
                    hsc = limb.upload_limbs(limb.ints_to_limbs(h))
                    nh = len(h)
                ta = pk.device_table("a_query", msm_g1)
                tb = pk.device_table("b_g1_query", msm_g1)
                th = pk.device_table("h_query", msm_g1)
                tl = pk.device_table("l_query", msm_g1)
                ni = r1cs.num_instance
                fold_res = msm_g1.run_device_fold(
                    [
                        (*ta, zsc),
                        (*tb, zsc),
                        (th[0][:nh], th[1][:nh], th[2][:nh], hsc),
                        (*tl, zsc[ni:]),
                    ]
                )
            if fold_res is None and h is None and h16 is not None:
                # rare fallback (affine path unavailable): materialize ints
                h = limb.limbs_to_ints(np.asarray(jax.device_get(h16)))[:-1]
            bz2 = None
            if fold_res is not None and _native_ok():
                # overlap: the G1 fold is dispatched but not yet fetched —
                # run the host-backend G2 MSM while the TPU works, so its
                # ~3.5 s disappears behind the fold (round-5 perf item 2)
                with timed("prove::MSM G2 (overlapped)"):
                    if zu is not None:
                        bz2 = nb.msm_g2_raw(zu, pk.native_g2_table())
                    else:
                        bz2 = nb.msm_g2([x % R for x in _zlist()], pk.b_g2_query)
            if fold_res is not None:
                az, bz1, hq, lw = msm_g1.ctx.points_to_host(
                    JPoints(
                        jnp.stack([p.x for p in fold_res]),
                        jnp.stack([p.y for p in fold_res]),
                        jnp.stack([p.z for p in fold_res]),
                    )
                )
            else:
                # the 4 G1 MSMs as one vmapped program (per-chunk host loop)
                res4 = msm_g1.run_device_many(
                    [
                        _msm_problem(pk, "a_query", _zlist(), msm_g1),
                        _msm_problem(pk, "b_g1_query", _zlist(), msm_g1),
                        _msm_problem(pk, "h_query", h, msm_g1),
                        _msm_problem(pk, "l_query", _zlist()[r1cs.num_instance :], msm_g1),
                    ]
                )
                az, bz1, hq, lw = msm_g1.ctx.points_to_host(res4)
        if bz2 is None:
            with timed("prove::MSM G2"):
                if _native_ok():
                    # the G2 MSM runs on the host backend even when G1 is on
                    # device: the Fq2 scan path is the slow executor and the
                    # reference keeps G2 on CPU too (prover.rs rayon)
                    if zu is not None:
                        bz2 = nb.msm_g2_raw(zu, pk.native_g2_table())
                    else:
                        bz2 = nb.msm_g2([x % R for x in _zlist()], pk.b_g2_query)
                else:
                    pg2 = _msm_problem(pk, "b_g2_query", _zlist(), msm_g2)
                    res2 = msm_g2.run_device(*pg2)
                    bz2 = msm_g2.ctx.points_to_host(
                        JPoints(res2.x[None], res2.y[None], res2.z[None])
                    )[0]

    vk = pk.vk
    # A = alpha + sum z_i A_i(t) + r*delta
    A = G1.add(G1.add(vk.alpha_g1, az), G1.mul(r, pk.delta_g1))
    # B(G2) = beta + sum z_i B_i(t) + s*delta ; B(G1) likewise
    B2 = G2.add(G2.add(vk.beta_g2, bz2), G2.mul(s, vk.delta_g2))
    B1 = G1.add(G1.add(pk.beta_g1, bz1), G1.mul(s, pk.delta_g1))
    # C = l + h + sA + rB1 - rs*delta
    C = G1.add(lw, hq)
    C = G1.add(C, G1.mul(s, A))
    C = G1.add(C, G1.mul(r, B1))
    C = G1.add(C, G1.neg(G1.mul(r * s % R, pk.delta_g1)))
    return Proof(A, B2, C)


def prepare_inputs(vk: VerifyingKey, public_inputs: list[int]) -> AffinePoint:
    """gamma_abc[0] + sum_i pub_i * gamma_abc[i+1]  (verifier.rs:25)."""
    assert len(public_inputs) == len(vk.gamma_abc_g1) - 1
    acc = vk.gamma_abc_g1[0]
    if public_inputs:
        if _native_ok():
            acc = G1.add(
                acc,
                nb.msm(
                    "bn254_g1",
                    [s % R for s in public_inputs],
                    vk.gamma_abc_g1[1:],
                ),
            )
        else:
            m = get_msm(G1, lanes=8)
            acc = G1.add(acc, m.run_host(public_inputs, vk.gamma_abc_g1[1:]))
    return acc


def verify_with_prepared_inputs(
    pvk: PreparedVerifyingKey, proof: Proof, prepared: AffinePoint
) -> bool:
    """e(A,B) == e(alpha,beta) * e(prepared, gamma) * e(C, delta)."""
    vk = pvk.vk
    f = pr.multi_pairing(
        [
            (proof.a, proof.b),
            (G1.neg(prepared), vk.gamma_g2),
            (G1.neg(proof.c), vk.delta_g2),
        ]
    )
    return f == pvk.alpha_beta


def verify(pvk: PreparedVerifyingKey, proof: Proof, public_inputs: list[int]) -> bool:
    return verify_with_prepared_inputs(pvk, proof, prepare_inputs(pvk.vk, public_inputs))


def rerandomize_proof(
    vk: VerifyingKey, proof: Proof, rng: random.Random,
    r1: Optional[int] = None, r2: Optional[int] = None,
) -> Proof:
    """Unlinkable rerandomization (BKSV20 fig.1; forks/groth16/src/prover.rs:227):
    A' = r1*A,  B' = (1/r1)*B + r2*delta_g2,  C' = C + r1*r2*A."""
    r1 = rng.randrange(1, R) if r1 is None else r1
    r2 = rng.randrange(R) if r2 is None else r2
    A2 = G1.mul(r1, proof.a)
    B2 = G2.add(G2.mul(pow(r1, -1, R), proof.b), G2.mul(r2, vk.delta_g2))
    C2 = G1.add(proof.c, G1.mul(r1 * r2 % R, proof.a))
    return Proof(A2, B2, C2)
