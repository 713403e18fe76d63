// BN254 host arithmetic for the in-browser show prover.
//
// Mirrors crescent_tpu/core/curves.py + core/fields.py (host-exact oracle)
// and utils/serialize.py (ark CanonicalSerialize byte layouts).  Points are
// [x, y] BigInt pairs (null = identity); G2 coordinates are [c0, c1] Fq2
// pairs.  All show-path muls are a few hundred points — BigInt speed is
// milliseconds, matching wasm_lib.rs's in-browser budget.
"use strict";

const FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583n;
const FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617n;

function mod(a, m) { const r = a % m; return r < 0n ? r + m : r; }

function powmod(b, e, m) {
  b = mod(b, m);
  let r = 1n;
  while (e > 0n) {
    if (e & 1n) r = (r * b) % m;
    b = (b * b) % m;
    e >>= 1n;
  }
  return r;
}

function invmod(a, m) {
  // extended Euclid
  let [old_r, r] = [mod(a, m), m];
  let [old_s, s] = [1n, 0n];
  while (r !== 0n) {
    const q = old_r / r;
    [old_r, r] = [r, old_r - q * r];
    [old_s, s] = [s, old_s - q * s];
  }
  if (old_r !== 1n) throw new Error("not invertible");
  return mod(old_s, m);
}

// ---------------------------------------------------------------------------
// G1 (y^2 = x^3 + 3 over Fq), affine with null identity
// ---------------------------------------------------------------------------

const G1 = {
  p: FQ,
  n: FR,
  generator: [1n, 2n],
  neg(pt) { return pt === null ? null : [pt[0], mod(-pt[1], FQ)]; },
  add(p1, p2) {
    if (p1 === null) return p2;
    if (p2 === null) return p1;
    const [x1, y1] = p1, [x2, y2] = p2;
    let lam;
    if (x1 === x2) {
      if (mod(y1 + y2, FQ) === 0n) return null;
      lam = mod(3n * x1 * x1 * invmod(2n * y1, FQ), FQ);
    } else {
      lam = mod((y2 - y1) * invmod(x2 - x1, FQ), FQ);
    }
    const x3 = mod(lam * lam - x1 - x2, FQ);
    return [x3, mod(lam * (x1 - x3) - y1, FQ)];
  },
  mul(k, pt) {
    k = mod(k, FR);
    let r = null, q = pt;
    while (k > 0n) {
      if (k & 1n) r = G1.add(r, q);
      q = G1.add(q, q);
      k >>= 1n;
    }
    return r;
  },
  msm(scalars, points) {
    let acc = null;
    for (let i = 0; i < scalars.length; i++)
      acc = G1.add(acc, G1.mul(scalars[i], points[i]));
    return acc;
  },
};

// ---------------------------------------------------------------------------
// Fq2 (u^2 = -1) and G2 (y^2 = x^3 + 3/(9+u))
// ---------------------------------------------------------------------------

const F2 = {
  add(a, b) { return [mod(a[0] + b[0], FQ), mod(a[1] + b[1], FQ)]; },
  sub(a, b) { return [mod(a[0] - b[0], FQ), mod(a[1] - b[1], FQ)]; },
  neg(a) { return [mod(-a[0], FQ), mod(-a[1], FQ)]; },
  mul(a, b) {
    const t0 = a[0] * b[0] % FQ, t1 = a[1] * b[1] % FQ;
    return [mod(t0 - t1, FQ), mod((a[0] + a[1]) * (b[0] + b[1]) - t0 - t1, FQ)];
  },
  scale(a, k) { return [mod(a[0] * k, FQ), mod(a[1] * k, FQ)]; },
  inv(a) {
    const d = invmod(mod(a[0] * a[0] + a[1] * a[1], FQ), FQ);
    return [mod(a[0] * d, FQ), mod(-a[1] * d, FQ)];
  },
  eq(a, b) { return a[0] === b[0] && a[1] === b[1]; },
  isZero(a) { return a[0] === 0n && a[1] === 0n; },
};

const G2 = {
  n: FR,
  neg(pt) { return pt === null ? null : [pt[0], F2.neg(pt[1])]; },
  add(p1, p2) {
    if (p1 === null) return p2;
    if (p2 === null) return p1;
    const [x1, y1] = p1, [x2, y2] = p2;
    let lam;
    if (F2.eq(x1, x2)) {
      if (F2.isZero(F2.add(y1, y2))) return null;
      lam = F2.mul(F2.scale(F2.mul(x1, x1), 3n), F2.inv(F2.scale(y1, 2n)));
    } else {
      lam = F2.mul(F2.sub(y2, y1), F2.inv(F2.sub(x2, x1)));
    }
    const x3 = F2.sub(F2.sub(F2.mul(lam, lam), x1), x2);
    return [x3, F2.sub(F2.mul(lam, F2.sub(x1, x3)), y1)];
  },
  mul(k, pt) {
    k = mod(k, FR);
    let r = null, q = pt;
    while (k > 0n) {
      if (k & 1n) r = G2.add(r, q);
      q = G2.add(q, q);
      k >>= 1n;
    }
    return r;
  },
};

// ---------------------------------------------------------------------------
// ark CanonicalSerialize byte layouts (utils/serialize.py)
// ---------------------------------------------------------------------------

const INFINITY_FLAG = 0x40;
const NEGATIVE_FLAG = 0x80;

function bigToLe(x, n) {
  const out = new Uint8Array(n);
  for (let i = 0; i < n; i++) { out[i] = Number(x & 0xffn); x >>= 8n; }
  if (x !== 0n) throw new Error("value too wide");
  return out;
}

function leToBig(bytes) {
  let v = 0n;
  for (let i = bytes.length - 1; i >= 0; i--) v = (v << 8n) | BigInt(bytes[i]);
  return v;
}

function fqIsNegative(y) { return y > FQ - y; }

function serG1Compressed(pt) {
  // x (32B LE) with bit7 = y negative, bit6 = infinity (in x's top byte)
  if (pt === null) {
    const out = new Uint8Array(32);
    out[31] = INFINITY_FLAG;
    return out;
  }
  const out = bigToLe(pt[0], 32);
  if (fqIsNegative(pt[1])) out[31] |= NEGATIVE_FLAG;
  return out;
}

function serG1Uncompressed(pt) {
  // x || y, infinity flag on y's top byte
  const out = new Uint8Array(64);
  if (pt === null) { out[63] = INFINITY_FLAG; return out; }
  out.set(bigToLe(pt[0], 32), 0);
  out.set(bigToLe(pt[1], 32), 32);
  return out;
}

function serG2Uncompressed(pt) {
  const out = new Uint8Array(128);
  if (pt === null) { out[127] = INFINITY_FLAG; return out; }
  out.set(bigToLe(pt[0][0], 32), 0);
  out.set(bigToLe(pt[0][1], 32), 32);
  out.set(bigToLe(pt[1][0], 32), 64);
  out.set(bigToLe(pt[1][1], 32), 96);
  return out;
}

function serFr(x) { return bigToLe(mod(x, FR), 32); }
function serU64(x) { return bigToLe(BigInt(x), 8); }

const BN254 = {
  FQ, FR, mod, powmod, invmod, G1, G2, F2,
  serG1Compressed, serG1Uncompressed, serG2Uncompressed, serFr, serU64,
  bigToLe, leToBig,
};
if (typeof module !== "undefined") module.exports = BN254;
if (typeof globalThis !== "undefined") globalThis.BN254 = BN254;
