// In-browser show prover — the reference's create_show_proof_wasm
// (creds/src/wasm_lib.rs:46-159) as vanilla JS, so the browser extension
// can run the show protocol WITHOUT round-tripping the credential through
// client_helper (the in-browser privacy property).
//
// Mirrors crescent_tpu/client.py::create_show_proof_client argument for
// argument; the crypto mirrors credentials/{groth16rand,dlog,rangeproof}.py
// and utils/{ark,merlin,poly}.py + models/kzg.py.  Golden-vector tested
// against client.py (sample/client/test/show_vectors.json — seeded
// HashDRBG on both sides makes outputs byte-identical).
//
// Scope: JWT (rs256/rs256-sd) credentials.  Device-bound (T-256 sigma +
// Spartan) and mDL shows still delegate to client_helper.
"use strict";

/* global BN254, CrescentCrypto */
const _B = typeof BN254 !== "undefined" ? BN254 : require("./bn254.js");
const _C = typeof CrescentCrypto !== "undefined" ? CrescentCrypto : require("./crypto.js");

const { FQ, FR, mod, invmod, powmod, G1, G2,
        serG1Compressed, serG1Uncompressed, serG2Uncompressed,
        serFr, serU64, bigToLe, leToBig } = _B;
const { Transcript, sha256, HashDRBG, toB64url, fromB64url } = _C;

const te = (s) => new TextEncoder().encode(s);
const RANGE_PROOF_INTERVAL_BITS = 32;

// ---------------------------------------------------------------------------
// ark reader / writer (utils/ark.py)
// ---------------------------------------------------------------------------

class Reader {
  constructor(buf) { this.buf = buf; this.pos = 0; }
  take(n) {
    if (this.pos + n > this.buf.length) throw new Error("ark: unexpected EOF");
    const b = this.buf.slice(this.pos, this.pos + n);
    this.pos += n;
    return b;
  }
  u8() { return this.take(1)[0]; }
  u64() { return Number(leToBig(this.take(8))); }
  boolean() { const v = this.u8(); if (v > 1) throw new Error("bad bool"); return v === 1; }
  fr() { const v = leToBig(this.take(32)); if (v >= FR) throw new Error("Fr range"); return v; }
  fq() { const v = leToBig(this.take(32)); if (v >= FQ) throw new Error("Fq range"); return v; }
  g1() {
    const raw = this.take(64);
    const flags = raw[63] & 0xc0;
    const r2 = Uint8Array.from(raw); r2[63] &= 0x3f;
    if (flags & 0x40) return null;
    return [leToBig(r2.slice(0, 32)), leToBig(r2.slice(32, 64))];
  }
  g2() {
    const raw = this.take(128);
    const flags = raw[127] & 0xc0;
    const r2 = Uint8Array.from(raw); r2[127] &= 0x3f;
    if (flags & 0x40) return null;
    return [
      [leToBig(r2.slice(0, 32)), leToBig(r2.slice(32, 64))],
      [leToBig(r2.slice(64, 96)), leToBig(r2.slice(96, 128))],
    ];
  }
  fq2() { return [this.fq(), this.fq()]; }
  string() { const n = this.u64(); return new TextDecoder().decode(this.take(n)); }
  vec(item) { const n = this.u64(); const out = []; for (let i = 0; i < n; i++) out.push(item()); return out; }
  option(item) { return this.boolean() ? item() : null; }
}

class Writer {
  constructor() { this.parts = []; }
  raw(b) { this.parts.push(b); }
  bool(v) { this.raw(new Uint8Array([v ? 1 : 0])); }
  u64(x) { this.raw(serU64(x)); }
  fr(x) { this.raw(serFr(x)); }
  g1(pt) { this.raw(serG1Uncompressed(pt)); }
  g2(pt) { this.raw(serG2Uncompressed(pt)); }
  string(s) { const b = te(s); this.u64(b.length); this.raw(b); }
  list(xs, item) { this.u64(xs.length); for (const x of xs) item(x); }
  option(v, item) { if (v === null || v === undefined) this.bool(false); else { this.bool(true); item(v); } }
  bytes() {
    let n = 0;
    for (const p of this.parts) n += p.length;
    const out = new Uint8Array(n);
    let off = 0;
    for (const p of this.parts) { out.set(p, off); off += p.length; }
    return out;
  }
}

// -- creds structures -------------------------------------------------------

function deserProof(r) { return { a: r.g1(), b: r.g2(), c: r.g1() }; }

function deserVk(r) {
  return {
    alphaG1: r.g1(), betaG2: r.g2(), gammaG2: r.g2(),
    deltaG1: r.g1(), deltaG2: r.g2(), gammaAbcG1: r.vec(() => r.g1()),
  };
}

function deserPvk(r) {
  const vk = deserVk(r);
  for (let i = 0; i < 12; i++) r.fq();          // alpha_beta (Fq12)
  for (let k = 0; k < 2; k++) {                 // two G2Prepared
    r.vec(() => { r.fq2(); r.fq2(); r.fq2(); });
    r.boolean();
  }
  return { vk };
}

function deserPedersenOpening(r) {
  return { bases: r.vec(() => r.g1()), m: r.fr(), r: r.fr(), c: r.g1() };
}

function deserClientState(r) {
  const inputs = r.vec(() => r.fr());
  const aux = r.option(() => r.string());
  const proof = deserProof(r);
  const vk = deserVk(r);
  deserPvk(r);
  const icr = r.option(() => r.fr());
  const coo = r.vec(() => deserPedersenOpening(r));
  const credtype = r.string();
  const configStr = r.string();
  return { inputs, aux, proof, vk, credtype, configStr };
}

function deserRangeProofPK(r) {
  return {
    powersOfG: r.vec(() => r.g1()),
    powersOfGammaG: r.vec(() => r.g1()),
  };
}

function serDlogPok(w, d) {
  w.fr(d.c);
  w.list(d.s, (row) => w.list(row, (x) => w.fr(x)));
}

function serKzgCommitment(w, c) { w.g1(c); }
function serKzgProof(w, pf) { w.g1(pf.w); w.option(pf.randomV, (x) => w.fr(x)); }

function serRangeProof(w, rp) {
  serKzgCommitment(w, rp.comF);
  serKzgCommitment(w, rp.comG);
  w.fr(rp.evalG);
  serKzgProof(w, rp.proofG);
  w.fr(rp.evalGw);
  serKzgProof(w, rp.proofGw);
  serKzgCommitment(w, rp.comQ);
  w.fr(rp.evalWHat);
  serKzgProof(w, rp.proofWHat);
  serDlogPok(w, rp.dleqProof);
}

function serShowProof(sp) {
  const w = new Writer();
  // ShowGroth16
  w.g1(sp.showGroth16.randProof.a);
  w.g2(sp.showGroth16.randProof.b);
  w.g1(sp.showGroth16.randProof.c);
  w.g1(sp.showGroth16.comHiddenInputs);
  serDlogPok(w, sp.showGroth16.pokInputs);
  w.list(sp.showGroth16.committedInputs, (p) => w.g1(p));
  // ShowRange exp + attr list
  serRangeProof(w, sp.showRangeExp);
  w.list(sp.showRangeAttr, (r) => serRangeProof(w, r));
  w.list(sp.revealedInputs, (x) => w.fr(x));
  w.option(sp.revealedPreimages, (s) => w.string(s));
  w.u64(sp.inputsLen);
  w.u64(sp.curTime);
  w.option(sp.deviceProof, () => { throw new Error("device-bound unsupported"); });
  return w.bytes();
}

// ---------------------------------------------------------------------------
// polynomials over Fr (utils/poly.py)
// ---------------------------------------------------------------------------

const Poly = {
  trim(p) { let n = p.length; while (n > 0 && mod(p[n - 1], FR) === 0n) n--; return p.slice(0, n); },
  add(p, q) {
    const out = [];
    for (let i = 0; i < Math.max(p.length, q.length); i++)
      out.push(mod((p[i] || 0n) + (q[i] || 0n), FR));
    return Poly.trim(out);
  },
  sub(p, q) {
    const out = [];
    for (let i = 0; i < Math.max(p.length, q.length); i++)
      out.push(mod((p[i] || 0n) - (q[i] || 0n), FR));
    return Poly.trim(out);
  },
  scale(p, k) { return Poly.trim(p.map((c) => mod(c * k, FR))); },
  mul(p, q) {
    if (!p.length || !q.length) return [];
    const out = new Array(p.length + q.length - 1).fill(0n);
    for (let i = 0; i < p.length; i++)
      for (let j = 0; j < q.length; j++)
        out[i + j] = mod(out[i + j] + p[i] * q[j], FR);
    return Poly.trim(out);
  },
  evaluate(p, x) {
    let acc = 0n;
    for (let i = p.length - 1; i >= 0; i--) acc = mod(acc * x + p[i], FR);
    return acc;
  },
  divByLinear(p, a) {
    // p = q*(X - a) + rem
    const q = new Array(Math.max(p.length - 1, 0)).fill(0n);
    let carry = 0n;
    for (let i = p.length - 1; i >= 1; i--) {
      carry = mod(p[i] + carry * a, FR);
      q[i - 1] = carry;
    }
    const rem = mod((p[0] || 0n) + carry * a, FR);
    return [Poly.trim(q), rem];
  },
  divByVanishing(p, n) {
    // divide by X^n - 1
    const out = p.slice();
    const q = [];
    for (let i = out.length - 1; i >= n; i--) {
      const c = out[i];
      q[i - n] = c;
      out[i] = 0n;
      out[i - n] = mod(out[i - n] + c, FR);
    }
    return [Poly.trim(q), Poly.trim(out.slice(0, n))];
  },
  mulByVanishing(p, n) {
    const out = new Array(p.length + n).fill(0n);
    for (let i = 0; i < p.length; i++) {
      out[i + n] = mod(p[i], FR);
      out[i] = mod(out[i] - p[i], FR);
    }
    return Poly.trim(out);
  },
  randPoly(degree, rng) {
    const p = [];
    for (let i = 0; i <= degree; i++) p.push(rng.randrange(FR));
    if (p[p.length - 1] === 0n) p[p.length - 1] = 1n;
    return p;
  },
};

// ---------------------------------------------------------------------------
// KZG10 (models/kzg.py)
// ---------------------------------------------------------------------------

function kzgCommit(powers, p, hidingBound, rng) {
  let com = p.length ? G1.msm(p, powers.powersOfG.slice(0, p.length)) : null;
  let blinding = [];
  if (hidingBound !== null) {
    blinding = Poly.randPoly(hidingBound + 1, rng);
    const hid = G1.msm(blinding, powers.powersOfGammaG.slice(0, blinding.length));
    com = G1.add(com, hid);
  }
  return [com, blinding];
}

function kzgOpen(powers, p, point, blinding) {
  const value = Poly.evaluate(p, point);
  const [quo, rem] = Poly.divByLinear(Poly.sub(p, [value]), point);
  if (rem !== 0n) throw new Error("kzg open: nonzero remainder");
  let w = quo.length ? G1.msm(quo, powers.powersOfG.slice(0, quo.length)) : null;
  let randomV = null;
  if (blinding.length) {
    randomV = Poly.evaluate(blinding, point);
    const [bq, br] = Poly.divByLinear(Poly.sub(blinding, [randomV]), point);
    if (br !== 0n) throw new Error("kzg open: blinding remainder");
    if (bq.length) w = G1.add(w, G1.msm(bq, powers.powersOfGammaG.slice(0, bq.length)));
  }
  return { w, randomV };
}

// ---------------------------------------------------------------------------
// DLogPoK (credentials/dlog.py)
// ---------------------------------------------------------------------------

function dlogChallenge(ts) {
  const b = ts.challengeBytes(new Uint8Array([0]), 31);
  let v = 0n;
  for (let i = 30; i >= 0; i--) v = (v << 8n) | BigInt(b[i]);  // little-endian
  return v;
}

function dlogProve(context, y, bases, scalars, eqPos, rng) {
  const ts = new Transcript(new Uint8Array([0]));
  ts.appendMessage(te("context string"), context || new Uint8Array(0));
  const r = bases.map((bs) => bs.map(() => rng.randrange(FR)));
  if (eqPos) for (const [i, j] of eqPos) r[1][j] = r[0][i];
  for (let i = 0; i < y.length; i++) {
    ts.appendMessage(te("num_bases"), serU64(bases[i].length));
    for (const b of bases[i]) ts.appendMessage(te("base"), serG1Compressed(b));
    const ki = G1.msm(r[i], bases[i]);
    ts.appendMessage(te("k"), serG1Compressed(ki));
    ts.appendMessage(te("y"), serG1Compressed(y[i]));
  }
  const c = dlogChallenge(ts);
  const s = r.map((ri, i) => ri.map((rij, j) => mod(rij - c * scalars[i][j], FR)));
  return { c, s };
}

// ---------------------------------------------------------------------------
// Range proof (credentials/rangeproof.py prove_n_bits)
// ---------------------------------------------------------------------------

// 2^s-th root of unity in Fr via the standard generator 5
function rootOfUnity(n) {
  const twoAdicity = 28n;
  const gen = powmod(5n, (FR - 1n) >> twoAdicity, FR);  // 2^28 root
  let k = 0n, m = BigInt(n);
  while ((1n << k) < m) k++;
  return powmod(gen, 1n << (twoAdicity - k), FR);
}

function ifftHost(evals, w, n) {
  const wInv = invmod(w, FR);
  const nInv = invmod(BigInt(n), FR);
  const out = [];
  for (let k = 0; k < n; k++) {
    let acc = 0n;
    for (let j = 0; j < n; j++)
      acc = mod(acc + evals[j] * powmod(wInv, BigInt(j * k), FR), FR);
    out.push(mod(acc * nInv, FR));
  }
  return Poly.trim(out);
}

function proveNBits(pedOpen, n, powers, rng) {
  const elem = mod(pedOpen.m, FR);
  const w = rootOfUnity(n);
  const domain = [];
  for (let i = 0; i < n; i++) domain.push(powmod(w, BigInt(i), FR));

  const bits = [];
  for (let i = 0; i < n; i++) bits.push((elem >> BigInt(i)) & 1n);
  const f = [elem];

  const gEvals = new Array(n).fill(0n);
  gEvals[n - 1] = bits[n - 1];
  for (let i = n - 2; i >= 0; i--) gEvals[i] = mod(2n * gEvals[i + 1] + bits[i], FR);
  const g = ifftHost(gEvals, w, n);

  const blinding = Poly.mulByVanishing(Poly.randPoly(2, rng), n);
  const gBlinded = Poly.add(g, blinding);
  const gwBlinded = gBlinded.map((c, i) => mod(c * domain[i % n], FR));

  const [q1, rem1] = Poly.divByLinear(Poly.sub(gBlinded, f), 1n);
  if (rem1 !== 0n) throw new Error("q1 remainder");
  const [q2, rem2] = Poly.divByLinear(
    Poly.mul(gBlinded, Poly.sub([1n], gBlinded)), domain[n - 1]);
  if (rem2 !== 0n) throw new Error("q2 remainder");
  const g2gw = Poly.sub(gBlinded, Poly.scale(gwBlinded, 2n));
  let w3 = Poly.mul(g2gw, Poly.sub([1n], g2gw));
  w3 = Poly.mul(w3, [mod(-domain[n - 1], FR), 1n]);
  const [q3, rem3] = Poly.divByVanishing(w3, n);
  if (rem3.length) throw new Error("q3 remainder");

  const [comF, randF] = kzgCommit(powers, f, 1, rng);

  const comFBasis = powers.powersOfGammaG.slice(0, 3).concat([powers.powersOfG[0]]);
  const comFScalars = randF.concat([elem]);

  const dleqProof = dlogProve(
    null,
    [pedOpen.c, comF],
    [pedOpen.bases.slice(), comFBasis],
    [[pedOpen.m, pedOpen.r], comFScalars],
    [[0, 3]],
    rng,
  );

  const [comG, randG] = kzgCommit(powers, gBlinded, 2, rng);

  const ts = new Transcript(new Uint8Array([0]));
  ts.appendMessage(te("com_f"), serG1Compressed(comF));
  ts.appendMessage(te("com_g"), serG1Compressed(comG));
  const c = dlogChallenge(ts);

  const q = Poly.add(Poly.add(q1, Poly.scale(q2, c)), Poly.scale(q3, mod(c * c, FR)));
  const [comQ, randQ] = kzgCommit(powers, q, 1, rng);

  ts.appendMessage(te("com_q"), serG1Compressed(comQ));
  const rho = dlogChallenge(ts);

  const evalG = Poly.evaluate(gBlinded, rho);
  const proofG = kzgOpen(powers, gBlinded, rho, randG);
  const rhoW = mod(rho * w, FR);
  const evalGw = Poly.evaluate(gBlinded, rhoW);
  const proofGw = kzgOpen(powers, gBlinded, rhoW, randG);

  const qCoeff = mod(powmod(rho, BigInt(n), FR) - 1n, FR);
  const fCoeff = mod(qCoeff * invmod(rho - 1n, FR), FR);
  const wHat = Poly.add(Poly.scale(f, fCoeff), Poly.scale(q, qCoeff));
  const randWHat = Poly.add(Poly.scale(randF, fCoeff), Poly.scale(randQ, qCoeff));
  const evalWHat = Poly.evaluate(wHat, rho);
  const proofWHat = kzgOpen(powers, wHat, rho, randWHat);

  return { comF, comG, evalG, proofG, evalGw, proofGw, comQ, evalWHat,
           proofWHat, dleqProof };
}

// ---------------------------------------------------------------------------
// Groth16 rerandomize + show (models/groth16.py + credentials/groth16rand.py)
// ---------------------------------------------------------------------------

function rerandomizeProof(vk, proof, rng) {
  const r1 = rng.randrange(1n, FR);
  const r2 = rng.randrange(FR);
  const a2 = G1.mul(r1, proof.a);
  const b2 = G2.add(G2.mul(invmod(r1, FR), proof.b), G2.mul(r2, vk.deltaG2));
  const c2 = G1.add(proof.c, G1.mul(mod(r1 * r2, FR), proof.a));
  return { a: a2, b: b2, c: c2 };
}

const IO_REVEALED = 0, IO_HIDDEN = 1, IO_COMMITTED = 2;

function showGroth16(clientState, context, ioTypes, rng) {
  const vk = clientState.vk;
  const randProof0 = rerandomizeProof(vk, clientState.proof, rng);

  const committedOpenings = [];
  const y = [], bases = [], scalars = [];
  const hiddenBases = [], hiddenScalars = [];
  let accR = 0n;
  for (let i = 0; i < ioTypes.length; i++) {
    const t = ioTypes[i];
    if (t === IO_REVEALED) continue;
    if (t === IO_HIDDEN) {
      hiddenBases.push(vk.gammaAbcG1[i + 1]);
      hiddenScalars.push(clientState.inputs[i]);
    } else {
      const r = rng.randrange(FR);
      accR = mod(accR + r, FR);
      const pedBases = [vk.gammaAbcG1[i + 1], vk.deltaG1];
      const c = G1.msm([r, clientState.inputs[i]], [vk.deltaG1, vk.gammaAbcG1[i + 1]]);
      bases.push(pedBases.slice());
      scalars.push([clientState.inputs[i], r]);
      y.push(c);
      committedOpenings.push({ bases: pedBases, m: clientState.inputs[i], r, c });
    }
  }

  const z = rng.randrange(FR);
  hiddenScalars.push(z);
  hiddenBases.push(vk.deltaG1);
  const comHidden = G1.msm(hiddenScalars, hiddenBases);

  scalars.push(hiddenScalars);
  bases.push(hiddenBases);
  y.push(comHidden);

  const cAdj = G1.add(randProof0.c,
    G1.neg(G1.mul(mod(accR + z, FR), G1.generator)));
  const randProof = { a: randProof0.a, b: randProof0.b, c: cAdj };

  const pokInputs = dlogProve(context, y, bases, scalars, null, rng);

  return {
    show: {
      randProof,
      comHiddenInputs: comHidden,
      pokInputs,
      committedInputs: committedOpenings.map((o) => o.c),
    },
    committedOpenings,
  };
}

// ---------------------------------------------------------------------------
// Proof-spec plumbing (credentials/prep_inputs.py + api.py)
// ---------------------------------------------------------------------------

const CRESCENT_CONFIG_KEYS = new Set(["alg", "credtype", "max_cred_len", "device_bound"]);

function parseIoLocations(s) {
  const locs = {};
  for (const line of s.split("\n")) {
    if (!line.trim()) continue;
    const [k, v] = line.split(",");
    locs[k] = parseInt(v, 10);
  }
  return locs;
}

function publicKeyIndices(locs) {
  return Object.keys(locs).sort()
    .filter((k) => k.startsWith("modulus") || k.startsWith("pubkey"))
    .map((k) => locs[k] - 1)
    .sort((a, b) => a - b);
}

function proofSpecInternal(spec, configStr) {
  const config = JSON.parse(configStr);
  const revealed = [], hashed = [];
  const claimTypes = {};
  for (const [k, v] of Object.entries(config)) {
    if (CRESCENT_CONFIG_KEYS.has(k)) continue;
    if (v && typeof v === "object" && typeof v.type === "string") claimTypes[k] = v.type;
  }
  for (const attr of spec.revealed || []) {
    if (!(attr in config)) throw new Error(`Attribute ${attr} not in config`);
    if (config[attr].reveal_digest) hashed.push(attr);
    else revealed.push(attr);
  }
  return {
    revealed, hashed,
    rangeOverYear: spec.range_over_year ? Object.entries(spec.range_over_year) : [],
    presentationMessage: spec.presentation_message || null,
    deviceBound: !!spec.device_bound,
    configStr, claimTypes,
  };
}

function contextJson(psi) {
  // mirrors api._context_json: serde_json field order, compact separators
  const d = {
    revealed: psi.revealed,
    range_over_year: psi.rangeOverYear.map(([k, v]) => [k, v]),
    hashed: psi.hashed,
    presentation_message: psi.presentationMessage
      ? Array.from(psi.presentationMessage) : null,
    device_bound: psi.deviceBound,
    config_str: psi.configStr,
    claim_types: Object.fromEntries(
      Object.entries(psi.claimTypes).sort(([a], [b]) => (a < b ? -1 : a > b ? 1 : 0))
    ),
  };
  return te(JSON.stringify(d));
}

// ---------------------------------------------------------------------------
// create_show_proof_client (client.py / wasm_lib.rs:46-159)
// ---------------------------------------------------------------------------

// client_helper's GET /getshowdata returns ONE b64url blob of
// ser_client_state || ser_range_proof_pk (services.py _showdata_b64url,
// mirroring client_helper main.rs:259).  Re-split it at the ark boundary
// into the two arguments createShowProofClient takes; `credtype` lets the
// caller route mdl/device-bound shows back to client_helper.
function splitShowData(showDataB64url) {
  const buf = fromB64url(showDataB64url);
  const r = new Reader(buf);
  const cs = deserClientState(r);
  return {
    clientStateB64url: toB64url(buf.slice(0, r.pos)),
    rangePkB64url: toB64url(buf.slice(r.pos)),
    credtype: cs.credtype,
    deviceBound: /"device_bound"\s*:\s*true/.test(cs.configStr),
  };
}

function createShowProofClient(
  clientStateB64url, rangePkB64url, ioLocationsStr, discUid, challenge,
  proofSpecB64url, opts
) {
  opts = opts || {};
  for (const [name, v] of [
    ["client_state_b64url", clientStateB64url],
    ["range_pk_b64url", rangePkB64url],
    ["disc_uid", discUid],
    ["io_locations_str", ioLocationsStr],
    ["challenge", challenge],
    ["proof_spec", proofSpecB64url],
  ]) {
    if (!v) throw new Error(`Received empty ${name}`);
  }
  const rng = opts.rng || new HashDRBG(crypto.getRandomValues(new Uint8Array(32)));
  const curTime = opts.curTime !== undefined
    ? opts.curTime : Math.floor(Date.now() / 1000);

  const clientState = deserClientState(new Reader(fromB64url(clientStateB64url)));
  const rangePk = deserRangeProofPK(new Reader(fromB64url(rangePkB64url)));
  const ioLocations = parseIoLocations(ioLocationsStr);
  const spec = JSON.parse(new TextDecoder().decode(fromB64url(proofSpecB64url)));

  // presentation message = SHA-256 of the verifier challenge (wasm_lib.rs:105)
  spec.presentation_message = Array.from(sha256(te(challenge)));

  if (clientState.credtype === "mdl")
    throw new Error("mdl show not supported in-browser yet (use client_helper)");
  if (spec.device_bound)
    throw new Error("device-bound show not supported in-browser yet");

  const psi = proofSpecInternal(spec, clientState.configStr);

  // io_types (api.create_show_proof)
  const expPos = ioLocations["exp_value"];
  const ioTypes = new Array(clientState.inputs.length).fill(IO_HIDDEN);
  ioTypes[expPos - 1] = IO_COMMITTED;
  for (const i of publicKeyIndices(ioLocations)) ioTypes[i] = IO_REVEALED;

  const revealedInputs = [];
  for (const attr of psi.revealed) {
    const loc = ioLocations[`${attr}_value`];
    ioTypes[loc - 1] = IO_REVEALED;
    revealedInputs.push(clientState.inputs[loc - 1]);
  }

  const revealedPreimages = {};
  for (const attr of psi.hashed) {
    const loc = ioLocations[`${attr}_digest`];
    ioTypes[loc - 1] = IO_REVEALED;
    if (clientState.aux === null)
      throw new Error(`hashed attribute ${attr} needs aux data`);
    const aux = JSON.parse(clientState.aux);
    revealedPreimages[attr] = JSON.stringify(aux[attr]);
  }

  const context = contextJson(psi);
  const { show, committedOpenings } = showGroth16(clientState, context, ioTypes, rng);

  // range proof: exp - cur_time is 32-bit (not expired)
  const comExp = committedOpenings[0];
  const t = BigInt(curTime);
  const shifted = {
    bases: comExp.bases.slice(),
    m: mod(comExp.m - t, FR),
    r: comExp.r,
    c: G1.add(comExp.c, G1.neg(G1.mul(t, comExp.bases[0]))),
  };
  if (shifted.m >= (1n << BigInt(RANGE_PROOF_INTERVAL_BITS)))
    throw new Error("value out of range (expired credential?)");
  const showRangeExp = proveNBits(shifted, RANGE_PROOF_INTERVAL_BITS, rangePk, rng);

  const showProof = {
    showGroth16: show,
    showRangeExp,
    showRangeAttr: [],
    revealedInputs,
    revealedPreimages: psi.hashed.length ? JSON.stringify(revealedPreimages) : null,
    inputsLen: clientState.inputs.length,
    curTime,
    deviceProof: null,
  };
  return toB64url(serShowProof(showProof));
}

const CrescentShow = {
  Reader, Writer, deserClientState, deserRangeProofPK, serShowProof,
  Poly, kzgCommit, kzgOpen, dlogProve, proveNBits, rerandomizeProof,
  showGroth16, proofSpecInternal, contextJson, createShowProofClient,
  splitShowData,
};
if (typeof module !== "undefined") module.exports = CrescentShow;
if (typeof globalThis !== "undefined") globalThis.CrescentShow = CrescentShow;
