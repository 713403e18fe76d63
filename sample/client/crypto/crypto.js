// Hash / transcript / RNG primitives for the in-browser show prover.
//
// Mirrors crescent_tpu/utils/{keccak,merlin,drbg}.py (which mirror the
// reference's merlin v3 STROBE-128 framing — creds/src/utils.rs:29 uses
// merlin::Transcript for every Fiat-Shamir challenge).  Pure vanilla JS
// (BigInt lanes for Keccak), no dependencies; golden-vector tested against
// client.py (sample/client/test/show_vectors.json).
"use strict";

// --------------------------------------------------------------------------
// Keccak-f[1600]
// --------------------------------------------------------------------------

const KECCAK_RC = [
  0x0000000000000001n, 0x0000000000008082n, 0x800000000000808an,
  0x8000000080008000n, 0x000000000000808bn, 0x0000000080000001n,
  0x8000000080008081n, 0x8000000000008009n, 0x000000000000008an,
  0x0000000000000088n, 0x0000000080008009n, 0x000000008000000an,
  0x000000008000808bn, 0x800000000000008bn, 0x8000000000008089n,
  0x8000000000008003n, 0x8000000000008002n, 0x8000000000000080n,
  0x000000000000800an, 0x800000008000000an, 0x8000000080008081n,
  0x8000000000008080n, 0x0000000080000001n, 0x8000000080008008n,
];
const M64 = (1n << 64n) - 1n;
const ROTC = [
  [0, 36, 3, 41, 18],
  [1, 44, 10, 45, 2],
  [62, 6, 43, 15, 61],
  [28, 55, 25, 21, 56],
  [27, 20, 39, 8, 14],
];

function rotl64(x, n) {
  n = BigInt(n);
  return ((x << n) | (x >> (64n - n))) & M64;
}

// state: Uint8Array(200), permuted in place
function keccakF1600(state) {
  const A = new Array(25);
  for (let i = 0; i < 25; i++) {
    let v = 0n;
    for (let j = 7; j >= 0; j--) v = (v << 8n) | BigInt(state[i * 8 + j]);
    A[i] = v;
  }
  const C = new Array(5);
  const B = new Array(25);
  for (let round = 0; round < 24; round++) {
    for (let x = 0; x < 5; x++)
      C[x] = A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20];
    for (let x = 0; x < 5; x++) {
      const D = C[(x + 4) % 5] ^ rotl64(C[(x + 1) % 5], 1);
      for (let y = 0; y < 5; y++) A[x + 5 * y] ^= D;
    }
    for (let x = 0; x < 5; x++)
      for (let y = 0; y < 5; y++)
        B[y + 5 * (((2 * x + 3 * y) % 5))] = rotl64(A[x + 5 * y], ROTC[x][y]);
    for (let x = 0; x < 5; x++)
      for (let y = 0; y < 5; y++)
        A[x + 5 * y] = B[x + 5 * y] ^ ((~B[(x + 1) % 5 + 5 * y] & M64) & B[(x + 2) % 5 + 5 * y]);
    A[0] ^= KECCAK_RC[round];
  }
  for (let i = 0; i < 25; i++) {
    let v = A[i];
    for (let j = 0; j < 8; j++) {
      state[i * 8 + j] = Number(v & 0xffn);
      v >>= 8n;
    }
  }
}

// --------------------------------------------------------------------------
// STROBE-128 + merlin Transcript (utils/merlin.py)
// --------------------------------------------------------------------------

const STROBE_R = 166;
const FLAG_I = 1, FLAG_A = 2, FLAG_C = 4, FLAG_T = 8, FLAG_M = 16, FLAG_K = 32;

class Strobe128 {
  constructor(protocolLabel) {
    const st = new Uint8Array(200);
    st.set([1, STROBE_R + 2, 1, 0, 1, 96], 0);
    st.set(new TextEncoder().encode("STROBEv1.0.2"), 6);
    keccakF1600(st);
    this.state = st;
    this.pos = 0;
    this.posBegin = 0;
    this.curFlags = 0;
    this.metaAd(protocolLabel, false);
  }
  _runF() {
    this.state[this.pos] ^= this.posBegin;
    this.state[this.pos + 1] ^= 0x04;
    this.state[STROBE_R + 1] ^= 0x80;
    keccakF1600(this.state);
    this.pos = 0;
    this.posBegin = 0;
  }
  _absorb(data) {
    for (const b of data) {
      this.state[this.pos] ^= b;
      if (++this.pos === STROBE_R) this._runF();
    }
  }
  _squeeze(n) {
    const out = new Uint8Array(n);
    for (let i = 0; i < n; i++) {
      out[i] = this.state[this.pos];
      this.state[this.pos] = 0;
      if (++this.pos === STROBE_R) this._runF();
    }
    return out;
  }
  _beginOp(flags, more) {
    if (more) {
      if (this.curFlags !== flags) throw new Error("strobe flag mismatch");
      return;
    }
    const oldBegin = this.posBegin;
    this.posBegin = this.pos + 1;
    this.curFlags = flags;
    this._absorb([oldBegin, flags]);
    if ((flags & (FLAG_C | FLAG_K)) !== 0 && this.pos !== 0) this._runF();
  }
  metaAd(data, more) { this._beginOp(FLAG_M | FLAG_A, more); this._absorb(data); }
  ad(data, more) { this._beginOp(FLAG_A, more); this._absorb(data); }
  prf(n, more) { this._beginOp(FLAG_I | FLAG_A | FLAG_C, more); return this._squeeze(n); }
}

function u32le(x) {
  return new Uint8Array([x & 255, (x >> 8) & 255, (x >> 16) & 255, (x >> 24) & 255]);
}

class Transcript {
  // merlin: Transcript::new(label) == strobe("Merlin v1.0") then
  // append_message(b"dom-sep", label)
  constructor(labelBytes) {
    this.strobe = new Strobe128(new TextEncoder().encode("Merlin v1.0"));
    this.appendMessage(new TextEncoder().encode("dom-sep"), labelBytes);
  }
  appendMessage(label, message) {
    this.strobe.metaAd(label, false);
    this.strobe.metaAd(u32le(message.length), true);
    this.strobe.ad(message, false);
  }
  challengeBytes(label, n) {
    this.strobe.metaAd(label, false);
    this.strobe.metaAd(u32le(n), true);
    return this.strobe.prf(n, false);
  }
}

// --------------------------------------------------------------------------
// SHA-256 (for the presentation message + DRBG)
// --------------------------------------------------------------------------

const SHA_K = new Uint32Array([
  0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
  0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
  0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
  0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
  0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
  0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
  0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
  0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
  0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
  0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
  0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]);

function sha256(data) {
  const len = data.length;
  const bitLen = len * 8;
  const padded = new Uint8Array((((len + 8) >> 6) + 1) << 6);
  padded.set(data);
  padded[len] = 0x80;
  const dv = new DataView(padded.buffer);
  dv.setUint32(padded.length - 4, bitLen >>> 0);
  dv.setUint32(padded.length - 8, Math.floor(bitLen / 4294967296));
  const H = new Uint32Array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
  ]);
  const w = new Uint32Array(64);
  for (let off = 0; off < padded.length; off += 64) {
    for (let i = 0; i < 16; i++) w[i] = dv.getUint32(off + 4 * i);
    for (let i = 16; i < 64; i++) {
      const s0 = ((w[i-15] >>> 7) | (w[i-15] << 25)) ^ ((w[i-15] >>> 18) | (w[i-15] << 14)) ^ (w[i-15] >>> 3);
      const s1 = ((w[i-2] >>> 17) | (w[i-2] << 15)) ^ ((w[i-2] >>> 19) | (w[i-2] << 13)) ^ (w[i-2] >>> 10);
      w[i] = (w[i-16] + s0 + w[i-7] + s1) >>> 0;
    }
    let [a, b, c, d, e, f, g, h] = H;
    for (let i = 0; i < 64; i++) {
      const S1 = ((e >>> 6) | (e << 26)) ^ ((e >>> 11) | (e << 21)) ^ ((e >>> 25) | (e << 7));
      const ch = (e & f) ^ (~e & g);
      const t1 = (h + S1 + ch + SHA_K[i] + w[i]) >>> 0;
      const S0 = ((a >>> 2) | (a << 30)) ^ ((a >>> 13) | (a << 19)) ^ ((a >>> 22) | (a << 10));
      const maj = (a & b) ^ (a & c) ^ (b & c);
      const t2 = (S0 + maj) >>> 0;
      h = g; g = f; f = e; e = (d + t1) >>> 0;
      d = c; c = b; b = a; a = (t1 + t2) >>> 0;
    }
    H[0] = (H[0] + a) >>> 0; H[1] = (H[1] + b) >>> 0;
    H[2] = (H[2] + c) >>> 0; H[3] = (H[3] + d) >>> 0;
    H[4] = (H[4] + e) >>> 0; H[5] = (H[5] + f) >>> 0;
    H[6] = (H[6] + g) >>> 0; H[7] = (H[7] + h) >>> 0;
  }
  const out = new Uint8Array(32);
  const odv = new DataView(out.buffer);
  for (let i = 0; i < 8; i++) odv.setUint32(4 * i, H[i]);
  return out;
}

// --------------------------------------------------------------------------
// HashDRBG — deterministic stream shared with utils/drbg.py
// --------------------------------------------------------------------------

class HashDRBG {
  constructor(seed) {
    this.seed = typeof seed === "string" ? new TextEncoder().encode(seed) : seed;
    this.ctr = 0;
    this.buf = new Uint8Array(0);
  }
  _take(n) {
    while (this.buf.length < n) {
      const inp = new Uint8Array(this.seed.length + 4);
      inp.set(this.seed);
      inp.set(u32le(this.ctr), this.seed.length);
      this.ctr += 1;
      const block = sha256(inp);
      const nb = new Uint8Array(this.buf.length + 32);
      nb.set(this.buf);
      nb.set(block, this.buf.length);
      this.buf = nb;
    }
    const out = this.buf.slice(0, n);
    this.buf = this.buf.slice(n);
    return out;
  }
  // randrange(n) / randrange(a, b): big-endian bytes mod span
  randrange(a, b) {
    let lo, hi;
    if (b === undefined) { lo = 0n; hi = BigInt(a); }
    else { lo = BigInt(a); hi = BigInt(b); }
    const span = hi - lo;
    if (span <= 0n) throw new Error("empty range");
    const nbytes = Math.floor((span.toString(2).length + 7) / 8) + 8;
    const bytes = this._take(nbytes);
    let v = 0n;
    for (const x of bytes) v = (v << 8n) | BigInt(x);
    return lo + (v % span);
  }
}

// --------------------------------------------------------------------------
// b64url
// --------------------------------------------------------------------------

function toB64url(bytes) {
  let bin = "";
  for (const b of bytes) bin += String.fromCharCode(b);
  return btoa(bin).replace(/\+/g, "-").replace(/\//g, "_").replace(/=+$/, "");
}

function fromB64url(s) {
  s = s.replace(/-/g, "+").replace(/_/g, "/");
  while (s.length % 4) s += "=";
  const bin = atob(s);
  const out = new Uint8Array(bin.length);
  for (let i = 0; i < bin.length; i++) out[i] = bin.charCodeAt(i);
  return out;
}

const CrescentCrypto = {
  keccakF1600, Strobe128, Transcript, sha256, HashDRBG,
  toB64url, fromB64url, u32le,
};
if (typeof module !== "undefined") module.exports = CrescentCrypto;
if (typeof globalThis !== "undefined") globalThis.CrescentCrypto = CrescentCrypto;
