// Service endpoints (reference: sample/client/src/config.ts + .env).
// The four sample services bind the same ports as the reference Rocket
// deployment: setup 8002, issuer 8001, client helper 8003, verifier 8004.
export default {
  clientHelperUrl: 'http://localhost:8003',
  setupUrl: 'http://localhost:8002',
  // poll /status every 5 s while the slow Groth16 prove runs in the
  // client helper (reference .env PREPARE_POLL_INTERVAL)
  pollInterval: 5000,
  // true  -> ask the client helper to build the show proof (GET /show),
  //          the reference's server-side fallback (client_helper main.rs:271).
  // false -> fetch ShowData once after prepare and prove IN-BROWSER via
  //          crypto/show.js (the reference's wasm_lib.rs:46 mode as vanilla
  //          JS; golden-vector tested against client.py — see
  //          crypto/README.md).  The credential then never leaves the
  //          extension after prepare.  mdl / device-bound shows
  //          auto-fall-back to the helper (not ported in-browser yet).
  clientHelperShowProof: true
}
