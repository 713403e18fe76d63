// Background service worker: wallet orchestration (reference:
// sample/client/src/background.ts + the background half of clientHelper.ts).
//
// Flow (SURVEY.md §3.5):
//   content 'import-card'  -> store the credential (status NEW)
//   popup   'prepare'      -> POST client-helper /prepare, poll /status
//                             until the slow Groth16 prove finishes, cache
//                             ShowData, mark PREPARED
//   popup   'disclose'     -> build the show proof and hand it to the
//                             content script to POST to the verifier page's
//                             crescent_verify_url.  Two modes, matching the
//                             reference (creds/src/wasm_lib.rs:46 in-browser
//                             vs client_helper main.rs:271 server-side):
//                             config.clientHelperShowProof=false proves
//                             IN-BROWSER via crypto/show.js (the credential
//                             never leaves the extension after prepare);
//                             =true asks client-helper GET /show.

import config from './config.js'
import * as helper from './clientHelper.js'
import { putCred, getCred, allCreds, removeCred } from './store.js'
// side-effect imports: define globalThis.CrescentCrypto / BN254 / CrescentShow
// (plain-script modules shared with the file:// golden-vector test pages)
import './crypto/crypto.js'
import './crypto/bn254.js'
import './crypto/show.js'

// sample/common.py disc_uid_to_proof_spec — the default spec when the
// verifier page has no crescent_proof_spec meta tag
function defaultProofSpec (discUid) {
  if (discUid === 'crescent://email_domain') return '{"revealed": ["email"]}'
  if (discUid === 'crescent://selective_disclosure') return '{"revealed": ["family_name"]}'
  const m = /^crescent:\/\/over_(\d+)$/.exec(discUid)
  if (m) return `{"revealed": [], "range_over_year": {"birth_date": ${m[1]}}}`
  throw new Error(`unknown disclosure uid ${discUid}`)
}

async function handleImport (msg) {
  const id = await sha256hex(msg.jwt)
  const existing = await getCred(id)
  if (existing) return existing.id
  await putCred({
    id,
    domain: msg.domain,
    schemaUid: msg.schemaUid,
    jwt: msg.jwt,
    credUid: null,
    status: 'NEW',
    showData: null,
    created: Date.now()
  })
  return id
}

async function handlePrepare (id) {
  const cred = await getCred(id)
  if (!cred) throw new Error('unknown credential')
  const credUid = await helper.prepare(cred.domain, cred.jwt, cred.schemaUid)
  cred.credUid = credUid
  cred.status = 'PREPARING'
  await putCred(cred)
  helper.pollUntilReady(credUid).then(
    async () => {
      if (!config.clientHelperShowProof) {
        cred.showData = await helper.getShowData(credUid)
        cred.ioLocations = await helper.getIoLocations()
      }
      cred.status = 'PREPARED'
      await putCred(cred)
    },
    async (err) => {
      cred.status = 'ERROR'
      cred.error = String(err)
      await putCred(cred)
    }
  )
  return credUid
}

// In-browser show (wasm_lib.rs:46 semantics): the cached ShowData blob is
// split into client state + range pk and proved locally with crypto/show.js.
// Returns null when this credential needs the server-side path (mdl /
// device-bound shows are not ported yet — crypto/README.md scope note).
function localShowProof (cred, disclosure) {
  const sd = CrescentShow.splitShowData(cred.showData)
  if (sd.credtype === 'mdl' || sd.deviceBound) return null
  const specStr = disclosure.proofSpec
    ? null : defaultProofSpec(disclosure.uid)
  const proofSpecB64 = disclosure.proofSpec ||
    CrescentCrypto.toB64url(new TextEncoder().encode(specStr))
  return CrescentShow.createShowProofClient(
    sd.clientStateB64url, sd.rangePkB64url, cred.ioLocations,
    disclosure.uid, disclosure.challenge, proofSpecB64
  )
}

async function handleDisclose (id, disclosure) {
  const cred = await getCred(id)
  if (!cred || cred.status !== 'PREPARED') throw new Error('credential not prepared')
  let proof = null
  if (!config.clientHelperShowProof && cred.showData && cred.ioLocations) {
    proof = localShowProof(cred, disclosure)
  }
  if (proof === null) {
    proof = await helper.show(
      cred.credUid, disclosure.uid, disclosure.challenge, disclosure.proofSpec || null
    )
  }
  // deliver to the active tab's content script, which POSTs to the verifier
  const [tab] = await chrome.tabs.query({ active: true, currentWindow: true })
  if (tab) {
    chrome.tabs.sendMessage(tab.id, {
      action: 'send-proof',
      url: disclosure.url,
      proof,
      proofSpec: disclosure.proofSpec || null,
      challenge: disclosure.challenge
    })
  }
  return true
}

async function handleRemove (id) {
  const cred = await getCred(id)
  if (cred && cred.credUid) await helper.remove(cred.credUid)
  await removeCred(id)
}

async function sha256hex (text) {
  const digest = await crypto.subtle.digest('SHA-256', new TextEncoder().encode(text))
  return Array.from(new Uint8Array(digest), (b) => b.toString(16).padStart(2, '0')).join('')
}

chrome.runtime.onMessage.addListener((msg, _sender, sendResponse) => {
  const route = {
    'import-card': () => handleImport(msg),
    'list-creds': () => allCreds(),
    prepare: () => handlePrepare(msg.id),
    disclose: () => handleDisclose(msg.id, msg.disclosure),
    remove: () => handleRemove(msg.id)
  }[msg.action]
  if (!route) return false
  route().then(
    (value) => sendResponse({ ok: true, value }),
    (error) => sendResponse({ ok: false, error: String(error) })
  )
  return true // async sendResponse
})
