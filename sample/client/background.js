// Background service worker: wallet orchestration (reference:
// sample/client/src/background.ts + the background half of clientHelper.ts).
//
// Flow (SURVEY.md §3.5):
//   content 'import-card'  -> store the credential (status NEW)
//   popup   'prepare'      -> POST client-helper /prepare, poll /status
//                             until the slow Groth16 prove finishes, cache
//                             ShowData, mark PREPARED
//   popup   'disclose'     -> GET client-helper /show (server-side show;
//                             the reference's wasm in-browser prover is the
//                             other mode, creds/src/wasm_lib.rs:46), then
//                             hand the proof to the content script to POST
//                             to the verifier page's crescent_verify_url.

import config from './config.js'
import * as helper from './clientHelper.js'
import { putCred, getCred, allCreds, removeCred } from './store.js'

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

async function handleDisclose (id, disclosure) {
  const cred = await getCred(id)
  if (!cred || cred.status !== 'PREPARED') throw new Error('credential not prepared')
  const proof = await helper.show(
    cred.credUid, disclosure.uid, disclosure.challenge, disclosure.proofSpec || null
  )
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
