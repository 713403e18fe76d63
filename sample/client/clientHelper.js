// REST client for the client-helper service (reference:
// sample/client/src/clientHelper.ts; service routes defined in
// crescent_tpu/sample/services.py ClientHelperService — POST /prepare,
// GET /status, /getshowdata, /show, /delete).

import config from './config.js'

async function asJson (response) {
  const text = await response.text()
  try { return JSON.parse(text) } catch { return text }
}

export async function prepare (issuerUrl, jwt, schemaUid) {
  const response = await fetch(`${config.clientHelperUrl}/prepare`, {
    method: 'POST',
    headers: { 'Content-Type': 'application/json' },
    body: JSON.stringify({ issuer_url: issuerUrl, cred: jwt, schema_uid: schemaUid })
  })
  const body = await asJson(response)
  if (!response.ok || !body.cred_uid) {
    throw new Error(`prepare failed: ${JSON.stringify(body)}`)
  }
  return body.cred_uid
}

export async function status (credUid) {
  const response = await fetch(
    `${config.clientHelperUrl}/status?cred_uid=${encodeURIComponent(credUid)}`
  )
  const body = await asJson(response)
  return body.status || 'unknown'
}

// resolves when the background prove completes; rejects on error/unknown
export function pollUntilReady (credUid, onTick) {
  return new Promise((resolve, reject) => {
    const timer = setInterval(async () => {
      let s
      try { s = await status(credUid) } catch (e) { s = `error: ${e}` }
      if (onTick) onTick(s)
      if (s === 'ready') { clearInterval(timer); resolve(credUid) }
      else if (s !== 'preparing') { clearInterval(timer); reject(new Error(String(s))) }
    }, config.pollInterval)
  })
}

export async function getShowData (credUid) {
  const response = await fetch(
    `${config.clientHelperUrl}/getshowdata?cred_uid=${encodeURIComponent(credUid)}`
  )
  if (!response.ok) throw new Error(`getshowdata failed (${response.status})`)
  return await response.text() // b64url ShowData blob
}

export async function getIoLocations () {
  // io_locations.sym from the setup service's shared-params tree
  // (reference: sample/setup_service static file serving; the verifier
  // gets the same string inside /verifier_params)
  const response = await fetch(`${config.setupUrl}/prove_params/io_locations.sym`)
  if (!response.ok) throw new Error(`io_locations fetch failed (${response.status})`)
  return await response.text()
}

export async function show (credUid, discUid, challenge, proofSpecB64) {
  const qs = new URLSearchParams({ cred_uid: credUid, disc_uid: discUid, challenge })
  if (proofSpecB64) qs.set('proof_spec', proofSpecB64)
  const response = await fetch(`${config.clientHelperUrl}/show?${qs}`)
  if (!response.ok) {
    throw new Error(`show failed: ${JSON.stringify(await asJson(response))}`)
  }
  return await response.text() // b64url ShowProof
}

export async function remove (credUid) {
  await fetch(
    `${config.clientHelperUrl}/delete?cred_uid=${encodeURIComponent(credUid)}`
  ).catch(() => {})
}
