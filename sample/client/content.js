// Content script: runs in every sample page.
//
// Two jobs (reference: sample/client/src/content.ts):
//  1. issuer pages embed the credential in <meta name="CRESCENT_JWT">
//     (issuer main.rs:168-244) -> import it into the wallet;
//  2. verifier pages announce a disclosure request via the
//     crescent_verify_url / crescent_disclosure_uid / crescent_challenge /
//     crescent_proof_spec meta tags -> the popup asks us to scan them, and
//     the background hands us the finished proof to POST to the verifier.

function getNamedMeta (name) {
  const el = document.querySelector(`meta[name="${name}"]`)
  return el ? (el.getAttribute('content') || '') : ''
}

// the reference verifier emits these as attribute-style tags
// (<meta crescent_challenge="...">); our sample uses name= — accept both
function getMetaTag (name) {
  const byAttr = document.querySelector(`meta[${name}]`)
  if (byAttr) return byAttr.getAttribute(name) || ''
  return getNamedMeta(name)
}

function scanForCredential () {
  const jwt = getNamedMeta('CRESCENT_JWT')
  if (jwt) {
    const domain = new URL(window.location.href).origin
    chrome.runtime.sendMessage({
      action: 'import-card',
      domain,
      schemaUid: getNamedMeta('CRESCENT_SCHEMA_UID') || 'jwt_corporate_1',
      jwt
    })
  }
}

function queryDisclosureRequest () {
  const url = getMetaTag('crescent_verify_url')
  const uid = getMetaTag('crescent_disclosure_uid')
  const challenge = getMetaTag('crescent_challenge')
  const proofSpec = getMetaTag('crescent_proof_spec')
  if (url && uid && challenge) {
    return { url, uid, challenge, proofSpec, origin: window.location.origin }
  }
  return null
}

chrome.runtime.onMessage.addListener((request, _sender, sendResponse) => {
  if (request.action === 'scan-disclosure') {
    sendResponse(queryDisclosureRequest())
    return
  }
  if (request.action === 'send-proof') {
    // POST the show proof to the verifier; on success follow the redirect
    // (reference content.ts send-proof listener)
    const target = new URL(request.url, window.location.origin).href
    fetch(target, {
      method: 'POST',
      headers: { 'Content-Type': 'application/json' },
      body: JSON.stringify({
        proof: request.proof,
        proof_spec: request.proofSpec,
        challenge: request.challenge
      }),
      redirect: 'follow'
    })
      .then(async (response) => {
        if (response.redirected) {
          window.location.href = response.url
          return
        }
        const body = await response.json().catch(() => ({}))
        chrome.runtime.sendMessage({ action: 'verify-result', result: body })
      })
      .catch((error) => console.error('crescent: error sending proof', error))
  }
})

scanForCredential()
