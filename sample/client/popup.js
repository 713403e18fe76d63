// Popup UI: list stored credentials, trigger prepare/disclose/remove
// (reference: sample/client/src/popup.ts, much simplified — cards,
// progress bars and collapsibles are cosmetic there).

function send (msg) {
  return new Promise((resolve, reject) => {
    chrome.runtime.sendMessage(msg, (response) => {
      if (chrome.runtime.lastError) return reject(chrome.runtime.lastError)
      if (!response || !response.ok) return reject(new Error(response && response.error))
      resolve(response.value)
    })
  })
}

function sendToActiveTab (msg) {
  return new Promise((resolve) => {
    chrome.tabs.query({ active: true, currentWindow: true }, ([tab]) => {
      if (!tab) return resolve(null)
      chrome.tabs.sendMessage(tab.id, msg, (response) => {
        void chrome.runtime.lastError // page may have no content script
        resolve(response || null)
      })
    })
  })
}

async function render () {
  const creds = await send({ action: 'list-creds' })
  const disclosure = await sendToActiveTab({ action: 'scan-disclosure' })
  const root = document.getElementById('creds')
  root.textContent = ''
  document.getElementById('empty').hidden = creds.length > 0
  for (const cred of creds) {
    const div = document.createElement('div')
    div.className = 'cred'
    const domain = document.createElement('div')
    domain.className = 'domain'
    domain.textContent = `${cred.domain} (${cred.schemaUid})`
    const status = document.createElement('div')
    status.className = 'status'
    status.textContent = cred.status + (cred.error ? `: ${cred.error}` : '')
    div.append(domain, status)

    if (cred.status === 'NEW' || cred.status === 'ERROR') {
      div.append(button('Prepare', async () => {
        await send({ action: 'prepare', id: cred.id })
        render()
      }))
    }
    if (cred.status === 'PREPARED' && disclosure) {
      div.append(button(`Disclose (${disclosure.uid})`, async () => {
        await send({ action: 'disclose', id: cred.id, disclosure })
        window.close()
      }))
    }
    div.append(button('Remove', async () => {
      await send({ action: 'remove', id: cred.id })
      render()
    }))
    root.append(div)
  }
}

function button (label, onClick) {
  const b = document.createElement('button')
  b.textContent = label
  b.addEventListener('click', () => { onClick().catch((e) => alert(e)) })
  return b
}

render()
setInterval(render, 2000) // reflect PREPARING -> PREPARED transitions
