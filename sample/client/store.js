// IndexedDB credential store (reference: sample/client/src/indexeddb.ts +
// cred.ts:18-42).  One object store "creds" keyed by local id; each record:
//   { id, domain, schemaUid, jwt, credUid, status, showData, created }
// status: NEW -> PREPARING -> PREPARED | ERROR

const DB_NAME = 'crescent'
const STORE = 'creds'

function openDb () {
  return new Promise((resolve, reject) => {
    const req = indexedDB.open(DB_NAME, 1)
    req.onupgradeneeded = () => {
      if (!req.result.objectStoreNames.contains(STORE)) {
        req.result.createObjectStore(STORE, { keyPath: 'id' })
      }
    }
    req.onsuccess = () => resolve(req.result)
    req.onerror = () => reject(req.error)
  })
}

async function tx (mode, fn) {
  const db = await openDb()
  return await new Promise((resolve, reject) => {
    const t = db.transaction(STORE, mode)
    const result = fn(t.objectStore(STORE))
    t.oncomplete = () => resolve(result.result !== undefined ? result.result : result)
    t.onerror = () => reject(t.error)
  })
}

export async function putCred (cred) {
  await tx('readwrite', (s) => s.put(cred))
  return cred
}

export async function getCred (id) {
  return await tx('readonly', (s) => s.get(id))
}

export async function allCreds () {
  return await tx('readonly', (s) => s.getAll())
}

export async function removeCred (id) {
  await tx('readwrite', (s) => s.delete(id))
}
