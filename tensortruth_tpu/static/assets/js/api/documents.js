// Typed client for the per-scope document routes (reference
// frontend/src/api/documents.ts): list/delete/reindex plus the three
// ingestion paths (multipart file upload with progress, URL fetch, pasted
// text).

import {api, del, post} from "./client.js";

export function listDocuments(sessionId) {
  return api(`/sessions/${sessionId}/documents`);
}
export function deleteDocument(sessionId, docId) {
  return del(`/sessions/${sessionId}/documents/${docId}`);
}
export function addUrlDocument(sessionId, url) {
  return post(`/sessions/${sessionId}/documents`, {url});
}
export function addTextDocument(sessionId, filename, text) {
  return post(`/sessions/${sessionId}/documents`, {filename, text});
}
export function reindexDocuments(sessionId) {
  return post(`/sessions/${sessionId}/documents/reindex`, {});
}
export function fileUrlInfo(url) {
  return api(`/file-url-info?url=${encodeURIComponent(url)}`);
}

// Multipart upload via XHR so the browser reports upload progress
// (fetch() cannot). Callbacks: onProgress(pct), onIndexing(), then
// onDone(status, data) or onError().
export function uploadDocumentXHR(sessionId, file, cbs) {
  const form = new FormData();
  form.append("file", file);
  const xhr = new XMLHttpRequest();
  xhr.open("POST", `/api/sessions/${sessionId}/documents`);
  xhr.upload.onprogress = ev => {
    if (ev.lengthComputable && cbs.onProgress)
      cbs.onProgress(Math.round(100 * ev.loaded / ev.total));
  };
  xhr.upload.onload = () => { if (cbs.onIndexing) cbs.onIndexing(); };
  xhr.onload = () => {
    let data = {};
    try { data = JSON.parse(xhr.responseText); } catch (e) {}
    cbs.onDone(xhr.status, data);
  };
  xhr.onerror = () => cbs.onError && cbs.onError();
  xhr.send(form);
}
