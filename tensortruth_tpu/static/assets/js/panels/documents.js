// Session-documents panel (reference components/documents/*): list/delete,
// URL ingestion (with a pre-flight probe of the content type/handler),
// pasted-text ingestion, arXiv-id ingestion, full reindex.

import {arxivLookup} from "../api/arxiv.js";
import {
  addTextDocument, addUrlDocument, deleteDocument, fileUrlInfo, listDocuments,
  reindexDocuments,
} from "../api/documents.js";
import {$, el, toast} from "../lib/dom.js";
import {currentSessionId} from "../stores/session.js";
import {rowItem} from "../views/manage.js";

export async function loadDocumentsPanel() {
  const label = $("documents-session-label");
  const box = $("documents-list"); box.innerHTML = "";
  if (!currentSessionId()) { label.textContent = "Open a session first."; return; }
  label.textContent = `Documents indexed into session ${currentSessionId()}`;
  const data = await listDocuments(currentSessionId());
  if (!(data.documents || []).length) box.appendChild(el("div", "dim", "No documents yet."));
  for (const doc of data.documents || []) {
    box.appendChild(rowItem(doc.filename || doc.id, `${doc.chunks ?? "?"} chunks`, [
      ["Delete", "danger", async () => {
        await deleteDocument(currentSessionId(), doc.id);
        loadDocumentsPanel();
      }],
    ]));
  }
}

export function wireDocumentsPanel() {
  $("doc-url-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!currentSessionId()) return;
    const f = new FormData(ev.target);
    const url = f.get("url");
    // pre-flight probe: surface the handler + content type before the
    // (potentially slow) fetch-and-index round-trip
    const info = await fileUrlInfo(url).catch(() => null);
    if (info && info.handler)
      toast(`ingesting via ${info.handler}`);
    await addUrlDocument(currentSessionId(), url);
    ev.target.reset();
    loadDocumentsPanel();
  };
  $("doc-text-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!currentSessionId()) return;
    const f = new FormData(ev.target);
    await addTextDocument(currentSessionId(), f.get("filename") || "pasted.md", f.get("text"));
    ev.target.reset();
    loadDocumentsPanel();
  };
  $("doc-arxiv-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!currentSessionId()) return;
    const f = new FormData(ev.target);
    const arxivId = String(f.get("arxiv_id") || "").trim();
    if (!arxivId) return;
    $("statusline").textContent = `fetching arXiv ${arxivId}…`;
    const r = await arxivLookup(arxivId).catch(e => ({error: String(e)}));
    if (r.error) { toast(r.error, true); $("statusline").textContent = ""; return; }
    await addTextDocument(currentSessionId(),
      `arxiv_${arxivId.replace(/[^\w.]+/g, "_")}.md`, r.markdown);
    $("statusline").textContent = "";
    toast(`indexed arXiv ${arxivId}: ${r.title || ""}`);
    ev.target.reset();
    loadDocumentsPanel();
  };
  $("docs-reindex").onclick = async ev => {
    if (!currentSessionId()) return;
    await reindexDocuments(currentSessionId());
    ev.target.textContent = "Reindexed ✓";
    setTimeout(() => ev.target.textContent = "Reindex all", 1500);
    loadDocumentsPanel();
  };
}
