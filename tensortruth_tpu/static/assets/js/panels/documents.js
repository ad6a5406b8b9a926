// Scope-aware documents panel (reference components/documents/
// DocumentPanel.tsx + DocumentUploader.tsx: one panel serves BOTH scope
// types): list/delete, file upload with progress, URL ingestion (with a
// pre-flight probe of the content type/handler), pasted-text ingestion,
// arXiv-id ingestion, full reindex — against the current session OR any
// project, selected in the scope dropdown.

import {arxivLookup} from "../api/arxiv.js";
import {
  addTextDocument, addUrlDocument, deleteDocument, fileUrlInfo, listDocuments,
  reindexDocuments, uploadDocumentXHR,
} from "../api/documents.js";
import {listProjects} from "../api/projects.js";
import {$, el, toast} from "../lib/dom.js";
import {currentSessionId} from "../stores/session.js";
import {rowItem} from "../views/manage.js";

// Selected scope: {kind: "session"|"project", id} or null when nothing is
// selectable (no open session and no projects).
let scope = null;

function describeScope() {
  if (!scope) return "Open a session or create a project first.";
  return scope.kind === "project"
    ? `Documents indexed into project ${scope.label || scope.id}`
    : `Documents indexed into session ${scope.id}`;
}

async function refreshScopeSelect() {
  const sel = $("doc-scope");
  const prev = sel.value;
  sel.innerHTML = "";
  const sid = currentSessionId();
  if (sid) {
    const opt = el("option", "", `Session ${sid}`);
    opt.value = `session:${sid}`;
    sel.appendChild(opt);
  }
  const projects = (await listProjects().catch(() => ({projects: []}))).projects || [];
  for (const pr of projects) {
    const opt = el("option", "", `Project: ${pr.name}`);
    opt.value = `project:${pr.id}`;
    opt.dataset.label = pr.name;
    sel.appendChild(opt);
  }
  if (!sel.options.length) { scope = null; return; }
  // keep the previous pick when still listed, else default to the session
  const values = [...sel.options].map(o => o.value);
  sel.value = values.includes(prev) ? prev : values[0];
  applyScopeSelect();
}

function applyScopeSelect() {
  const v = $("doc-scope").value;
  if (!v) { scope = null; return; }
  const [kind, ...rest] = v.split(":");
  const id = rest.join(":");
  const opt = [...$("doc-scope").options].find(o => o.value === v);
  scope = {kind, id, label: opt && opt.dataset.label};
}

export async function loadDocumentsPanel() {
  await refreshScopeSelect();
  const label = $("documents-session-label");
  const box = $("documents-list"); box.innerHTML = "";
  label.textContent = describeScope();
  if (!scope) return;
  const data = await listDocuments(scope);
  if (!(data.documents || []).length) box.appendChild(el("div", "dim", "No documents yet."));
  for (const doc of data.documents || []) {
    box.appendChild(rowItem(doc.filename || doc.id, `${doc.chunks ?? "?"} chunks`, [
      ["Delete", "danger", async () => {
        await deleteDocument(scope, doc.id);
        reloadList();
      }],
    ]));
  }
}

// List-only refresh: the scope select keeps the user's pick (a full
// loadDocumentsPanel re-resolves the dropdown, which is only needed when
// sessions/projects changed).
async function reloadList() {
  const box = $("documents-list"); box.innerHTML = "";
  $("documents-session-label").textContent = describeScope();
  if (!scope) return;
  const data = await listDocuments(scope);
  if (!(data.documents || []).length) box.appendChild(el("div", "dim", "No documents yet."));
  for (const doc of data.documents || []) {
    box.appendChild(rowItem(doc.filename || doc.id, `${doc.chunks ?? "?"} chunks`, [
      ["Delete", "danger", async () => {
        await deleteDocument(scope, doc.id);
        reloadList();
      }],
    ]));
  }
}

export function wireDocumentsPanel() {
  $("doc-scope").onchange = () => { applyScopeSelect(); reloadList(); };
  $("doc-upload-btn").onclick = () => $("doc-file-input").click();
  $("doc-file-input").onchange = ev => {
    const file = ev.target.files[0];
    ev.target.value = "";
    if (!file || !scope) return;
    $("statusline").textContent = `uploading ${file.name}…`;
    uploadDocumentXHR(scope, file, {
      onProgress: pct => { $("statusline").textContent = `uploading ${file.name} ${pct}%`; },
      onIndexing: () => { $("statusline").textContent = `indexing ${file.name}…`; },
      onDone: (status, data) => {
        $("statusline").textContent = "";
        if (status < 300) toast(`indexed ${file.name} (${data.chunks} chunks)`);
        else toast(`upload failed: ${data.error || data.detail || status}`, true);
        reloadList();
      },
      onError: () => {
        $("statusline").textContent = "";
        toast("upload failed", true);
      },
    });
  };
  $("doc-url-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!scope) return;
    const f = new FormData(ev.target);
    const url = f.get("url");
    // pre-flight probe: surface the handler + content type before the
    // (potentially slow) fetch-and-index round-trip
    const info = await fileUrlInfo(url).catch(() => null);
    if (info && info.handler)
      toast(`ingesting via ${info.handler}`);
    await addUrlDocument(scope, url);
    ev.target.reset();
    reloadList();
  };
  $("doc-text-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!scope) return;
    const f = new FormData(ev.target);
    await addTextDocument(scope, f.get("filename") || "pasted.md", f.get("text"));
    ev.target.reset();
    reloadList();
  };
  $("doc-arxiv-form").onsubmit = async ev => {
    ev.preventDefault();
    if (!scope) return;
    const f = new FormData(ev.target);
    const arxivId = String(f.get("arxiv_id") || "").trim();
    if (!arxivId) return;
    $("statusline").textContent = `fetching arXiv ${arxivId}…`;
    const r = await arxivLookup(arxivId).catch(e => ({error: String(e)}));
    if (r.error) { toast(r.error, true); $("statusline").textContent = ""; return; }
    await addTextDocument(scope,
      `arxiv_${arxivId.replace(/[^\w.]+/g, "_")}.md`, r.markdown);
    $("statusline").textContent = "";
    toast(`indexed arXiv ${arxivId}: ${r.title || ""}`);
    ev.target.reset();
    reloadList();
  };
  $("docs-reindex").onclick = async ev => {
    if (!scope) return;
    await reindexDocuments(scope);
    ev.target.textContent = "Reindexed ✓";
    setTimeout(() => ev.target.textContent = "Reindex all", 1500);
    reloadList();
  };
}
