// Sidebar + chat-view session lifecycle: session list/filter, project
// list, knowledge-module picker, document upload with progress, session
// open/rename/export (reference components/sessions/* + useSessionStore).

import {uploadDocumentXHR} from "../api/documents.js";
import {listModules} from "../api/modules.js";
import {createProject, createProjectSession, listProjects} from "../api/projects.js";
import {
  createSession, deleteSession, getSession, listSessions as listSessionsApi,
  imageUrl, patchSession,
} from "../api/sessions.js";
import {$, el} from "../lib/dom.js";
import {renderMarkdown} from "../lib/markdown.js";
import {sessionStore, currentSessionId} from "../stores/session.js";
import {
  addMessage, renderMetrics, renderSources, renderThinking, renderToolSteps,
  renderWelcome,
} from "../chat/messages.js";
import {fillParamsDrawer} from "../chat/params.js";
import {closeWS, connectWS} from "../chat/ws.js";

export async function loadSessions() {
  const data = await listSessionsApi();
  sessionStore.set({sessions: data.sessions});
}

export async function loadProjects() {
  const data = await listProjects();
  const box = $("projects"); box.innerHTML = "";
  for (const pr of data.projects) {
    const d = el("div", "session", pr.name);
    d.title = "New session in this project";
    d.onclick = async () => {
      const s = await createProjectSession(pr.id);
      await openSession(s.id);
    };
    box.appendChild(d);
  }
}

export async function loadModules() {
  const data = await listModules();
  const sel = $("modules-select"); sel.innerHTML = "";
  for (const m of data.modules) {
    const opt = el("option", "", `${m.module} (${m.doc_type})`);
    opt.value = m.id;
    sel.appendChild(opt);
  }
  sel.size = Math.min(4, Math.max(1, data.modules.length));
  $("modules-row").style.display = data.modules.length ? "block" : "none";
}

export function selectedModules() {
  return [...$("modules-select").selectedOptions].map(o => o.value);
}

export async function openSession(id) {
  closeWS();
  $("messages").innerHTML = "";
  const session = await getSession(id);
  sessionStore.set({current: id, title: session.title || id});
  for (const [mi, m] of session.messages.entries()) {
    const wrap = addMessage(m.role, m.role === "assistant" ? "" : m.content,
                            {index: mi, timestamp: m.timestamp,
                             onDelete: () => openSession(id)});
    if (m.role === "assistant") {
      const body = wrap.querySelector(".body");
      body.style.whiteSpace = "normal";
      body.innerHTML = renderMarkdown(m.content || "");
      if (m.thinking) renderThinking(wrap, m.thinking);
    }
    for (const imgId of m.images || []) {
      const img = document.createElement("img");
      img.src = imageUrl(id, imgId);
      img.style.cssText = "max-width:240px; border-radius:8px; margin-top:6px; display:block;";
      wrap.appendChild(img);
    }
    renderSources(wrap, m.sources);
    renderToolSteps(wrap, m.tool_steps);
    renderMetrics(wrap, m.metrics, m.confidence);
  }
  if (!session.messages.length) renderWelcome();
  fillParamsDrawer(session.params || {});
  connectWS();
  loadSessions();
}

// -- document upload with progress -------------------------------------------
export function uploadDocument(file) {
  if (!currentSessionId()) return;
  const bar = $("upload-progress");
  bar.style.display = "block";
  bar.firstElementChild.style.width = "0%";
  $("statusline").textContent = `uploading ${file.name}…`;
  uploadDocumentXHR(currentSessionId(), file, {
    onProgress: pct => { bar.firstElementChild.style.width = `${pct}%`; },
    onIndexing: () => { $("statusline").textContent = `indexing ${file.name}…`; },
    onDone: (status, data) => {
      bar.style.display = "none";
      $("statusline").textContent = status < 300
        ? `indexed ${file.name} (${data.chunks} chunks)`
        : `upload failed: ${data.error || data.detail || status}`;
    },
    onError: () => {
      bar.style.display = "none";
      $("statusline").textContent = "upload failed";
    },
  });
}

async function exportSession() {
  if (!currentSessionId()) return;
  const session = await getSession(currentSessionId());
  const lines = [`# ${session.title || session.id}`, ""];
  for (const m of session.messages) {
    lines.push(`## ${m.role}${m.timestamp ? ` — ${m.timestamp}` : ""}`, "", m.content || "", "");
    for (const s of m.sources || [])
      lines.push(`> [${(s.score ?? 0).toFixed?.(2) ?? "—"}] ${s.title || s.id || ""} ${s.url || ""}`);
    if ((m.sources || []).length) lines.push("");
  }
  const blob = new Blob([lines.join("\n")], {type: "text/markdown"});
  const a = document.createElement("a");
  a.href = URL.createObjectURL(blob);
  a.download = `${(session.title || session.id).replace(/[^\w-]+/g, "_")}.md`;
  a.click();
  URL.revokeObjectURL(a.href);
}

export function wireSidebar() {
  sessionStore.subscribe(st => {
    const box = $("sessions"); box.innerHTML = "";
    const needle = ($("session-filter").value || "").toLowerCase();
    for (const s of st.sessions) {
      if (needle && !(s.title || s.id).toLowerCase().includes(needle)) continue;
      const d = el("div", "session" + (st.current === s.id ? " active" : ""));
      d.appendChild(el("span", "", s.title || s.id));
      const x = el("span", "del", "×");
      x.title = "Delete session";
      x.onclick = async ev => {
        ev.stopPropagation();
        await deleteSession(s.id);
        if (st.current === s.id) { sessionStore.set({current: null, title: ""}); $("messages").innerHTML = ""; }
        loadSessions();
      };
      d.appendChild(x);
      d.onclick = () => openSession(s.id);
      box.appendChild(d);
    }
    $("chat-title").textContent = st.title || (st.current ? st.current : "—");
  });

  $("new-session").onclick = async () => {
    const s = await createSession({modules: selectedModules()});
    await openSession(s.id);
  };
  $("new-project").onclick = async () => {
    const name = prompt("Project name?");
    if (!name) return;
    await createProject({name, modules: selectedModules()});
    loadProjects();
  };
  $("upload-btn").onclick = () => $("file-input").click();
  $("file-input").onchange = ev => {
    if (ev.target.files[0]) uploadDocument(ev.target.files[0]);
    ev.target.value = "";
  };
  $("session-filter").addEventListener("input", () => sessionStore.set({}));
  $("export-btn").onclick = exportSession;
  $("chat-title").ondblclick = async () => {
    if (!currentSessionId()) return;
    const name = prompt("Rename session", sessionStore.get().title);
    if (!name) return;
    await patchSession(currentSessionId(), {title: name});
    sessionStore.set({title: name});
    loadSessions();
  };
}
