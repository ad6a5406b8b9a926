// System panel (reference components/status/*): backend/devices/RAM,
// loaded embedder/reranker/engine, LLM runtime reachability + unload,
// engine restart, JAX profiler control, background tasks.

import {listTasks} from "../api/tasks.js";
import {
  profileStart, profileStop, ragStatus, restartEngine, runtimeStatus,
  runtimeUnload, systemDevices, systemMemory, unloadModels,
} from "../api/system.js";
import {$, el, toast} from "../lib/dom.js";
import {rowItem} from "../views/manage.js";

export async function loadSystemPanel() {
  const kv = $("system-kv"); kv.innerHTML = "";
  const put = (k, v) => {
    kv.appendChild(el("div", "k", k));
    kv.appendChild(el("div", "", typeof v === "string" ? v : JSON.stringify(v)));
  };
  try {
    const [mem, devices, rag] = await Promise.all([
      systemMemory(), systemDevices(), ragStatus(),
    ]);
    const gb = (b) => (b / 1024 / 1024 / 1024).toFixed(1);
    put("backend", devices.backend);
    put("devices", (devices.devices || []).map(d => d.kind || d.platform).join(", "));
    put("host RAM", mem.ram && mem.ram.total
      ? `${gb(mem.ram.total - mem.ram.available)} / ${gb(mem.ram.total)} GB (${mem.ram.percent}%)` : "—");
    put("embedder", rag.embedder ? `${rag.embedder.key[0]} (${rag.embedder.param_gb} GB)` : "not loaded");
    put("reranker", rag.reranker ? `${rag.reranker.key[0]} (${rag.reranker.param_gb} GB)` : "not loaded");
    put("engine", rag.engine
      ? `loaded: ${(rag.engine.modules || []).join(", ") || "scope docs"} (${rag.engine.n_chunks} chunks)`
      : "not loaded");
  } catch (e) { put("error", String(e)); }
  const rl = $("runtimes-list"); rl.innerHTML = "";
  for (const [name, path] of [["Ollama", "ollama"], ["llama.cpp", "llama-cpp"]]) {
    try {
      const st = await runtimeStatus(path);
      const up = st.reachable;
      const row = rowItem(name,
        up ? `reachable · ${(st.models || st.loaded || []).length ?? 0} models`
           : `unreachable${st.error ? " · " + st.error : ""}`,
        up ? [["Unload", "", async () => {
          await runtimeUnload(path);
          loadSystemPanel();
        }]] : []);
      row.insertBefore(el("span", "badge" + (up ? " on" : ""), up ? "up" : "down"),
                       row.children[1]);
      rl.appendChild(row);
    } catch (e) {
      rl.appendChild(rowItem(name, "status error: " + e, []));
    }
  }
  const tl = $("tasks-list"); tl.innerHTML = "";
  const tasks = await listTasks().catch(() => ({tasks: []}));
  if (!(tasks.tasks || []).length) tl.appendChild(el("div", "dim", "No background tasks."));
  for (const t of tasks.tasks || []) {
    tl.appendChild(rowItem(t.name || t.id,
      `${t.status}${t.stage ? " · " + t.stage : ""}${t.total ? ` (${t.progress}/${t.total})` : ""}`, []));
  }
}

export function wireSystemPanel() {
  $("engine-restart").onclick = async ev => {
    await restartEngine();
    ev.target.textContent = "Restarted ✓";
    setTimeout(() => ev.target.textContent = "Restart RAG engine", 1500);
  };
  $("models-unload").onclick = async () => {
    await unloadModels();
    loadSystemPanel();
  };
  $("system-refresh").onclick = () => loadSystemPanel();
  $("profile-start").onclick = async () => {
    const r = await profileStart();
    toast(r.status || r.error || "profiler started");
  };
  $("profile-stop").onclick = async () => {
    const r = await profileStop();
    toast(r.status || r.trace_dir || r.error || "profiler stopped");
  };
}
