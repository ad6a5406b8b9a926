// MCP panel (reference components/config/mcp): configured MCP servers
// (toggle/delete/add) and ready-made presets.

import {
  addMcpServer, deleteMcpServer, listMcpServers, mcpPresets, toggleMcpServer,
} from "../api/mcp.js";
import {$, el} from "../lib/dom.js";
import {rowItem} from "../views/manage.js";

export async function loadMcpPanel() {
  const [servers, presets] = await Promise.all([
    listMcpServers(), mcpPresets().catch(() => ({presets: []})),
  ]);
  const box = $("mcp-list"); box.innerHTML = "";
  if (!(servers.servers || []).length) box.appendChild(el("div", "dim", "No MCP servers configured."));
  for (const s of servers.servers || []) {
    // Surface config errors (bad transport, missing url/command) and the
    // last connect attempt's outcome so a server silently loading zero
    // tools is visible here, not just in server logs.
    let detail = `${s.transport || "stdio"} · ${s.command || s.url || ""}`;
    if (s.config_error) detail += ` · ⚠ ${s.config_error}`;
    else if (s.connection?.status === "error") detail += ` · ⚠ ${s.connection.error}`;
    else if (s.connection?.status === "connected")
      detail += ` · ✓ ${s.connection.n_tools} tools`;
    box.appendChild(rowItem(s.name, detail, [
      [s.enabled ? "Disable" : "Enable", "", async () => {
        await toggleMcpServer(s.name);
        loadMcpPanel();
      }],
      ["Delete", "danger", async () => {
        await deleteMcpServer(s.name);
        loadMcpPanel();
      }],
    ]));
  }
  const pbox = $("mcp-presets"); pbox.innerHTML = "";
  for (const p of presets.presets || []) {
    pbox.appendChild(rowItem(p.name, p.description || p.command || "", [
      ["Add", "primary", async () => {
        await addMcpServer(p);
        loadMcpPanel();
      }],
    ]));
  }
}

export function wireMcpPanel() {
  $("mcp-form").onsubmit = async ev => {
    ev.preventDefault();
    const f = new FormData(ev.target);
    await addMcpServer({
      name: f.get("name"), transport: f.get("transport") || "stdio",
      command: f.get("command"), url: f.get("url") || "",
      args: (f.get("args") || "").split(/\s+/).filter(Boolean),
    });
    ev.target.reset();
    loadMcpPanel();
  };
}
