// Providers panel (reference components/providers/*): CRUD, reachability
// test, model discovery, set-as-session-model.

import {
  addProvider, deleteProvider, discoverModels, listProviders, patchProvider,
  testProvider,
} from "../api/providers.js";
import {patchSession} from "../api/sessions.js";
import {$, el} from "../lib/dom.js";
import {currentSessionId} from "../stores/session.js";
import {rowItem} from "../views/manage.js";

export async function loadProvidersPanel() {
  const data = await listProviders();
  const box = $("providers-list"); box.innerHTML = "";
  if (!data.providers.length) box.appendChild(el("div", "dim", "No providers configured."));
  for (const p of data.providers) {
    const d = rowItem(`${p.id}`, `${p.type} · ${p.base_url || "default URL"}`, [
      [p.enabled ? "Disable" : "Enable", "", async () => {
        await patchProvider(p.id, {enabled: !p.enabled});
        loadProvidersPanel();
      }],
      ["Test", "", async ev => {
        ev.target.textContent = "…";
        const r = await testProvider({type: p.type, base_url: p.base_url, api_key: p.api_key});
        ev.target.textContent = r.ok ? "✓ OK" : "✗ unreachable";
      }],
      ["Models", "", async () => showProviderModels(p.id)],
      ["Delete", "danger", async () => {
        await deleteProvider(p.id);
        loadProvidersPanel();
      }],
    ]);
    const badge = el("span", "badge" + (p.enabled ? " on" : ""), p.enabled ? "enabled" : "disabled");
    d.insertBefore(badge, d.children[1]);
    box.appendChild(d);
  }
}

export async function showProviderModels(providerId) {
  const box = $("provider-models"); box.innerHTML = "";
  box.appendChild(el("div", "dim", "discovering…"));
  try {
    const data = await discoverModels(providerId);
    box.innerHTML = "";
    const models = data[providerId] || [];
    if (!models.length) box.appendChild(el("div", "dim", "No models reported by this provider."));
    for (const m of models) {
      const name = m.id || m.name || m;
      const row = rowItem(String(name), m.details || "", [
        ["Use in session", "primary", async () => {
          if (!currentSessionId()) return;
          await patchSession(currentSessionId(), {params: {model: String(name)}});
          $("statusline").textContent = `session model → ${name}`;
        }],
      ]);
      box.appendChild(row);
    }
  } catch (e) {
    box.innerHTML = "";
    box.appendChild(el("div", "dim", "discover failed: " + e));
  }
}

export function wireProvidersPanel() {
  $("provider-form").onsubmit = async ev => {
    ev.preventDefault();
    const f = new FormData(ev.target);
    await addProvider(Object.fromEntries(f));
    ev.target.reset();
    loadProvidersPanel();
  };
}
