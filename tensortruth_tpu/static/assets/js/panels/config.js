// Config panel (reference components/config/*): structured per-section
// forms for scalar settings with write-through to a raw-JSON textarea —
// the single source of truth for Save, so forms and advanced JSON can
// never diverge: a form change re-serializes the textarea, and Save
// PATCHes whatever the textarea holds.

import {getConfig, getConfigDefaults, patchConfigRaw} from "../api/config.js";
import {$, el} from "../lib/dom.js";

export async function loadConfigPanel() {
  const cfg = await getConfig();
  $("config-json").value = JSON.stringify(cfg, null, 2);
  renderConfigForms(cfg);
  $("config-status").textContent = "";
}

function setConfigPath(path, value) {
  let cfg;
  try { cfg = JSON.parse($("config-json").value); }
  catch (e) { $("config-status").textContent = "raw JSON invalid — fix it before using forms"; return; }
  let node = cfg;
  for (const k of path.slice(0, -1)) {
    if (typeof node[k] !== "object" || node[k] === null) node[k] = {};
    node = node[k];
  }
  node[path[path.length - 1]] = value;
  $("config-json").value = JSON.stringify(cfg, null, 2);
  $("config-status").textContent = "edited (Save to apply)";
}

function renderConfigForms(cfg) {
  const box = $("config-forms"); box.innerHTML = "";
  const isScalar = v => v === null ||
    typeof v === "string" || typeof v === "number" || typeof v === "boolean";
  const fieldRow = (grid, path, key, val) => {
    grid.appendChild(el("div", "k", key));
    let input;
    if (typeof val === "boolean") {
      input = document.createElement("input");
      input.type = "checkbox"; input.checked = val;
      input.onchange = () => setConfigPath(path, input.checked);
    } else if (typeof val === "number") {
      input = document.createElement("input");
      input.type = "number"; input.step = "any"; input.value = val;
      input.onchange = () => {
        const n = Number(input.value);
        // '' coerces to 0 — a cleared field must not silently write 0
        if (input.value !== "" && !Number.isNaN(n)) setConfigPath(path, n);
        else input.value = val;
      };
    } else {
      input = document.createElement("input");
      input.type = "text"; input.value = val === null ? "" : String(val);
      input.placeholder = val === null ? "null" : "";
      input.onchange = () => setConfigPath(path, input.value === "" && val === null ? null : input.value);
    }
    input.className = "cfg-input";
    input.dataset.path = path.join(".");
    grid.appendChild(input);
  };
  const section = (title, entries, basePath) => {
    const scalars = entries.filter(([, v]) => isScalar(v));
    if (!scalars.length) return;
    const d = document.createElement("details");
    d.open = basePath.length === 0;
    const s = document.createElement("summary");
    s.textContent = title; s.style.cursor = "pointer"; s.style.margin = "6px 0";
    d.appendChild(s);
    const grid = el("div", "kv", "");
    for (const [k, v] of scalars) fieldRow(grid, basePath.concat([k]), k, v);
    d.appendChild(grid);
    box.appendChild(d);
  };
  section("general", Object.entries(cfg), []);
  for (const [sec, val] of Object.entries(cfg)) {
    if (typeof val === "object" && val !== null && !Array.isArray(val)) {
      section(sec, Object.entries(val), [sec]);
    }
  }
}

export function wireConfigPanel() {
  $("config-save").onclick = async () => {
    try {
      const patch = JSON.parse($("config-json").value);
      const r = await patchConfigRaw(patch);
      $("config-status").textContent = r.ok ? "saved ✓" : `error ${r.status}`;
    } catch (e) { $("config-status").textContent = "invalid JSON: " + e; }
  };
  $("config-defaults").onclick = async () => {
    const defs = await getConfigDefaults();
    $("config-json").value = JSON.stringify(defs, null, 2);
    $("config-status").textContent = "defaults shown (Save to apply)";
  };
}
