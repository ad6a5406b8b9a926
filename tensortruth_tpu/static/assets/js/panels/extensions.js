// Extensions panel (reference components/config/extensions): installed
// YAML extensions, remote catalog install, hot reload (which also
// invalidates the slash-command autocomplete cache).

import {
  extensionLibrary, installExtension, listExtensions, reloadExtensions,
  uninstallExtension,
} from "../api/extensions.js";
import {invalidateCommandCatalog} from "../chat/composer.js";
import {$, el} from "../lib/dom.js";
import {rowItem} from "../views/manage.js";

export async function loadExtensionsPanel() {
  const [inst, lib] = await Promise.all([
    listExtensions(), extensionLibrary().catch(() => ({catalog: []})),
  ]);
  const box = $("extensions-list"); box.innerHTML = "";
  if (!(inst.extensions || []).length) box.appendChild(el("div", "dim", "No extensions installed."));
  for (const e of inst.extensions || []) {
    box.appendChild(rowItem(e.name || e.filename, e.type || e.ext_type, [
      ["Uninstall", "danger", async () => {
        await uninstallExtension(e.ext_type || "commands", e.filename);
        loadExtensionsPanel();
      }],
    ]));
  }
  const cat = $("extension-catalog"); cat.innerHTML = "";
  for (const c of lib.catalog || []) {
    cat.appendChild(rowItem(c.name, c.description || "", [
      ["Install", "primary", async () => {
        await installExtension(c.name);
        loadExtensionsPanel();
      }],
    ]));
  }
}

export function wireExtensionsPanel() {
  $("extensions-reload").onclick = async () => {
    await reloadExtensions();
    invalidateCommandCatalog();  // user commands may have changed
    loadExtensionsPanel();
  };
}
