// Knowledge-modules panel (reference components/modules/*): built module
// indexes, known embedding models, registered rerankers.

import {listEmbeddingModels, listModules, listRerankers} from "../api/modules.js";
import {$, el} from "../lib/dom.js";
import {rowItem} from "../views/manage.js";

export async function loadModulesPanel() {
  const [mods, models, rerankers] = await Promise.all([
    listModules(), listEmbeddingModels().catch(() => ({models: []})),
    listRerankers().catch(() => ({rerankers: []})),
  ]);
  const box = $("modules-list"); box.innerHTML = "";
  if (!mods.modules.length) box.appendChild(el("div", "dim", "No module indexes built. Use tensor-truth-tpu-build."));
  for (const m of mods.modules)
    box.appendChild(rowItem(m.module, `${m.doc_type} · ${m.n_chunks ?? "?"} chunks`, []));
  const mbox = $("embedding-models-list"); mbox.innerHTML = "";
  for (const m of models.models || []) mbox.appendChild(rowItem(m, "", []));
  const rbox = $("rerankers-list"); rbox.innerHTML = "";
  for (const m of rerankers.rerankers || []) rbox.appendChild(rowItem(m, "", []));
}
