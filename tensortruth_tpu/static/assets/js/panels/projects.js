// Projects panel (reference components/projects/*): CRUD, catalog-module
// attach via per-module checkboxes, jump into a fresh project session.

import {listModules} from "../api/modules.js";
import {
  createProject, createProjectSession, deleteProject, listProjects,
  patchProject,
} from "../api/projects.js";
import {$, el} from "../lib/dom.js";
import {openSession, loadProjects} from "../views/sidebar.js";
import {rowItem, showManage} from "../views/manage.js";

export async function loadProjectsPanel() {
  const [projects, mods] = await Promise.all([listProjects(), listModules()]);
  const box = $("projects-list"); box.innerHTML = "";
  if (!projects.projects.length) box.appendChild(el("div", "dim", "No projects yet."));
  for (const pr of projects.projects) {
    const row = rowItem(pr.name, `modules: ${(pr.modules || []).join(", ") || "none"}`, [
      ["+ Session", "primary", async () => {
        const s = await createProjectSession(pr.id);
        showManage(false);
        await openSession(s.id);
      }],
      ["Delete", "danger", async () => {
        await deleteProject(pr.id);
        loadProjectsPanel(); loadProjects();
      }],
    ]);
    box.appendChild(row);
    // catalog-module attach: one checkbox per built module
    const attach = el("div", "row-item");
    attach.style.flexWrap = "wrap";
    attach.appendChild(el("span", "dim", "catalog:"));
    for (const m of mods.modules) {
      const lbl = el("label", "dim");
      const cb = document.createElement("input");
      cb.type = "checkbox";
      cb.checked = (pr.modules || []).includes(m.id) || (pr.modules || []).includes(m.module);
      cb.onchange = async () => {
        const cur = new Set(pr.modules || []);
        cb.checked ? cur.add(m.id) : (cur.delete(m.id), cur.delete(m.module));
        await patchProject(pr.id, {modules: [...cur]});
        loadProjectsPanel();
      };
      lbl.appendChild(cb);
      lbl.appendChild(document.createTextNode(" " + m.module));
      lbl.style.marginRight = "10px";
      attach.appendChild(lbl);
    }
    if (!mods.modules.length) attach.appendChild(el("span", "dim", "no built modules"));
    box.appendChild(attach);
  }
}

export function wireProjectsPanel() {
  $("project-form").onsubmit = async ev => {
    ev.preventDefault();
    const f = new FormData(ev.target);
    await createProject({
      name: f.get("name"), system_prompt: f.get("system_prompt") || undefined,
    });
    ev.target.reset();
    loadProjectsPanel(); loadProjects();
  };
}
