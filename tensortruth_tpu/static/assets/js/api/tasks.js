// Typed client for /api/tasks (reference frontend/src/api/tasks.ts) plus
// the polling helper every long-running flow (index build, model pull)
// shares.

import {api} from "./client.js";

export function listTasks() { return api("/tasks"); }
export function getTask(id) { return api(`/tasks/${id}`); }

export async function watchTask(taskId, onUpdate) {
  for (let i = 0; i < 1800; i++) {
    const t = await getTask(taskId);
    onUpdate(t);
    if (t.status === "completed" || t.status === "failed") return t;
    await new Promise(r => setTimeout(r, 1000));
  }
}
