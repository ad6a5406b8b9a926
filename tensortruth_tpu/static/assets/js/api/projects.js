// Typed client for /api/projects (reference frontend/src/api/projects.ts).

import {api, del, patch, post} from "./client.js";

export function listProjects() { return api("/projects"); }
export function createProject(body) { return post("/projects", body); }
export function patchProject(id, body) { return patch(`/projects/${id}`, body); }
export function deleteProject(id) { return del(`/projects/${id}`); }
export function createProjectSession(id) { return post(`/projects/${id}/sessions`, {}); }
