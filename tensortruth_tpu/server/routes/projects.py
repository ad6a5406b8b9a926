"""Project routes (reference api/routes/projects.py:91-241)."""

from __future__ import annotations

from aiohttp import web

from tensortruth_tpu.server.schemas import (
    ProjectCreate,
    ProjectPatch,
    ProjectSessionCreate,
    parse_body,
)


def _svc(request):
    return request.app["services"].project_service


async def list_projects(request):
    return web.json_response({"projects": _svc(request).list_projects()})


async def create_project(request):
    body = await parse_body(request, ProjectCreate)
    project = _svc(request).create_project(
        name=body.name,
        description=body.description,
        modules=body.modules,
        system_prompt=body.system_prompt,
        params=body.params,
    )
    return web.json_response(project)


async def get_project(request):
    p = _svc(request).get_project(request.match_info["project_id"])
    if p is None:
        raise web.HTTPNotFound(reason="project not found")
    return web.json_response(p)


async def patch_project(request):
    patch = (await parse_body(request, ProjectPatch)).model_dump(exclude_unset=True)
    p = _svc(request).update_project(request.match_info["project_id"], patch)
    if p is None:
        raise web.HTTPNotFound(reason="project not found")
    return web.json_response(p)


async def delete_project(request):
    if not _svc(request).delete_project(request.match_info["project_id"]):
        raise web.HTTPNotFound(reason="project not found")
    return web.json_response({"status": "deleted"})


async def create_project_session(request):
    """Session inside a project inherits modules/params/system prompt
    (reference projects.py:183-218)."""
    services = request.app["services"]
    project_id = request.match_info["project_id"]
    ctx = _svc(request).session_context(project_id)
    if _svc(request).get_project(project_id) is None:
        raise web.HTTPNotFound(reason="project not found")
    body = await parse_body(request, ProjectSessionCreate)
    session = services.session_service.create_session(
        modules=body.modules if body.modules is not None else ctx["modules"],
        params={**ctx["params"], **body.params},
        title=body.title,
        project_id=project_id,
    )
    return web.json_response(session)


async def list_project_sessions(request):
    services = request.app["services"]
    project_id = request.match_info["project_id"]
    sessions = [
        s for s in services.session_service.list_sessions()
        if s.get("project_id") == project_id
    ]
    return web.json_response({"sessions": sessions})


def setup(app: web.Application) -> None:
    r = app.router
    r.add_get("/api/projects", list_projects)
    r.add_post("/api/projects", create_project)
    r.add_post("/api/projects/{project_id}/sessions", create_project_session)
    r.add_get("/api/projects/{project_id}/sessions", list_project_sessions)
    r.add_get("/api/projects/{project_id}", get_project)
    r.add_patch("/api/projects/{project_id}", patch_project)
    r.add_delete("/api/projects/{project_id}", delete_project)
