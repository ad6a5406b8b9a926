"""Project persistence + config inheritance to sessions.

Behavioral mirror of reference services/project_service.py:22-307: project
CRUD under ``projects/{id}/project.json``, catalog-module attach/detach,
system-prompt + param inheritance for sessions created inside a project.
"""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from pathlib import Path

from tensortruth_tpu.app.file_utils import atomic_write_json, read_json


def _now() -> str:
    return datetime.now(timezone.utc).isoformat()


class ProjectService:
    def __init__(self, projects_dir: str | Path):
        self.projects_dir = Path(projects_dir)
        self.projects_dir.mkdir(parents=True, exist_ok=True)

    def _file(self, project_id: str) -> Path:
        return self.projects_dir / project_id / "project.json"

    def create_project(
        self,
        name: str,
        description: str = "",
        modules: list[str] | None = None,
        system_prompt: str = "",
        params: dict | None = None,
    ) -> dict:
        project_id = uuid.uuid4().hex[:12]
        project = {
            "id": project_id,
            "name": name,
            "description": description,
            "created_at": _now(),
            "updated_at": _now(),
            "modules": modules or [],
            "system_prompt": system_prompt,
            "params": params or {},
            "documents": [],
        }
        (self.projects_dir / project_id).mkdir(parents=True, exist_ok=True)
        atomic_write_json(self._file(project_id), project)
        return project

    def get_project(self, project_id: str) -> dict | None:
        return read_json(self._file(project_id))

    def list_projects(self) -> list[dict]:
        out = []
        for d in sorted(self.projects_dir.iterdir()) if self.projects_dir.exists() else []:
            if d.is_dir():
                p = read_json(d / "project.json")
                if p:
                    out.append(p)
        out.sort(key=lambda p: p.get("created_at", ""), reverse=True)
        return out

    def update_project(self, project_id: str, patch: dict) -> dict | None:
        project = self.get_project(project_id)
        if project is None:
            return None
        for key in ("name", "description", "modules", "system_prompt", "params", "documents"):
            if key in patch:
                project[key] = patch[key]
        project["updated_at"] = _now()
        atomic_write_json(self._file(project_id), project)
        return project

    def delete_project(self, project_id: str) -> bool:
        import shutil

        d = self.projects_dir / project_id
        if not d.exists():
            return False
        shutil.rmtree(d)
        return True

    def session_context(self, project_id: str) -> dict:
        """Modules + params + system prompt a session inherits
        (reference chat.py:119-215 ChatContext.from_session)."""
        project = self.get_project(project_id)
        if project is None:
            return {"modules": [], "params": {}, "system_prompt": ""}
        return {
            "modules": list(project.get("modules", [])),
            "params": dict(project.get("params", {})),
            "system_prompt": project.get("system_prompt", ""),
        }
