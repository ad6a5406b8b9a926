"""sources.json ↔ filesystem consistency checks
(reference utils/validation.py:1-394)."""

from __future__ import annotations

from pathlib import Path

from tensortruth_tpu.app.sources import (
    get_document_type_for_module,
    list_all_modules,
    module_docs_dirname,
)


def validate_module_for_build(module: str, sources: dict, docs_dir: str | Path) -> str | None:
    """Error string or None (pre-build validation)."""
    if module not in list_all_modules(sources):
        return f"module '{module}' not found in sources.json"
    doc_type = get_document_type_for_module(sources, module)
    mod_dir = Path(docs_dir) / module_docs_dirname(doc_type, module)
    if not mod_dir.exists():
        return f"docs directory missing: {mod_dir} (run tensor-truth-tpu-docs first)"
    if not any(mod_dir.rglob("*.md")) and not any(mod_dir.rglob("*.txt")):
        return f"docs directory empty: {mod_dir}"
    return None


def validate_sources(sources: dict, docs_dir: str | Path) -> dict:
    """Full report: per-module status + orphaned doc dirs."""
    docs_dir = Path(docs_dir)
    report = {"modules": {}, "orphaned_dirs": []}
    for module in list_all_modules(sources):
        err = validate_module_for_build(module, sources, docs_dir)
        report["modules"][module] = {"ok": err is None, "error": err}
    known = {
        module_docs_dirname(get_document_type_for_module(sources, m), m)
        for m in list_all_modules(sources)
    }
    if docs_dir.exists():
        for d in docs_dir.iterdir():
            if d.is_dir() and d.name not in known:
                report["orphaned_dirs"].append(d.name)
    return report


def validate_library_config(config: dict) -> str | None:
    doc_type = config.get("doc_type", config.get("type", "sphinx"))
    if doc_type == "sphinx" and not config.get("inventory_url"):
        return "sphinx library needs 'inventory_url'"
    if doc_type == "doxygen" and not config.get("doc_root"):
        return "doxygen library needs 'doc_root'"
    return None
