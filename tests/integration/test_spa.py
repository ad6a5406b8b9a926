"""Bundled SPA consistency: the single-file UI has no build step or JS test
runner in this environment, so these tests statically verify the contracts
that would break the page at runtime — every element id the script wires
must exist in the markup, every REST path it calls must resolve to a
registered route, and the page must ship all management panels
(reference frontend/src feature areas: providers, documents, modules,
config, system, extensions, MCP, startup)."""

import re
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager

pytestmark = pytest.mark.integration

SPA = Path("tensortruth_tpu/static/index.html").read_text(encoding="utf-8")

PANELS = [
    "providers", "documents", "modules", "config",
    "system", "extensions", "mcp", "startup",
]


@pytest.fixture
def client(tmp_path, monkeypatch, event_loop):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    ModelManager.reset_instance()
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.default_reranker = "tiny-reranker"
    cfg.rag.use_fused_topk = False

    from tensortruth_tpu.server.app import create_app

    app = create_app(data_dir=tmp_path, config=cfg)
    client = TestClient(TestServer(app, loop=event_loop), loop=event_loop)
    event_loop.run_until_complete(client.start_server())
    yield client
    event_loop.run_until_complete(client.close())


def test_every_wired_element_id_exists():
    wired = set(re.findall(r'\$\("([^"]+)"\)', SPA))
    defined = set(re.findall(r'id="([^"]+)"', SPA))
    missing = wired - defined
    assert not missing, f"JS wires ids missing from markup: {sorted(missing)}"


def test_all_management_panels_present():
    for p in PANELS:
        assert f'id="panel-{p}"' in SPA, f"panel-{p} missing"
        assert f'data-panel="{p}"' in SPA, f"tab for {p} missing"
    # each panel has a loader registered
    for p in PANELS:
        assert re.search(rf"\b{p}: load\w+Panel", SPA), f"no loader for {p}"


async def test_root_serves_spa_with_panels(client):
    r = await client.get("/")
    assert r.status == 200
    html = await r.text()
    for p in PANELS:
        assert f'id="panel-{p}"' in html


async def test_every_js_api_path_resolves(client):
    """Each api("...") literal (with template params substituted) must hit a
    registered route — not the SPA catch-all (which would return HTML)."""
    calls = set(re.findall(r'api\(\s*[`"]([^`"]+)[`"]', SPA))
    calls |= set(re.findall(r'fetch\("/api([^"]+)"', SPA))
    for path in sorted(calls):
        concrete = re.sub(r"\$\{[^}]+\}", "x", path)
        url = "/api" + concrete
        r = await client.request("GET", url)
        body = await r.text()
        # A JS-called path that falls through to the SPA catch-all means the
        # route does not exist server-side.
        assert not body.lstrip().startswith("<!DOCTYPE"), f"{url} fell to catch-all"
        assert r.status in (200, 400, 404, 405, 422), (url, r.status)


async def test_panel_backing_endpoints_return_expected_shapes(client):
    checks = {
        "/api/providers": "providers",
        "/api/modules": "modules",
        "/api/embedding-models": "models",
        "/api/rerankers": "rerankers",
        "/api/config": "rag",
        "/api/system/devices": "backend",
        "/api/system/rag/status": "embedder",
        "/api/extensions": "extensions",
        "/api/extensions/library": "catalog",
        "/api/mcp-servers": "servers",
        "/api/mcp-servers/presets": "presets",
        "/api/startup/status": "index_count",
        "/api/startup/available-indexes": "indexes",
    }
    for url, key in checks.items():
        r = await client.get(url)
        assert r.status == 200, (url, r.status)
        assert key in (await r.json()), (url, key)


# -- round-3 SPA depth: wizard, params drawer, WS protocol coverage ----------

def test_new_panels_present():
    for p in ["projects", "tools"]:
        assert f'id="panel-{p}"' in SPA, f"panel-{p} missing"
        assert f'data-panel="{p}"' in SPA, f"tab for {p} missing"
        assert re.search(rf"\b{p}: load\w+Panel", SPA), f"no loader for {p}"


def test_ws_handlers_cover_every_server_message_type():
    """The SPA's WS_HANDLERS table must have a branch for every message type
    the server can emit (chat route + orchestrator + web pipeline + tool
    confirmations) — a missing branch silently drops protocol data."""
    src_files = [
        "tensortruth_tpu/server/routes/chat.py",
        "tensortruth_tpu/services/orchestrator_service.py",
        "tensortruth_tpu/services/orchestrator_tools.py",
        "tensortruth_tpu/web/pipeline.py",
    ]
    emitted = set()
    for f in src_files:
        text = Path(f).read_text(encoding="utf-8")
        emitted |= set(re.findall(r'"type":\s*"([a-z_]+)"', text))
    emitted -= {"object", "string", "array", "integer", "number", "boolean"}  # JSON-schema noise
    emitted -= {"stop"}  # client→server control message, not an emission
    m = re.search(r"const WS_HANDLERS = \{(.*?)\n\};", SPA, re.S)
    assert m, "WS_HANDLERS table missing from SPA"
    handlers = set(re.findall(r"^\s{2}(\w+)\(", m.group(1), re.M))
    missing = emitted - handlers
    assert not missing, f"WS message types with no SPA handler: {sorted(missing)}"


def test_wizard_structure_complete():
    """Startup wizard: one renderer per step, progress bar, nav controls."""
    assert 'id="wizard"' in SPA
    steps = re.search(r'const WIZARD_STEPS = \[([^\]]+)\]', SPA).group(1)
    n_steps = len(re.findall(r'"[^"]+"', steps))
    renderers = len(re.findall(r"^  async body => \{", SPA, re.M))
    assert renderers == n_steps, (renderers, n_steps)
    for eid in ["wizard-next", "wizard-back", "wizard-skip", "wizard-open",
                "wizard-steps", "wizard-body", "wizard-title"]:
        assert f'id="{eid}"' in SPA, eid


def test_params_drawer_fields_match_session_params():
    """Every field in the params drawer must be a real session param the
    server accepts (session_service defaults / schemas)."""
    drawer = re.search(r'id="params-drawer".*?</div>\s*</div>', SPA, re.S).group(0)
    fields = set(re.findall(r'name="(\w+)"', drawer))
    expected = {"model", "temperature", "context_window", "reranker_top_n",
                "use_reranker", "confidence_cutoff", "corpus_dtype",
                "use_orchestrator"}
    assert fields == expected, fields ^ expected


def test_spa_has_no_control_characters():
    """Regression: a NUL byte once landed in the served HTML (sentinel
    characters pasted literally); control chars break strict parsers."""
    raw = Path("tensortruth_tpu/static/index.html").read_bytes()
    bad = [b for b in raw if b < 9 or (13 < b < 32)]
    assert not bad, f"{len(bad)} control bytes in SPA"


def test_metrics_display_renders_full_schema():
    """The metrics renderer must surface the full RetrievalMetrics schema
    (reference frontend message-metrics display): score distribution,
    diversity, coverage, quality."""
    fn = re.search(r"function renderMetrics.*?\n\}", SPA, re.S).group(0)
    for field in ["score_distribution", "diversity", "coverage", "quality",
                  "mean", "median", "std", "unique_sources", "entropy",
                  "estimated_tokens", "high_score_ratio"]:
        assert field in fn, f"metrics display missing {field}"


async def test_session_params_roundtrip_via_drawer_endpoints(client):
    """The params drawer's exact REST flow: create session → PATCH params →
    re-read (what fillParamsDrawer consumes)."""
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    r = await client.patch(f"/api/sessions/{sid}", json={
        "params": {"temperature": 0.3, "reranker_top_n": 7,
                   "use_reranker": False, "corpus_dtype": "int8"}})
    assert r.status == 200
    session = await (await client.get(f"/api/sessions/{sid}")).json()
    p = session["params"]
    assert p["temperature"] == 0.3
    assert p["reranker_top_n"] == 7
    assert p["use_reranker"] is False
    assert p["corpus_dtype"] == "int8"


async def test_wizard_flow_endpoints(client):
    """The wizard's REST flow end-to-end: status → provider test (offline →
    ok:false, never a 5xx) → build-with-no-sources → 422 → defaults."""
    st = await (await client.get("/api/startup/status")).json()
    assert "indexes_present" in st and "modules_configured" in st
    r = await client.post("/api/providers/test", json={
        "type": "ollama", "base_url": "http://127.0.0.1:1", "api_key": ""})
    body = await r.json()
    assert r.status == 200 and body["ok"] is False
    r = await client.post("/api/startup/download-indexes", json={})
    assert r.status == 422  # no sources configured in tmp data dir
    r = await client.get("/api/config/defaults")
    assert r.status == 200 and "rag" in (await r.json())


async def test_tools_panel_endpoints(client):
    for url, key in [("/api/tools", "tools"), ("/api/commands", "commands"),
                     ("/api/agents", "agents"), ("/api/tasks", "tasks")]:
        r = await client.get(url)
        assert r.status == 200, url
        assert key in (await r.json()), url


async def test_project_catalog_attach_flow(client):
    """Projects panel flow: create → attach modules via PATCH → session in
    project inherits them."""
    r = await client.post("/api/projects", json={"name": "proj-ui"})
    pr = await r.json()
    r = await client.patch(f"/api/projects/{pr['id']}",
                           json={"modules": ["library_numpy"]})
    assert r.status == 200
    got = await (await client.get(f"/api/projects/{pr['id']}")).json()
    assert got["modules"] == ["library_numpy"]
    r = await client.post(f"/api/projects/{pr['id']}/sessions", json={})
    s = await r.json()
    assert s["modules"] == ["library_numpy"]


def test_spa_script_brackets_balanced():
    """No JS engine exists in this environment, so catch gross syntax
    errors (unclosed blocks/strings) with a string-aware bracket scanner
    over the inline script."""
    m = re.search(r"<script>(.*)</script>", SPA, re.S)
    src = m.group(1)
    stack = []
    pairs = {")": "(", "]": "[", "}": "{"}
    i, n = 0, len(src)
    state = []  # nested string/template contexts
    while i < n:
        c = src[i]
        mode = state[-1] if state else None
        if mode in ("'", '"'):
            if c == "\\":
                i += 2
                continue
            if c == mode or c == "\n":
                state.pop()
        elif mode == "`":
            if c == "\\":
                i += 2
                continue
            if c == "`":
                state.pop()
            elif c == "$" and i + 1 < n and src[i + 1] == "{":
                state.append("${")
                stack.append("{")
                i += 2
                continue
        elif mode == "//":
            if c == "\n":
                state.pop()
        elif mode == "/*":
            if c == "*" and i + 1 < n and src[i + 1] == "/":
                state.pop()
                i += 2
                continue
        else:
            if c in "'\"`":
                state.append(c)
            elif c == "/" and i + 1 < n and src[i + 1] == "/":
                state.append("//")
            elif c == "/" and i + 1 < n and src[i + 1] == "*":
                state.append("/*")
            elif c == "/" and _regex_position(src, i):
                # skip a regex literal: /.../flags
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        break
                    j += 1
                i = j + 1
                continue
            elif c in "([{":
                stack.append(c)
            elif c in ")]}":
                if mode == "${" and c == "}" and stack and stack[-1] == "{":
                    state.pop()
                    stack.pop()
                    i += 1
                    continue
                assert stack and stack[-1] == pairs[c], (
                    f"unbalanced {c!r} at offset {i}: ...{src[max(0,i-60):i+20]!r}"
                )
                stack.pop()
        i += 1
    assert not stack, f"unclosed brackets: {stack[-8:]}"
    assert not state, f"unclosed string/comment context: {state}"


def _regex_position(src, i):
    """Heuristic: a '/' starts a regex when the previous non-space char
    cannot end an expression."""
    j = i - 1
    while j >= 0 and src[j] in " \t":
        j -= 1
    return j < 0 or src[j] in "=(,[{;:!&|?+-*%<>~^\n"


# -- round-3b SPA polish ------------------------------------------------------

def test_message_actions_and_toasts_wired():
    for feature in ["copyText(", 'el("div", "actions")', "function toast(",
                    'id="toasts"', "✕ delete", "messages.entries()"]:
        assert feature in SPA, f"missing UI feature: {feature}"


def test_markdown_pipe_tables_supported():
    fn = re.search(r"function renderMarkdown.*?\n\}", SPA, re.S).group(0)
    assert "<table>" in fn and "<thead>" in fn and "<td>" in fn


def test_session_filter_and_rename_and_stats():
    assert 'id="session-filter"' in SPA
    assert '$("chat-title").ondblclick' in SPA
    assert "/sessions/stats" in SPA or "api(\"/sessions/stats\")" in SPA
    # keyboard shortcuts
    assert '"Escape"' in SPA and 'key === "k"' in SPA


def test_source_preview_expansion():
    assert 'el("div", "preview"' in SPA
    assert 'classList.toggle("open")' in SPA


def test_round3c_chat_controls_wired():
    for feature in ['id="stop-btn"', 'id="send-btn"', 'id="export-btn"',
                    "setStreaming(", "↻ resend", 'id="runtimes-list"',
                    'id="profile-start"', 'id="profile-stop"']:
        assert feature in SPA, f"missing: {feature}"
    # stop sends the protocol stop message with close+reconnect fallback;
    # export builds a markdown blob
    stop_src = SPA.split('$("stop-btn").onclick')[1][:700]
    assert '{type: "stop"}' in stop_src
    assert "connectWS()" in stop_src
    assert "text/markdown" in SPA


def test_image_attach_ui_wired():
    """Vision UI: attach button, base64 pipeline into the WS payload,
    persisted-image rendering in history."""
    for feature in ['id="attach-btn"', 'id="image-input"', 'id="attach-row"',
                    "readAsDataURL", "payload.images = pendingImages",
                    "/images/${imgId}"]:
        assert feature in SPA, f"missing: {feature}"


def test_config_forms_panel_wired():
    """Structured config editing: scalar fields render per section, and every
    edit writes through to the raw JSON textarea that Save PATCHes — one save
    path, so forms and advanced JSON cannot diverge."""
    for feature in ['id="config-forms"', "renderConfigForms(", "setConfigPath(",
                    'type = "checkbox"', "Raw JSON (advanced"]:
        assert feature in SPA, f"missing: {feature}"
    fn = SPA.split("function setConfigPath")[1][:900]
    assert '$("config-json").value = JSON.stringify(cfg' in fn
    # loader renders forms from the fetched config
    loader = SPA.split("async function loadConfigPanel")[1][:300]
    assert "renderConfigForms(cfg)" in loader


def test_command_autocomplete_wired():
    """Slash-command autocomplete (reference CommandAutocomplete.tsx):
    menu element, /api/commands catalog fetch, keyboard navigation, and
    Enter-accepts-before-submit ordering inside the keydown handler."""
    for feature in ['id="cmd-menu"', "commandCatalog", 'api("/commands")',
                    "acceptCmd(", '"ArrowDown"', '"ArrowUp"', '"Tab"']:
        assert feature in SPA, f"missing: {feature}"
    kd = SPA.split('$("input").addEventListener("keydown"')[1]
    kd = kd[:kd.index("});") + 3]
    # menu navigation must be handled before the plain Enter-submit branch
    assert kd.index('"ArrowDown"') < kd.index("requestSubmit")
    # extension reload invalidates the cached catalog
    rl = SPA.split('$("extensions-reload").onclick')[1][:300]
    assert "cmdList = null" in rl


def test_theme_toggle_wired():
    """Light/dark theme (reference ThemeToggle.tsx): CSS override block,
    header button, localStorage persistence applied on load."""
    for feature in ["body.light {", 'id="theme-btn"', "applyTheme(",
                    'localStorage.setItem("tt-theme"',
                    'localStorage.getItem("tt-theme")']:
        assert feature in SPA, f"missing: {feature}"
