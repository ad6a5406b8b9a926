"""Bundled SPA consistency: the UI is a no-build ES-module app (markup
shell `index.html` + `assets/js/**` modules + `assets/css/app.css`,
mirroring the reference frontend's architecture: typed API clients per
route group, stores, chat components, panels, wizard — reference
frontend/src/{api,hooks,stores,components}). There is no JS engine or
browser in this environment, so these tests statically verify the
contracts that would break the page at runtime: every element id the
script wires must exist in the markup (or be created by a script
template), every REST path the clients call must resolve to a registered
route, every server WS message type must have a handler, the ES-module
import graph must resolve, and brackets must balance per module."""

import re
from pathlib import Path

import pytest
from aiohttp.test_utils import TestClient, TestServer

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.models.manager import ModelManager

pytestmark = pytest.mark.integration

STATIC = Path("tensortruth_tpu/static")
HTML = (STATIC / "index.html").read_text(encoding="utf-8")
JS_FILES = sorted((STATIC / "assets" / "js").rglob("*.js"))
JS = {p.relative_to(STATIC / "assets" / "js").as_posix(): p.read_text(encoding="utf-8")
      for p in JS_FILES}
JS_ALL = "\n".join(JS.values())
CSS = (STATIC / "assets" / "css" / "app.css").read_text(encoding="utf-8")
# Concatenated view for feature-presence checks (markup first, so markup
# regexes anchor in the HTML portion).
SPA = HTML + "\n" + JS_ALL + "\n" + CSS

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


# -- ES-module architecture ---------------------------------------------------

def test_module_layout_mirrors_reference_frontend():
    """Reference frontend/src has api/ (17 typed clients), stores/, hooks
    (WS protocol), components/; the no-build equivalent must keep that
    shape: one client per route group, stores, chat modules, one module
    per management panel, the wizard, and the bootstrap."""
    expected = [
        "app.js",
        "lib/dom.js", "lib/markdown.js",
        "stores/store.js", "stores/session.js", "stores/ui.js",
        "api/client.js", "api/sessions.js", "api/projects.js",
        "api/documents.js", "api/providers.js", "api/modules.js",
        "api/config.js", "api/system.js", "api/startup.js", "api/tasks.js",
        "api/tools.js", "api/extensions.js", "api/mcp.js",
        "api/confirmations.js", "api/arxiv.js",
        "chat/stream.js", "chat/messages.js", "chat/send.js", "chat/ws.js",
        "chat/composer.js", "chat/params.js",
        "views/sidebar.js", "views/manage.js",
        "panels/providers.js", "panels/documents.js", "panels/modules.js",
        "panels/projects.js", "panels/config.js", "panels/system.js",
        "panels/extensions.js", "panels/mcp.js", "panels/tools.js",
        "panels/startup.js",
        "wizard/wizard.js",
    ]
    missing = [m for m in expected if m not in JS]
    assert not missing, f"missing SPA modules: {missing}"


_IMPORT_RE = re.compile(
    r'^import\s*(?:\{([^}]*)\}\s*from\s*)?["\']([^"\']+)["\'];?', re.M
)
_EXPORT_RE = re.compile(
    r"^export\s+(?:async\s+)?(?:function|const|let|class)\s+([\w$]+)", re.M
)


def _norm(path: str) -> str:
    parts = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            parts.pop()
        else:
            parts.append(seg)
    return "/".join(parts)


def test_import_graph_resolves():
    """Every import specifier must point at an existing module, and every
    imported name must be exported there — a typo here is a blank page."""
    exports = {mod: set(_EXPORT_RE.findall(src)) for mod, src in JS.items()}
    problems = []
    for mod, src in JS.items():
        for names, spec in _IMPORT_RE.findall(src):
            target = _norm(str(Path(mod).parent / spec))
            if target not in JS:
                problems.append(f"{mod}: import from missing module {spec!r}")
                continue
            for name in filter(None, (n.split(" as ")[0].strip()
                                      for n in names.split(","))):
                if name not in exports[target]:
                    problems.append(f"{mod}: {name!r} not exported by {target}")
    assert not problems, "\n".join(problems)


def test_api_clients_only_build_on_shared_client():
    """Typed clients must route through api/client.js primitives — no stray
    fetch() elsewhere in api/ (keeps error handling in one place). The two
    exceptions live in client.js itself and the XHR upload / app-level
    reload endpoints, which are explicit."""
    for mod, src in JS.items():
        if not mod.startswith("api/") or mod == "api/client.js":
            continue
        direct = [ln for ln in src.splitlines()
                  if "fetch(" in ln and "reload-extensions" not in ln
                  and not ln.lstrip().startswith("//")]
        assert not direct, f"{mod} bypasses client.js: {direct}"


def test_panel_loaders_are_function_declarations():
    """views/manage.js builds PANEL_LOADERS at module-eval time while the
    panel modules circularly import rowItem back from it. That is only safe
    because function *declarations* are hoisted across circular ES-module
    imports — a `const` arrow would be a TDZ crash at load. Pin the
    convention."""
    for mod, src in JS.items():
        if not mod.startswith("panels/"):
            continue
        m = re.search(r"export\s+async\s+function\s+(load\w+Panel)", src)
        assert m, f"{mod}: panel loader must be an exported async function declaration"


def test_index_html_is_a_markup_shell():
    assert '<script type="module" src="/assets/js/app.js">' in HTML
    assert '<link rel="stylesheet" href="/assets/css/app.css">' in HTML
    assert "<style>" not in HTML and "function " not in HTML


async def test_assets_served(client):
    for url, marker in [
        ("/assets/js/app.js", "wireSidebar"),
        ("/assets/js/api/client.js", "export const api"),
        ("/assets/css/app.css", ":root"),
        ("/assets/js/chat/ws.js", "WS_HANDLERS"),
    ]:
        r = await client.get(url)
        assert r.status == 200, url
        assert marker in (await r.text()), url


# -- id wiring / panels -------------------------------------------------------

def test_every_wired_element_id_exists():
    wired = set(re.findall(r'\$\("([^"]+)"\)', JS_ALL))
    # ids exist in the markup, or are created by a script template
    # (wizard provider form) / property assignment (inp.id = "wiz-model")
    defined = set(re.findall(r'id="([^"]+)"', SPA))
    defined |= set(re.findall(r'\.id = "([^"]+)"', JS_ALL))
    missing = wired - defined
    assert not missing, f"JS wires ids missing from markup: {sorted(missing)}"


def test_all_management_panels_present():
    for p in PANELS:
        assert f'id="panel-{p}"' in HTML, f"panel-{p} missing"
        assert f'data-panel="{p}"' in HTML, f"tab for {p} missing"
    # each panel has a loader registered
    for p in PANELS:
        assert re.search(rf"\b{p}: load\w+Panel", JS["views/manage.js"]), \
            f"no loader for {p}"


def test_new_panels_present():
    for p in ["projects", "tools"]:
        assert f'id="panel-{p}"' in HTML, f"panel-{p} missing"
        assert f'data-panel="{p}"' in HTML, f"tab for {p} missing"
        assert re.search(rf"\b{p}: load\w+Panel", JS["views/manage.js"]), \
            f"no loader for {p}"


async def test_root_serves_spa_with_panels(client):
    r = await client.get("/")
    assert r.status == 200
    html = await r.text()
    for p in PANELS:
        assert f'id="panel-{p}"' in html


async def test_every_js_api_path_resolves(client):
    """Each REST path literal in the typed clients (with template params
    substituted) must hit a registered route — not the SPA catch-all
    (which would return HTML)."""
    calls = set(re.findall(r'\b(?:api|apiFetch|post|patch|del)\(\s*[`"]([^`"]+)[`"]',
                           JS_ALL))
    calls |= set(re.findall(r'fetch\("/api([^"]+)"', JS_ALL))
    calls = {c for c in calls if c.startswith("/")}
    assert len(calls) >= 40, f"typed clients shrank suspiciously: {len(calls)}"
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


# -- WS protocol / wizard / params --------------------------------------------

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
    m = re.search(r"const WS_HANDLERS = \{(.*?)\n\};", JS["chat/ws.js"], re.S)
    assert m, "WS_HANDLERS table missing from chat/ws.js"
    handlers = set(re.findall(r"^\s{2}(\w+)\(", m.group(1), re.M))
    missing = emitted - handlers
    assert not missing, f"WS message types with no SPA handler: {sorted(missing)}"


def test_wizard_structure_complete():
    """Startup wizard: one renderer per step, progress bar, nav controls."""
    assert 'id="wizard"' in HTML
    wiz = JS["wizard/wizard.js"]
    steps = re.search(r'const WIZARD_STEPS = \[([^\]]+)\]', wiz).group(1)
    n_steps = len(re.findall(r'"[^"]+"', steps))
    renderers = len(re.findall(r"^  async body => \{", wiz, re.M))
    assert renderers == n_steps, (renderers, n_steps)
    for eid in ["wizard-next", "wizard-back", "wizard-skip", "wizard-open",
                "wizard-steps", "wizard-body", "wizard-title"]:
        assert f'id="{eid}"' in HTML, eid


def test_params_drawer_fields_match_session_params():
    """Every field in the params drawer must be a param name the server
    actually READS (``params.get("<name>")`` / ``params["<name>"]`` somewhere
    in the package) — a hand-copied expected-set once let the drawer ship a
    ``use_orchestrator`` field while the backend read ``orchestrator_enabled``,
    making the UI toggle a silent no-op."""
    drawer = re.search(r'id="params-drawer".*?</div>\s*</div>', HTML, re.S).group(0)
    fields = set(re.findall(r'name="(\w+)"', drawer))
    expected = {"model", "temperature", "context_window", "reranker_top_n",
                "use_reranker", "confidence_cutoff", "corpus_dtype",
                "orchestrator_enabled", "thinking", "max_tokens",
                "max_iterations", "max_history_turns",
                "confidence_cutoff_hard", "reranker_model",
                "custom_instructions"}
    assert fields == expected, fields ^ expected

    pkg = Path(__file__).resolve().parents[2] / "tensortruth_tpu"
    source = "\n".join(
        p.read_text(encoding="utf-8") for p in pkg.rglob("*.py")
    )
    for name in fields:
        assert (
            f'params.get("{name}"' in source or f'params["{name}"]' in source
        ), f"drawer field {name!r} is never read as a session param server-side"


def test_spa_has_no_control_characters():
    """Regression: a NUL byte once landed in the served HTML (sentinel
    characters pasted literally); control chars break strict parsers."""
    for path in [STATIC / "index.html", STATIC / "assets" / "css" / "app.css",
                 *JS_FILES]:
        raw = path.read_bytes()
        bad = [b for b in raw if b < 9 or (13 < b < 32)]
        assert not bad, f"{len(bad)} control bytes in {path}"


def test_metrics_display_renders_full_schema():
    """The metrics renderer must surface the full RetrievalMetrics schema
    (reference frontend message-metrics display): score distribution,
    diversity, coverage, quality."""
    fn = re.search(r"function renderMetrics.*?\n\}", JS["chat/messages.js"],
                   re.S).group(0)
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


# -- per-module syntax sanity -------------------------------------------------

@pytest.mark.parametrize("mod", sorted(JS), ids=sorted(JS))
def test_spa_script_brackets_balanced(mod):
    """No JS engine exists in this environment, so catch gross syntax
    errors (unclosed blocks/strings) with a string-aware bracket scanner
    over each module."""
    src = JS[mod]
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
                    f"{mod}: unbalanced {c!r} at offset {i}: "
                    f"...{src[max(0, i - 60):i + 20]!r}"
                )
                stack.pop()
        i += 1
    assert not stack, f"{mod}: unclosed brackets: {stack[-8:]}"
    assert not state, f"{mod}: unclosed string/comment context: {state}"


def _regex_position(src, i):
    """Heuristic: a '/' starts a regex when the previous non-space char
    cannot end an expression."""
    j = i - 1
    while j >= 0 and src[j] in " \t":
        j -= 1
    return j < 0 or src[j] in "=(,[{;:!&|?+-*%<>~^\n"


# -- feature presence ---------------------------------------------------------

def test_message_actions_and_toasts_wired():
    for feature in ["copyText(", 'el("div", "actions")', "function toast(",
                    "✕ delete", "renderHistoryMessage("]:
        assert feature in JS_ALL, f"missing UI feature: {feature}"
    assert 'id="toasts"' in HTML


def test_markdown_pipe_tables_supported():
    # table rendering moved to a dedicated block function in the r4 rewrite
    src = JS["lib/markdown.js"]
    assert "<table>" in src and "<thead>" in src and "<td>" in src


def test_session_filter_and_rename_and_stats():
    assert 'id="session-filter"' in HTML
    assert '$("chat-title").ondblclick' in JS["views/sidebar.js"]
    assert 'api("/sessions/stats")' in JS["api/sessions.js"]
    # keyboard shortcuts
    assert '"Escape"' in JS["app.js"] and 'key === "k"' in JS["app.js"]


def test_source_preview_expansion():
    assert 'el("div", "preview"' in JS["chat/messages.js"]
    assert 'classList.toggle("open")' in JS["chat/messages.js"]


def test_chat_controls_wired():
    for feature in ['id="stop-btn"', 'id="send-btn"', 'id="export-btn"',
                    'id="profile-start"', 'id="profile-stop"',
                    'id="runtimes-list"']:
        assert feature in HTML, f"missing: {feature}"
    assert "setStreaming(" in JS["chat/stream.js"]
    assert "↻ resend" in JS["chat/messages.js"]
    # stop sends the protocol stop message with close+reconnect fallback;
    # export builds a markdown blob
    stop_src = JS["chat/ws.js"].split("function stopStreaming")[1]
    assert '{type: "stop"}' in stop_src
    assert "connectWS()" in stop_src
    assert "text/markdown" in JS["views/sidebar.js"]


def test_image_attach_ui_wired():
    """Vision UI: attach button, base64 pipeline into the WS payload,
    persisted-image rendering in history."""
    for feature in ['id="attach-btn"', 'id="image-input"', 'id="attach-row"']:
        assert feature in HTML, f"missing: {feature}"
    assert "readAsDataURL" in JS["chat/composer.js"]
    assert "payload.images = images" in JS["chat/send.js"]
    assert "/images/${imageId}" in JS["api/sessions.js"]
    assert "imageUrl(id, imgId)" in JS["views/sidebar.js"]


def test_config_forms_panel_wired():
    """Structured config editing: scalar fields render per section, and every
    edit writes through to the raw JSON textarea that Save PATCHes — one save
    path, so forms and advanced JSON cannot diverge."""
    cfg = JS["panels/config.js"]
    for feature in ["renderConfigForms(", "setConfigPath(",
                    'type = "checkbox"']:
        assert feature in cfg, f"missing: {feature}"
    assert 'id="config-forms"' in HTML and "Raw JSON (advanced" in HTML
    fn = cfg.split("function setConfigPath")[1][:900]
    assert '$("config-json").value = JSON.stringify(cfg' in fn
    # loader renders forms from the fetched config
    loader = cfg.split("async function loadConfigPanel")[1][:300]
    assert "renderConfigForms(cfg)" in loader


def test_command_autocomplete_wired():
    """Slash-command autocomplete (reference CommandAutocomplete.tsx):
    menu element, /api/commands catalog fetch, keyboard navigation, and
    Enter-accepts-before-submit ordering inside the keydown handler."""
    comp = JS["chat/composer.js"]
    for feature in ["commandCatalog", "acceptCmd(", '"ArrowDown"',
                    '"ArrowUp"', '"Tab"']:
        assert feature in comp, f"missing: {feature}"
    assert 'id="cmd-menu"' in HTML
    assert 'api("/commands")' in JS["api/tools.js"]
    kd = comp.split('$("input").addEventListener("keydown"')[1]
    # menu navigation must be handled before the plain Enter-submit branch
    assert kd.index('"ArrowDown"') < kd.index("requestSubmit")
    # extension reload invalidates the cached catalog
    rl = JS["panels/extensions.js"]
    assert "invalidateCommandCatalog()" in rl.split('$("extensions-reload").onclick')[1]
    assert "cmdList = null" in comp


def test_theme_toggle_wired():
    """Light/dark theme (reference ThemeToggle.tsx): CSS override block,
    header button, localStorage persistence applied on load."""
    assert "body.light {" in CSS
    assert 'id="theme-btn"' in HTML
    for feature in ["applyTheme(", 'localStorage.setItem("tt-theme"',
                    'localStorage.getItem("tt-theme")']:
        assert feature in JS["app.js"], f"missing: {feature}"


def test_responsive_sidebar_drawer_wired():
    """Mobile layout (reference useMediaQuery + drawer): a ≤900px media
    block turns the sidebar into a translate-X drawer behind a scrim,
    toggled by the header button and dismissed by scrim tap or session
    pick."""
    assert "@media (max-width: 900px)" in CSS
    assert "body.sidebar-open aside" in CSS
    assert "transform: translateX(-100%)" in CSS
    assert 'id="sidebar-btn"' in HTML
    app = JS["app.js"]
    assert '$("sidebar-btn").onclick' in app
    assert 'classList.toggle("sidebar-open")' in app
    assert 'classList.remove("sidebar-open")' in app  # scrim/session dismiss


def test_arxiv_ingestion_form_wired():
    """Documents panel can ingest an arXiv paper by id: lookup via the
    typed arxiv client, then index the markdown as a text document."""
    assert 'id="doc-arxiv-form"' in HTML
    docs = JS["panels/documents.js"]
    assert "arxivLookup(" in docs
    assert "addTextDocument(" in docs


def test_welcome_empty_state_wired():
    """Empty sessions show the welcome card (reference WelcomePage.tsx):
    rendered on open when there are no messages, removed by the first real
    message, suggestion buttons fill the composer input."""
    msgs = JS["chat/messages.js"]
    assert "renderWelcome" in msgs
    assert 'card.id = "welcome-card"' in msgs
    assert "WELCOME_PROMPTS" in msgs
    assert "welcome.remove()" in msgs  # first addMessage clears it
    sidebar = JS["views/sidebar.js"]
    assert "renderWelcome()" in sidebar
    assert "msgs.length" in sidebar
    assert ".welcome-prompts" in CSS


def test_image_preview_strip_wired():
    """Pending attachments render as thumbnails with per-image remove
    (reference ImagePreviewStrip.tsx), and both buffers clear on send."""
    comp = JS["chat/composer.js"]
    assert "pendingDataUrls" in comp
    assert "attach-thumb" in comp
    assert "splice(i, 1)" in comp  # per-image remove
    assert "pendingDataUrls = []" in comp  # cleared on successful send
    assert ".attach-thumb img" in CSS


def test_smart_autoscroll():
    """Streaming tokens must not yank the scroll position when the reader
    scrolled up (reference useAutoScroll.ts): token path uses the
    near-bottom-aware helper, own messages force-scroll."""
    dom = JS["lib/dom.js"]
    assert "function scrollMessages" in dom
    assert "nearBottom" in dom
    assert "scrollMessages()" in JS["chat/ws.js"]       # token: respect reader
    assert "scrollMessages(true)" in JS["chat/messages.js"]  # own msg: force
    # the raw scroll yank is gone from the chat modules
    assert 'scrollTop = 1e9' not in JS["chat/ws.js"]
    assert 'scrollTop = 1e9' not in JS["chat/messages.js"]


def test_thinking_param_control():
    """The thinking toggle is a real session param: drawer select present,
    save path coerces its true/false strings to booleans, and the provider
    layer consumes params['thinking'] (core/providers.py create_llm)."""
    assert 'name="thinking"' in HTML
    params = JS["chat/params.js"]
    assert 'v === "true"' in params and 'v === "false"' in params
    import inspect

    from tensortruth_tpu.core import providers

    assert 'params.get("thinking")' in inspect.getsource(providers)


def test_model_quickswitch_wired():
    """Chat-header model switcher (reference ModelSelectContent.tsx +
    ModelStatusDot.tsx): encode/decode of provider::model values, resident
    marker sourced from the ollama status route's `running` list, selection
    PATCHes the session, eject unloads via the runtime route."""
    assert 'id="model-select"' in HTML and 'id="model-eject"' in HTML
    ms = JS["chat/modelselect.js"]
    assert "::" in ms and "decodeModelValue" in ms and "encodeModelValue" in ms
    assert "st.running" in ms              # ● dot fed by /api/ps via the status route
    assert "patchSessionRaw" in ms         # selection persists to session params
    assert "provider_id" in ms             # reference resolve_model contract
    assert "runtimeUnload" in ms           # eject path
    # session open refreshes the switcher to that session's params
    assert "refreshModelSelect(session.params" in JS["views/sidebar.js"]
    # the server side of the dot: status route returns running models
    import inspect

    from tensortruth_tpu.server.routes import system as system_routes

    src = inspect.getsource(system_routes)
    assert "/api/ps" in src and '"running"' in src


def test_thinking_quickselect_matches_drawer():
    """Composer thinking quick-select mirrors the params-drawer thinking
    options (reference ThinkingSelect.tsx) so the two controls can never
    offer different vocabularies."""
    import re as _re

    def options(select_id_or_name):
        m = _re.search(select_id_or_name + r'.*?</select>', HTML, _re.S)
        assert m, select_id_or_name
        return set(_re.findall(r'value="([^"]*)"', m.group(0)))

    drawer = options(r'<select name="thinking">')
    quick = options(r'<select id="thinking-select"')
    assert quick == drawer, (quick, drawer)
    comp = JS["chat/composer.js"]
    assert "syncThinkingSelect" in comp and "thinking-select" in comp
    assert "syncThinkingSelect(session.params" in JS["views/sidebar.js"]


def test_memory_monitor_wired():
    """Sidebar memory strip (reference MemoryMonitor.tsx): polls
    /api/system/memory, renders device HBM vs limit + RAM pressure, and
    opens the System panel on click."""
    assert 'id="memstrip"' in HTML
    assert 'class="mem-label"' in HTML and 'class="mem-bar"' in HTML
    mem = JS["views/memstrip.js"]
    assert "systemMemory" in mem and "setInterval" in mem
    assert "bytes_in_use" in mem and "bytes_limit" in mem
    assert 'showManage(true, "system")' in mem
    assert "wireMemstrip" in JS["app.js"]


def test_project_grouped_sessions():
    """Sidebar groups sessions under their project with collapse state
    persisted (reference ProjectSessionList.tsx): project header rows carry
    new-session and delete actions; flat list holds only project-less
    sessions; opening a session hands it to the module picker."""
    sb = JS["views/sidebar.js"]
    assert "s.project_id === pr.id" in sb      # nested under the right project
    assert "!s.project_id" in sb               # flat list excludes project sessions
    assert "tt-collapsed" in sb                # collapse persistence
    assert "createProjectSession" in sb and "deleteProject" in sb
    assert "syncModulePicker(session)" in sb   # composer badge tracks the session
    assert "project-head" in CSS and ".session.nested" in CSS


def test_generation_stats_displayed():
    """The done message's stats (est_tokens/duration/tok-s) render under the
    assistant message (reference ResponseStats on MessageItem.tsx)."""
    msgs = JS["chat/messages.js"]
    assert "renderStats" in msgs
    assert "est_tokens" in msgs and "tokens_per_s" in msgs
    assert "renderStats(stream.assistant, msg.stats)" in JS["chat/ws.js"]
    assert ".gen-stats" in CSS
    # server side actually sends them on both chat paths
    import inspect

    from tensortruth_tpu.server.routes import chat as chat_routes

    src = inspect.getsource(chat_routes)
    assert src.count('"stats"') >= 2  # direct + orchestrator done messages


def test_long_user_messages_collapse():
    """Long pasted user messages clamp with an expander (reference
    MessageItem.tsx USER_MSG_COLLAPSED_PX)."""
    msgs = JS["chat/messages.js"]
    assert "clamped" in msgs and "show more" in msgs and "show less" in msgs
    assert ".msg.user .body.clamped" in CSS and "max-height" in CSS


def test_documents_panel_is_scope_aware():
    """Documents panel serves BOTH scope types (reference DocumentPanel.tsx
    ScopeType): a scope dropdown listing the open session and every project,
    a file-upload control inside the panel, and a scope-generic API client
    whose scopePath covers /sessions/{id} and /projects/{id}."""
    apidoc = JS["api/documents.js"]
    assert "export function scopePath" in apidoc
    assert '"project" ? "projects" : "sessions"' in apidoc
    # every document call routes through scopePath — no hardcoded scope
    assert "`/sessions/${sessionId}/documents`" not in apidoc
    assert apidoc.count("scopePath(scope)") >= 6
    panel = JS["panels/documents.js"]
    for feature in ["listProjects", 'kind === "project"', "uploadDocumentXHR(",
                    '$("doc-scope").onchange']:
        assert feature in panel, f"missing: {feature}"
    for el_id in ["doc-scope", "doc-upload-btn", "doc-file-input"]:
        assert f'id="{el_id}"' in HTML, f"missing element: {el_id}"
    # sidebar's session upload still rides the back-compat string scope
    assert "uploadDocumentXHR(currentSessionId()" in JS["views/sidebar.js"]


def test_source_status_and_type_badges():
    """Sources display fetch-status and type chips + error text (reference
    WebSearchSources.tsx getStatusBadge / SourceCard type badges) and fall
    back to the snippet when a failed fetch has no content."""
    msgs = JS["chat/messages.js"]
    for feature in ["STATUS_BADGES", '"src-badge " + s.status', "s.error",
                    "s.content || s.snippet"]:
        assert feature in msgs, f"missing: {feature}"
    for cls in [".src-badge", ".src-badge.failed", ".src-error"]:
        assert cls in CSS, f"missing CSS: {cls}"
    # wire-schema contract: the fields the JS reads exist in SourceNode.to_dict
    import inspect

    from tensortruth_tpu.core.source import SourceNode
    src = inspect.getsource(SourceNode.to_dict)
    for field in ['"type"', '"status"', '"error"', '"snippet"']:
        assert field in src, f"SourceNode.to_dict lost {field}"


def test_reset_stream_removes_reasoning_box():
    """resetStream must remove the ephemeral reasoning box from the DOM
    (via clearReasoning), not just null the reference — a wedged-socket
    stop would otherwise orphan the never-persisted box in the message."""
    body = JS["chat/stream.js"].split("export function resetStream")[1]
    assert "clearReasoning()" in body
    assert "reasoningBox = null" not in body  # removal owns the reference


# -- r5 panel depth (VERDICT r4 item 2) ---------------------------------------


def test_config_field_specs_cover_real_paths():
    """Every FIELD_SPECS path must name a real config field — specs rot
    silently otherwise — and the validation machinery must be wired."""
    cfg_js = JS["panels/config.js"]
    for feature in ["FIELD_SPECS", "validateNumber(", "markInvalid(",
                    "selectInput(", "listInput(", "reset section",
                    "cfg-input.invalid"]:
        assert feature in cfg_js, f"missing: {feature}"
    import re as _re

    from tensortruth_tpu.app.config import TensorTruthTPUConfig

    cfg = TensorTruthTPUConfig.default().to_dict()
    paths = _re.findall(r'"([a-z_]+\.[a-z_]+)": \{', cfg_js)
    assert len(paths) >= 20, "typed widget coverage regressed"
    for p in paths:
        sec, key = p.split(".")
        assert sec in cfg and key in cfg[sec], f"FIELD_SPECS names ghost path {p}"


def test_config_save_surfaces_422_detail_list():
    cfg_js = JS["panels/config.js"]
    assert "Array.isArray(body.detail)" in cfg_js  # schemas.py 422 shape
    assert "fix the highlighted fields first" in cfg_js  # invalid gate on Save


def test_providers_panel_feedback_states():
    p = JS["panels/providers.js"]
    for feature in ["Testing…", "probeCache", "discoveryBanner(",
                    "validateProviderForm(", "reachBadge(", "Edit URL",
                    "confirm(`Delete provider"]:
        assert feature in p, f"missing: {feature}"
    assert ".badge.err" in CSS


def test_provider_form_validation_rules():
    p = JS["panels/providers.js"]
    assert "id must be a slug" in p
    assert "openai_compatible providers need a base URL" in p
    assert "https?:\\/\\/" in p or "^https?:" in p


def test_documents_panel_per_doc_affordances():
    d = JS["panels/documents.js"]
    for feature in ["uploadQueue(", "documents-summary", "chunks_removed",
                    "confirm(`Remove", "Reindexing…", "docRow("]:
        assert feature in d, f"missing: {feature}"
    assert 'id="documents-summary"' in HTML
    assert "multiple" in HTML.split('id="doc-file-input"')[1].split(">")[0] or \
        "multiple" in HTML.split('id="doc-file-input"')[0].rsplit("<input", 1)[1]


async def test_config_patch_error_body_shape_matches_js_reader(client):
    """The JS reads Array detail of {loc, msg}; the server must keep that
    contract for invalid patches."""
    r = await client.patch("/api/config", json={"not_a_section": {}})
    assert r.status == 422
    body = await r.json()
    assert isinstance(body["detail"], list)
    assert {"loc", "msg"} <= set(body["detail"][0].keys())


async def test_providers_panel_route_surface(client):
    """Drive every route the providers panel calls, including the failure
    states its badges render from."""
    r = await client.post("/api/providers", json={
        "id": "drive-ollama", "type": "ollama",
        "base_url": "http://127.0.0.1:1", "api_key": ""})
    assert r.status == 200
    r = await client.get("/api/providers")
    ids = [p["id"] for p in (await r.json())["providers"]]
    assert "drive-ollama" in ids
    # test: unreachable provider must report ok=False + error (the ✗ state)
    r = await client.post("/api/providers/test", json={
        "type": "ollama", "base_url": "http://127.0.0.1:1", "api_key": ""})
    body = await r.json()
    assert body["ok"] is False and body.get("error")
    # patch (Edit URL), then delete
    r = await client.patch("/api/providers/drive-ollama",
                           json={"base_url": "http://127.0.0.1:2"})
    assert r.status == 200
    r = await client.delete("/api/providers/drive-ollama")
    assert r.status == 200
    r = await client.delete("/api/providers/drive-ollama")
    assert r.status == 404  # delete feedback path


async def test_documents_panel_route_surface(client):
    """Drive the per-doc affordance routes: list shape with chunks, delete
    with chunks_removed, 404 surfacing, reindex count."""
    r = await client.post("/api/sessions", json={})
    sid = (await r.json())["id"]
    r = await client.post(f"/api/sessions/{sid}/documents",
                          json={"filename": "a.md", "text": "alpha " * 200})
    assert r.status == 200
    doc_id = (await r.json())["doc_id"]
    r = await client.get(f"/api/sessions/{sid}/documents")
    docs = (await r.json())["documents"]
    assert docs and {"id", "filename", "chunks"} <= set(docs[0].keys())
    assert docs[0]["chunks"] > 0
    r = await client.post(f"/api/sessions/{sid}/documents/reindex")
    assert (await r.json())["documents"] >= 1
    r = await client.delete(f"/api/sessions/{sid}/documents/{doc_id}")
    body = await r.json()
    assert body["chunks_removed"] > 0
    r = await client.delete(f"/api/sessions/{sid}/documents/{doc_id}")
    assert r.status == 404  # the JS surfaces this as a delete-failed toast


def test_image_paste_and_drop_wired():
    """Clipboard-paste and drag-drop images reach the same attach path as
    the picker (reference useImageAttachment.ts parity)."""
    comp = JS["chat/composer.js"]
    for feature in ["attachFile", 'addEventListener("paste"', "clipboardData",
                    '"dragover"', '"drop"', "dataTransfer",
                    'startsWith("image/")']:
        assert feature in comp, f"missing: {feature}"
    assert "#composer.dragging" in CSS


def test_modules_client_supports_model_filter():
    mods = JS["api/modules.js"]
    assert "embedding_model=" in mods  # reference ModuleSelector filter


async def test_projects_panel_rename_and_prompt_routes(client):
    """The Rename/Prompt buttons PATCH name/system_prompt (reference
    ProjectConfigPanel editing); drive the exact payload shapes the JS sends."""
    r = await client.post("/api/projects", json={"name": "alpha"})
    pid = (await r.json())["id"]
    r = await client.patch(f"/api/projects/{pid}", json={"name": "beta"})
    assert r.status == 200
    r = await client.patch(f"/api/projects/{pid}",
                           json={"system_prompt": "answer in haiku"})
    assert r.status == 200
    r = await client.get(f"/api/projects/{pid}")
    body = await r.json()
    assert body["name"] == "beta"
    sp = (body.get("config") or {}).get("system_prompt") or body.get("system_prompt")
    assert sp == "answer in haiku"
    # clearing via null (the JS sends null for an emptied prompt)
    r = await client.patch(f"/api/projects/{pid}", json={"system_prompt": None})
    assert r.status == 200
    r = await client.delete(f"/api/projects/{pid}")
    assert r.status == 200


def test_no_unused_named_imports():
    """Named imports that nothing in the module body references are dead
    dependency edges — they mislead readers about coupling and silently
    survive refactors (the JS has no linter in this image; this is the
    eslint no-unused-vars subset that matters for module hygiene)."""
    bad = []
    for rel, src in JS.items():
        body = re.sub(r'import\s*\{[^}]*\}\s*from\s*"[^"]*";\s*', "", src)
        for m in re.finditer(r"import\s*\{([^}]*)\}\s*from", src):
            for name in m.group(1).split(","):
                name = name.strip()
                if not name:
                    continue
                name = name.split(" as ")[-1].strip()
                pat = r"(?<![\w$])" + re.escape(name) + r"(?![\w$])"
                if not re.search(pat, body):
                    bad.append(f"{rel}: {name}")
    assert not bad, f"unused named imports: {bad}"
