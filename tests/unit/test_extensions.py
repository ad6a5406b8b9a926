"""Extension system: schema validation, template interpolation, YAML command
execution, loader error accumulation, install/uninstall, bundled catalog.

Mirrors the reference test strategy for extensions (reference
extensions/{schema,loader,yaml_command}.py, SURVEY.md §2.9)."""

import re

import pytest

from tensortruth_tpu.extensions.schema import (
    AgentSpec,
    CommandSpec,
    ExtensionError,
    StepSpec,
)
from tensortruth_tpu.extensions.yaml_command import (
    YamlCommand,
    interpolate,
    interpolate_params,
)

# ---------------------------------------------------------------- interpolate


def test_interpolate_simple_and_missing():
    assert interpolate("hi {{name}}!", {"name": "bob"}) == "hi bob!"
    assert interpolate("({{gone}})", {}) == "()"
    assert interpolate("{{ spaced }}", {"spaced": "x"}) == "x"


def test_interpolate_dotted_dict_path():
    vars = {"result": {"inner": {"deep": 7}}}
    assert interpolate("{{result.inner.deep}}", vars) == "7"
    assert interpolate("{{result.inner.nope}}", vars) == ""


def test_interpolate_regex_match_groups():
    m = re.search(r"v(?P<major>\d+)\.(\d+)", "release v3.14 out")
    assert interpolate("{{m.major}}-{{m.2}}", {"m": m}) == "3-14"
    assert interpolate("{{m.9}}", {"m": m}) == ""  # out-of-range group


def test_interpolate_json_encodes_containers():
    assert interpolate("{{d}}", {"d": {"a": 1}}) == '{"a": 1}'
    assert interpolate("{{l}}", {"l": [1, "x"]}) == '[1, "x"]'


def test_interpolate_params_recurses():
    out = interpolate_params(
        {"q": "{{args}}", "nested": {"k": ["{{args}}", 5]}, "n": 3},
        {"args": "Q"},
    )
    assert out == {"q": "Q", "nested": {"k": ["Q", 5]}, "n": 3}


# ------------------------------------------------------------------- schemas


def test_step_spec_requires_tool():
    with pytest.raises(ExtensionError):
        StepSpec.from_dict({"params": {}})


def test_command_spec_steps_xor_agent():
    with pytest.raises(ExtensionError):
        CommandSpec.from_dict({"name": "x"})  # neither
    with pytest.raises(ExtensionError):
        CommandSpec.from_dict(
            {"name": "x", "agent": "a", "steps": [{"tool": "t"}]}
        )  # both
    ok = CommandSpec.from_dict({"name": "x", "agent": "a"})
    assert ok.agent == "a" and ok.output_template == "{{last_result}}"


def test_command_spec_requires_name():
    with pytest.raises(ExtensionError):
        CommandSpec.from_dict({"steps": [{"tool": "t"}]})


def test_agent_spec_defaults():
    with pytest.raises(ExtensionError):
        AgentSpec.from_dict({})
    a = AgentSpec.from_dict({"name": "research", "max_iterations": "4"})
    assert a.max_iterations == 4 and a.tools == [] and a.model is None


# ----------------------------------------------------------- YamlCommand run


class FakeToolService:
    def __init__(self, results):
        self.results = results  # tool name -> return value
        self.calls = []

    async def execute_tool(self, name, **kwargs):
        self.calls.append((name, kwargs))
        r = self.results[name]
        if isinstance(r, Exception):
            raise r
        return r


async def collect(agen):
    return [e async for e in agen]


async def test_yaml_command_step_pipeline_and_result_vars():
    spec = CommandSpec.from_dict(
        {
            "name": "lookup",
            "steps": [
                {"tool": "search", "params": {"q": "{{args}}"}, "result_var": "hits"},
                {
                    "tool": "fetch",
                    "params": {"data": "{{hits}}"},
                    "result_extract": r"BODY:(.*)",
                },
            ],
            "output_template": "=> {{last_result}} (from {{hits}})",
        }
    )
    svc = FakeToolService({"search": "u1", "fetch": "hdr BODY:payload"})
    events = await collect(YamlCommand(spec, svc).execute("cats", {}))

    assert svc.calls == [("search", {"q": "cats"}), ("fetch", {"data": "u1"})]
    kinds = [e["type"] for e in events]
    assert kinds == ["status", "status", "token", "done"]
    assert events[2]["content"] == "=> payload (from u1)"


async def test_yaml_command_result_extract_no_match_yields_empty():
    spec = CommandSpec.from_dict(
        {
            "name": "x",
            "steps": [{"tool": "t", "result_extract": r"NOPE:(\d+)"}],
        }
    )
    svc = FakeToolService({"t": "nothing here"})
    events = await collect(YamlCommand(spec, svc).execute("", {}))
    assert events[-2] == {"type": "token", "content": ""}


async def test_yaml_command_json_results_are_serialized():
    spec = CommandSpec.from_dict({"name": "j", "steps": [{"tool": "t"}]})
    svc = FakeToolService({"t": {"answer": 42}})
    events = await collect(YamlCommand(spec, svc).execute("", {}))
    assert events[-2]["content"] == '{"answer": 42}'


async def test_yaml_command_agent_delegation():
    from tensortruth_tpu.agents.base import Agent
    from tensortruth_tpu.agents.registry import AgentFactoryRegistry

    class EchoAgent(Agent):
        async def run(self, task, context=None):
            yield {"type": "token", "content": f"agent:{task}"}
            yield {"type": "done"}

    reg = AgentFactoryRegistry.get_instance()
    reg.register("echo-test", lambda ctx: EchoAgent(), user=True)
    try:
        spec = CommandSpec.from_dict({"name": "d", "agent": "echo-test"})
        events = await collect(YamlCommand(spec, None).execute("task!", {}))
        assert events[0]["content"] == "agent:task!"
    finally:
        reg.clear_user_agents()


# --------------------------------------------------------------------- loader


class FakeServices:
    def __init__(self, registry, tool_service=None):
        self.command_registry = registry
        self.tool_service = tool_service


@pytest.fixture
def ext_env(tmp_path, monkeypatch):
    from tensortruth_tpu.server.commands import CommandRegistry

    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    registry = CommandRegistry()
    return tmp_path, FakeServices(registry)


def test_load_user_extensions_registers_and_accumulates_errors(ext_env):
    from tensortruth_tpu.extensions.loader import load_user_extensions

    tmp, services = ext_env
    cmds = tmp / "commands"
    cmds.mkdir()
    (cmds / "good.yaml").write_text(
        "name: greet\naliases: [hi]\nsteps:\n  - tool: echo\n"
    )
    (cmds / "bad_schema.yaml").write_text("name: broken\n")  # no steps/agent
    (cmds / "bad_yaml.yaml").write_text("name: [unclosed\n")
    agents = tmp / "agents"
    agents.mkdir()
    (agents / "a.yaml").write_text("name: researcher\ntools: [search]\n")

    out = load_user_extensions(services)
    assert sorted(out["loaded"]) == ["agents/a.yaml", "commands/good.yaml"]
    assert {e["file"] for e in out["errors"]} == {"bad_schema.yaml", "bad_yaml.yaml"}
    assert services.command_registry.get("greet") is not None
    assert services.command_registry.get("hi").name == "greet"  # alias

    from tensortruth_tpu.agents.registry import AgentFactoryRegistry

    reg = AgentFactoryRegistry.get_instance()
    assert any(a["name"] == "researcher" and a["user"] for a in reg.list_agents())
    reg.clear_user_agents()


def test_load_user_extensions_replaces_previous_user_commands(ext_env):
    from tensortruth_tpu.extensions.loader import load_user_extensions

    tmp, services = ext_env
    cmds = tmp / "commands"
    cmds.mkdir()
    f = cmds / "c.yaml"
    f.write_text("name: one\nsteps:\n  - tool: t\n")
    load_user_extensions(services)
    f.write_text("name: two\nsteps:\n  - tool: t\n")
    load_user_extensions(services)
    assert services.command_registry.get("one") is None  # unregistered
    assert services.command_registry.get("two") is not None


def test_install_extension_validates_before_writing(ext_env):
    from tensortruth_tpu.extensions.loader import install_extension

    tmp, services = ext_env
    with pytest.raises(ValueError):
        install_extension("nope", "a.yaml", "name: x\nagent: a\n")
    with pytest.raises(ValueError):
        install_extension("commands", "../evil.yaml", "name: x\nagent: a\n")
    with pytest.raises(ValueError):
        install_extension("commands", "noext", "name: x\nagent: a\n")
    with pytest.raises(ExtensionError):
        install_extension("commands", "bad.yaml", "name: x\n")  # invalid spec
    assert not (tmp / "commands" / "bad.yaml").exists()

    out = install_extension(
        "commands", "ok.yaml", "name: x\nsteps:\n  - tool: t\n", services=services
    )
    assert out["status"] == "installed"
    assert services.command_registry.get("x") is not None


def test_uninstall_extension(ext_env):
    from tensortruth_tpu.extensions.loader import (
        install_extension,
        uninstall_extension,
    )

    tmp, services = ext_env
    install_extension("commands", "z.yaml", "name: z\nsteps:\n  - tool: t\n")
    assert uninstall_extension("commands", "z.yaml", services=services)
    assert not (tmp / "commands" / "z.yaml").exists()
    assert not uninstall_extension("commands", "z.yaml")  # already gone
    assert not uninstall_extension("commands", "../z.yaml")  # traversal


def test_bundled_catalog_and_install_from_catalog(ext_env):
    from tensortruth_tpu.extensions.loader import (
        get_extension_catalog,
        install_from_catalog,
    )

    tmp, services = ext_env
    catalog = get_extension_catalog()  # offline → bundled extension_library/
    assert catalog, "bundled catalog should ship entries"
    entry = catalog[0]
    out = install_from_catalog(entry["name"], services=services)
    assert out["status"] == "installed"
    assert (tmp / entry["ext_type"] / entry["filename"]).exists()
    with pytest.raises(ValueError):
        install_from_catalog("no-such-extension")


def test_list_installed_extensions(ext_env):
    from tensortruth_tpu.extensions.loader import (
        install_extension,
        list_installed_extensions,
    )

    tmp, _ = ext_env
    assert list_installed_extensions() == []
    install_extension("agents", "r.yaml", "name: r\n")
    listed = list_installed_extensions()
    assert [(e["ext_type"], e["filename"]) for e in listed] == [("agents", "r.yaml")]


def test_agent_command_translates_agent_done_to_token_and_done(event_loop, monkeypatch):
    """Regression: agent-delegated YAML commands yielded raw agent_done,
    which neither the chat route nor the SPA consume — the answer was
    invisible and unsaved. It must surface as token + done."""
    from tensortruth_tpu.agents.registry import AgentFactoryRegistry

    class FakeAgent:
        async def run(self, prompt, context=None):
            yield {"type": "tool_phase", "tools": ["x"], "iteration": 1}
            yield {"type": "agent_done", "content": "the answer", "tool_outputs": []}

    reg = AgentFactoryRegistry.get_instance()
    monkeypatch.setattr(reg, "create", lambda name, ctx=None: FakeAgent())
    cmd = YamlCommand(CommandSpec.from_dict({"name": "ag", "agent": "fake"}), None)

    async def collect():
        return [e async for e in cmd.execute("q", {})]

    events = event_loop.run_until_complete(collect())
    types = [e["type"] for e in events]
    assert types == ["tool_phase", "token", "done"]
    assert events[1]["content"] == "the answer"


def test_user_command_cannot_shadow_builtin():
    """Regression: a user command named like a built-in replaced it, and the
    next reload's unregister_user_commands deleted the name entirely."""
    import pytest as _pytest

    from tensortruth_tpu.server.commands import CommandRegistry, ToolCommand

    class Builtin(ToolCommand):
        name = "web"
        aliases = ["search"]
        description = "builtin"

        async def execute(self, args, context):
            yield {"type": "done"}

    class UserCmd(Builtin):
        is_user_command = True

    reg = CommandRegistry()
    reg.register(Builtin())
    with _pytest.raises(ValueError):
        reg.register(UserCmd())
    assert reg.get("web").is_user_command is False  # built-in survived

    class UserAlias(ToolCommand):
        name = "mine"
        aliases = ["search"]  # collides with the built-in's alias
        description = "user"
        is_user_command = True

        async def execute(self, args, context):
            yield {"type": "done"}

    with _pytest.raises(ValueError):
        reg.register(UserAlias())


def test_user_alias_cannot_shadow_builtin_name():
    """Regression (advisor r2): get() resolves aliases before names, so a
    user alias EQUAL to a built-in command's NAME hijacked that built-in."""
    import pytest as _pytest

    from tensortruth_tpu.server.commands import CommandRegistry, ToolCommand

    class Builtin(ToolCommand):
        name = "web"
        description = "builtin"

        async def execute(self, args, context):
            yield {"type": "done"}

    class UserAliasHijack(ToolCommand):
        name = "mine"
        aliases = ["web"]  # equals the built-in's NAME, not its alias
        description = "user"
        is_user_command = True

        async def execute(self, args, context):
            yield {"type": "done"}

    reg = CommandRegistry()
    reg.register(Builtin())
    with _pytest.raises(ValueError):
        reg.register(UserAliasHijack())
    assert reg.get("web").name == "web"  # built-in still resolves
