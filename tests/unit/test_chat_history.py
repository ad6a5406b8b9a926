"""Chat history building + cleaning (reference tests analog)."""

from tensortruth_tpu.app.config import HistoryCleaningConfig
from tensortruth_tpu.app.history_cleaner import clean_history_content
from tensortruth_tpu.services.chat_history import ChatHistory, ChatHistoryMessage, ChatHistoryService


def _msgs(n_turns):
    out = []
    for i in range(n_turns):
        out.append({"role": "user", "content": f"q{i}"})
        out.append({"role": "assistant", "content": f"a{i}"})
    return out


def test_turn_limiting():
    svc = ChatHistoryService()
    h = svc.build_history(_msgs(10), max_turns=3)
    assert len(h.messages) == 6
    assert h.messages[0].content == "q7"
    assert h.messages[0].role == "user"  # complete-turn invariant


def test_complete_turn_invariant_on_odd_window():
    svc = ChatHistoryService()
    msgs = [{"role": "assistant", "content": "orphan"}] + _msgs(2)
    h = svc.build_history(msgs, max_turns=50)
    assert h.messages[0].role == "user"


def test_zero_turns_disables():
    svc = ChatHistoryService()
    assert svc.build_history(_msgs(2), max_turns=0).is_empty


def test_malformed_skipped():
    svc = ChatHistoryService()
    msgs = [
        "not a dict",
        {"role": "user"},
        {"content": "no role"},
        {"role": "alien", "content": "x"},
        {"role": "user", "content": "ok"},
        {"role": "assistant", "content": "fine"},
    ]
    h = svc.build_history(msgs, max_turns=5)
    assert [m.content for m in h.messages] == ["ok", "fine"]


def test_hard_cap():
    svc = ChatHistoryService()
    h = svc.build_history(_msgs(100), max_turns=99)
    assert len(h.messages) == ChatHistoryService.MAX_HISTORY_TURNS * 2


def test_prompt_string_and_chat_messages():
    h = ChatHistory(messages=(
        ChatHistoryMessage("user", "hi"), ChatHistoryMessage("assistant", "yo"),
    ))
    assert h.to_prompt_string() == "user: hi\nassistant: yo"
    assert h.to_chat_messages()[1] == {"role": "assistant", "content": "yo"}


def test_cleaner_filler_and_whitespace():
    cfg = HistoryCleaningConfig()
    out = clean_history_content("Great question! The answer   is 42.\n\n\n\nDone.", cfg)
    assert out == "The answer is 42.\n\nDone."


def test_cleaner_preserves_indentation():
    cfg = HistoryCleaningConfig()
    code = "def f():\n    return 1"
    assert clean_history_content(code, cfg) == code


def test_cleaner_emoji():
    cfg = HistoryCleaningConfig()
    assert clean_history_content("fix 🚀 the 🎉 bug", cfg) == "fix the bug"


def test_cleaner_disabled_passthrough():
    cfg = HistoryCleaningConfig(enabled=False)
    s = "Great question!   \n\n\n\n x"
    assert clean_history_content(s, cfg) == s


def test_config_zero_turns_disables_history():
    """Regression: config max_history_turns=0 resolved AFTER the explicit
    max_turns==0 guard, and valid[-0:] returned the ENTIRE history."""
    from tensortruth_tpu.app.config import TensorTruthTPUConfig
    from tensortruth_tpu.services.chat_history import ChatHistoryService

    cfg = TensorTruthTPUConfig.default()
    cfg.conversation.max_history_turns = 0
    svc = ChatHistoryService(cfg)
    msgs = [{"role": "user", "content": f"q{i}"} for i in range(6)]
    assert svc.build_history(msgs, max_turns=None).messages == ()
