"""Regex history cleaning variants (reference app_utils/history_cleaner.py:43-177)."""

import pytest

from tensortruth_tpu.app.config import HistoryCleaningConfig
from tensortruth_tpu.app.history_cleaner import clean_history_content


def _cfg(**kw):
    base = dict(enabled=True, remove_emojis=True, remove_filler_phrases=True,
                normalize_whitespace=True, collapse_newlines=True)
    base.update(kw)
    return HistoryCleaningConfig(**base)


def test_disabled_returns_unchanged():
    s = "Sure!  😀   Let me   help."
    assert clean_history_content(s, _cfg(enabled=False)) == s


def test_emoji_stripped():
    out = clean_history_content("result 🎉🎉 done 🚀", _cfg())
    assert "🎉" not in out and "🚀" not in out
    assert "result" in out and "done" in out


def test_whitespace_and_newlines_normalized():
    out = clean_history_content("a    b\n\n\n\n\nc", _cfg())
    assert "    " not in out
    assert "\n\n\n" not in out


def test_filler_phrases_are_regexes():
    cfg = _cfg()
    cfg.filler_phrases = [r"(?i)certainly!\s*", r"(?i)great question!"]
    out = clean_history_content("Certainly! The answer is 4. Great question!", cfg)
    assert "Certainly" not in out
    assert "The answer is 4." in out


def test_invalid_filler_regex_skipped():
    cfg = _cfg()
    cfg.filler_phrases = ["([unclosed", r"(?i)^sure[,!]?\s*"]
    out = clean_history_content("Sure, here it is", cfg)
    assert out == "here it is"


def test_emoji_preserved_when_off():
    cfg = _cfg(remove_emojis=False)
    assert "🎉" in clean_history_content("yay 🎉", cfg)


def test_cache_keyed_by_config():
    """Same content under different configs must not share cache entries."""
    s = "Sure! okay 🎉"
    a = clean_history_content(s, _cfg())
    b = clean_history_content(s, _cfg(remove_emojis=False))
    assert a != b
