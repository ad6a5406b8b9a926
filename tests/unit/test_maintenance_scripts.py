"""Maintenance CLI scripts (reference scripts/check_invalid_characters.py,
scripts/normalize_math_delimiters.py) driven against tmp markdown files."""

import importlib.util
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).parent.parent.parent / "scripts"


def _load(name):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def docs_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    d = tmp_path / "library_docs" / "papers_x"
    d.mkdir(parents=True)
    return d


def test_check_invalid_chars_reports_and_fixes(docs_dir, monkeypatch, capsys):
    bad = docs_dir / "bad.md"
    bad.write_text("ok � mid \x00 end", encoding="utf-8")
    clean = docs_dir / "clean.md"
    clean.write_text("all fine", encoding="utf-8")

    mod = _load("check_invalid_characters")
    monkeypatch.setattr(sys, "argv", ["check_invalid_characters.py"])
    assert mod.main() == 1  # report-only run flags the bad file
    out = capsys.readouterr().out
    assert "bad.md" in out and "2 invalid character(s)" in out

    monkeypatch.setattr(sys, "argv", ["check_invalid_characters.py", "--fix"])
    assert mod.main() == 0
    assert bad.read_text(encoding="utf-8") == "ok  mid  end"

    monkeypatch.setattr(sys, "argv", ["check_invalid_characters.py"])
    assert mod.main() == 0  # clean after fix


def test_normalize_math_delimiters_batch_and_dry_run(docs_dir, monkeypatch, capsys):
    f = docs_dir / "math.md"
    f.write_text(r"inline \(a+b\) display \[x^2\]", encoding="utf-8")

    mod = _load("normalize_math_delimiters")
    monkeypatch.setattr(sys, "argv", ["normalize_math_delimiters.py", "--dry-run"])
    assert mod.main() == 0
    assert "would change" in capsys.readouterr().out
    assert r"\(a+b\)" in f.read_text(encoding="utf-8")  # untouched

    monkeypatch.setattr(sys, "argv", ["normalize_math_delimiters.py"])
    assert mod.main() == 0
    assert f.read_text(encoding="utf-8") == "inline $a+b$ display $$x^2$$"


def test_single_file_mode(tmp_path, monkeypatch):
    f = tmp_path / "one.md"
    f.write_text("x �", encoding="utf-8")
    mod = _load("check_invalid_characters")
    monkeypatch.setattr(sys, "argv", ["check_invalid_characters.py", "--file", str(f), "--fix"])
    assert mod.main() == 0
    assert f.read_text(encoding="utf-8") == "x "
