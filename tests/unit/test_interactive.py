"""Interactive source wizard (scripted input, no network)."""

import pytest

from tensortruth_tpu.app.sources import load_user_sources
from tensortruth_tpu.utils.interactive import (
    add_book_interactive,
    add_library_interactive,
    interactive_add,
)


def scripted(answers):
    it = iter(answers)

    def input_fn(prompt):
        return next(it)

    return input_fn


def test_add_library_sphinx():
    name, cfg = add_library_interactive(
        scripted(["numpy_2.1", "sphinx", "https://numpy.org/objects.inv", "", ""])
    )
    assert name == "numpy_2.1"
    assert cfg == {"doc_type": "sphinx", "inventory_url": "https://numpy.org/objects.inv"}


def test_add_library_doxygen_requires_root():
    with pytest.raises(ValueError):
        add_library_interactive(scripted(["opencv", "doxygen", "", ""]))


def test_add_book():
    name, cfg = add_book_interactive(scripted(["mlbook", "https://x/b.pdf", ""]))
    assert cfg == {"url": "https://x/b.pdf", "pages_per_chunk": 15}


def test_interactive_add_saves(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    interactive_add(
        scripted(["libraries", "jax_0.9", "sphinx", "https://jax.dev/objects.inv", "", ""])
    )
    sources = load_user_sources()
    assert "jax_0.9" in sources["libraries"]
