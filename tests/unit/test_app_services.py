"""Session/project services, task runner, document index/service, pdf utils
(reference tests for session_service/document_index/task_runner analogs)."""

import time

import numpy as np
import pytest

from tensortruth_tpu.app.config import TensorTruthTPUConfig
from tensortruth_tpu.services.document_index import DocumentIndexBuilder
from tensortruth_tpu.services.document_service import DocumentService, make_doc_id
from tensortruth_tpu.services.project_service import ProjectService
from tensortruth_tpu.services.session_service import SessionService
from tensortruth_tpu.services.task_runner import TaskRunner
from tensortruth_tpu.tokenization import load_tokenizer
from tensortruth_tpu.utils.pdf import (
    normalize_math_delimiters,
    pdf_to_text,
    scrub_invalid_chars,
    split_pages_into_chunks,
)

import hashlib


def _stable_seed(t: str) -> int:
    return int.from_bytes(hashlib.blake2b(t.encode(), digest_size=4).digest(), "little")


class FakeEmbedder:
    tokenizer = load_tokenizer()
    model_id = "fake"

    def encode(self, texts, **kw):
        out = np.zeros((len(texts), 8), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(_stable_seed(t))
            v = rng.standard_normal(8)
            out[i] = v / np.linalg.norm(v)
        return out


# -- sessions -----------------------------------------------------------------


def test_session_crud_and_defaults(tmp_path):
    svc = SessionService(tmp_path / "sessions", config=TensorTruthTPUConfig.default())
    s = svc.create_session(modules=["numpy"], params={"temperature": 0.1})
    assert s["params"]["temperature"] == 0.1  # user override wins
    assert s["params"]["reranker_top_n"] == 5  # config default filled
    assert s["params"]["embedding_model"] == "BAAI/bge-m3"

    got = svc.get_session(s["id"])
    assert got["modules"] == ["numpy"]

    svc.add_message(s["id"], "user", "hello", metrics={"x": 1})
    msgs = svc.get_messages(s["id"])
    assert msgs[0]["content"] == "hello" and msgs[0]["metrics"] == {"x": 1}

    svc.set_title(s["id"], "My chat")
    assert svc.get_session(s["id"])["title"] == "My chat"
    assert not svc.get_session(s["id"])["title_needs_update"]

    listing = svc.list_sessions()
    assert listing[0]["id"] == s["id"] and listing[0]["title"] == "My chat"
    assert svc.stats()["total_messages"] == 1

    assert svc.delete_session(s["id"])
    assert svc.get_session(s["id"]) is None
    assert svc.list_sessions() == []


def test_session_update_merges_params(tmp_path):
    svc = SessionService(tmp_path / "s")
    s = svc.create_session(params={"a": 1, "b": 2})
    svc.update_session(s["id"], {"params": {"b": 3}})
    got = svc.get_session(s["id"])
    assert got["params"]["a"] == 1 and got["params"]["b"] == 3


# -- projects -------------------------------------------------------------------


def test_project_crud_and_inheritance(tmp_path):
    svc = ProjectService(tmp_path / "projects")
    p = svc.create_project("ML", modules=["numpy"], system_prompt="be terse",
                           params={"temperature": 0.2})
    ctx = svc.session_context(p["id"])
    assert ctx["modules"] == ["numpy"]
    assert ctx["system_prompt"] == "be terse"
    assert ctx["params"]["temperature"] == 0.2

    svc.update_project(p["id"], {"modules": ["numpy", "jax"]})
    assert svc.get_project(p["id"])["modules"] == ["numpy", "jax"]
    assert len(svc.list_projects()) == 1
    assert svc.delete_project(p["id"])
    assert svc.session_context(p["id"]) == {"modules": [], "params": {}, "system_prompt": ""}


# -- task runner -------------------------------------------------------------------


def test_task_runner_serial_and_progress():
    tr = TaskRunner()
    order = []

    def job(name, fail=False):
        def run(progress):
            progress("working", 1, 2)
            order.append(name)
            if fail:
                raise RuntimeError("boom")
            return name

        return run

    done = []
    t1 = tr.submit("one", job("one"), on_complete=lambda i: done.append(i.id))
    t2 = tr.submit("two", job("two", fail=True))
    for _ in range(100):
        if tr.get(t2.id).status in ("completed", "failed"):
            break
        time.sleep(0.05)
    assert order == ["one", "two"]  # serial execution
    assert tr.get(t1.id).status == "completed"
    assert tr.get(t1.id).result == "one"
    assert tr.get(t2.id).status == "failed"
    assert "boom" in tr.get(t2.id).error
    assert done == [t1.id]
    assert {t.id for t in tr.list()} == {t1.id, t2.id}
    tr.stop()


# -- pdf utils -----------------------------------------------------------------------


def _tiny_pdf(text=b"Hello TPU world this is enough text") -> bytes:
    import zlib

    content = b"BT /F1 12 Tf (" + text + b") Tj ET"
    comp = zlib.compress(content)
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream\nendobj\n%%EOF"
    )


def test_pdf_fallback_extraction():
    assert "Hello TPU world" in pdf_to_text(_tiny_pdf())


def test_math_normalization_and_scrub():
    assert normalize_math_delimiters(r"a \(x^2\) b \[E=mc^2\]") == "a $x^2$ b $$E=mc^2$$"
    assert scrub_invalid_chars("ok\x00bad\x1f") == "okbad"
    assert split_pages_into_chunks(["p"] * 31, 15) == ["\n\n".join(["p"] * 15)] * 2 + ["p"]


# -- document index + service ----------------------------------------------------------


def test_document_index_incremental(tmp_path):
    b = DocumentIndexBuilder(tmp_path / "index", FakeEmbedder(), chunk_sizes=[64, 16], chunk_overlap=4)
    assert not b.exists
    b.add_documents({"doc1": "first document text. " * 50})
    assert b.exists
    n1 = b.load().n_alive
    b.add_documents({"doc2": "second document text. " * 50})
    assert b.load().n_alive > n1
    assert b.doc_ids() == ["doc1", "doc2"]

    b.remove_document("doc1")
    assert b.doc_ids() == ["doc2"]

    # re-upload same id replaces, not duplicates
    b.add_documents({"doc2": "changed text. " * 50})
    assert b.doc_ids() == ["doc2"]

    assert not b.is_stale()
    b2 = DocumentIndexBuilder(tmp_path / "index", FakeEmbedder(), chunk_sizes=[32, 8], chunk_overlap=4)
    assert b2.is_stale()


def test_document_service_pdf_and_text(tmp_path):
    svc = DocumentService(lambda: FakeEmbedder(), chunk_sizes=[64, 16])
    scope = tmp_path / "sessions" / "abc"

    r = svc.add_pdf(scope, "paper.pdf", _tiny_pdf(b"Long enough pdf body " * 20))
    assert r["status"] == "success"
    assert r["chunks"] > 0
    assert (scope / "pdfs").exists() and (scope / "markdown").exists()

    r2 = svc.add_text(scope, "notes.md", "markdown notes " * 100)
    assert r2["status"] == "success"
    assert len(svc.list_documents(scope)) == 2

    svc.remove_document(scope, r["doc_id"])
    assert svc.list_documents(scope) == [r2["doc_id"]]

    assert svc.reindex(scope) == 1

    bad = svc.add_pdf(scope, "scan.pdf", b"%PDF-1.4 nothing")
    assert bad["status"] == "failed"


def test_doc_id_stable():
    a = make_doc_id("report final.pdf", b"data")
    assert a == make_doc_id("report final.pdf", b"data")
    assert a != make_doc_id("report final.pdf", b"other")
    assert " " not in a


def test_modules_route_count_rows(tmp_path):
    """_count_rows (server/routes/modules.py) reads the chunk count from
    the shard manifest or the npy header without loading embeddings."""
    import json

    import numpy as np

    from tensortruth_tpu.server.routes.modules import _count_rows

    d = tmp_path / "mod"
    d.mkdir()
    assert _count_rows(d) is None  # empty dir
    np.save(d / "embeddings.npy", np.zeros((7, 4), np.float32))
    assert _count_rows(d) == 7
    (d / "embeddings.manifest.json").write_text(json.dumps({"n_rows": 123}))
    assert _count_rows(d) == 123  # manifest wins (sharded saves)
    (d / "embeddings.manifest.json").write_text("{corrupt")
    assert _count_rows(d) is None  # corrupt manifest degrades to None


def test_session_params_null_does_not_shadow_defaults(tmp_path, monkeypatch):
    """Regression: explicit null params overrode config defaults with None
    (a None confidence_cutoff later crashes the gate compare)."""
    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    from tensortruth_tpu.app.config import TensorTruthTPUConfig
    from tensortruth_tpu.services.session_service import SessionService

    svc = SessionService(tmp_path / "sessions", config=TensorTruthTPUConfig.default())
    s = svc.create_session(params={"confidence_cutoff": None, "temperature": 0.1})
    assert s["params"]["confidence_cutoff"] == 0.35  # default preserved
    assert s["params"]["temperature"] == 0.1  # real values still override
