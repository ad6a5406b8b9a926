"""Query micro-batching: coalescing, correctness, error propagation."""

import threading
import time

import numpy as np
import pytest

from tensortruth_tpu.services.batcher import QueryBatcher


def test_coalesces_concurrent_requests():
    calls = []

    def run_batch(texts, key=None):
        calls.append(list(texts))
        time.sleep(0.02)
        return [t.upper() for t in texts]

    b = QueryBatcher(run_batch, max_batch=8, max_wait_ms=30)
    futures = [b.submit(f"q{i}") for i in range(6)]
    results = [f.result(5) for f in futures]
    assert results == [f"Q{i}" for i in range(6)]
    assert b.requests_served == 6
    assert b.batches_run < 6  # at least some coalescing happened
    assert max(len(c) for c in calls) > 1
    b.stop()


def test_max_batch_respected():
    def run_batch(texts, key=None):
        assert len(texts) <= 3
        return texts

    b = QueryBatcher(run_batch, max_batch=3, max_wait_ms=50)
    futures = [b.submit(f"q{i}") for i in range(10)]
    assert [f.result(5) for f in futures] == [f"q{i}" for i in range(10)]
    b.stop()


def test_error_propagates_to_all():
    def run_batch(texts, key=None):
        raise RuntimeError("device on fire")

    b = QueryBatcher(run_batch, max_batch=4, max_wait_ms=20)
    futures = [b.submit("x") for _ in range(3)]
    for f in futures:
        with pytest.raises(RuntimeError, match="device on fire"):
            f.result(5)
    b.stop()


def test_requests_with_different_keys_never_share_a_dispatch():
    """Engine pinning: a reload mid-window must not mix two engines' queries."""
    seen = []

    def run_batch(texts, key):
        seen.append((key, list(texts)))
        return [f"{key}:{t}" for t in texts]

    b = QueryBatcher(run_batch, max_batch=16, max_wait_ms=40)
    futures = [b.submit(f"q{i}", key="engineA" if i % 2 else "engineB") for i in range(8)]
    results = [f.result(5) for f in futures]
    for i, r in enumerate(results):
        assert r == f"{'engineA' if i % 2 else 'engineB'}:q{i}"
    for key, texts in seen:
        assert all(t in [f"q{i}" for i in range(8)] for t in texts)
        # each dispatch carries exactly one key's requests
        parity = {int(t[1:]) % 2 for t in texts}
        assert len(parity) == 1
    b.stop()


def test_rag_service_batched_matches_unbatched(tmp_path, monkeypatch, tiny_tokenizer):
    """Batched retrieval returns the same sources as the unbatched path."""
    from tensortruth_tpu.app.config import TensorTruthTPUConfig
    from tensortruth_tpu.app.sources import save_user_sources
    from tensortruth_tpu.indexing.builder import build_module
    from tensortruth_tpu.models.manager import ModelManager
    from tensortruth_tpu.services.rag_service import RAGService
    from tensortruth_tpu.tokenization import load_tokenizer

    monkeypatch.setenv("TENSOR_TRUTH_TPU_DATA_DIR", str(tmp_path))
    ModelManager.reset_instance()
    sources = {"libraries": {"m": {}}, "papers": {}, "books": {}}
    save_user_sources(sources, tmp_path / "sources.json")
    docs = tmp_path / "library_docs" / "library_m"
    docs.mkdir(parents=True)
    docs.joinpath("a.md").write_text("Mesh sharding and collectives. " * 150)

    class E:
        tokenizer = load_tokenizer()

        def encode(self, texts, **kw):
            import hashlib

            out = np.zeros((len(texts), 64), np.float32)
            for i, t in enumerate(texts):
                seed = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=4).digest(), "little"
                )
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(64)
                out[i] = v / np.linalg.norm(v)
            return out

    build_module("m", E(), library_docs_dir=tmp_path / "library_docs",
                 indexes_dir=tmp_path / "indexes", sources=sources,
                 embedding_model="tiny-embedder", chunk_sizes=[128, 32], chunk_overlap=8)
    cfg = TensorTruthTPUConfig.default()
    cfg.rag.default_embedding_model = "tiny-embedder"
    cfg.rag.default_reranker = "tiny-reranker"
    cfg.rag.use_fused_topk = False

    svc = RAGService(config=cfg, llm_factory=lambda p: None)
    svc.load_engine(["m"], {"reranker_top_n": 3}, indexes_dir=tmp_path / "indexes")

    queries = [f"sharding question {i}" for i in range(4)]
    unbatched = [svc.retrieve(q) for q in queries]

    svc.enable_batching(max_batch=4, max_wait_ms=40)
    results = [None] * 4

    def worker(i):
        results[i] = svc.retrieve(queries[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.disable_batching()

    for u, b in zip(unbatched, results):
        assert [s.id for s in u.sources] == [s.id for s in b.sources]
        np.testing.assert_allclose(
            [s.score for s in u.sources], [s.score for s in b.sources],
            rtol=1e-3, atol=1e-3,
        )
    assert svc._batcher is None

def test_partial_group_failure_isolated():
    """One engine-group failing must not poison another group's futures."""
    def run_batch(texts, key):
        if key == "bad":
            raise RuntimeError("engine gone")
        return [t + "!" for t in texts]

    b = QueryBatcher(run_batch, max_batch=16, max_wait_ms=40)
    good = [b.submit(f"g{i}", key="good") for i in range(3)]
    bad = [b.submit(f"b{i}", key="bad") for i in range(3)]
    assert [f.result(5) for f in good] == ["g0!", "g1!", "g2!"]
    for f in bad:
        with pytest.raises(RuntimeError, match="engine gone"):
            f.result(5)
    b.stop()


def test_retrieve_timeout_raises():
    def run_batch(texts, key):
        time.sleep(5)
        return texts

    b = QueryBatcher(run_batch, max_batch=2, max_wait_ms=5)
    from concurrent.futures import TimeoutError as FTimeout

    with pytest.raises(FTimeout):
        b.retrieve("x", timeout=0.2)
    b.stop()


def test_wrong_result_count_fails_all_in_group():
    def run_batch(texts, key):
        return texts[:-1]  # one short

    b = QueryBatcher(run_batch, max_batch=4, max_wait_ms=20)
    futures = [b.submit(f"q{i}") for i in range(3)]
    for f in futures:
        with pytest.raises(RuntimeError, match="returned"):
            f.result(5)
    b.stop()


def test_stop_then_start_recovers():
    def run_batch(texts, key):
        return [t.upper() for t in texts]

    b = QueryBatcher(run_batch, max_batch=4, max_wait_ms=10)
    assert b.retrieve("a", timeout=5) == "A"
    b.stop()
    time.sleep(0.15)  # let the worker observe the stop event
    assert b.retrieve("b", timeout=5) == "B"  # submit() restarts the worker
    b.stop()


def test_two_phase_run_batch_resolves_when_idle():
    """A run_batch returning a finisher (two-phase protocol) must still
    resolve callers promptly when nothing else is queued."""
    calls = {"dispatch": 0, "finish": 0}

    def run_batch(texts, key):
        calls["dispatch"] += 1

        def finish():
            calls["finish"] += 1
            return [t.upper() for t in texts]

        return finish

    b = QueryBatcher(run_batch, max_batch=4, max_wait_ms=10)
    assert b.retrieve("a", timeout=5) == "A"
    assert calls == {"dispatch": 1, "finish": 1}
    b.stop()


def test_two_phase_overlaps_under_load():
    """Under continuous load, batch B's finisher runs AFTER batch B+1's
    dispatch (double-buffering), and every future still resolves correctly."""
    order = []

    def run_batch(texts, key):
        order.append(("dispatch", tuple(texts)))

        def finish():
            order.append(("finish", tuple(texts)))
            return [t * 2 for t in texts]

        return finish

    b = QueryBatcher(run_batch, max_batch=1, max_wait_ms=1)
    # Pre-start worker is racing us; enqueue quickly so the queue is
    # non-empty when the first dispatch completes.
    futs = [b.submit(t) for t in ["a", "b", "c", "d"]]
    results = [f.result(10) for f in futs]
    assert results == ["aa", "bb", "cc", "dd"]
    # every dispatch/finish happened exactly once per batch
    dispatches = [o for o in order if o[0] == "dispatch"]
    finishes = [o for o in order if o[0] == "finish"]
    assert len(dispatches) == len(finishes) == 4
    # at least one finish was deferred past the next dispatch (overlap);
    # scheduling jitter means not necessarily all of them
    deferred = any(
        order.index(("finish", d[1])) > order.index(("dispatch", dispatches[i + 1][1]))
        for i, d in enumerate(dispatches[:-1])
    )
    assert deferred, order
    b.stop()


def test_two_phase_finisher_exception_fails_batch():
    def run_batch(texts, key):
        def finish():
            raise ValueError("device exploded")

        return finish

    b = QueryBatcher(run_batch, max_batch=4, max_wait_ms=10)
    f = b.submit("q")
    with pytest.raises(ValueError, match="exploded"):
        f.result(5)
    b.stop()


def test_two_phase_drains_pending_on_stop():
    """stop() must run an outstanding finisher rather than strand callers."""
    import threading

    release = threading.Event()

    def run_batch(texts, key):
        def finish():
            return [t for t in texts]

        return finish

    b = QueryBatcher(run_batch, max_batch=1, max_wait_ms=1)
    # keep the queue non-empty so the first batch's finisher stays pending,
    # then stop while it is deferred
    f1 = b.submit("one")
    f2 = b.submit("two")
    r1, r2 = f1.result(10), f2.result(10)
    assert (r1, r2) == ("one", "two")
    b.stop()


def test_two_phase_pending_not_starved_by_direct_batches():
    """A two-phase batch's finisher must settle after ANY later dispatch —
    sustained direct (non-callable) traffic from a second engine (e.g.
    rerankerless, returning plain lists) previously kept the queue busy and
    deferred the two-phase callers until a gap or their future timeout."""
    import threading

    KEY_TWO_PHASE, KEY_DIRECT = object(), object()
    resolved = threading.Event()

    def run_batch(texts, key):
        if key is KEY_TWO_PHASE:
            def finish():
                resolved.set()
                return list(texts)
            return finish
        return list(texts)  # direct: device work completes inline

    b = QueryBatcher(run_batch, max_batch=1, max_wait_ms=1)
    f_tp = b.submit("slow", key=KEY_TWO_PHASE)
    # a steady stream of direct requests keeps the queue non-empty
    stop_feed = threading.Event()

    def feeder():
        while not stop_feed.is_set():
            b.submit("d", key=KEY_DIRECT)
            time.sleep(0.002)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        # the two-phase future must settle promptly, NOT wait for a gap
        assert f_tp.result(timeout=2.0) == "slow"
        assert resolved.is_set()
    finally:
        stop_feed.set()
        t.join(timeout=2)
        b.stop()
