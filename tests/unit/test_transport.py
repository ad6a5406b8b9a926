"""Cross-process DCN transport: framing, worker RPC, and the 2-process
multi-slice search path (VERDICT r2 #4 — the multi-slice story must cross a
real process boundary, not just an in-process stub)."""

import socket
import threading

import numpy as np
import pytest

from tensortruth_tpu.ops.ivf import build_ivf
from tensortruth_tpu.parallel.multislice import MultiSliceIVF
from tensortruth_tpu.parallel.transport import (
    LocalTransport,
    SocketTransport,
    SupervisedTransport,
    _recv_frame,
    _send_frame,
    load_ivf_part,
    save_ivf_part,
    spawn_slice_worker,
)


def _corpus(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_frame_roundtrip_over_socketpair():
    a, b = socket.socketpair()
    try:
        arrays = {
            "q": np.arange(12, dtype=np.float32).reshape(3, 4),
            "ids": np.array([[1, -1]], dtype=np.int64),
        }
        t = threading.Thread(
            target=lambda: _send_frame(a, {"cmd": "search", "k": 5}, arrays)
        )
        t.start()
        header, got = _recv_frame(b)
        t.join()
        assert header["cmd"] == "search" and header["k"] == 5
        np.testing.assert_array_equal(got["q"], arrays["q"])
        np.testing.assert_array_equal(got["ids"], arrays["ids"])
        assert got["q"].dtype == np.float32 and got["ids"].dtype == np.int64
    finally:
        a.close()
        b.close()


def test_ivf_part_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    emb = _corpus(rng, 600, 16)
    index = build_ivf(emb, n_clusters=8, sample_size=600, kmeans_iters=3)
    save_ivf_part(index, tmp_path / "part.npz")
    loaded = load_ivf_part(tmp_path / "part.npz")
    np.testing.assert_array_equal(np.asarray(loaded.row_map), index.row_map)
    np.testing.assert_allclose(
        np.asarray(loaded.centroids), np.asarray(index.centroids), rtol=1e-6
    )
    assert loaded.n_actual == index.n_actual
    assert np.asarray(loaded.blocks).shape == np.asarray(index.blocks).shape


@pytest.mark.slow
def test_multislice_search_crosses_process_boundary(tmp_path):
    """2-process e2e: group 1 is served by a REAL worker subprocess over a
    socket; results must match the all-local coordinator exactly. The
    coordinator's local copy of group 1 is dropped, so any hit from its
    cluster range can only have crossed the process boundary."""
    rng = np.random.default_rng(7)
    emb = _corpus(rng, 4_000, 32)
    index = build_ivf(emb, n_clusters=16, sample_size=4_000, kmeans_iters=5)
    q = _corpus(rng, 16, 32)
    k, nprobe = 10, 16  # probe everything → all groups touched

    local = MultiSliceIVF(index, n_groups=2)
    v_ref, r_ref = local.search(q, k=k, nprobe=nprobe)

    remote = MultiSliceIVF(index, n_groups=2)
    remote.save_part(1, tmp_path / "g1.npz")
    cluster_lo = remote.groups[1].cluster_lo
    proc, port = spawn_slice_worker(
        tmp_path / "g1.npz", cluster_lo=cluster_lo, startup_timeout=180
    )
    try:
        t = SocketTransport("127.0.0.1", port)
        assert t.ping()
        remote.attach_transport(1, t)
        assert remote.groups[1].index is None  # local copy really dropped
        v, r = remote.search(q, k=k, nprobe=nprobe)
        np.testing.assert_array_equal(r, r_ref)
        np.testing.assert_allclose(v, v_ref, rtol=1e-4, atol=1e-5)
        # at least one hit must come from the remote group's cluster range
        # (nprobe=all ensures both groups contribute)
        remote_rows = set()
        idx1 = local.groups[1].index
        remote_rows = set(int(x) for x in np.asarray(idx1.row_map).ravel() if x >= 0)
        assert any(int(x) in remote_rows for x in r.ravel() if x >= 0), (
            "no result row came from the worker-held cluster range"
        )
        # second round-trip on the same connection (persistent socket)
        v2, r2 = remote.search(q[:4], k=k, nprobe=nprobe)
        np.testing.assert_array_equal(r2, r_ref[:4])
        t.shutdown_worker()
        proc.wait(timeout=30)
        assert proc.returncode == 0
    finally:
        if proc.poll() is None:
            proc.kill()
        local.close()
        remote.close()


def test_socket_transport_error_reporting():
    """A transport pointed at a dead port fails loudly, not silently."""
    t = SocketTransport("127.0.0.1", 1, timeout=2)
    assert t.ping() is False
    with pytest.raises(OSError):
        t.search(np.zeros((1, 4), np.float32), k=1, nprobe=1)


def test_worker_error_rpc_keeps_connection_usable(tmp_path):
    """A failed search RPC reports an error status and the SAME connection
    serves the next request (per-request error isolation in the worker)."""
    import threading as th

    from tensortruth_tpu.parallel import slice_worker

    rng = np.random.default_rng(1)
    emb = _corpus(rng, 400, 16)
    index = build_ivf(emb, n_clusters=4, sample_size=400, kmeans_iters=2)
    save_ivf_part(index, tmp_path / "p.npz")

    # run the worker loop in-thread on an ephemeral port
    import socket as sk

    srv_ready = th.Event()
    port_holder = {}

    def run():
        import io
        import sys as _sys

        class PortSniffer(io.StringIO):
            def write(self, s):
                if s.startswith("PORT "):
                    port_holder["port"] = int(s.split()[1])
                    srv_ready.set()
                return len(s)

            def flush(self):
                pass

        old = _sys.stdout
        _sys.stdout = PortSniffer()
        try:
            slice_worker.serve(str(tmp_path / "p.npz"), 0)
        finally:
            _sys.stdout = old

    t = th.Thread(target=run, daemon=True)
    t.start()
    assert srv_ready.wait(60)
    tr = SocketTransport("127.0.0.1", port_holder["port"])
    # bad request: wrong dtype header handled → error, not crash
    sock = tr._connect()
    _send_frame(sock, {"cmd": "search", "k": 5, "nprobe": 2}, {})  # no q array
    header, _ = _recv_frame(sock)
    assert header["status"] == "error"
    # same connection still works
    q = _corpus(rng, 2, 16)
    vals, rows = tr.search(q, k=5, nprobe=2)
    assert vals.shape == (2, 5) and rows.shape == (2, 5)
    tr.shutdown_worker()
    t.join(timeout=30)
    assert not t.is_alive()


def test_local_transport_delegates_and_closes():
    class FakeGroup:
        def __init__(self):
            self.calls = []

        def search(self, q, k, nprobe):
            self.calls.append((q.shape, k, nprobe))
            return np.zeros((q.shape[0], k), np.float32), np.zeros((q.shape[0], k), np.int64)

    g = FakeGroup()
    t = LocalTransport(g)
    v, r = t.search(np.zeros((2, 4), np.float32), k=3, nprobe=1)
    assert v.shape == (2, 3) and g.calls == [((2, 4), 3, 1)]
    t.close()  # no-op, must not raise


class _RaisingTransport:
    def search(self, q, k, nprobe):
        raise ConnectionError("worker unreachable")

    def close(self):
        pass


def test_group_failure_isolation_degrades_not_fails():
    """One dead slice group must not fail the batch: surviving groups'
    candidates are returned (recall degrades for the dead clusters only),
    and the failure is recorded on last_failed_groups."""
    rng = np.random.default_rng(11)
    emb = _corpus(rng, 1_200, 16)
    index = build_ivf(emb, n_clusters=8, sample_size=1_200, kmeans_iters=3)
    q = _corpus(rng, 6, 16)
    k, nprobe = 8, 8  # probe everything → both groups touched

    ms = MultiSliceIVF(index, n_groups=2)
    dead_rows = {
        int(x) for x in np.asarray(ms.groups[1].index.row_map).ravel() if x >= 0
    }
    ms.transports[1] = _RaisingTransport()
    v, r = ms.search(q, k=k, nprobe=nprobe)
    assert ms.last_failed_groups == [1]
    live = r[r >= 0]
    assert live.size  # group 0 still answered
    assert not any(int(x) in dead_rows for x in live), (
        "a row from the dead group appeared without its transport"
    )
    # scores for live rows stay sorted per query
    for row in v:
        fin = row[np.isfinite(row)]
        assert np.all(np.diff(fin) <= 1e-6)
    # a later healthy batch clears the record
    ms.transports[1] = LocalTransport(ms.groups[1])
    ms.search(q, k=k, nprobe=nprobe)
    assert ms.last_failed_groups == []


def test_all_groups_failing_raises():
    rng = np.random.default_rng(12)
    emb = _corpus(rng, 600, 16)
    index = build_ivf(emb, n_clusters=4, sample_size=600, kmeans_iters=2)
    ms = MultiSliceIVF(index, n_groups=2)
    ms.transports[0] = _RaisingTransport()
    ms.transports[1] = _RaisingTransport()
    with pytest.raises(RuntimeError, match="all .* failed"):
        ms.search(_corpus(rng, 3, 16), k=4, nprobe=4)


@pytest.mark.slow
def test_supervised_transport_respawns_after_worker_death(tmp_path):
    """Elastic recovery across a real process boundary: kill the worker
    process out from under the transport; the next search respawns it from
    the persisted partition and returns identical results."""
    rng = np.random.default_rng(13)
    emb = _corpus(rng, 800, 16)
    index = build_ivf(emb, n_clusters=4, sample_size=800, kmeans_iters=3)
    save_ivf_part(index, tmp_path / "p.npz")
    q = _corpus(rng, 4, 16)

    from tensortruth_tpu.parallel.multislice import SliceGroup

    v_ref, r_ref = SliceGroup(0, 0, index).search(q, k=6, nprobe=4)

    st = SupervisedTransport(tmp_path / "p.npz", startup_timeout=180)
    try:
        v, r = st.search(q, k=6, nprobe=4)
        np.testing.assert_array_equal(r, np.asarray(r_ref))
        pid_before = st.worker_pid
        st._proc.kill()  # simulate a worker crash
        st._proc.wait(timeout=30)
        v2, r2 = st.search(q, k=6, nprobe=4)  # respawn + retry, same answer
        np.testing.assert_array_equal(r2, np.asarray(r_ref))
        np.testing.assert_allclose(v2, v, rtol=1e-5, atol=1e-6)
        assert st.respawn_count == 1
        assert st.worker_pid != pid_before
        assert st.ping()
    finally:
        st.close()
    assert st.worker_pid is None


@pytest.mark.slow
def test_supervised_transport_respawn_budget_exhausts(tmp_path):
    """A crash-looping worker degrades to a hard error once the respawn
    budget is spent, instead of spinning forever."""
    rng = np.random.default_rng(14)
    emb = _corpus(rng, 400, 16)
    index = build_ivf(emb, n_clusters=4, sample_size=400, kmeans_iters=2)
    save_ivf_part(index, tmp_path / "p.npz")

    st = SupervisedTransport(tmp_path / "p.npz", max_respawns=0, startup_timeout=180)
    try:
        st._proc.kill()
        st._proc.wait(timeout=30)
        with pytest.raises(RuntimeError, match="exceeded 0 respawns"):
            st.search(_corpus(rng, 2, 16), k=4, nprobe=2)
    finally:
        st.close()


def test_multislice_close_closes_all_transports(tmp_path):
    rng = np.random.default_rng(2)
    emb = _corpus(rng, 600, 16)
    index = build_ivf(emb, n_clusters=8, sample_size=600, kmeans_iters=2)
    ms = MultiSliceIVF(index, n_groups=2)
    closed = []
    for i, t in enumerate(ms.transports):
        orig = t.close
        t.close = (lambda i=i, orig=orig: (closed.append(i), orig())[1])
    ms.close()
    assert closed == [0, 1]


def test_socket_transport_resets_socket_after_rpc_failure():
    """A failed/garbled RPC must drop the connection: reusing the socket
    after a timeout or partial frame can read a LATE response as the answer
    to the NEXT query — silently wrong rows at matching shapes (code-review
    r3 finding). First reply is a malformed ok-frame (no arrays) → the
    client raises AND discards the socket; the reconnect gets a good frame."""
    calls = {"n": 0}
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(2)
    port = srv.getsockname()[1]

    def serve():
        for _ in range(2):
            conn, _ = srv.accept()
            with conn:
                _recv_frame(conn)  # consume the request
                calls["n"] += 1
                if calls["n"] == 1:
                    _send_frame(conn, {"status": "ok"}, {})  # no vals/rows
                else:
                    _send_frame(
                        conn,
                        {"status": "ok"},
                        {
                            "vals": np.zeros((1, 2), np.float32),
                            "rows": np.zeros((1, 2), np.int32),
                        },
                    )

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    tr = SocketTransport("127.0.0.1", port, timeout=10)
    q = np.zeros((1, 4), np.float32)
    with pytest.raises(KeyError):
        tr.search(q, k=2, nprobe=1)
    assert tr._sock is None, "socket must be discarded after a garbled reply"
    vals, rows = tr.search(q, k=2, nprobe=1)  # fresh connection, clean stream
    assert vals.shape == (1, 2) and rows.shape == (1, 2)
    tr.close()
    srv.close()
    t.join(timeout=10)


def test_supervised_transport_respawns_on_protocol_corruption(monkeypatch):
    """Respawn triggers on protocol corruption (garbled frame → JSON/struct/
    KeyError), not only OSError — a worker emitting garbage is as dead as
    one that closed the socket. status:error RuntimeErrors still do NOT
    respawn (live worker, bad request)."""
    import json as _json

    spawned = []

    class FakeInner:
        def __init__(self, fail_with):
            self.fail_with = fail_with

        def search(self, q, k, nprobe):
            if self.fail_with is not None:
                e, self.fail_with = self.fail_with, None
                raise e
            return np.zeros((1, k), np.float32), np.zeros((1, k), np.int64)

        def close(self):
            pass

    def fake_spawn(self):
        inner = FakeInner(
            _json.JSONDecodeError("garbage", "x", 0) if not spawned else None
        )
        spawned.append(inner)
        self._proc = None
        self._inner = inner

    monkeypatch.setattr(SupervisedTransport, "_spawn", fake_spawn)
    tr = SupervisedTransport("unused.npz", max_respawns=2)
    vals, rows = tr.search(np.zeros((1, 4), np.float32), k=3, nprobe=1)
    assert vals.shape == (1, 3)
    assert len(spawned) == 2, "corrupted frame must trigger one respawn"

    # application-level error from a live worker: no respawn
    spawned[1].fail_with = RuntimeError("slice worker error: bad request")
    with pytest.raises(RuntimeError):
        tr.search(np.zeros((1, 4), np.float32), k=3, nprobe=1)
    assert len(spawned) == 2
