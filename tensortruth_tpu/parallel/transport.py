"""Cross-process transport for multi-slice IVF groups (the DCN boundary).

SURVEY.md §2.14: above one slice's HBM the corpus splits by IVF cluster
range across slice groups, the coordinator host routes query batches, and
steps 2/4 (scatter/gather) cross hosts over DCN. ``parallel/multislice.py``
implements routing/probe/merge; THIS module is the transport those steps
ride on:

* ``LocalTransport`` — in-process call (single-host deployments, tests).
* ``SocketTransport`` — length-prefixed binary RPC to a ``slice_worker``
  process (tensortruth_tpu/parallel/slice_worker.py) owning its own JAX
  runtime + cluster range. This is the host-boundary skeleton: in a real
  multi-slice pod each worker runs on another host's slice and the socket
  rides DCN; the framing, array marshalling, routing, and merge are
  identical either way.

Wire format (both directions): a 4-byte big-endian length, a JSON header,
then the raw array payloads named by the header. Arrays travel as
dtype+shape+bytes — no pickle, so a worker never executes peer-controlled
code. One request per round-trip; the socket is kept open across batches.

Reference analog: none — the reference is single-process (SURVEY.md §2.14);
its closest boundary is HTTP to Ollama. This replaces nothing and adds the
10M-tier scale-out story.

On a real multi-slice pod prefer the collective path
(parallel/distributed.py): one jax.distributed runtime across hosts, the
corpus row-sharded over a global mesh, and the merge all_gather riding
ICI/DCN inside a single jit program. THIS transport remains for
coordinator-routed deployments where slices run independent runtimes
(elastic workers, per-slice restart isolation, heterogeneous slice sizes).
"""

from __future__ import annotations

import json
import logging
import socket
import struct
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

_LEN = struct.Struct(">I")


def _send_frame(sock: socket.socket, header: dict, arrays: dict[str, np.ndarray]) -> None:
    meta = {
        **header,
        "arrays": {
            name: {"dtype": str(a.dtype), "shape": list(a.shape)}
            for name, a in arrays.items()
        },
    }
    blob = json.dumps(meta).encode()
    sock.sendall(_LEN.pack(len(blob)) + blob)
    for name in meta["arrays"]:
        payload = np.ascontiguousarray(arrays[name]).tobytes()
        sock.sendall(_LEN.pack(len(payload)) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf.extend(chunk)
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> tuple[dict, dict[str, np.ndarray]]:
    (n,) = _LEN.unpack(_recv_exact(sock, 4))
    header = json.loads(_recv_exact(sock, n))
    arrays = {}
    for name, spec in header.get("arrays", {}).items():
        (ln,) = _LEN.unpack(_recv_exact(sock, 4))
        data = _recv_exact(sock, ln)
        arrays[name] = np.frombuffer(data, dtype=np.dtype(spec["dtype"])).reshape(
            spec["shape"]
        )
    return header, arrays


class LocalTransport:
    """In-process transport: the group lives in this runtime."""

    def __init__(self, group):
        self.group = group

    def search(self, q: np.ndarray, k: int, nprobe: int):
        return self.group.search(q, k, nprobe)

    def close(self) -> None:
        pass


class SocketTransport:
    """Client side of the slice-worker RPC (one worker per slice group)."""

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self.addr = (host, port)
        self.timeout = timeout
        self._sock: socket.socket | None = None

    def _connect(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self.addr, timeout=self.timeout)
            self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return self._sock

    def search(self, q: np.ndarray, k: int, nprobe: int):
        # Any failure mid-RPC — timeout, partial frame, bad header — leaves
        # the stream position unknown: a late response for THIS request
        # could otherwise be read as the answer to the NEXT one (silently
        # wrong rows at matching shapes). Drop the socket so the next call
        # reconnects on a clean stream.
        sock = self._connect()
        try:
            _send_frame(
                sock,
                {"cmd": "search", "k": int(k), "nprobe": int(nprobe)},
                {"q": np.asarray(q, np.float32)},
            )
            header, arrays = _recv_frame(sock)
        except Exception:
            self.close()
            raise
        if header.get("status") != "ok":
            raise RuntimeError(f"slice worker error: {header.get('error')}")
        try:
            return arrays["vals"], arrays["rows"]
        except KeyError:
            self.close()  # malformed ok-response: same desync risk
            raise

    def ping(self) -> bool:
        try:
            sock = self._connect()
            _send_frame(sock, {"cmd": "ping"}, {})
            header, _ = _recv_frame(sock)
            return header.get("status") == "ok"
        except Exception:
            self.close()
            return False

    def shutdown_worker(self) -> None:
        try:
            sock = self._connect()
            _send_frame(sock, {"cmd": "shutdown"}, {})
            _recv_frame(sock)
        except OSError:
            pass
        self.close()

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class SupervisedTransport:
    """Self-healing worker transport: spawn, detect death, respawn.

    Wraps (spawn_slice_worker + SocketTransport) with elastic recovery:
    a transport-level failure (connection refused/reset, mid-frame EOF,
    socket timeout) kills the worker, respawns it from its persisted
    partition, and retries the request ONCE. Application-level errors
    (``status: error`` from a live worker) are NOT respawn triggers — the
    worker is healthy, the request was bad.

    ``max_respawns`` bounds total restarts for the transport's lifetime so
    a crash-looping worker (corrupt partition, OOM on load) degrades to a
    hard error instead of spinning forever. The coordinator
    (multislice.MultiSliceIVF) additionally isolates per-group failures,
    so one dead group degrades recall for its clusters rather than failing
    the batch — the same ladder as the reference's per-retriever isolation
    (reference rag_engine.py:453-455), one level up.
    """

    def __init__(
        self,
        part_path: str | Path,
        cluster_lo: int = 0,
        max_respawns: int = 3,
        startup_timeout: float = 120.0,
        rpc_timeout: float = 120.0,
        env_extra: dict | None = None,
    ):
        self.part_path = str(part_path)
        self.cluster_lo = cluster_lo
        self.max_respawns = max_respawns
        self.startup_timeout = startup_timeout
        self.rpc_timeout = rpc_timeout
        self.env_extra = env_extra
        self.respawn_count = 0
        self._proc: subprocess.Popen | None = None
        self._inner: SocketTransport | None = None
        self._spawn()

    def _spawn(self) -> None:
        self._proc, port = spawn_slice_worker(
            self.part_path,
            cluster_lo=self.cluster_lo,
            startup_timeout=self.startup_timeout,
            env_extra=self.env_extra,
        )
        self._inner = SocketTransport("127.0.0.1", port, timeout=self.rpc_timeout)

    def _respawn(self, cause: BaseException) -> None:
        if self.respawn_count >= self.max_respawns:
            raise RuntimeError(
                f"slice worker for {self.part_path} exceeded "
                f"{self.max_respawns} respawns (last error: {cause})"
            ) from cause
        self.respawn_count += 1
        logger.warning(
            "slice worker died (%s) — respawn %d/%d from %s",
            cause, self.respawn_count, self.max_respawns, self.part_path,
        )
        self._kill()
        self._spawn()

    def _kill(self) -> None:
        if self._inner is not None:
            self._inner.close()
            self._inner = None
        if self._proc is not None:
            if self._proc.poll() is None:
                self._proc.kill()
            try:
                self._proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                pass
            self._proc = None

    def search(self, q: np.ndarray, k: int, nprobe: int):
        try:
            return self._inner.search(q, k, nprobe)
        except RuntimeError:
            # status:error from a LIVE worker — bad request, not a death;
            # respawning would just replay it.
            raise
        except Exception as e:
            # OSError (refused/reset/timeout/mid-frame EOF) and protocol
            # corruption (json/struct/KeyError on a garbled frame) both mean
            # the worker or its stream is unusable — respawn and retry once.
            self._respawn(e)
            return self._inner.search(q, k, nprobe)

    def ping(self) -> bool:
        return self._inner is not None and self._inner.ping()

    @property
    def worker_pid(self) -> int | None:
        return self._proc.pid if self._proc is not None else None

    def close(self) -> None:
        if self._inner is not None:
            self._inner.shutdown_worker()
        self._kill()


def save_ivf_part(index, path: str | Path) -> None:
    """Persist one IVF partition for a worker process (npz, no pickle).

    bf16 blocks have no numpy dtype, so they travel as f32 with the
    original dtype recorded and restored at load (value-exact: every bf16
    is exactly representable in f32)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blocks = index.blocks
    block_dtype = str(blocks.dtype)
    if block_dtype == "bfloat16":
        blocks = blocks.astype("float32")
    arrays = {
        "centroids": np.asarray(index.centroids, np.float32),
        "blocks": np.asarray(blocks),
        "block_dtype": np.asarray(block_dtype),
        "row_map": np.asarray(index.row_map),
        "n_actual": np.asarray(index.n_actual),
    }
    if index.scales is not None:
        arrays["scales"] = np.asarray(index.scales, np.float32)
    np.savez(path, **arrays)


def load_ivf_part(path: str | Path):
    """Load a partition saved by ``save_ivf_part`` as a host-side IVFIndex."""
    import jax.numpy as jnp

    from tensortruth_tpu.ops.ivf import IVFIndex

    with np.load(Path(path)) as z:
        blocks = jnp.asarray(z["blocks"])
        block_dtype = str(z["block_dtype"]) if "block_dtype" in z.files else ""
        if block_dtype == "bfloat16":
            blocks = blocks.astype(jnp.bfloat16)
        return IVFIndex(
            centroids=jnp.asarray(z["centroids"]),
            blocks=blocks,
            row_map=z["row_map"],
            n_actual=int(z["n_actual"]),
            scales=jnp.asarray(z["scales"]) if "scales" in z.files else None,
        )


def spawn_slice_worker(
    part_path: str | Path,
    port: int = 0,
    cluster_lo: int = 0,
    startup_timeout: float = 120.0,
    env_extra: dict | None = None,
) -> tuple[subprocess.Popen, int]:
    """Start a slice-worker subprocess serving ``part_path``; returns
    (process, bound_port). ``port=0`` lets the worker pick a free port and
    report it on stdout (``PORT <n>`` line)."""
    import os

    import tensortruth_tpu

    env = dict(os.environ)
    # workers are host-routed CPU/JAX processes in tests; a real deployment
    # launches them on their slice hosts with the slice's TPU visible
    env.setdefault("JAX_PLATFORMS", "cpu")
    # make the package importable regardless of the spawner's cwd
    pkg_root = str(Path(tensortruth_tpu.__file__).resolve().parent.parent)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra or {})
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "tensortruth_tpu.parallel.slice_worker",
            "--part",
            str(part_path),
            "--port",
            str(port),
            "--cluster-lo",
            str(cluster_lo),
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        text=True,
    )
    # A blocking readline() would ignore the deadline when the worker hangs
    # without producing output (e.g. stuck backend init) — read from a
    # daemon thread so the timeout is enforced no matter what the child does.
    import queue as queue_mod
    import threading

    lines: queue_mod.Queue = queue_mod.Queue()
    port_found = threading.Event()

    def _reader():
        # After the port is known the thread keeps DRAINING the pipe (so a
        # chatty worker never blocks on a full stdout buffer) but discards
        # the lines — queueing them for the worker's lifetime would grow
        # memory without bound, since nobody reads the queue after startup.
        for line in proc.stdout:
            if not port_found.is_set():
                lines.put(line)
        lines.put(None)  # EOF

    threading.Thread(target=_reader, daemon=True).start()
    deadline = time.monotonic() + startup_timeout
    bound = None
    while bound is None:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        try:
            line = lines.get(timeout=min(0.25, remaining))
        except queue_mod.Empty:
            if proc.poll() is not None:
                raise RuntimeError(
                    f"slice worker died on startup (rc={proc.returncode})"
                )
            continue
        if line is None:  # stdout closed
            if proc.poll() is not None:
                raise RuntimeError(
                    f"slice worker died on startup (rc={proc.returncode})"
                )
            break
        if line.startswith("PORT "):
            bound = int(line.split()[1])
            port_found.set()
    if bound is None:
        proc.kill()
        raise TimeoutError("slice worker did not report its port in time")
    return proc, bound
