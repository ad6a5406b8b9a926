"""Slice-group worker process: serves one IVF cluster range over a socket.

``python -m tensortruth_tpu.parallel.slice_worker --part part.npz --port 0``
loads the partition (parallel/transport.py save_ivf_part format), binds a
TCP port (0 = ephemeral; the bound port is announced as ``PORT <n>`` on
stdout for the spawner), and answers ``search`` RPCs until ``shutdown``.

This is the process-side of the multi-slice DCN story (SURVEY.md §2.14):
in a production pod each worker runs on a different host attached to its
own TPU slice and probes its clusters with ops/ivf (sharded over the
slice's mesh when one is configured); the coordinator
(parallel/multislice.py MultiSliceIVF) routes batches to workers over
these sockets. Single request at a time per connection — the device is
serial per group anyway (one JAX runtime per worker).
"""

from __future__ import annotations

import argparse
import socket
import sys

import numpy as np


def serve(part_path: str, port: int, cluster_lo: int = 0) -> None:
    from tensortruth_tpu.parallel.multislice import SliceGroup
    from tensortruth_tpu.parallel.transport import (
        _recv_frame,
        _send_frame,
        load_ivf_part,
    )

    group = SliceGroup(
        group_id=0, cluster_lo=cluster_lo, index=load_ivf_part(part_path)
    )

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(4)
    print(f"PORT {srv.getsockname()[1]}", flush=True)

    running = True
    while running:
        conn, _ = srv.accept()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        try:
            while True:
                try:
                    header, arrays = _recv_frame(conn)
                except (ConnectionError, OSError):
                    break
                cmd = header.get("cmd")
                if cmd == "ping":
                    _send_frame(conn, {"status": "ok"}, {})
                elif cmd == "shutdown":
                    _send_frame(conn, {"status": "ok"}, {})
                    running = False
                    break
                elif cmd == "search":
                    try:
                        vals, rows = group.search(
                            arrays["q"], k=int(header["k"]),
                            nprobe=int(header["nprobe"]),
                        )
                        _send_frame(
                            conn,
                            {"status": "ok"},
                            {
                                "vals": np.asarray(vals, np.float32),
                                "rows": np.asarray(rows, np.int64),
                            },
                        )
                    except Exception as e:  # report, keep serving
                        _send_frame(conn, {"status": "error", "error": str(e)}, {})
                else:
                    _send_frame(
                        conn, {"status": "error", "error": f"unknown cmd {cmd}"}, {}
                    )
        finally:
            conn.close()
    srv.close()


def main(argv=None) -> int:
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # some PJRT plugins (the tunnelled TPU one) ignore the env var;
        # config.update before any backend touch is the binding choice —
        # also keeps a test worker from stealing the exclusive TPU lock
        import jax

        jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--part", required=True, help="npz partition path")
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--cluster-lo", type=int, default=0)
    args = ap.parse_args(argv)
    serve(args.part, args.port, args.cluster_lo)
    return 0


if __name__ == "__main__":
    sys.exit(main())
