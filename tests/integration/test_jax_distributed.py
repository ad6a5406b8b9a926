"""Two-process global-mesh retrieval over real cross-process collectives.

The production multi-slice path (parallel/distributed.py): two OS
processes × 4 virtual CPU devices join one jax.distributed runtime, form a
single 8-device mesh, each places only ITS half of the corpus, and the
sharded top-k's all_gather merge crosses the process boundary over Gloo
TCP — the CPU stand-in for DCN on a real pod. Both processes must agree
with a single-process numpy brute force exactly.

This is the collective-per-query counterpart to the coordinator-RPC tier
(tests/integration/test_transport.py); SURVEY.md §2.14.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = [pytest.mark.integration, pytest.mark.slow]

WORKER = Path(__file__).with_name("dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_global_mesh_topk(tmp_path):
    coord = f"localhost:{_free_port()}"
    outs = [tmp_path / f"p{i}.json" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), coord, "2", str(i), str(outs[i])],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            # a fresh env-derived JAX runtime per process; the worker sets
            # its own JAX_PLATFORMS/XLA_FLAGS before importing jax
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers hung (rendezvous never completed)")
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    reports = [json.loads(o.read_text()) for o in outs]
    for rep in reports:
        assert rep["ok"], rep
        assert rep["ids_match"], rep
        assert rep["ivf_ids_match"], rep  # IVF tier collective too
        assert rep["int8_overlap_vs_f32"] >= 0.8, rep
    # the int8 tier's replicated output must be bit-identical on both hosts
    assert reports[0]["int8_ids_sha"] == reports[1]["int8_ids_sha"]
    # the two processes own disjoint, covering halves of the padded matrix
    assert reports[0]["start"] == 0
    assert reports[0]["stop"] == reports[1]["start"]
    assert reports[1]["stop"] == reports[0]["n_pad"]
