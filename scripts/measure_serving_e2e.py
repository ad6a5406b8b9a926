"""Serving throughput THROUGH the real server shell at the 1M-chunk tier.

bench.py's headline (75.5 QPS on one v5e chip) is the honest device-side
serving loop — production components, but driven in-process. This script
closes the remaining gap to "a user's actual deployment": it launches the
REAL aiohttp server (server/app.py), loads a synthetic 1M-chunk index
through the REAL engine/store path, and drives N concurrent WebSocket chat
sessions end-to-end (WS protocol -> session service -> RAGService ->
QueryBatcher micro-batching -> fused embed->top-k -> docstore hydration ->
length-bucketed cross-encoder rerank -> provider-streamed generation ->
sources/done messages -> session persistence), measuring sustained
queries/sec as a client sees them.

Generation uses a local fake Ollama server (instant tiny responses) so the
measurement isolates THIS framework's serving stack — the reference's LLM
stage is the same external HTTP hop in both stacks.

Synthetic index: random normalized embeddings (timing-identical to real
ones) over 1M DISTINCT leaf texts at the measured real leaf-length mix
(scripts/measure_pair_lengths.py: ~65% ~242 words, ~30% ~118, rest ~215) in
a 4-leaves-per-parent hierarchy, so docstore hydration, auto-merge scans,
and host pair tokenization all pay their true per-candidate cost
(cf. bench.py's distinct-text-hydration note).

Usage:
    python scripts/measure_serving_e2e.py            # full 1M run on TPU
    SERVE_TINY=1 python scripts/measure_serving_e2e.py   # CPU logic smoke

The index artifact persists under $SERVE_DATA_DIR (default /tmp/serve1m)
and is reused across runs; delete the dir to regenerate.

Prints ONE JSON line:
    {"metric": "serving_qps_through_server_1M", "value": N, ...}
"""

from __future__ import annotations

import asyncio
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TINY = bool(os.environ.get("SERVE_TINY"))
DATA_DIR = Path(os.environ.get("SERVE_DATA_DIR", "/tmp/serve1m_tiny" if TINY else "/tmp/serve1m"))
PORT = int(os.environ.get("SERVE_PORT", "8941"))
OLLAMA_PORT = int(os.environ.get("SERVE_OLLAMA_PORT", "11434"))
N_CHUNKS = 4_096 if TINY else 1_000_000
DIM = 64 if TINY else 1024
MODULE = "synth1m"
CONCURRENCY = 8 if TINY else 64
MEASURE_S = 10 if TINY else 60.0
WARMUP_MSGS_PER_WORKER = 1 if TINY else 2
# Word counts reproducing the measured leaf-token mix (bench.py _CHUNK_WORDS).
CHUNK_WORDS = [242, 242, 242, 242, 242, 242, 118, 118, 118, 215]
WORDS = "retrieval engine shard merge index token kernel matmul embed chunk".split()


# ---------------------------------------------------------------- prepare

def prepare_index() -> Path:
    """Build the synthetic module index once; idempotent across runs."""
    from tensortruth_tpu.index.nodes import HierarchyStore, Node
    from tensortruth_tpu.index.store import VectorIndex, sanitize_model_id

    model_id = "tiny-embedder" if TINY else "BAAI/bge-m3"
    idx_dir = (
        DATA_DIR / "indexes" / sanitize_model_id(model_id) / f"library_{MODULE}"
    )
    if VectorIndex.is_valid(idx_dir):
        print(f"[prepare] reusing index at {idx_dir}", file=sys.stderr)
        return idx_dir

    t0 = time.time()
    print(f"[prepare] generating {N_CHUNKS}-chunk index at {idx_dir}", file=sys.stderr)
    import numpy as np

    store = HierarchyStore()
    row_ids: list[str] = []
    # 4 leaves per parent: auto-merge has a real hierarchy to walk.
    for p in range(-(-N_CHUNKS // 4)):
        pid = f"p{p:07d}"
        child_ids = [f"n{j:07d}" for j in range(p * 4, min((p + 1) * 4, N_CHUNKS))]
        first_words = CHUNK_WORDS[(p * 4) % len(CHUNK_WORDS)]
        store.add(
            Node(
                node_id=pid,
                text=" ".join(
                    f"p{p}" if i == 0 else WORDS[(i + p) % len(WORDS)]
                    for i in range(min(first_words * 4, 900))
                ),
                level=0,
                doc_id=f"d{p // 256}",
                module=MODULE,
                child_ids=child_ids,
            )
        )
        for j_str in child_ids:
            j = int(j_str[1:])
            n_words = CHUNK_WORDS[j % len(CHUNK_WORDS)]
            store.add(
                Node(
                    node_id=j_str,
                    # leading c{j} token makes every text DISTINCT: host pair
                    # tokenization can never memoize across candidates
                    text=" ".join(
                        f"c{j}" if i == 0 else WORDS[(i + j) % len(WORDS)]
                        for i in range(n_words)
                    ),
                    level=1,
                    doc_id=f"d{p // 256}",
                    module=MODULE,
                    parent_id=pid,
                )
            )
            row_ids.append(j_str)
    store.finalize_leaves()

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((N_CHUNKS, DIM), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)

    index = VectorIndex(
        emb,
        row_ids,
        store,
        metadata={
            "embedding_model": model_id,
            "created_at": "synthetic",
            "index_version": "1.0",
            "chunk_sizes": [2048, 512, 256],
            "chunk_overlap": 64,
            "chunking_strategy": "hierarchical",
            # match the serving encoder's flavor so the engine-load
            # mismatch warning stays quiet (TPU default = tanh)
            "gelu": "exact" if TINY else "tanh",
        },
    )
    index.save(idx_dir)
    print(f"[prepare] done in {time.time() - t0:.0f}s", file=sys.stderr)
    return idx_dir


def write_config() -> None:
    os.environ["TENSOR_TRUTH_TPU_DATA_DIR"] = str(DATA_DIR)
    from tensortruth_tpu.app.config import TensorTruthTPUConfig, save_config

    cfg = TensorTruthTPUConfig.default()
    if TINY:
        cfg.rag.default_embedding_model = "tiny-embedder"
        cfg.rag.default_reranker = "tiny-reranker"
        cfg.rag.use_fused_topk = False
    # history OFF: no condenser LLM hop, each message retrieves standalone
    cfg.conversation.max_history_turns = 0
    for p in cfg.providers:
        if p.type == "ollama":
            p.base_url = f"http://127.0.0.1:{OLLAMA_PORT}"
    cfg.llm.default_model = "fake-llm"
    save_config(cfg)


# ---------------------------------------------------------------- servers

FAKE_OLLAMA = """
import json, sys
from aiohttp import web

async def tags(_):
    return web.json_response({"models": [{"name": "fake-llm"}]})

async def show(_):
    return web.json_response({"capabilities": []})

async def chat(request):
    await request.json()
    resp = web.StreamResponse()
    resp.content_type = "application/x-ndjson"
    await resp.prepare(request)
    await resp.write((json.dumps({"message": {"content": "Answer."}}) + "\\n").encode())
    await resp.write((json.dumps({"message": {}, "done": True}) + "\\n").encode())
    return resp

app = web.Application()
app.router.add_get("/api/tags", tags)
app.router.add_post("/api/show", show)
app.router.add_post("/api/chat", chat)
web.run_app(app, host="127.0.0.1", port=int(sys.argv[1]), print=None)
"""

SERVER = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
{platform_pin}
# reuse the shared TPU executable cache (bench.py warms the same shapes)
os.makedirs("/root/.cache/jax_comp", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from tensortruth_tpu.server.app import run
run(host="127.0.0.1", port={port})
"""


def launch(idx_dir: Path):
    env = dict(os.environ, TENSOR_TRUTH_TPU_DATA_DIR=str(DATA_DIR))
    ollama = subprocess.Popen(
        [sys.executable, "-c", FAKE_OLLAMA, str(OLLAMA_PORT)],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    pin = 'jax.config.update("jax_platforms", "cpu")' if TINY else ""
    if TINY:
        env["JAX_PLATFORMS"] = "cpu"
    server_log = open(DATA_DIR / "server.log", "w")
    server = subprocess.Popen(
        [sys.executable, "-c", SERVER.format(repo=str(REPO), port=PORT, platform_pin=pin)],
        env=env,
        stdout=server_log,
        stderr=server_log,
    )
    return ollama, server


async def wait_health(timeout: float = 120.0) -> None:
    import aiohttp

    t0 = time.time()
    async with aiohttp.ClientSession() as s:
        while True:
            try:
                async with s.get(f"http://127.0.0.1:{PORT}/health") as r:
                    if r.status == 200:
                        return
            except aiohttp.ClientError:
                pass
            if time.time() - t0 > timeout:
                raise TimeoutError("server never became healthy")
            await asyncio.sleep(1.0)


# ---------------------------------------------------------------- drive

async def drive() -> dict:
    import aiohttp

    base = f"http://127.0.0.1:{PORT}"
    results: list[float] = []  # per-message latencies in the measure window
    errors: list[str] = []
    state = {"measuring": False, "done_at": None}
    qn = iter(range(10_000_000))

    async def worker(wid: int, sess: aiohttp.ClientSession, stop_at: list) -> None:
        r = await sess.post(
            f"{base}/api/sessions", json={"modules": [MODULE]}
        )
        sid = (await r.json())["id"]
        async with sess.ws_connect(f"ws://127.0.0.1:{PORT}/ws/chat/{sid}") as ws:
            n = 0
            while True:
                if stop_at[0] and time.time() >= stop_at[0]:
                    return
                q = f"how does component {next(qn)} interact with the sharded engine"
                t0 = time.time()
                await ws.send_json({"message": q})
                ok = False
                while True:
                    raw = await asyncio.wait_for(ws.receive(), timeout=1800)
                    if raw.type != aiohttp.WSMsgType.TEXT:
                        errors.append(f"ws closed: {raw.type!r} data={raw.data!r}")
                        return
                    msg = json.loads(raw.data)
                    if msg["type"] == "done":
                        ok = True
                        break
                    if msg["type"] == "error":
                        errors.append(str(msg)[:200])
                        break
                n += 1
                if ok and state["measuring"]:
                    results.append(time.time() - t0)
                if not ok:
                    return

    async with aiohttp.ClientSession() as sess:
        stop_at = [None]
        tasks = [asyncio.create_task(worker(i, sess, stop_at)) for i in range(CONCURRENCY)]
        # warmup: first messages pay engine load + any cold compiles
        warm_deadline = time.time() + (3600 if not TINY else 600)
        t_start = None
        while len(results) == 0 and not state["measuring"]:
            await asyncio.sleep(2.0)
            # measuring starts once every worker has finished its warmup:
            # approximate by waiting until some traffic flowed, then a beat
            async with sess.get(f"{base}/api/system/rag/status") as r:
                st = await r.json()
            served = (st.get("batcher") or {}).get("requests_served", 0)
            if served >= CONCURRENCY * WARMUP_MSGS_PER_WORKER:
                state["measuring"] = True
                t_start = time.time()
                stop_at[0] = t_start + MEASURE_S
                break
            if time.time() > warm_deadline:
                raise TimeoutError("warmup never completed")
            if any(t.done() and t.exception() for t in tasks):
                break
        for t in tasks:
            try:
                await t
            except Exception:  # worker crash → full traceback, not repr
                import traceback

                errors.append(traceback.format_exc(limit=5)[-500:])
        if t_start is None:
            raise RuntimeError(
                f"no measurement window: {len(errors)} worker errors, "
                f"first: {errors[0] if errors else 'none'}"
            )
        elapsed = time.time() - t_start
        async with sess.get(f"{base}/api/system/rag/status") as r:
            status = await r.json()

    if errors:
        raise RuntimeError(f"{len(errors)} worker errors, first: {errors[0]}")
    lat = sorted(results)
    qps = len(results) / elapsed
    return {
        "qps": qps,
        "messages": len(results),
        "elapsed_s": round(elapsed, 1),
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 1) if lat else None,
        "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 1) if lat else None,
        "batcher": status.get("batcher"),
        "engine_n_chunks": (status.get("engine") or {}).get("n_chunks"),
    }


def main() -> None:
    DATA_DIR.mkdir(parents=True, exist_ok=True)
    idx_dir = prepare_index()
    write_config()
    ollama, server = launch(idx_dir)
    try:
        asyncio.run(wait_health(timeout=600))
        out = asyncio.run(drive())
        print(
            json.dumps(
                {
                    "metric": "serving_qps_through_server_1M",
                    "value": round(out.pop("qps"), 2),
                    "unit": "qps",
                    "detail": {
                        **out,
                        "concurrency": CONCURRENCY,
                        "n_chunks": N_CHUNKS,
                        "tiny": TINY,
                    },
                }
            )
        )
    finally:
        for p in (server, ollama):
            p.send_signal(signal.SIGTERM)
        for p in (server, ollama):
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    main()
