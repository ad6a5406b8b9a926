"""Property-based tests (hypothesis is a dev dep in the reference too,
pyproject.toml:117)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from tensortruth_tpu.index.chunker import _token_windows, hierarchical_chunk
from tensortruth_tpu.index.nodes import HierarchyStore
from tensortruth_tpu.retrieval.automerge import auto_merge
from tensortruth_tpu.tokenization import SimpleTokenizer

TOK = SimpleTokenizer()


@given(
    n_tokens=st.integers(0, 5000),
    size=st.integers(1, 512),
    overlap_frac=st.floats(0, 0.9),
)
@settings(max_examples=100, deadline=None)
def test_token_windows_cover_everything(n_tokens, size, overlap_frac):
    overlap = int(size * overlap_frac)
    windows = _token_windows(n_tokens, size, overlap)
    if n_tokens == 0:
        assert windows == []
        return
    assert windows[0][0] == 0
    assert windows[-1][1] == n_tokens
    covered = set()
    for s, e in windows:
        assert 0 < e - s <= size
        covered.update(range(s, e))
    assert covered == set(range(n_tokens))  # no token dropped


@given(
    n_words=st.integers(1, 400),
    seed=st.integers(0, 1000),
)
@settings(max_examples=30, deadline=None)
def test_hierarchy_invariants(n_words, seed):
    rng = np.random.default_rng(seed)
    text = " ".join(f"w{rng.integers(0, 50)}" for _ in range(n_words))
    nodes = hierarchical_chunk(text, TOK, "doc", chunk_sizes=[64, 16], chunk_overlap=4)
    by_id = {n.node_id: n for n in nodes}
    for n in nodes:
        # span sanity
        assert 0 <= n.start <= n.end <= len(text)
        assert n.text == text[n.start : n.end]
        # child containment
        if n.parent_id:
            p = by_id[n.parent_id]
            assert p.start <= n.start and n.end <= p.end
            assert n.level == p.level + 1
    # every non-leaf has children; leaves at deepest reached level only
    for n in nodes:
        if n.child_ids:
            assert all(c in by_id for c in n.child_ids)


@given(
    scores=st.lists(st.floats(0.01, 1.0), min_size=1, max_size=12),
    ratio=st.floats(0.1, 0.9),
)
@settings(max_examples=50, deadline=None)
def test_automerge_fixpoint_and_order(scores, ratio):
    """auto_merge output is a fixpoint, sorted desc, and never larger."""
    # Flat two-level tree: one parent with 4 children c0..c3; hits are a
    # random subset of children (ids cycle over c0..c3).
    from tensortruth_tpu.index.nodes import Node

    store = HierarchyStore()
    p = Node(node_id="p", text="p", level=0, doc_id="d")
    kids = [Node(node_id=f"c{i}", text="x", level=1, doc_id="d", parent_id="p")
            for i in range(4)]
    p.child_ids = [k.node_id for k in kids]
    store.add_all([p] + kids)
    store.finalize_leaves()

    hits = sorted(
        {(f"c{i % 4}", s) for i, s in enumerate(scores)}, key=lambda x: -x[1]
    )
    # dedupe ids keeping best score (auto_merge assumes unique ids)
    seen, uniq = set(), []
    for nid, s in hits:
        if nid not in seen:
            seen.add(nid)
            uniq.append((nid, s))
    merged = auto_merge(uniq, store, ratio=ratio)
    assert len(merged) <= len(uniq)
    got = [s for _, s in merged]
    assert got == sorted(got, reverse=True)
    # fixpoint: merging again changes nothing
    assert auto_merge(merged, store, ratio=ratio) == merged


@given(
    texts=st.lists(st.text(min_size=0, max_size=200), min_size=1, max_size=8),
    max_length=st.integers(8, 64),
)
@settings(max_examples=50, deadline=None)
def test_batch_encode_shapes_and_mask(texts, max_length):
    ids, mask = TOK.encode_batch(texts, max_length)
    assert ids.shape == mask.shape == (len(texts), max_length)
    for i, t in enumerate(texts):
        n = int(mask[i].sum())
        assert 0 < n <= max_length  # at least CLS+SEP
        assert (ids[i, :n] != TOK.pad_id).all() or n <= 2
        assert (mask[i, n:] == 0).all()
        assert ids[i, 0] == TOK.cls_id


@given(
    n=st.integers(2, 200),
    d=st.sampled_from([8, 16, 32]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_int8_quantization_error_bound(n, d, seed):
    """quantize_corpus: per-element reconstruction error ≤ scale/2, and
    cosine scores against any query shift by at most d·(max_scale/2)."""
    from tensortruth_tpu.ops.topk import quantize_corpus

    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-9)
    emb_q, scales = quantize_corpus(emb)
    recon = emb_q.astype(np.float32) * scales[:, None]
    err = np.abs(recon - emb)
    assert (err <= scales[:, None] / 2 + 1e-7).all()
    q = rng.standard_normal(d).astype(np.float32)
    q /= max(np.linalg.norm(q), 1e-9)
    score_shift = np.abs(recon @ q - emb @ q)
    assert (score_shift <= np.abs(q).sum() * scales / 2 + 1e-6).all()


@given(
    b=st.integers(1, 6),
    n=st.integers(1, 60),
    k=st.integers(1, 70),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_exact_topk_matches_numpy(b, n, k, seed):
    """exact_topk ≡ numpy argsort for any (b, n, k) incl. k > n padding."""
    import jax.numpy as jnp

    from tensortruth_tpu.ops.topk import exact_topk

    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, 8)).astype(np.float32)
    q = rng.standard_normal((b, 8)).astype(np.float32)
    k_eff = min(k, n)
    vals, idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k_eff)
    scores = q @ emb.T
    ref_idx = np.argsort(-scores, axis=1, kind="stable")[:, :k_eff]
    ref_vals = np.take_along_axis(scores, ref_idx, axis=1)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    # indices may differ on exact ties; scores must match exactly
    got_vals = np.take_along_axis(scores, np.asarray(idx), axis=1)
    np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-5, atol=1e-5)


@given(
    n_msgs=st.integers(0, 30),
    max_turns=st.integers(1, 8),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=25, deadline=None)
def test_chat_history_turn_invariants(n_msgs, max_turns, seed):
    """build_history: never exceeds max_turns complete turns, preserves
    order, and always starts at a user message (complete-turn invariant,
    reference chat_history.py turn-based limiting)."""
    from tensortruth_tpu.services.chat_history import ChatHistoryService

    rng = np.random.default_rng(seed)
    msgs = []
    for i in range(n_msgs):
        role = "user" if i % 2 == 0 else "assistant"
        msgs.append({"role": role, "content": f"m{i}"})
    hist = ChatHistoryService().build_history(msgs, max_turns=max_turns)
    out = list(hist.messages)
    assert len(out) <= 2 * max_turns
    if out:
        assert out[0].role == "user"
    contents = [m.content for m in out]
    assert contents == sorted(contents, key=lambda c: int(c[1:]))


@given(
    lengths=st.lists(st.integers(1, 60), min_size=1, max_size=24),
    seed=st.integers(0, 10_000),
)
@settings(max_examples=15, deadline=None)
def test_score_pairs_order_invariance(lengths, seed):
    """Bucketed cross-query scoring must be a pure function of each pair:
    shuffling the input order returns the same scores per pair."""
    import jax.numpy as jnp

    from tensortruth_tpu.models.reranker import Reranker
    from tensortruth_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig(vocab_size=256, hidden_size=32, num_layers=1,
                     num_heads=2, intermediate_size=64, max_position=130,
                     num_labels=1)
    rr = Reranker.random_init(cfg, TOK, dtype=jnp.float32, max_length=64,
                              batch_buckets=(4, 8), seq_buckets=(16, 32, 64))
    rng = np.random.default_rng(seed)
    pairs = [("q", "w " * ln) for ln in lengths]
    base = rr.score_pairs(pairs)
    perm = rng.permutation(len(pairs))
    shuffled = rr.score_pairs([pairs[i] for i in perm])
    np.testing.assert_allclose(shuffled, base[perm], rtol=1e-4, atol=1e-5)


@given(
    n=st.integers(130, 900),
    k=st.integers(1, 20),
    b=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=10, deadline=None)
def test_fused_topk_interpret_matches_exact(n, k, b, seed):
    """Pallas fused kernel (interpret mode) ≡ exact top-k for arbitrary
    shapes with m=1 (no bucket collisions possible at c_out >= tile)."""
    import jax.numpy as jnp

    from tensortruth_tpu.ops.topk import exact_topk, fused_topk

    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((n, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((b, 16)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k_eff = min(k, n)
    vals, idx = fused_topk(
        jnp.asarray(q), jnp.asarray(emb), k_eff, tile_n=128, interpret=True
    )
    ref_vals, ref_idx = exact_topk(jnp.asarray(q), jnp.asarray(emb), k_eff)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(ref_vals), rtol=1e-4, atol=1e-5
    )
    got = np.sort(np.asarray(idx), axis=1)
    want = np.sort(np.asarray(ref_idx), axis=1)
    np.testing.assert_array_equal(got, want)


@given(
    ctx=st.integers(1024, 32768),
    n_msgs=st.integers(0, 12),
    msg_len=st.integers(10, 4000),
)
@settings(max_examples=20, deadline=None)
def test_budget_history_never_exceeds_share(ctx, n_msgs, msg_len):
    """The 12/18/18/50 window partition: history chars never exceed its 18%
    share plus whatever the (small) system/user prompts released."""
    from tensortruth_tpu.services.orchestrator_service import (
        BUDGET_HISTORY,
        CHARS_PER_TOKEN,
        budget_history,
    )

    history = [
        {"role": "user" if i % 2 == 0 else "assistant", "content": "x" * msg_len}
        for i in range(n_msgs)
    ]
    out = budget_history(history, ctx, system_prompt="sys", user_prompt="u")
    total = sum(len(m["content"]) for m in out)
    # small system/user release almost their whole share to history; bound
    # by history share + system share + user share (all in chars)
    ceiling = int(ctx * CHARS_PER_TOKEN * (BUDGET_HISTORY + 0.12 + 0.18)) + msg_len
    assert total <= ceiling
    # order preserved, complete messages only
    contents = [m["content"] for m in out]
    assert all(c == "x" * msg_len for c in contents)


# ---------------------------------------------------------------- r4 surfaces

MD_TEXT = st.text(
    alphabet=st.sampled_from(list("ab c\n`*_$[]()<>#->|!\\{}^~=+.123")),
    max_size=400,
)


@given(src=MD_TEXT)
@settings(max_examples=150, deadline=None)
def test_split_blocks_conserves_nonblank_lines(src):
    from tensortruth_tpu.utils.mdrender import split_blocks

    blocks = split_blocks(src)
    nonblank = lambda s: [ln for ln in s.split("\n") if ln.strip()]  # noqa: E731
    assert nonblank("\n\n".join(blocks)) == nonblank(src)
    # a block is never empty and never leads/ends with a splittable blank
    for b in blocks:
        assert b.strip()


@given(src=MD_TEXT)
@settings(max_examples=150, deadline=None)
def test_split_blocks_streaming_prefix_stability(src):
    from tensortruth_tpu.utils.mdrender import split_blocks

    prev: list[str] = []
    for i in range(0, len(src) + 1, 3):
        blocks = split_blocks(src[:i])
        for j in range(min(len(prev), len(blocks)) - 1):
            assert blocks[j] == prev[j], (
                f"finalized block {j} changed at prefix {i}"
            )
        prev = blocks


@given(src=MD_TEXT)
@settings(max_examples=150, deadline=None)
def test_render_markdown_never_raises_never_leaks_script(src):
    from tensortruth_tpu.utils.mdrender import render_markdown

    html = render_markdown(src + "<script>alert(1)</script>")
    assert "<script" not in html  # raw tags always escaped
    assert "\x00" not in html  # no unresolved extraction placeholders


@given(
    n=st.integers(1, 60),
    n_clusters=st.integers(1, 8),
    rpc_mult=st.floats(1.0, 3.0),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=80, deadline=None)
def test_place_rows_places_every_row_exactly_once(n, n_clusters, rpc_mult, seed):
    from tensortruth_tpu.ops.ivf import _place_rows

    rng = np.random.default_rng(seed)
    assign = rng.integers(0, n_clusters, n).astype(np.int32)
    second = rng.integers(0, n_clusters, n).astype(np.int32)
    rows_per_cluster = max(1, int(np.ceil(n / n_clusters * rpc_mult)))
    cluster, slot, fill, leftover = _place_rows(
        assign, second, n_clusters, rows_per_cluster
    )
    placed = cluster >= 0
    # every row is either placed or a leftover, never both, never neither
    assert sorted(np.flatnonzero(~placed)) == sorted(leftover)
    # no slot collision: (cluster, slot) unique among placed rows
    pairs = set(zip(cluster[placed].tolist(), slot[placed].tolist()))
    assert len(pairs) == placed.sum()
    assert (slot[placed] < rows_per_cluster).all()
    assert (slot[placed] >= 0).all()
    # fill counts match actual occupancy
    occ = np.bincount(cluster[placed], minlength=n_clusters)
    assert (occ == fill[: n_clusters]).all()
    # a leftover only exists if both its preferred clusters were full
    for r in leftover:
        assert fill[assign[r]] == rows_per_cluster
        assert fill[second[r]] == rows_per_cluster


@given(
    shard_sizes=st.lists(st.integers(1, 7), min_size=1, max_size=5),
    seed=st.integers(0, 2**31 - 1),
    n_take=st.integers(0, 30),
    allow_dups=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_take_rows_matches_numpy_gather(shard_sizes, seed, n_take, allow_dups):
    from tensortruth_tpu.index.store import ShardedMatrix

    rng = np.random.default_rng(seed)
    shards = [rng.standard_normal((s, 3)).astype(np.float32) for s in shard_sizes]
    n = sum(shard_sizes)
    mat = ShardedMatrix(shards, n, 3, np.float32)
    full = np.concatenate(shards)
    rows = rng.integers(0, n, n_take) if allow_dups else rng.permutation(n)[:min(n_take, n)]
    np.testing.assert_array_equal(mat.take_rows(rows), full[rows])


@given(
    shard_sizes=st.lists(st.integers(1, 5), min_size=1, max_size=3),
    bad=st.integers(-5, 5),
)
@settings(max_examples=50, deadline=None)
def test_take_rows_raises_on_out_of_range(shard_sizes, bad):
    from tensortruth_tpu.index.store import ShardedMatrix

    n = sum(shard_sizes)
    shards = [np.zeros((s, 2), np.float32) for s in shard_sizes]
    mat = ShardedMatrix(shards, n, 2, np.float32)
    import pytest

    with pytest.raises(IndexError):
        mat.take_rows(np.array([0, n + max(bad, 0)]))
    with pytest.raises(IndexError):
        mat.take_rows(np.array([-1]))


# ---- cross-language timeline equivalence -----------------------------------

_TOOLS = ["rag_query", "web_search", "fetch_page"]


@st.composite
def _tool_event_stream(draw):
    """A plausible agent event stream: iterations of tool_phase fan-outs,
    each call later resolved by a tool_progress (possibly phase-less,
    possibly failing, same tool repeated in one iteration), plus stray
    unmatched progress events (the /web pipeline shape)."""
    events = []
    for _ in range(draw(st.integers(0, 3))):
        calls = draw(st.lists(st.sampled_from(_TOOLS), min_size=1, max_size=3))
        phase_ev = {
            "type": "tool_phase",
            "tools": calls,
            "calls": [{"tool": t, "params": {"q": draw(st.text(max_size=5))}}
                      for t in calls],
        }
        shape = draw(st.sampled_from(["calls", "tools_only", "empty_calls"]))
        if shape == "tools_only":
            del phase_ev["calls"]       # legacy emitters send only `tools`
        elif shape == "empty_calls":
            phase_ev["calls"] = []      # present-but-empty must NOT fall back
        events.append(phase_ev)
        for t in draw(st.permutations(calls)):
            phase = draw(st.sampled_from(["completed", "failed", None]))
            msg = draw(st.sampled_from(
                ["found 3 chunks", "failed https://x", "ERROR: kaput",
                 "fetched https://y", ""]))
            ev = {"type": "tool_progress", "tool": t, "message": msg}
            if phase:
                ev["phase"] = phase
            if draw(st.booleans()):
                # include >2000-char outputs: both sides must apply the
                # same truncation cap
                ev["output"] = draw(st.one_of(
                    st.text(max_size=30), st.just("X" * 2500)))
            events.append(ev)
    for _ in range(draw(st.integers(0, 2))):  # unmatched (no prior phase)
        events.append({
            "type": "tool_progress",
            "tool": draw(st.sampled_from(_TOOLS)),
            "message": draw(st.sampled_from(["failed https://z", "fetched ok"])),
        })
    return events


def _norm(steps):
    out = []
    for s in steps:
        out.append({
            "tool": s.get("tool"),
            "status": s.get("status"),
            "message": s.get("message") or None,
            "output": s.get("output") or None,
            "params": s.get("params") or None,
        })
    return out


@settings(max_examples=40, deadline=None)
@given(events=_tool_event_stream())
def test_tool_timeline_mirror_equivalence(events):
    """The server's persisted tool_steps (routes/chat.py mirror_tool_event)
    and the SPA's live timeline (chat/progress.js beginToolCalls/
    resolveToolCall, EXECUTED on jsrt) must produce identical step lists
    for any event stream — a reloaded session may never disagree with what
    the live view painted."""
    from pathlib import Path

    from tensortruth_tpu.jsrt import Runtime, from_js, to_js
    from tensortruth_tpu.server.routes.chat import mirror_tool_event

    server_steps: list = []
    for ev in events:
        mirror_tool_event(server_steps, ev)

    js_dir = (Path(__file__).resolve().parents[2]
              / "tensortruth_tpu" / "static" / "assets" / "js")
    rt = Runtime(root=js_dir)
    prog = rt.load_module(js_dir / "chat" / "progress.js")
    js_steps = to_js([])
    for ev in events:
        if ev["type"] == "tool_phase":
            rt.interp.call_any(prog["beginToolCalls"], [js_steps, to_js(ev)])
        else:
            rt.interp.call_any(prog["resolveToolCall"], [js_steps, to_js(ev)])

    assert _norm(from_js(js_steps)) == _norm(server_steps)
