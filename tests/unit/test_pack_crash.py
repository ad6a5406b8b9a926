"""Crash-injection around pack_index's atomic swap, ShardedMatrix.take_rows
edge cases, and repack-over-live-readers (VERDICT r3 item 6, ADVICE r3).

The swap discipline under test (index/packed.py pack_index): write everything
into ``packed.tmp/``, rename the old pack aside to ``packed.old/``, rename the
new pack in, delete ``packed.old``. Each rename is atomic, so every crash
window must leave the module serving either the OLD pack (directly or via
``is_packed``'s self-heal rename-back) or the complete NEW pack — never a
valid-looking manifest over torn blobs, and never "no hierarchy at all".
"""

import json

import numpy as np
import pytest

from tensortruth_tpu.index.nodes import HierarchyStore, Node
from tensortruth_tpu.index.packed import (
    PACKED_DIR,
    PackedHierarchyStore,
    is_packed,
    pack_index,
)
from tensortruth_tpu.index.store import (
    CorruptIndexError,
    ShardedMatrix,
    VectorIndex,
)


def _hierarchy(tag: str, n_leaves: int = 4) -> HierarchyStore:
    store = HierarchyStore()
    parent = Node(node_id=f"{tag}-p", text=f"parent {tag}", level=0, doc_id="d")
    kids = [
        Node(
            node_id=f"{tag}-c{i}",
            text=f"leaf {tag}.{i}",
            level=1,
            doc_id="d",
            parent_id=parent.node_id,
        )
        for i in range(n_leaves)
    ]
    parent.child_ids = [k.node_id for k in kids]
    store.add(parent)
    store.add_all(kids)
    store.finalize_leaves()
    return store


def _pack(tmp_path, tag: str, n_leaves: int = 4) -> HierarchyStore:
    store = _hierarchy(tag, n_leaves)
    pack_index(tmp_path, store, list(store.leaf_ids), np.ones(n_leaves, bool))
    return store


class _CrashAt:
    """Raise on the Nth call to the wrapped function (1-indexed)."""

    def __init__(self, fn, n: int):
        self.fn, self.n, self.calls = fn, n, 0

    def __call__(self, *a, **kw):
        self.calls += 1
        if self.calls == self.n:
            raise RuntimeError("injected crash")
        return self.fn(*a, **kw)


class TestPackSwapCrashWindows:
    def test_crash_before_any_swap_keeps_old_pack(self, tmp_path, monkeypatch):
        """Crash while writing packed.tmp: the old pack is untouched."""
        _pack(tmp_path, "old")
        import tensortruth_tpu.index.packed as packed_mod

        def boom(*a, **kw):
            raise RuntimeError("injected crash")

        monkeypatch.setattr(packed_mod, "_write_blob", boom)
        new = _hierarchy("new")
        with pytest.raises(RuntimeError):
            pack_index(tmp_path, new, list(new.leaf_ids), np.ones(4, bool))
        assert is_packed(tmp_path)
        assert "old-p" in PackedHierarchyStore(tmp_path)

    def test_crash_between_renames_self_heals_to_old_pack(
        self, tmp_path, monkeypatch
    ):
        """Kill between rename-aside and rename-in: only packed.old exists;
        is_packed must rename it back so the module keeps serving."""
        _pack(tmp_path, "old")
        import os

        crash = _CrashAt(os.replace, 2)  # 1st = final→old, 2nd = tmp→final
        monkeypatch.setattr(os, "replace", crash)
        new = _hierarchy("new")
        with pytest.raises(RuntimeError):
            pack_index(tmp_path, new, list(new.leaf_ids), np.ones(4, bool))
        monkeypatch.undo()
        assert not (tmp_path / PACKED_DIR / "manifest.json").exists()
        assert (tmp_path / (PACKED_DIR + ".old") / "manifest.json").exists()
        # self-heal: is_packed renames packed.old back in
        assert is_packed(tmp_path)
        assert (tmp_path / PACKED_DIR / "manifest.json").exists()
        assert not (tmp_path / (PACKED_DIR + ".old")).exists()
        assert "old-p" in PackedHierarchyStore(tmp_path)

    def test_crash_after_rename_in_leaves_new_pack_and_stale_old(
        self, tmp_path, monkeypatch
    ):
        """Kill between rename-in and the packed.old cleanup: the NEW pack is
        live; the stale .old must not shadow it and the next pack_index must
        clear it."""
        _pack(tmp_path, "old")
        import shutil

        # pack_index calls rmtree only for stale tmp/old dirs; with a prior
        # pack present the calls are: (1) stale-old cleanup [skipped: none],
        # so the first rmtree in this run IS the final old cleanup.
        crash = _CrashAt(shutil.rmtree, 1)
        monkeypatch.setattr(shutil, "rmtree", crash)
        new = _hierarchy("new")
        with pytest.raises(RuntimeError):
            pack_index(tmp_path, new, list(new.leaf_ids), np.ones(4, bool))
        monkeypatch.undo()
        assert (tmp_path / (PACKED_DIR + ".old")).exists()
        assert is_packed(tmp_path)
        assert "new-p" in PackedHierarchyStore(tmp_path)  # new pack won
        # a later rebuild clears the stale .old and succeeds
        third = _hierarchy("third")
        pack_index(tmp_path, third, list(third.leaf_ids), np.ones(4, bool))
        assert not (tmp_path / (PACKED_DIR + ".old")).exists()
        assert "third-p" in PackedHierarchyStore(tmp_path)

    def test_missing_hierarchy_raises_typed_error(self, tmp_path):
        """Embeddings + metadata but no hierarchy (pack wiped, no JSONL):
        VectorIndex.load must say 'rebuild me' (CorruptIndexError), not
        FileNotFoundError (ADVICE r3)."""
        np.save(tmp_path / "embeddings.npy", np.zeros((2, 4), np.float32))
        (tmp_path / "index_metadata.json").write_text(json.dumps({"v": 1}))
        assert VectorIndex.is_valid(tmp_path)
        with pytest.raises(CorruptIndexError):
            VectorIndex.load(tmp_path)


class TestRepackOverLiveReaders:
    def test_old_mmap_reader_survives_repack(self, tmp_path):
        """POSIX semantics: a PackedHierarchyStore holding the old pack's
        mmaps keeps reading the old inodes after the directory is replaced;
        a fresh load sees the new pack."""
        old_store = _pack(tmp_path, "old")
        reader = PackedHierarchyStore(tmp_path)
        assert reader.get("old-c0").text == "leaf old.0"

        new = _hierarchy("new", n_leaves=6)
        pack_index(tmp_path, new, list(new.leaf_ids), np.ones(6, bool))

        # the live reader still serves the OLD hierarchy, fully intact
        assert len(reader) == len(old_store)
        assert reader.get("old-c3").text == "leaf old.3"
        assert reader.parent("old-c3").node_id == "old-p"
        with pytest.raises(KeyError):
            reader.get("new-c0")
        # a fresh open sees the NEW pack
        fresh = PackedHierarchyStore(tmp_path)
        assert len(fresh) == 7
        assert fresh.get("new-c5").text == "leaf new.5"


class TestTakeRowsEdgeCases:
    def _matrix(self, n=10, shard=4) -> ShardedMatrix:
        emb = np.arange(n * 2, dtype=np.float32).reshape(n, 2)
        shards = [emb[i : i + shard] for i in range(0, n, shard)]
        return ShardedMatrix(shards, n, 2, np.float32)

    def test_unsorted_rows_return_requested_order(self):
        m = self._matrix()
        rows = np.array([7, 0, 9, 3])
        got = m.take_rows(rows)
        np.testing.assert_array_equal(got, np.asarray(m)[rows])

    def test_duplicate_rows_are_duplicated(self):
        m = self._matrix()
        rows = np.array([5, 5, 1, 5])
        got = m.take_rows(rows)
        np.testing.assert_array_equal(got, np.asarray(m)[rows])

    def test_out_of_range_raises_index_error(self):
        m = self._matrix()
        with pytest.raises(IndexError):
            m.take_rows(np.array([0, 10]))
        with pytest.raises(IndexError):
            m.take_rows(np.array([-1, 2]))

    def test_getitem_fancy_matches_numpy(self):
        m = self._matrix()
        rows = np.array([2, 8, 2, 0])
        np.testing.assert_array_equal(m[rows], np.asarray(m)[rows])
        mask = np.zeros(10, bool)
        mask[[1, 6]] = True
        np.testing.assert_array_equal(m[mask], np.asarray(m)[mask])


def test_params_null_value_deletes_key(tmp_path):
    """PATCH {params: {k: null}} restores k to 'use config default' — a
    merge-only patch could never un-set a saved value (ADVICE r3)."""
    from tensortruth_tpu.services.session_service import SessionService

    svc = SessionService(tmp_path / "s")
    s = svc.create_session(params={"orchestrator_enabled": False, "a": 1})
    svc.update_session(s["id"], {"params": {"orchestrator_enabled": None}})
    got = svc.get_session(s["id"])["params"]
    assert "orchestrator_enabled" not in got
    assert got["a"] == 1
    # null params dict is still a no-op, and deleting a missing key is fine
    svc.update_session(s["id"], {"params": None})
    svc.update_session(s["id"], {"params": {"never_set": None}})
    assert svc.get_session(s["id"])["params"]["a"] == 1


class TestSwapHealRace:
    def test_repack_survives_concurrent_is_packed_hammer(self, tmp_path):
        """is_packed's crash-heal used to race pack_index's rename-aside
        swap: a heal between the two renames restored packed.old into
        packed/, making os.replace(out, final) fail ENOTEMPTY. The swap
        lock (+ bounded retry) must let repacks succeed while readers
        hammer is_packed from another thread."""
        import threading

        store = _pack(tmp_path, "race")
        stop = threading.Event()
        heals_alive = []

        def hammer():
            while not stop.is_set():
                heals_alive.append(is_packed(tmp_path))

        t = threading.Thread(target=hammer)
        t.start()
        try:
            for _ in range(30):
                pack_index(
                    tmp_path, store, list(store.leaf_ids), np.ones(4, bool)
                )
        finally:
            stop.set()
            t.join()
        # every probe during the repacks saw a valid pack (old or new)
        assert all(heals_alive)
        assert is_packed(tmp_path)
        reader = PackedHierarchyStore(tmp_path)
        assert reader.get("race-p").text == "parent race"
        # no debris from retried swaps
        assert not (tmp_path / "packed.old").exists()

    def test_reader_load_survives_concurrent_repacks(self, tmp_path):
        """Opening a PackedHierarchyStore touches ~15 files; the swap guard
        must keep a repack from renaming the pack aside mid-open-sequence
        (mixed old/new files or FileNotFoundError)."""
        import threading

        store = _pack(tmp_path, "load")
        stop = threading.Event()
        errors = []

        def load_loop():
            while not stop.is_set():
                try:
                    r = PackedHierarchyStore(tmp_path)
                    assert r.get("load-p").text == "parent load"
                except Exception as e:  # noqa: BLE001 — the test's assertion
                    errors.append(repr(e))
                    return

        t = threading.Thread(target=load_loop)
        t.start()
        try:
            for _ in range(30):
                pack_index(
                    tmp_path, store, list(store.leaf_ids), np.ones(4, bool)
                )
        finally:
            stop.set()
            t.join()
        assert not errors, errors[:3]

    def test_concurrent_packers_never_collide_on_cleanup(self, tmp_path):
        """Two packers on one module dir (CLI rebuild racing a server
        reindex): packer A's post-guard ``packed.old`` cleanup runs outside
        the lock, so packer B's in-guard stale-clear can see the tree
        half-deleted — the clear must tolerate vanishing entries and the
        aside/finish must retry instead of surfacing ENOTEMPTY."""
        import threading

        store = _pack(tmp_path, "dual")
        errors = []

        def pack_loop():
            try:
                for _ in range(15):
                    pack_index(
                        tmp_path, store, list(store.leaf_ids),
                        np.ones(4, bool),
                    )
            except Exception as e:  # noqa: BLE001 — the test's assertion
                errors.append(repr(e))

        threads = [threading.Thread(target=pack_loop) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors[:3]
        assert is_packed(tmp_path)
        assert PackedHierarchyStore(tmp_path).get("dual-p").text == "parent dual"

    def test_retry_preserves_asided_pack_when_finish_fails(
        self, tmp_path, monkeypatch
    ):
        """If final→old succeeded but out→final failed once (exotic fs), the
        retry must NOT clear the asided old pack — a crash mid-retry then
        still heals to the previous pack instead of leaving nothing."""
        import os as os_mod

        import tensortruth_tpu.index.packed as packed_mod

        _pack(tmp_path, "keep")
        real_replace = os_mod.replace
        state = {"fails": 0}

        def flaky_replace(src, dst):
            # fail the FIRST finish (dst == packed/) once, after the aside
            if str(dst).endswith(packed_mod.PACKED_DIR) and state["fails"] == 0:
                state["fails"] = 1
                assert (tmp_path / "packed.old" / "manifest.json").exists()
                raise OSError("injected transient finish failure")
            return real_replace(src, dst)

        monkeypatch.setattr(os_mod, "replace", flaky_replace)
        new = _hierarchy("keep2")
        pack_index(tmp_path, new, list(new.leaf_ids), np.ones(4, bool))
        assert is_packed(tmp_path)
        assert PackedHierarchyStore(tmp_path).get("keep2-p").text == "parent keep2"
        assert not (tmp_path / "packed.old").exists()


class TestMatrixSaveAtomicity:
    """VectorIndex.save used to np.save over embeddings.npy in place
    (truncate-then-write): a concurrent load — or a crash — saw a torn
    matrix. Saves now stage to PID-tagged tmps and rename under the swap
    guard, which load also holds while opening."""

    @staticmethod
    def _vi(tag, n=6, dim=8):
        from tensortruth_tpu.index.store import VectorIndex

        kids = [
            Node(node_id=f"{tag}-k{i}", text=f"{tag} c{i}", doc_id="d",
                 module="m", level=0)
            for i in range(n)
        ]
        parent = Node(node_id=f"{tag}-p", text=f"parent {tag}", doc_id="d",
                      module="m", level=1,
                      child_ids=[k.node_id for k in kids])
        rng = np.random.default_rng(1)
        return VectorIndex.build(
            [parent] + kids,
            lambda t: rng.standard_normal((len(t), dim)).astype(np.float32),
        )

    def test_concurrent_save_load_never_sees_torn_matrix(self, tmp_path):
        import threading

        from tensortruth_tpu.index.store import VectorIndex

        vi = self._vi("t")
        vi.save(tmp_path)
        stop = threading.Event()
        errors = []

        def load_loop():
            while not stop.is_set():
                try:
                    r = VectorIndex.load(tmp_path)
                    assert r.matrix()[0].shape[1] == 8
                except Exception as e:  # noqa: BLE001 — the test's assertion
                    errors.append(repr(e))
                    return

        t = threading.Thread(target=load_loop)
        t.start()
        try:
            for _ in range(40):
                vi.save(tmp_path)
        finally:
            stop.set()
            t.join()
        assert not errors, errors[:3]

    def test_crash_mid_matrix_stage_keeps_old_matrix(self, tmp_path, monkeypatch):
        import tensortruth_tpu.index.store as store_mod

        vi = self._vi("keepm")
        vi.save(tmp_path)
        before = np.asarray(store_mod.VectorIndex.load(tmp_path).matrix()[0])

        real_save = np.save
        calls = {"n": 0}

        def flaky_save(f, arr, **kw):
            calls["n"] += 1
            raise RuntimeError("injected crash mid-stage")

        monkeypatch.setattr(np, "save", flaky_save)
        vi2 = self._vi("newm")
        with pytest.raises(RuntimeError):
            vi2.save(tmp_path)
        monkeypatch.setattr(np, "save", real_save)
        after = np.asarray(store_mod.VectorIndex.load(tmp_path).matrix()[0])
        np.testing.assert_array_equal(before, after)
        # staged debris was aborted
        assert not list(tmp_path.glob("embeddings*.tmp-*"))

    def test_packed_save_commits_matrix_and_pack_in_one_window(self, tmp_path):
        """After save(packed=True), matrix rows == packed row map length
        (the single-guard commit), and repeated packed saves over the same
        dir keep it loadable."""
        from tensortruth_tpu.index.store import VectorIndex

        vi = self._vi("both")
        for _ in range(3):
            vi.save(tmp_path, packed=True)
        r = VectorIndex.load(tmp_path)
        assert r.store.get("both-p").text == "parent both"
        assert not list(tmp_path.glob("packed.tmp-*"))
        assert not (tmp_path / "packed.old").exists()


class TestSwapGuardReentrancy:
    """VectorIndex.save/load hold the swap guard around nested pack
    operations (load → is_packed → PackedHierarchyStore), so the guard
    must be reentrant per (thread, path) — and still exclude OTHER
    threads while held."""

    def test_nested_same_path_does_not_deadlock(self, tmp_path):
        from tensortruth_tpu.index.packed import _swap_guard

        with _swap_guard(tmp_path):
            with _swap_guard(tmp_path):
                with _swap_guard(tmp_path):
                    pass  # would deadlock on a non-reentrant flock

    def test_nested_distinct_paths_from_one_thread(self, tmp_path):
        from tensortruth_tpu.index.packed import _swap_guard

        a, b = tmp_path / "a", tmp_path / "b"
        a.mkdir(), b.mkdir()
        with _swap_guard(a):
            with _swap_guard(b):  # different dir: fresh flock, no clash
                with _swap_guard(a):
                    pass

    def test_other_thread_still_excluded_while_held(self, tmp_path):
        import threading
        import time

        from tensortruth_tpu.index.packed import _swap_guard

        order = []

        def contender():
            with _swap_guard(tmp_path):
                order.append("contender")

        with _swap_guard(tmp_path):
            t = threading.Thread(target=contender)
            t.start()
            time.sleep(0.05)
            order.append("holder")
        t.join(5)
        assert order == ["holder", "contender"]


class TestSwapGuardSharedMode:
    """ADVICE r4: readers take the guard SHARED — concurrent loaders of one
    module must not serialize cross-process; only a writer's exclusive
    rename window excludes them."""

    HOLDER = (
        "import sys, time\n"
        "from tensortruth_tpu.index.packed import _swap_guard\n"
        "with _swap_guard(sys.argv[1], shared=(sys.argv[2] == 'shared')):\n"
        "    print('held', flush=True)\n"
        "    time.sleep(float(sys.argv[3]))\n"
    )

    def _spawn_holder(self, path, mode, hold_s):
        import subprocess
        import sys

        proc = subprocess.Popen(
            [sys.executable, "-c", self.HOLDER, str(path), mode, str(hold_s)],
            stdout=subprocess.PIPE,
            text=True,
        )
        assert proc.stdout.readline().strip() == "held"
        return proc

    def test_shared_readers_do_not_serialize_cross_process(self, tmp_path):
        import time

        from tensortruth_tpu.index.packed import _swap_guard

        proc = self._spawn_holder(tmp_path, "shared", 3.0)
        try:
            t0 = time.monotonic()
            with _swap_guard(tmp_path, shared=True):
                pass
            # a shared reader must get in while the other shared holder
            # sleeps — serializing would take the full 3 s hold
            assert time.monotonic() - t0 < 1.5
        finally:
            proc.wait(10)

    def test_writer_excluded_while_shared_reader_holds(self, tmp_path):
        import time

        from tensortruth_tpu.index.packed import _swap_guard

        proc = self._spawn_holder(tmp_path, "shared", 1.0)
        try:
            t0 = time.monotonic()
            with _swap_guard(tmp_path):  # exclusive: must wait out the reader
                waited = time.monotonic() - t0
            assert waited > 0.4
        finally:
            proc.wait(10)

    def test_nested_exclusive_under_shared_upgrades(self, tmp_path):
        # load() holds SHARED; is_packed's crash-heal nests an EXCLUSIVE
        # request on the same dir — must upgrade in place, not deadlock.
        from tensortruth_tpu.index.packed import _swap_guard

        with _swap_guard(tmp_path, shared=True):
            with _swap_guard(tmp_path):
                with _swap_guard(tmp_path, shared=True):
                    pass


def test_staged_pack_dir_honors_umask(tmp_path, tiny_tokenizer, sample_text):
    """ADVICE r4 (medium): mkdtemp stages the pack 0700; after the swap the
    live packed/ dir must carry umask-respecting perms so a serving process
    under a different account can still read a CLI rebuild's output."""
    import os
    import stat

    from tensortruth_tpu.index.chunker import hierarchical_chunk
    from tensortruth_tpu.index.store import VectorIndex

    nodes = hierarchical_chunk(
        sample_text, tiny_tokenizer, "doc1", chunk_sizes=[128, 32], chunk_overlap=8
    )
    import numpy as np

    idx = VectorIndex.build(
        nodes, lambda ts: np.ones((len(ts), 4), np.float32), embedding_model="t"
    )
    old_umask = os.umask(0o022)
    try:
        idx.save(tmp_path / "mod", packed=True)
    finally:
        os.umask(old_umask)
    mode = stat.S_IMODE((tmp_path / "mod" / "packed").stat().st_mode)
    assert mode == 0o755, oct(mode)
