"""Model lifecycle manager — the L0 model runtime.

Re-designs the reference's ``ModelManager`` (reference
services/model_manager.py:39-186: thread-safe singleton, exactly one embedder
+ one reranker resident, swap-on-mismatch with explicit unload, parameter-
memory accounting :420-510) for the JAX runtime:

* "unload" = dropping the param pytree references; XLA frees HBM when the
  last reference dies (no torch.cuda.empty_cache equivalent needed).
* model identity key = (model_id, dtype, max_length); a mismatch swaps the
  resident model, matching reference :298-372 semantics.
* loading resolves, in order: a local HF checkpoint directory (converted via
  models/convert.py), else random-init weights at the requested architecture
  (offline environments — this container has no network/HF cache).
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tensortruth_tpu.models.embedder import Embedder
from tensortruth_tpu.models.reranker import Reranker
from tensortruth_tpu.models.xlmr import (
    BGE_M3_CONFIG,
    BGE_RERANKER_V2_M3_CONFIG,
    XLMRConfig,
)
from tensortruth_tpu.tokenization import load_tokenizer

logger = logging.getLogger(__name__)

DEFAULT_EMBEDDING_MODEL = "BAAI/bge-m3"
DEFAULT_RERANKER_MODEL = "BAAI/bge-reranker-v2-m3"


def host_cache_tag() -> str:
    """Short fingerprint of this host's CPU feature set.

    JAX's persistent compilation cache keys entries by HLO + compile options
    but NOT by the host machine's CPU features, and XLA:CPU AOT executables
    baked for one microarchitecture fail to load (or worse, SIGILL) on
    another ("Machine type used for XLA:CPU compilation doesn't match...").
    Cache directories are therefore suffixed with this tag so that moving
    the cache dir between hosts — which happens between build rounds here —
    starts cold instead of tripping over incompatible AOT artifacts.
    """
    import hashlib
    import platform

    feats = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats += " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats += platform.processor()
    return hashlib.sha256(feats.encode()).hexdigest()[:10]


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for this process.

    Cold-compiling the 568M encoder/reranker graphs costs tens of seconds
    per (batch, seq) bucket — minutes over a remote-tunnelled device; with
    the cache, every later process start is warm. Called by the server app
    factory and the build CLI; no-ops if the app already configured a dir.
    """
    import os

    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache",
        "tensortruth_tpu_jax_" + host_cache_tag(),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        logger.info("persistent XLA compilation cache at %s", cache_dir)
    except Exception as e:  # cache is an optimization, never fatal
        logger.warning("could not enable compilation cache: %s", e)

# Architectures known to this engine, keyed by HF model id. ``tiny-*`` ids
# exist for tests/CI so suites never build 568M-param models.
_EMBEDDER_ARCHS: dict[str, XLMRConfig] = {
    DEFAULT_EMBEDDING_MODEL: BGE_M3_CONFIG,
    "tiny-embedder": XLMRConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=130,
    ),
}
_RERANKER_ARCHS: dict[str, XLMRConfig] = {
    DEFAULT_RERANKER_MODEL: BGE_RERANKER_V2_M3_CONFIG,
    "tiny-reranker": XLMRConfig(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, max_position=130, num_labels=1,
    ),
}


def discover_checkpoint(model_id: str) -> tuple[str | None, str | None]:
    """Find local weights + tokenizer for ``model_id`` without any network.

    Search order (first hit wins):

    1. ``$TENSOR_TRUTH_TPU_MODELS_DIR/<model_id|sanitized>/`` — plain dirs;
    2. the HF hub cache (``$HF_HUB_CACHE`` / ``$HF_HOME/hub`` /
       ``~/.cache/huggingface/hub``) ``models--org--name/snapshots/*/``.

    Returns (model_dir, tokenizer_json_path), either may be None. The
    reference downloads from the Hub at runtime (reference
    model_manager.py:254-337); this engine is offline-first and only ever
    reads what is already on disk.
    """
    import os
    from pathlib import Path

    roots: list[Path] = []
    env_dir = os.environ.get("TENSOR_TRUTH_TPU_MODELS_DIR")
    if env_dir:
        roots.append(Path(env_dir))
    hub = os.environ.get("HF_HUB_CACHE")
    if not hub:
        hf_home = os.environ.get("HF_HOME")
        hub = os.path.join(hf_home, "hub") if hf_home else None
    roots.append(Path(hub) if hub else Path.home() / ".cache/huggingface/hub")

    def weights_in(d: Path) -> bool:
        return (
            (d / "model.safetensors").exists()
            or (d / "model.safetensors.index.json").exists()  # sharded
            or (d / "pytorch_model.bin").exists()
        )

    def snapshots_ordered(repo_dir: Path) -> list[Path]:
        """Current revision first: refs/main names the live commit hash —
        lexicographic hash order is arbitrary and can pick a stale
        revision. Fallback: newest mtime first."""
        snap_root = repo_dir / "snapshots"
        snaps = [p for p in snap_root.iterdir() if p.is_dir()]
        ref = repo_dir / "refs" / "main"
        if ref.exists():
            head = ref.read_text().strip()
            snaps.sort(key=lambda p: (p.name != head, -p.stat().st_mtime))
        else:
            snaps.sort(key=lambda p: -p.stat().st_mtime)
        return snaps

    candidates: list[Path] = []
    sanitized = model_id.split("/")[-1]
    for root in roots:
        if not root.is_dir():
            continue
        candidates += [root / model_id, root / sanitized]
        repo_dir = root / f"models--{model_id.replace('/', '--')}"
        if (repo_dir / "snapshots").is_dir():
            candidates += snapshots_ordered(repo_dir)

    for d in candidates:
        if d.is_dir() and weights_in(d):
            tok = d / "tokenizer.json"
            return str(d), str(tok) if tok.exists() else None
    # tokenizer.json may exist without weights (e.g. shipped separately)
    for d in candidates:
        if d.is_dir() and (d / "tokenizer.json").exists():
            return None, str(d / "tokenizer.json")
    return None, None


@dataclass
class ModelSpec:
    model_id: str
    dtype: str = "bfloat16"
    # Matches the chunker's largest (level-0) node: a 2048-token parent can be
    # embedded/reranked un-truncated (BGE-M3 itself supports 8192 — raise via
    # config per model if needed). Queries still land in the small seq buckets.
    max_length: int = 2048
    local_dir: str | None = None  # local HF checkpoint to convert
    tokenizer_path: str | None = None
    # None = the runtime's tuned defaults (config.yaml per-model blocks
    # override, app/config.py EmbeddingModelConfig)
    batch_buckets: tuple | None = None
    seq_buckets: tuple | None = None

    def key(self) -> tuple:
        # tokenizer_path included: a newly discovered/changed tokenizer.json
        # MUST swap the resident model or stale hash-token embeddings keep
        # serving until restart
        return (
            self.model_id, self.dtype, self.max_length,
            self.local_dir, self.tokenizer_path,
            self.batch_buckets, self.seq_buckets,
        )

    def bucket_kwargs(self) -> dict:
        """Non-None bucket overrides for Embedder/Reranker construction."""
        kw = {}
        if self.batch_buckets:
            kw["batch_buckets"] = tuple(self.batch_buckets)
        if self.seq_buckets:
            kw["seq_buckets"] = tuple(self.seq_buckets)
        return kw


def _clamp_max_length(spec: ModelSpec, cfg: XLMRConfig) -> ModelSpec:
    """Cap ``spec.max_length`` at the architecture's position capacity.

    XLM-R learned positions start at padding_idx+1=2, so a model with
    ``max_position`` rows supports sequences of ``max_position - 2`` tokens;
    BERT-family positions are a plain arange, capacity = ``max_position``
    (512 for MiniLM-class checkpoints). Feeding longer sequences indexes
    past the embedding table (silently clamped/wrapped by the backend —
    garbage scores, no error). BGE-M3's 8194 rows comfortably cover the
    default 2048; this guard matters for smaller architectures (e.g. the
    ``tiny-*`` test models at 130 rows, where an unclamped 2048-token
    program is also a ~100× compile+compute blowup on the CPU test backend).
    """
    offset = 0 if cfg.position_style == "bert" else 2
    cap = max(cfg.max_position - offset, 8)
    if spec.max_length <= cap:
        return spec
    from dataclasses import replace

    return replace(spec, max_length=cap)


def _mesh_desc(mesh) -> tuple | None:
    """JSON-able VALUE identity for a mesh: config-driven meshes are fresh
    objects each engine load, so object identity would thrash the model
    cache, and raw Mesh objects crash json.dumps in status()."""
    if mesh is None:
        return None
    return (
        tuple(sorted(dict(mesh.shape).items())),
        tuple(int(d.id) for d in mesh.devices.flat),
    )


class ModelManager:
    """Process-wide singleton: one embedder + one reranker resident at a time."""

    _instance: "ModelManager | None" = None
    _instance_lock = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.RLock()
        self._embedder: Embedder | None = None
        self._embedder_key: tuple | None = None
        self._reranker: Reranker | None = None
        self._reranker_key: tuple | None = None

    @classmethod
    def get_instance(cls) -> "ModelManager":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    @classmethod
    def reset_instance(cls) -> None:
        with cls._instance_lock:
            cls._instance = None

    # -- embedder ------------------------------------------------------------

    # model_id -> (expiry, (local_dir, tokenizer_path)): the filesystem scan
    # (models dir + HF cache snapshots) must not run per serving request
    _discovery_cache: dict[str, tuple[float, tuple]] = {}
    _DISCOVERY_TTL = 60.0

    @classmethod
    def _discover_cached(cls, model_id: str) -> tuple[str | None, str | None]:
        import time

        hit = cls._discovery_cache.get(model_id)
        now = time.monotonic()
        if hit and hit[0] > now:
            return hit[1]
        found = discover_checkpoint(model_id)
        cls._discovery_cache[model_id] = (now + cls._DISCOVERY_TTL, found)
        return found

    @classmethod
    def _resolve_spec(cls, spec: ModelSpec) -> ModelSpec:
        """Fill local_dir/tokenizer_path from on-disk checkpoints (no network)."""
        from dataclasses import replace
        from pathlib import Path

        if spec.model_id.startswith("tiny-"):
            return spec  # test architectures are always random-init
        if spec.local_dir and not spec.tokenizer_path:
            # an explicitly configured checkpoint dir usually ships its own
            # tokenizer.json — look there before the global search roots
            tok = Path(spec.local_dir) / "tokenizer.json"
            if tok.exists():
                spec = replace(spec, tokenizer_path=str(tok))
        if spec.local_dir and spec.tokenizer_path:
            return spec
        local_dir, tok = cls._discover_cached(spec.model_id)
        return replace(
            spec,
            local_dir=spec.local_dir or local_dir,
            tokenizer_path=spec.tokenizer_path or tok,
        )

    @staticmethod
    def _warn_if_degraded(spec: ModelSpec, role: str) -> None:
        if spec.model_id.startswith("tiny-"):
            return
        if spec.tokenizer_path is None:
            logger.warning(
                "%s %s: NO tokenizer.json found — falling back to the "
                "hash-based SimpleTokenizer. Embeddings/scores will NOT "
                "match the real model; retrieval quality is degraded. "
                "Provide tokenizer.json via TENSOR_TRUTH_TPU_MODELS_DIR, "
                "the HF cache, or the model config's tokenizer_path.",
                role, spec.model_id,
            )

    @staticmethod
    def _key_matches(resident_key, new_key, mesh) -> bool:
        """mesh=None means "don't care": callers off the engine path
        (document uploads, web reranking) must reuse the resident model
        rather than swap-thrash it into a second full HBM copy."""
        if resident_key is None:
            return False
        if mesh is None:
            return resident_key[:-1] == new_key[:-1]
        return resident_key == new_key

    def get_embedder(self, spec: ModelSpec | None = None, mesh=None) -> Embedder:
        spec = self._resolve_spec(spec or ModelSpec(DEFAULT_EMBEDDING_MODEL))
        key = (*spec.key(), _mesh_desc(mesh))
        with self._lock:
            if self._embedder is not None and self._key_matches(
                self._embedder_key, key, mesh
            ):
                return self._embedder
            if self._embedder is not None:
                logger.info("swapping embedder %s -> %s", self._embedder_key, key)
                self._embedder = None  # release HBM before loading the new one
            self._embedder = self._load_embedder(spec, mesh=mesh)
            self._embedder_key = key
            return self._embedder

    @staticmethod
    def _resolve_arch(
        spec: ModelSpec, registry: dict, default: XLMRConfig, num_labels: int
    ) -> XLMRConfig:
        """Architecture for ``spec``: registry id → checkpoint's own
        config.json (any local BERT/RoBERTa/XLM-R-family checkpoint, the
        reference's "any HF model id" surface) → BGE default with a warning."""
        cfg = registry.get(spec.model_id)
        if cfg is not None:
            return cfg
        if spec.local_dir:
            from tensortruth_tpu.models.convert import config_from_hf

            cfg = config_from_hf(spec.local_dir, num_labels=num_labels)
            if cfg is not None:
                logger.info(
                    "%s: architecture from %s/config.json (%s, L=%d H=%d, "
                    "pooling=%s)", spec.model_id, spec.local_dir,
                    cfg.position_style, cfg.num_layers, cfg.hidden_size,
                    cfg.pooling,
                )
                return cfg
        if spec.model_id not in (DEFAULT_EMBEDDING_MODEL, DEFAULT_RERANKER_MODEL):
            logger.warning(
                "%s: unknown architecture and no readable config.json — "
                "assuming the BGE default (XLM-R %d-layer)",
                spec.model_id, default.num_layers,
            )
        return default

    def _load_embedder(self, spec: ModelSpec, mesh=None) -> Embedder:
        cfg = self._resolve_arch(spec, _EMBEDDER_ARCHS, BGE_M3_CONFIG, 0)
        spec = _clamp_max_length(spec, cfg)
        dtype = getattr(jnp, spec.dtype)
        self._warn_if_degraded(spec, "embedder")
        tokenizer = load_tokenizer(
            spec.tokenizer_path,
            sep_style="bert" if cfg.position_style == "bert" else "xlmr",
        )
        if spec.local_dir:
            from tensortruth_tpu.models.convert import convert_local_checkpoint

            params = convert_local_checkpoint(
                spec.local_dir, num_layers=cfg.num_layers, dtype=dtype
            )
            embedder = Embedder(
                params, cfg, tokenizer, max_length=spec.max_length, mesh=mesh,
                **spec.bucket_kwargs(),
            )
        else:
            logger.warning(
                "no local checkpoint for %s — using random-init weights", spec.model_id
            )
            embedder = Embedder.random_init(
                cfg, tokenizer, dtype=dtype, max_length=spec.max_length, mesh=mesh,
                **spec.bucket_kwargs(),
            )
        embedder.model_id = spec.model_id
        return embedder

    # -- reranker ------------------------------------------------------------

    def get_reranker(self, spec: ModelSpec | None = None, mesh=None) -> Reranker:
        spec = self._resolve_spec(spec or ModelSpec(DEFAULT_RERANKER_MODEL))
        key = (*spec.key(), _mesh_desc(mesh))
        with self._lock:
            if self._reranker is not None and self._key_matches(
                self._reranker_key, key, mesh
            ):
                return self._reranker
            if self._reranker is not None:
                logger.info("swapping reranker %s -> %s", self._reranker_key, key)
                self._reranker = None
            self._reranker = self._load_reranker(spec, mesh=mesh)
            self._reranker_key = key
            return self._reranker

    def _load_reranker(self, spec: ModelSpec, mesh=None) -> Reranker:
        cfg = self._resolve_arch(
            spec, _RERANKER_ARCHS, BGE_RERANKER_V2_M3_CONFIG, 1
        )
        spec = _clamp_max_length(spec, cfg)
        dtype = getattr(jnp, spec.dtype)
        self._warn_if_degraded(spec, "reranker")
        tokenizer = load_tokenizer(
            spec.tokenizer_path,
            sep_style="bert" if cfg.position_style == "bert" else "xlmr",
        )
        if spec.local_dir:
            from tensortruth_tpu.models.convert import convert_local_checkpoint

            params = convert_local_checkpoint(
                spec.local_dir, num_layers=cfg.num_layers,
                num_labels=cfg.num_labels, dtype=dtype,
            )
            reranker = Reranker(
                params, cfg, tokenizer, max_length=spec.max_length, mesh=mesh,
                **spec.bucket_kwargs(),
            )
        else:
            logger.warning(
                "no local checkpoint for %s — using random-init weights", spec.model_id
            )
            reranker = Reranker.random_init(
                cfg, tokenizer, dtype=dtype, max_length=spec.max_length, mesh=mesh,
                **spec.bucket_kwargs(),
            )
        reranker.model_id = spec.model_id
        return reranker

    # -- lifecycle / accounting (reference model_manager.py:385-510) ---------

    def unload_all(self) -> None:
        with self._lock:
            self._embedder = None
            self._embedder_key = None
            self._reranker = None
            self._reranker_key = None

    def status(self) -> dict:
        with self._lock:
            def entry(model, key):
                if model is None:
                    return None
                return {
                    "key": list(key),
                    "param_bytes": model.param_bytes(),
                    "param_gb": round(model.param_bytes() / 2**30, 3),
                }

            devices = [
                {"id": d.id, "platform": d.platform, "kind": d.device_kind}
                for d in jax.devices()
            ]
            return {
                "embedder": entry(self._embedder, self._embedder_key),
                "reranker": entry(self._reranker, self._reranker_key),
                "devices": devices,
            }


def register_embedder_arch(model_id: str, cfg: XLMRConfig) -> None:
    _EMBEDDER_ARCHS[model_id] = cfg


def register_reranker_arch(model_id: str, cfg: XLMRConfig) -> None:
    _RERANKER_ARCHS[model_id] = cfg
