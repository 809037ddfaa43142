"""Compilation + converted-checkpoint caches.

- `enable_compilation_cache()`: persistent XLA compilation cache
  (compiles through the TPU tunnel cost 30-190s; the second process
  start pays ~0). Called by the CLI, server and bench.
- `save_params_cache` / `load_params_cache`: orbax-backed cache of
  converted Flax param trees keyed by source checkpoint path+mtime —
  replaces repeated torch->numpy->jax conversion of multi-GB
  checkpoints (SURVEY.md §5 checkpoint/resume: "orbax for any
  native-format caching").
"""
from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cremage_tpu", "jax_cache"
)
_enabled = False


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    global _enabled
    if _enabled:
        return
    d = cache_dir or os.environ.get("CREMAGE_TPU_COMPILE_CACHE",
                                    _DEFAULT_CACHE_DIR)
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
        logger.info("persistent compilation cache at %s", d)
    except Exception as e:  # pragma: no cover - config name drift
        logger.warning("could not enable compilation cache: %s", e)


def _cache_key(source_path: str, extra: str = "") -> str:
    st = os.stat(source_path)
    raw = f"{os.path.abspath(source_path)}:{st.st_size}:{st.st_mtime_ns}:{extra}"
    return hashlib.sha256(raw.encode()).hexdigest()[:24]


def params_cache_dir(base: Optional[str] = None) -> str:
    return base or os.path.join(os.path.expanduser("~"), ".cremage_tpu",
                                "params_cache")


def save_params_cache(source_path: str, params: Any, extra: str = "",
                      base: Optional[str] = None) -> str:
    import orbax.checkpoint as ocp

    d = os.path.join(params_cache_dir(base), _cache_key(source_path, extra))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(d, params, force=True)
    return d


def load_params_cache(source_path: str, extra: str = "",
                      base: Optional[str] = None) -> Optional[Any]:
    import orbax.checkpoint as ocp

    if not os.path.exists(source_path):
        return None
    d = os.path.join(params_cache_dir(base), _cache_key(source_path, extra))
    if not os.path.isdir(d):
        return None
    try:
        return ocp.PyTreeCheckpointer().restore(d)
    except Exception as e:
        logger.warning("params cache restore failed (%s); reconverting", e)
        return None
