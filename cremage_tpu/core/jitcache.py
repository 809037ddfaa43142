"""Cached jitted applies for host-driven model calls.

The sampler loops are single jitted scan programs, but the calls AROUND
them — text-tower encodes, VAE encode/decode, safety/annotator nets —
were plain eager `model.apply(...)`.  On CPU that is harmless; through
the tunneled TPU backend every eager op is its own ~ms-scale dispatch,
and an eager CLIP/VAE forward costs SECONDS of host time (measured
round 5, tools/profile_e2e.py: text conditioning 4.3 s of a 7.6 s
batch-4 serving job, VAE decode 1.4 s — vs ~0.05 s of device compute
each).  Routing those calls through one cached jitted program per
(module, method) collapses them to a single dispatch.

Params are ARGUMENTS of the jitted function (never closed over — the
repo-wide jit discipline), so one program serves every checkpoint of
the same architecture.  The cache retains the module object, keeping
`id(model)` stable for the process lifetime.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax

_CACHE: Dict[Tuple, Tuple[Any, Callable]] = {}


def jit_apply(model, method: Optional[Callable] = None,
              tag: str = "") -> Callable:
    """Cached `jax.jit(lambda params, *args, **kwargs: model.apply(...))`
    for this (module instance, method, tag)."""
    key = (id(model), method, tag)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[1]
    if method is None:
        fn = jax.jit(lambda p, *a, **k: model.apply(p, *a, **k))
    else:
        fn = jax.jit(
            lambda p, *a, **k: model.apply(p, *a, method=method, **k))
    _CACHE[key] = (model, fn)
    return fn


def jit_fn(anchor, builder: Callable, tag: str) -> Callable:
    """Cached jit of an arbitrary function tied to `anchor`'s lifetime:
    builder() -> python function, jitted once per (id(anchor), tag)."""
    key = (id(anchor), None, tag)
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[1]
    fn = jax.jit(builder())
    _CACHE[key] = (anchor, fn)
    return fn
