"""Seed / RNG semantics.

Behavior contract with the reference:
- a job seed of -1 means "draw a fresh random seed" (reference
  `modules/cremage/utils/random_utils.py` safe_random_int, used by
  `sd/image_generator.py:609-617`);
- image ``i`` of a batch job uses ``seed + i`` so a saved image's metadata
  seed exactly reproduces it standalone (reference
  `sd/image_generator.py:1135` stores `opt.seed + i`).

TPU-native design: stateless `jax.random` keys derived from the integer
seed; no global RNG state crosses jit boundaries. Noise tensors are drawn
in float32 and cast down, so the same seed yields the same trajectory
regardless of compute dtype.
"""
from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp

# Max value for drawn seeds; reference uses 32-bit-ish UI-safe ints.
_SEED_MAX = 2**31 - 1


def resolve_seed(seed: int | None) -> int:
    """Resolve a job seed: -1/None draws a fresh random seed (host-side)."""
    if seed is None or int(seed) < 0:
        return secrets.randbelow(_SEED_MAX)
    return int(seed)


def key_for_image(seed: int, image_index: int = 0) -> jax.Array:
    """PRNG key for image `image_index` of a job: key(seed + i)."""
    return jax.random.key((int(seed) + int(image_index)) % (2**63 - 1))


def noise_like(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Standard normal noise drawn in fp32, cast to `dtype`."""
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


def split_for_steps(key: jax.Array, num_steps: int) -> jax.Array:
    """Pre-split per-step keys for ancestral/SDE samplers (scan-friendly)."""
    return jax.random.split(key, num_steps)
