#!/usr/bin/env python
"""Microbench of temporal-attention formulations (SVD full-res shape).

The hlo_stats profile shows the softmax fusion of the transpose-free
einsum formulation HBM-bound at 61 GB/s: logits land as (b,s,h,t,u)
with u=14 minor, so lane vectors are 14/128 utilized. This compares
candidate formulations, chained REPS times in one jit (axon tunnel:
differential timing only).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache

REPS = int(os.environ.get("PROF_REPS", "30"))
B, T, S, H, D = 2, 14, 9216, 5, 64
SCALE = D ** -0.5


def chained(op):
    def run(q, k, v):
        def body(i, q):
            return op(q, k, v).astype(q.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, q).astype(jnp.float32))
    return jax.jit(run)


def current(q, k, v):
    logits = jnp.einsum("btshd,bushd->bshtu", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bshtu,bushd->btshd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def mulsum(q, k, v):
    # explicit broadcast-multiply-reduce; no dot_general, logits (b,t,u,s,h)
    l = (q[:, :, None].astype(jnp.float32)
         * k[:, None].astype(jnp.float32)).sum(-1) * SCALE  # btushd->btus h
    l = l - lax.stop_gradient(l.max(axis=2, keepdims=True))
    e = jnp.exp(l)
    p = (e / e.sum(axis=2, keepdims=True)).astype(v.dtype)
    return jnp.einsum("btush,bushd->btshd", p, v,
                      preferred_element_type=jnp.float32)


def transposed(q, k, v):
    # old formulation: physically transpose to (B*S, T, H, D)
    qr = q.transpose(0, 2, 1, 3, 4).reshape(B * S, T, H, D)
    kr = k.transpose(0, 2, 1, 3, 4).reshape(B * S, T, H, D)
    vr = v.transpose(0, 2, 1, 3, 4).reshape(B * S, T, H, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qr, kr,
                        preferred_element_type=jnp.float32) * SCALE
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vr.dtype), vr,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, S, T, H, D).transpose(0, 2, 1, 3, 4)


def flat_tu(q, k, v):
    # softmax over a (t*u) minor dim flattened view: logits laid out
    # (b,s,h,t,u) -> reshape (b,s,h,t*u)=196 lanes, exp on flat, then
    # segment-sum via reshape back (t,u) for the normalizer
    logits = jnp.einsum("btshd,bushd->bshtu", q, k,
                        preferred_element_type=jnp.float32) * SCALE
    flat = logits.reshape(B, S, H, T * T)
    m = logits.max(axis=-1).reshape(B, S, H, T, 1)
    e = jnp.exp(logits - m)
    p = (e / e.sum(axis=-1, keepdims=True)).astype(v.dtype)
    del flat
    return jnp.einsum("bshtu,bushd->btshd", p, v,
                      preferred_element_type=jnp.float32)


def main():
    enable_compilation_cache()
    key = jax.random.key(0)
    q = jax.random.normal(key, (B, T, S, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, T, S, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, T, S, H, D), jnp.bfloat16)

    ref = None
    for name, op in [("einsum-bshtu (current)", current),
                     ("mul-sum btus", mulsum),
                     ("transpose (B*S,T)", transposed)]:
        out = np.asarray(jax.jit(op)(q, k, v))
        if ref is None:
            ref = out
        else:
            np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
        f = chained(op)
        np.asarray(f(q, k, v))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(f(q, k, v))
            best = min(best, time.perf_counter() - t0)
        per = best / REPS * 1e3
        print(f"{name:28s} {per:8.3f} ms/layer-eval", flush=True)


if __name__ == "__main__":
    main()
