"""Sequence-parallel self-attention over a device mesh.

The reference has no distributed code at all (SURVEY.md §2.2); this is
the TPU-native "long context" axis called out in SURVEY §5: at hires
scales (2048² image → 65k latent tokens) a single image cannot use the
batch (data) axis, tensor parallelism caps at the head count, but the
*token* axis of self-attention splits cleanly over the ICI mesh — each
chip keeps a token slice of q and the O(N²) logits work and O(N)
activation memory divide by the mesh size.

Two schedules, both full (non-causal) attention as diffusion UNet/DiT
self-attention requires:

- `all_gather_kv`: k/v are all-gathered once, q stays local.  One
  collective; peak memory O(N) for k/v but logits stay blocked at
  O(N·N/p).  Right for moderate N.
- `ring`: k/v chunks circulate around the ring via `ppermute` while a
  streaming online-softmax accumulator (running max m, normalizer l,
  weighted sum acc) folds each chunk in — the Ring Attention schedule
  (Liu et al. 2023, public pattern re-derived here for NHWC latent
  tokens).  Peak memory O(N/p) per device and the k/v transfer
  overlaps the block compute on the ICI torus.

Inputs follow ops/attention.py convention: (B, N, H, D) with the token
axis sharded over the chosen mesh axis.  Math in fp32 (same contract as
the Pallas flash kernel: fp32 softmax statistics).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _reference_attention(q, k, v):
    """Plain fp32-softmax attention, (B,N,H,D) layout — the oracle."""
    scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
    logits = jnp.einsum("bnhd,bmhd->bhnm", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def _all_gather_kv_shard(q, k, v, axis_name: str):
    """Per-shard body: local q slice against the full (gathered) k/v."""
    k_full = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    return _reference_attention(q, k_full, v_full)


def _ring_shard(q, k, v, axis_name: str, k_prefix=None, v_prefix=None):
    """Per-shard body: streaming online-softmax over ring-passed k/v.

    Accumulators: m (B,H,Nq) running max, l (B,H,Nq) running softmax
    normalizer, acc (B,Nq,H,D) running weighted value sum — the flash-
    attention recurrence, with the 'blocks' being other devices' k/v
    slices arriving over ICI.

    `k_prefix`/`v_prefix` (optional, REPLICATED across the axis) are
    folded in once before the ring — the joint-attention case where a
    short context stream (not divisible by the mesh, and cheap to
    replicate) attends together with the sharded latent tokens
    (models/mmdit.py under cfg.sp_axis).
    """
    n_dev = jax.lax.psum(1, axis_name)
    axis_index = jax.lax.axis_index(axis_name)
    del axis_index  # ring is rotation-invariant for full attention
    b, nq, h, d = q.shape
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    qf = q.astype(jnp.float32)

    def fold(m, l, acc, k_c, v_c):
        logits = jnp.einsum("bnhd,bmhd->bhnm", qf,
                            k_c.astype(jnp.float32)) * scale
        m_blk = logits.max(axis=-1)
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)                       # (B,H,Nq)
        l = l * corr + p.sum(axis=-1)
        acc = (acc * jnp.moveaxis(corr, 1, 2)[..., None]
               + jnp.einsum("bhnm,bmhd->bnhd", p, v_c.astype(jnp.float32)))
        return m_new, l, acc

    def block(carry, _):
        m, l, acc, k_c, v_c = carry
        m, l, acc = fold(m, l, acc, k_c, v_c)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        return (m, l, acc, k_c, v_c), None

    m0 = jnp.full((b, h, nq), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, nq), jnp.float32)
    acc0 = jnp.zeros((b, nq, h, d), jnp.float32)
    if k_prefix is not None:
        m0, l0, acc0 = fold(m0, l0, acc0, k_prefix, v_prefix)
    (m, l, acc, _, _), _ = jax.lax.scan(
        block, (m0, l0, acc0, k, v), None, length=n_dev)
    out = acc / jnp.moveaxis(l, 1, 2)[..., None]
    return out.astype(q.dtype)


def sp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    schedule: str = "ring",
) -> jnp.ndarray:
    """Full self-attention with the token axis sharded over mesh[axis].

    q/k/v: (B, N, H, D); N must divide by the mesh axis size.  Returns
    (B, N, H, D) with the same token sharding as the inputs.  Use under
    `jax.jit` inside a `with mesh:` scope (or pass pre-sharded arrays).
    """
    if schedule not in ("ring", "all_gather_kv"):
        raise ValueError(f"unknown schedule {schedule!r}")
    n_shards = mesh.shape[axis]
    if q.shape[1] % n_shards:
        raise ValueError(
            f"token count {q.shape[1]} must divide over {n_shards} "
            f"devices on mesh axis {axis!r}")
    body = _ring_shard if schedule == "ring" else _all_gather_kv_shard
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(body, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def token_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NamedSharding placing the token axis of (B,N,H,D) on mesh[axis]."""
    return NamedSharding(mesh, P(None, axis, None, None))


# public name for the per-shard ring body: models call it directly when
# their forward already runs inside a shard_map with the token axis
# sharded (e.g. models/flux.py _attention_with_rope under cfg.sp_axis).
ring_attention_body = _ring_shard


def flux_sp_apply(
    model,
    params,
    mesh: Mesh,
    img_tokens: jnp.ndarray,
    txt_tokens: jnp.ndarray,
    t: jnp.ndarray,
    y_vec: jnp.ndarray,
    img_ids,
    txt_ids,
    guidance: Optional[jnp.ndarray] = None,
    axis: str = "data",
    mode: str = "full",
    deep: Optional[jnp.ndarray] = None,
    cache_depth: int = 1,
) -> jnp.ndarray:
    """FLUX forward with the token axis sharded over `mesh[axis]`.

    The batch=1 latency axis for the 12B DiT: every per-token op
    (Dense with replicated weights, LayerNorm, modulation) runs on each
    device's token slice with zero collectives; only attention
    communicates — the ring schedule (`_ring_shard`) circulates k/v
    slices over ICI.  txt and img tokens shard independently (both
    counts must divide the axis size); per-shard local order is
    [txt_loc; img_loc], exact because full attention is permutation-
    invariant in the kv set and q rows keep their own RoPE freqs (see
    FluxModel.__call__ docstring).

    img_tokens: (B, Ni, 64); txt_tokens: (B, Nt, ctx_dim); returns
    (B, Ni, 64) velocity, token-sharded like the input.

    DeepCache composes (samplers/deepcache.py Δ-cache, the models/flux.py
    capture/shallow contract): the cached delta is the per-img-token
    fp32 residual the back blocks add — token-local by construction —
    so it simply rides the scan carry TOKEN-SHARDED.  mode="capture"
    returns (out, delta) both sharded P(None, axis, None); "shallow"
    takes the sharded delta back in and reruns only the front
    `cache_depth` double blocks (ring attention included).
    """
    import dataclasses as _dc

    from cremage_tpu.models.flux import rope_freqs

    n_shards = mesh.shape[axis]
    nt, ni = txt_tokens.shape[1], img_tokens.shape[1]
    for name, n in (("txt", nt), ("img", ni)):
        if n % n_shards:
            raise ValueError(
                f"{name} token count {n} must divide over {n_shards} "
                f"devices on mesh axis {axis!r}")

    cfg = model.cfg
    sp_model = type(model)(_dc.replace(cfg, sp_axis=axis))
    freqs_txt = jnp.asarray(rope_freqs(np.asarray(txt_ids), cfg.axes_dim,
                                       cfg.theta))
    freqs_img = jnp.asarray(rope_freqs(np.asarray(img_ids), cfg.axes_dim,
                                       cfg.theta))

    tok = P(None, axis, None)
    frq = P(axis, None, None)
    rep_params = jax.tree.map(lambda _: P(), params)

    assert mode in ("full", "capture", "shallow"), mode
    mk = {} if mode == "full" else dict(mode=mode, cache_depth=cache_depth)
    if mode == "shallow":
        assert deep is not None, "shallow mode needs the cached delta"

    def body(p, it, tt, ft, fi, t_, y_, *rest):
        kw = dict(mk)
        rest = list(rest)
        if mode == "shallow":
            kw["deep"] = rest.pop(0)
        if guidance is not None:
            kw["guidance"] = rest.pop(0)
        return sp_model.apply(p, it, tt, t_, y_, None, None,
                              freqs=jnp.concatenate([ft, fi], axis=0), **kw)

    in_specs = [rep_params, tok, tok, frq, frq, P(None), P(None, None)]
    args = [params, img_tokens, txt_tokens, freqs_txt, freqs_img, t, y_vec]
    if mode == "shallow":
        in_specs.append(tok)
        args.append(deep)
    if guidance is not None:
        in_specs.append(P(None))
        args.append(guidance)
    out_specs = (tok, tok) if mode == "capture" else tok

    fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=out_specs, check_vma=False)
    return fn(*args)


def mmdit_sp_apply(
    model,
    params,
    mesh: Mesh,
    x: jnp.ndarray,
    t: jnp.ndarray,
    context: jnp.ndarray,
    pooled: jnp.ndarray,
    axis: str = "data",
    mode: str = "full",
    deep: Optional[jnp.ndarray] = None,
    cache_depth: int = 1,
) -> jnp.ndarray:
    """MMDiT (SD3) forward with latent patch rows sharded over
    `mesh[axis]`.  DeepCache capture/shallow compose: the Δ-cache is
    the per-token residual of the latent stream (models/mmdit.py), so
    it rides token-sharded P(None, axis, None).

    Each shard patchifies its own row band (the stride-p patch conv is
    band-local when the band height divides by the patch size), adds
    its slice of the centered pos-embed crop, and runs every per-token
    op locally; joint attention rings the latent kv while the short
    context stream — not generally divisible by the mesh, and cheap —
    stays replicated and is folded as a prefix block (context q rows
    ride the ring identically on every shard, so the context stream's
    residual state stays replicated across blocks).

    x: (B, H, W, C) latents NHWC; returns (B, H, W, C) velocity with
    the H axis sharded like the input.
    """
    import dataclasses as _dc

    cfg = model.cfg
    n_shards = mesh.shape[axis]
    _validate_bands(x.shape[1], cfg.patch_size, n_shards)

    sp_model = type(model)(_dc.replace(cfg, sp_axis=axis))
    row = P(None, axis, None, None)
    tokd = P(None, axis, None)
    rep_params = jax.tree.map(lambda _: P(), params)

    assert mode in ("full", "capture", "shallow"), mode
    mk = {} if mode == "full" else dict(mode=mode, cache_depth=cache_depth)

    def body(p, x_, t_, c_, y_, *rest):
        kw = dict(mk)
        if mode == "shallow":
            kw["deep"] = rest[0]
        return sp_model.apply(p, x_, t_, c_, y_, **kw)

    in_specs = [rep_params, row, P(None), P(None, None, None),
                P(None, None)]
    args = [params, x, t, context, pooled]
    if mode == "shallow":
        assert deep is not None, "shallow mode needs the cached delta"
        in_specs.append(tokd)
        args.append(deep)
    out_specs = (row, tokd) if mode == "capture" else row

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=out_specs, check_vma=False)
    return fn(*args)


def _validate_bands(hh: int, patch: int, n_shards: int):
    band = hh // n_shards
    if hh % n_shards or band % patch:
        raise ValueError(
            f"latent height {hh} must divide over {n_shards} devices "
            f"into patch-aligned bands (patch_size {patch})")


def pixart_sp_apply(
    model,
    params,
    mesh: Mesh,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    axis: str = "data",
    mode: str = "full",
    deep: Optional[jnp.ndarray] = None,
    cache_depth: int = 1,
) -> jnp.ndarray:
    """PixArt-Σ forward with latent patch rows sharded over `mesh[axis]`.
    DeepCache capture/shallow compose token-sharded (see mmdit_sp_apply).

    Self-attention rings the latent kv; cross-attention is local (its
    kv is the replicated text stream y) — zero collectives outside the
    self-attention ring.  The GLOBAL sincos position table is computed
    on the host and handed to each shard as a token-sharded operand
    (row-major token order makes a row band a contiguous token slice).
    """
    import dataclasses as _dc

    from cremage_tpu.models.pixart import sincos_2d

    cfg = model.cfg
    n_shards = mesh.shape[axis]
    hh, ww = x.shape[1], x.shape[2]
    _validate_bands(hh, cfg.patch_size, n_shards)
    hp, wp = hh // cfg.patch_size, ww // cfg.patch_size

    sp_model = type(model)(_dc.replace(cfg, sp_axis=axis))
    pos = jnp.asarray(sincos_2d(cfg.hidden_size, hp, wp))   # (N, hidden)

    row = P(None, axis, None, None)
    tokd = P(None, axis, None)
    rep_params = jax.tree.map(lambda _: P(), params)

    assert mode in ("full", "capture", "shallow"), mode
    mk = {} if mode == "full" else dict(mode=mode, cache_depth=cache_depth)

    def body(p, x_, t_, y_, pos_, *rest):
        kw = dict(mk)
        if mode == "shallow":
            kw["deep"] = rest[0]
        return sp_model.apply(p, x_, t_, y_, pos=pos_, **kw)

    in_specs = [rep_params, row, P(None), P(None, None, None),
                P(axis, None)]
    args = [params, x, t, y, pos]
    if mode == "shallow":
        assert deep is not None, "shallow mode needs the cached delta"
        in_specs.append(tokd)
        args.append(deep)
    out_specs = (row, tokd) if mode == "capture" else row

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=out_specs, check_vma=False)
    return fn(*args)


def hunyuan_sp_apply(
    model,
    params,
    mesh: Mesh,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_text: jnp.ndarray,
    mt5_text: jnp.ndarray,
    axis: str = "data",
    mode: str = "full",
    deep: Optional[jnp.ndarray] = None,
    cache_depth: int = 1,
) -> jnp.ndarray:
    """Hunyuan-DiT forward with latent patch rows sharded over
    `mesh[axis]`.  DeepCache capture/shallow compose token-sharded
    (see mmdit_sp_apply; the cache boundary stays in the encoder half,
    so the U-ViT skips never cross it).

    Self-attention rings the latent kv (RoPE tables ride in as a
    token-sharded operand built from the GLOBAL grid); cross-attention
    is local over the replicated joint [CLIP; mT5] text stream; the
    U-ViT long skips concatenate per-token residuals, so they stay
    band-local.
    """
    import dataclasses as _dc

    from cremage_tpu.models.flux import rope_freqs

    cfg = model.cfg
    n_shards = mesh.shape[axis]
    hh, ww = x.shape[1], x.shape[2]
    _validate_bands(hh, cfg.patch_size, n_shards)
    hp, wp = hh // cfg.patch_size, ww // cfg.patch_size

    sp_model = type(model)(_dc.replace(cfg, sp_axis=axis))
    ys, xs = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids = np.stack([ys, xs], -1).reshape(-1, 2)
    d_head = cfg.hidden_size // cfg.num_heads
    freqs = jnp.asarray(rope_freqs(
        ids, (d_head - d_head // 2, d_head // 2), 10000.0))

    row = P(None, axis, None, None)
    txt = P(None, None, None)
    tokd = P(None, axis, None)
    rep_params = jax.tree.map(lambda _: P(), params)

    assert mode in ("full", "capture", "shallow"), mode
    mk = {} if mode == "full" else dict(mode=mode, cache_depth=cache_depth)

    def body(p, x_, t_, ct_, mt_, fr_, *rest):
        kw = dict(mk)
        if mode == "shallow":
            kw["deep"] = rest[0]
        return sp_model.apply(p, x_, t_, ct_, mt_, freqs=fr_, **kw)

    in_specs = [rep_params, row, P(None), txt, txt, P(axis, None, None)]
    args = [params, x, t, clip_text, mt5_text, freqs]
    if mode == "shallow":
        assert deep is not None, "shallow mode needs the cached delta"
        in_specs.append(tokd)
        args.append(deep)
    out_specs = (row, tokd) if mode == "capture" else row

    fn = jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=out_specs, check_vma=False)
    return fn(*args)
