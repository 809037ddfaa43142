"""FLUX.1 transformer (double-stream + single-stream DiT) in Flax.

Architecture contract: black-forest-labs FLUX.1 as consumed by the
reference (`modules/flux/txt2img.py:85-120` hand-assembles CLIP + T5 +
FluxTransformer2D + VAE): packed 2x2x16=64-ch latent tokens, T5 context
tokens, CLIP pooled vector + timestep (+ guidance for -dev) modulation,
3-axis RoPE (axes_dim 16/56/56 over head_dim 128), RMS qk-norm,
19 double blocks (separate img/txt streams, joint attention) and 38
single blocks (fused stream, parallel attn+MLP), velocity prediction
under rectified flow.

Checkpoint keys (BFL layout): img_in, txt_in, time_in.{in_layer,
out_layer}, vector_in.{...}, guidance_in.{...} (dev),
double_blocks.{i}.{img_mod.lin, img_attn.{qkv,proj,norm.query_norm.scale,
norm.key_norm.scale}, img_mlp.{0,2}, txt_*}, single_blocks.{i}.{linear1,
linear2, modulation.lin, norm.{query,key}_norm.scale},
final_layer.{adaLN_modulation.1, linear}.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.layers import Dense, silu, timestep_embedding
from cremage_tpu.ops import tome


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64
    hidden_size: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    depth_double: int = 19
    depth_single: int = 38
    mlp_ratio: int = 4
    context_dim: int = 4096
    vec_dim: int = 768
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: float = 10000.0
    guidance_embed: bool = False     # schnell: False, dev: True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # Token merging (ToMe, ops/tome.py — opt-in speed feature beyond
    # reference parity).  tome_ratio r>0 merges int(Ni*r) img tokens
    # once after img_in; the WHOLE block stack (joint attention + MLPs)
    # runs on the reduced stream and the final projection output is
    # unmerged.  Kept tokens keep their RoPE rows (merged tokens adopt
    # the dst position).  Composes with deep_cache (the Δ-cache is
    # stored in full-token space); not with sp_axis.
    tome_ratio: float = 0.0
    # Set (to a mesh axis name) ONLY when the forward runs inside a
    # shard_map body with the token axis sharded over that axis: every
    # per-token op (Dense/LN/modulation) then works on the local token
    # slice and attention runs the ring schedule over the axis
    # (parallel/sequence.py flux_sp_apply is the entry point).
    sp_axis: Optional[str] = None


def flux_schnell_config(**kw) -> FluxConfig:
    return FluxConfig(guidance_embed=False, **kw)


def flux_dev_config(**kw) -> FluxConfig:
    return FluxConfig(guidance_embed=True, **kw)


# ---------------------------------------------------------------------------
# RoPE over (id0, id1, id2) position ids
# ---------------------------------------------------------------------------

def rope_freqs(ids: np.ndarray, axes_dim, theta: float) -> np.ndarray:
    """ids: (N, n_axes) int -> (N, head_dim/2, 2) [cos, sin] table."""
    outs = []
    for a, dim in enumerate(axes_dim):
        half = dim // 2
        freqs = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / dim))
        ang = np.asarray(ids[:, a], np.float64)[:, None] * freqs[None, :]
        outs.append(np.stack([np.cos(ang), np.sin(ang)], axis=-1))
    return np.concatenate(outs, axis=1).astype(np.float32)  # (N, D/2, 2)


def apply_rope(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, H, D); freqs: (N, D/2, 2), or (B, N, D/2, 2) when the
    table is per-batch-row (the ToMe path gathers each row's kept
    tokens' freqs — plans differ across the batch)."""
    b, n, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, n, h, d // 2, 2)
    f = freqs if freqs.ndim == 4 else freqs[None]
    cos = f[:, :, None, :, 0]
    sin = f[:, :, None, :, 1]
    xr = xf[..., 0]
    xi = xf[..., 1]
    out = jnp.stack([xr * cos - xi * sin, xr * sin + xi * cos], axis=-1)
    return out.reshape(b, n, h, d).astype(x.dtype)


def make_position_ids(h_patches: int, w_patches: int, txt_len: int):
    txt_ids = np.zeros((txt_len, 3), np.int64)
    ys, xs = np.meshgrid(np.arange(h_patches), np.arange(w_patches),
                         indexing="ij")
    img_ids = np.stack(
        [np.zeros_like(ys), ys, xs], axis=-1
    ).reshape(-1, 3)
    return txt_ids, img_ids


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

class _RMSScale(nn.Module):
    """FLUX qk-norm: RMS norm with a learned scale named 'scale'."""

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax_rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6)
        return (x32 * scale).astype(x.dtype)


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)


class MLPEmbedder(nn.Module):
    hidden: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        dd = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = Dense(self.hidden, name="in_layer", **dd)(x)
        return Dense(self.hidden, name="out_layer", **dd)(silu(x))


def _attention_with_rope(q, k, v, freqs, sp_axis=None):
    q = apply_rope(q, freqs)
    k = apply_rope(k, freqs)
    if sp_axis is not None:
        # token axis sharded over `sp_axis` (inside shard_map): ring
        # attention — k/v chunks circulate via ppermute while an
        # online-softmax accumulator folds them in.
        from cremage_tpu.parallel.sequence import ring_attention_body

        return ring_attention_body(q, k, v, axis_name=sp_axis)
    from cremage_tpu.ops.attention import attention

    return attention(q, k, v)


class DoubleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img, txt, vec, freqs):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h, d = cfg.num_heads, cfg.head_dim
        nt = txt.shape[1]

        img_mod = Dense(6 * cfg.hidden_size, name="img_mod_lin", **dd)(silu(vec))
        txt_mod = Dense(6 * cfg.hidden_size, name="txt_mod_lin", **dd)(silu(vec))
        (i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2) = jnp.split(img_mod, 6, -1)
        (t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2) = jnp.split(txt_mod, 6, -1)

        def qkv_of(prefix, inp, sh, sc):
            normed = _no_affine_ln(inp) * (1 + sc[:, None]) + sh[:, None]
            qkv = Dense(3 * cfg.hidden_size, name=f"{prefix}_attn_qkv", **dd)(normed)
            b, n, _ = qkv.shape
            qkv = qkv.reshape(b, n, 3, h, d)
            q = _RMSScale(name=f"{prefix}_attn_norm_query_norm")(qkv[:, :, 0])
            k = _RMSScale(name=f"{prefix}_attn_norm_key_norm")(qkv[:, :, 1])
            return q, k, qkv[:, :, 2]

        iq, ik, iv = qkv_of("img", img, i_sh1, i_sc1)
        tq, tk, tv = qkv_of("txt", txt, t_sh1, t_sc1)
        q = jnp.concatenate([tq, iq], axis=1)
        k = jnp.concatenate([tk, ik], axis=1)
        v = jnp.concatenate([tv, iv], axis=1)
        att = _attention_with_rope(q, k, v, freqs, sp_axis=cfg.sp_axis)
        att = att.reshape(att.shape[0], att.shape[1], cfg.hidden_size)
        t_att, i_att = att[:, :nt], att[:, nt:]

        img = img + i_g1[:, None] * Dense(
            cfg.hidden_size, name="img_attn_proj", **dd)(i_att)
        m = _no_affine_ln(img) * (1 + i_sc2[:, None]) + i_sh2[:, None]
        m = Dense(cfg.hidden_size * cfg.mlp_ratio, name="img_mlp_0", **dd)(m)
        m = nn.gelu(m, approximate=True)
        img = img + i_g2[:, None] * Dense(cfg.hidden_size, name="img_mlp_2",
                                          **dd)(m)

        txt = txt + t_g1[:, None] * Dense(
            cfg.hidden_size, name="txt_attn_proj", **dd)(t_att)
        m = _no_affine_ln(txt) * (1 + t_sc2[:, None]) + t_sh2[:, None]
        m = Dense(cfg.hidden_size * cfg.mlp_ratio, name="txt_mlp_0", **dd)(m)
        m = nn.gelu(m, approximate=True)
        txt = txt + t_g2[:, None] * Dense(cfg.hidden_size, name="txt_mlp_2",
                                          **dd)(m)
        return img, txt


class SingleBlock(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, x, vec, freqs):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h, d = cfg.num_heads, cfg.head_dim
        mlp_dim = cfg.hidden_size * cfg.mlp_ratio

        mod = Dense(3 * cfg.hidden_size, name="modulation_lin", **dd)(silu(vec))
        sh, sc, gate = jnp.split(mod, 3, -1)
        normed = _no_affine_ln(x) * (1 + sc[:, None]) + sh[:, None]
        lin1 = Dense(3 * cfg.hidden_size + mlp_dim, name="linear1", **dd)(normed)
        qkv, mlp = lin1[..., : 3 * cfg.hidden_size], lin1[..., 3 * cfg.hidden_size:]
        b, n, _ = qkv.shape
        qkv = qkv.reshape(b, n, 3, h, d)
        q = _RMSScale(name="norm_query_norm")(qkv[:, :, 0])
        k = _RMSScale(name="norm_key_norm")(qkv[:, :, 1])
        att = _attention_with_rope(q, k, qkv[:, :, 2], freqs,
                                   sp_axis=cfg.sp_axis)
        att = att.reshape(b, n, cfg.hidden_size)
        out = Dense(cfg.hidden_size, name="linear2", **dd)(
            jnp.concatenate([att, nn.gelu(mlp, approximate=True)], axis=-1)
        )
        return x + gate[:, None] * out


def _no_affine_ln(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class FluxModel(nn.Module):
    cfg: FluxConfig

    @nn.compact
    def __call__(self, img_tokens, txt_tokens, t, y_vec, img_ids, txt_ids,
                 guidance: Optional[jnp.ndarray] = None,
                 freqs: Optional[jnp.ndarray] = None,
                 mode: str = "full", deep=None, cache_depth: int = 1):
        """img_tokens: (B, Ni, 64) packed latents; txt_tokens: (B, Nt, 4096);
        t: (B,) in [0,1]; y_vec: (B, 768) CLIP pooled; ids: host numpy.

        `freqs` (Nt+Ni, head_dim/2, 2) overrides the ids-derived RoPE
        table — the sequence-parallel path passes each shard its local
        slice as a traced operand (ids stay None).  Full attention is
        permutation-invariant in the kv set, so per-shard
        [txt_loc; img_loc] ordering is exact as long as q/k/v/freqs
        share it (they do: all derive from the same local tokens).

        Deep-cache modes (samplers/deepcache.py, Δ-cache over the back
        blocks — see models/mmdit.py for the full contract): the
        boundary sits inside the double blocks (1 <= cache_depth <=
        depth_double); "capture" returns (out, delta) with delta (fp32)
        = the residual the remaining double blocks plus ALL single
        blocks added to the img stream; "shallow" runs only the front
        `cache_depth` double blocks and splices the cached delta back
        in before the final layer."""
        cfg = self.cfg
        assert mode in ("full", "capture", "shallow"), mode
        if mode != "full":
            assert 1 <= cache_depth <= cfg.depth_double, (
                f"cache_depth must be in [1, {cfg.depth_double}]")
        if mode == "shallow":
            assert deep is not None, "shallow mode needs the cached delta"
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)

        img = Dense(cfg.hidden_size, name="img_in", **dd)(
            img_tokens.astype(cfg.dtype))
        txt = Dense(cfg.hidden_size, name="txt_in", **dd)(
            txt_tokens.astype(cfg.dtype))

        vec = MLPEmbedder(cfg.hidden_size, cfg.dtype, cfg.param_dtype,
                          name="time_in")(
            timestep_embedding(t * 1000.0, 256).astype(cfg.dtype))
        if cfg.guidance_embed:
            assert guidance is not None
            vec = vec + MLPEmbedder(cfg.hidden_size, cfg.dtype, cfg.param_dtype,
                                    name="guidance_in")(
                timestep_embedding(guidance * 1000.0, 256).astype(cfg.dtype))
        vec = vec + MLPEmbedder(cfg.hidden_size, cfg.dtype, cfg.param_dtype,
                                name="vector_in")(y_vec.astype(cfg.dtype))

        if freqs is None:
            ids = np.concatenate([np.asarray(txt_ids), np.asarray(img_ids)],
                                 axis=0)
            freqs = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))

        plan = None
        if cfg.tome_ratio > 0:
            assert cfg.sp_axis is None, (
                "tome_ratio does not compose with sequence parallelism "
                "(the bipartite match needs the global token set)")
            ids_np = np.asarray(img_ids)
            hp = int(ids_np[:, 1].max()) + 1
            wp = int(ids_np[:, 2].max()) + 1
            assert hp * wp == img.shape[1], (hp, wp, img.shape)
            plan = tome.plan_for_grid(img, hp, wp, cfg.tome_ratio, t)
            if plan is not None:
                img = tome.merge(plan, img)
                b, nt = txt.shape[0], txt.shape[1]
                f_txt = jnp.broadcast_to(freqs[None, :nt],
                                         (b, nt) + freqs.shape[1:])
                f_img = tome.select(plan, jnp.broadcast_to(
                    freqs[None, nt:], (b, hp * wp) + freqs.shape[1:]))
                freqs = jnp.concatenate([f_txt, f_img], axis=1)

        n_double = cache_depth if mode == "shallow" else cfg.depth_double
        front = None
        for i in range(n_double):
            img, txt = DoubleBlock(cfg, name=f"double_blocks_{i}")(
                img, txt, vec, freqs)
            if mode == "capture" and i == cache_depth - 1:
                front = img

        # The Δ-cache lives in FULL-token space so ToMe composes: capture
        # unmerges the reduced delta, shallow re-merges it under the
        # current step's plan (group-averaging constituent deltas).
        if mode == "shallow":
            deep_r = tome.merge(plan, deep) if plan is not None else deep
            img = (img.astype(jnp.float32) + deep_r).astype(cfg.dtype)
        else:
            x = jnp.concatenate([txt, img], axis=1)
            for i in range(cfg.depth_single):
                x = SingleBlock(cfg, name=f"single_blocks_{i}")(x, vec, freqs)
            img = x[:, txt.shape[1]:]
        delta = None
        if mode == "capture":
            delta = img.astype(jnp.float32) - front.astype(jnp.float32)
            if plan is not None:
                delta = tome.unmerge(plan, delta)

        sh_sc = Dense(2 * cfg.hidden_size, name="final_layer_adaLN_modulation_1",
                      **dd)(silu(vec))
        sh, sc = jnp.split(sh_sc, 2, -1)
        out = _no_affine_ln(img) * (1 + sc[:, None]) + sh[:, None]
        out = Dense(cfg.in_channels, name="final_layer_linear", **dd)(out)
        if plan is not None:
            # unmerge AFTER the per-token final projection: 64-channel
            # traffic instead of hidden_size, identical result
            out = tome.unmerge(plan, out)
        return (out, delta) if mode == "capture" else out


def pack_latents(lat: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 16) -> (B, H/2*W/2, 64) 2x2 packing."""
    b, h, w, c = lat.shape
    lat = lat.reshape(b, h // 2, 2, w // 2, 2, c)
    lat = lat.transpose(0, 1, 3, 2, 4, 5)
    return lat.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(tokens: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """(B, H/2*W/2, 64) -> (B, H, W, 16)."""
    b = tokens.shape[0]
    c = tokens.shape[-1] // 4
    lat = tokens.reshape(b, h // 2, w // 2, 2, 2, c)
    lat = lat.transpose(0, 1, 3, 2, 4, 5)
    return lat.reshape(b, h, w, c)
