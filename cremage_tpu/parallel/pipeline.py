"""Pipeline parallelism (PP) for the FLUX transformer.

The reference has no distributed runtime at all (SURVEY §2.2); this is
TPU-native scaling design, completing the parallel/ family: DP
(core/mesh.py batch axis), TP (parallel/sharding.py), SP
(parallel/sequence.py), and now PP.

What PP buys over the others:
- vs TP: ONE activation transfer per stage boundary per microbatch
  instead of collectives inside every layer — the right trade when ICI
  bandwidth is the constraint, and the only way past TP's head-count
  sharding cap.
- vs SP: no token-axis resharding; weights are PARTITIONED, not
  replicated — bf16 FLUX.1 (≈24 GB transformer) does not fit one 16 GB
  v5e chip but spans 2+ chips under PP without quantization.

Design (idiomatic JAX, no explicit schedule program):
- the 19 double + 38 single blocks are split into contiguous stages,
  weighted 2:1 (a DoubleBlock runs two streams' worth of matmuls);
  stage s's params are committed to device s with `jax.device_put`.
- each stage is its own jitted function reusing the exact DoubleBlock /
  SingleBlock modules under their FluxModel names, so a stage's param
  tree is literally a top-level slice of the full tree (quantized
  trees slice the same way — `weight_scale` siblings ride along).
- the host streams microbatches through the stage jits; JAX async
  dispatch overlaps stage s on microbatch m with stage s-1 on
  microbatch m+1, so the GPipe schedule emerges from data dependencies
  alone.  With one microbatch PP is a memory-spanning feature (bubbles
  fill the pipe); throughput needs microbatches >= stages.

Behavior contract: output equals the single-device FluxModel forward
(tests/test_pipeline_parallel.py proves parity on the CPU mesh).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.flux import (
    DoubleBlock, FluxConfig, MLPEmbedder, SingleBlock, _no_affine_ln,
    make_position_ids, rope_freqs,
)
from cremage_tpu.models.layers import Dense, silu, timestep_embedding


@dataclasses.dataclass(frozen=True)
class StageSpec:
    """Contiguous slice of the FLUX block sequence."""
    d_lo: int
    d_hi: int
    s_lo: int
    s_hi: int

    @property
    def units(self) -> int:
        return 2 * (self.d_hi - self.d_lo) + (self.s_hi - self.s_lo)


def flux_pp_plan(cfg: FluxConfig, n_stages: int) -> List[StageSpec]:
    """Split the (doubles then singles) chain into n_stages contiguous
    chunks balanced by compute weight (double=2, single=1)."""
    nd, ns = cfg.depth_double, cfg.depth_single
    if not 1 <= n_stages <= nd + ns:
        raise ValueError(
            f"n_stages must be in [1, {nd + ns}] for depth_double={nd}, "
            f"depth_single={ns}; got {n_stages}")
    weights = [2] * nd + [1] * ns
    total = sum(weights)
    specs: List[StageSpec] = []
    pos = 0
    acc = 0.0
    for s in range(n_stages):
        # ideal cumulative weight after this stage; leave at least one
        # block per remaining stage
        target = total * (s + 1) / n_stages
        hi = pos
        while hi < len(weights) and (
                acc + weights[hi] <= target + 1e-9
                or hi - pos == 0) and len(weights) - (hi + 1) >= (
                    n_stages - s - 1):
            acc += weights[hi]
            hi += 1
        if s == n_stages - 1:
            while hi < len(weights):
                acc += weights[hi]
                hi += 1
        d_lo, d_hi = min(pos, nd), min(hi, nd)
        s_lo, s_hi = max(pos - nd, 0), max(hi - nd, 0)
        specs.append(StageSpec(d_lo, d_hi, s_lo, s_hi))
        pos = hi
    assert pos == len(weights), specs
    return specs


class FluxStage(nn.Module):
    """One PP stage: optional embedders (first), a contiguous run of
    double then single blocks, optional final layer (last).  Module
    names match FluxModel exactly, so `params` is a top-level slice of
    the full FluxModel tree."""
    cfg: FluxConfig
    spec: StageSpec
    txt_len: int
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, jnp.ndarray], freqs: jnp.ndarray):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        if self.first:
            img = Dense(cfg.hidden_size, name="img_in", **dd)(
                carry["img_tokens"].astype(cfg.dtype))
            txt = Dense(cfg.hidden_size, name="txt_in", **dd)(
                carry["txt_tokens"].astype(cfg.dtype))
            vec = MLPEmbedder(cfg.hidden_size, cfg.dtype, cfg.param_dtype,
                              name="time_in")(
                timestep_embedding(carry["t"] * 1000.0, 256).astype(cfg.dtype))
            if cfg.guidance_embed:
                vec = vec + MLPEmbedder(
                    cfg.hidden_size, cfg.dtype, cfg.param_dtype,
                    name="guidance_in")(
                    timestep_embedding(carry["guidance"] * 1000.0,
                                       256).astype(cfg.dtype))
            vec = vec + MLPEmbedder(cfg.hidden_size, cfg.dtype,
                                    cfg.param_dtype, name="vector_in")(
                carry["y_vec"].astype(cfg.dtype))
            img_s, txt_s, x = img, txt, None
        else:
            img_s, txt_s = carry.get("img"), carry.get("txt")
            x = carry.get("x")
            vec = carry["vec"]

        for i in range(self.spec.d_lo, self.spec.d_hi):
            img_s, txt_s = DoubleBlock(cfg, name=f"double_blocks_{i}")(
                img_s, txt_s, vec, freqs)
        if x is None and (self.spec.s_hi > self.spec.s_lo or self.last):
            x = jnp.concatenate([txt_s, img_s], axis=1)
        for i in range(self.spec.s_lo, self.spec.s_hi):
            x = SingleBlock(cfg, name=f"single_blocks_{i}")(x, vec, freqs)

        if self.last:
            img_out = x[:, self.txt_len:]
            sh_sc = Dense(2 * cfg.hidden_size,
                          name="final_layer_adaLN_modulation_1", **dd)(
                silu(vec))
            sh, sc = jnp.split(sh_sc, 2, -1)
            out = _no_affine_ln(img_out) * (1 + sc[:, None]) + sh[:, None]
            return Dense(cfg.in_channels, name="final_layer_linear",
                         **dd)(out)
        nxt = {"vec": vec}
        if x is not None:
            nxt["x"] = x
        else:
            nxt["img"], nxt["txt"] = img_s, txt_s
        return nxt


def _stage_param_names(cfg: FluxConfig, spec: StageSpec, first: bool,
                       last: bool) -> List[str]:
    names = [f"double_blocks_{i}" for i in range(spec.d_lo, spec.d_hi)]
    names += [f"single_blocks_{i}" for i in range(spec.s_lo, spec.s_hi)]
    if first:
        names += ["img_in", "txt_in", "time_in", "vector_in"]
        if cfg.guidance_embed:
            names.append("guidance_in")
    if last:
        names += ["final_layer_adaLN_modulation_1", "final_layer_linear"]
    return names


def _slice_params(params: Any, names: Sequence[str]) -> Any:
    """Top-level slice across every variable collection."""
    out = {}
    for col, tree in params.items():
        sub = {k: tree[k] for k in names if k in tree}
        out[col] = sub
    return out


@dataclasses.dataclass
class _BoundStage:
    fn: Callable
    params: Any
    freqs: jnp.ndarray
    device: Any


class FluxPP:
    """Pipeline-parallel FLUX forward over explicit devices.

    One instance is bound to a (hp, wp, txt_len) geometry (the RoPE
    table is precomputed per stage device).  Call with full-batch
    operands; `microbatch` splits the batch and streams the chunks so
    stages overlap via async dispatch.
    """

    def __init__(self, model, params, devices: Sequence[Any],
                 hp: int, wp: int, txt_len: int,
                 n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan and its freq gather are stage-0-local; "
                "use tome without pp, or pp without tome)")
        if cfg.sp_axis is not None:
            raise ValueError("choose one of sequence parallelism "
                             "(use_mesh_sp) or pipeline parallelism")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        specs = flux_pp_plan(cfg, n_stages)
        txt_ids, img_ids = make_position_ids(hp, wp, txt_len)
        freqs_np = np.asarray(rope_freqs(
            np.concatenate([txt_ids, img_ids], axis=0), cfg.axes_dim,
            cfg.theta))
        self.stages: List[_BoundStage] = []
        for si, spec in enumerate(specs):
            first, last = si == 0, si == n_stages - 1
            mod = FluxStage(cfg, spec, txt_len, first=first, last=last)
            sub = _slice_params(params, _stage_param_names(
                cfg, spec, first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply),
                params=jax.device_put(sub, dev),
                freqs=jax.device_put(jnp.asarray(freqs_np), dev),
                device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, img_tokens, txt_tokens, t, y_vec, guidance=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = img_tokens.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        if self.cfg.guidance_embed:
            if guidance is None:
                raise ValueError("guidance_embed model needs guidance")
            guidance = jnp.broadcast_to(
                jnp.asarray(guidance, jnp.float32), (b,))
        mb = int(microbatch or b)
        if b % mb != 0:
            # a ragged tail microbatch would compile a second program per
            # stage; keep the contract strict instead
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"img_tokens": img_tokens[sl],
                          "txt_tokens": txt_tokens[sl],
                          "t": t[sl], "y_vec": y_vec[sl]}
            if self.cfg.guidance_embed:
                carry["guidance"] = guidance[sl]
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry, st.freqs)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.stages[-1].device) for o in outs], axis=0)


# ---------------- MMDiT (SD3) pipeline parallelism ----------------
#
# The joint-block chain is homogeneous (every block costs the same), so
# the plan is a plain contiguous split; everything else mirrors FluxPP:
# stage modules reuse JointBlock under its MMDiT name so stage params
# are top-level slices of the full tree (quantize_dit's weight_scale
# siblings ride along), and microbatches stream through per-stage jits.


def uniform_pp_plan(depth: int, n_stages: int) -> List[tuple]:
    """Contiguous (lo, hi) chunks of a homogeneous depth-`depth` chain,
    sizes differing by at most one."""
    if not 1 <= n_stages <= depth:
        raise ValueError(
            f"n_stages must be in [1, {depth}] for depth={depth}; "
            f"got {n_stages}")
    base, extra = divmod(depth, n_stages)
    plan = []
    lo = 0
    for s in range(n_stages):
        hi = lo + base + (1 if s < extra else 0)
        plan.append((lo, hi))
        lo = hi
    assert lo == depth, plan
    return plan


class MMDiTStage(nn.Module):
    """One PP stage of the SD3 MMDiT: optional embedders (first), a
    contiguous run of joint blocks, optional final layer + unpatchify
    (last).  Module/param names match models/mmdit.py MMDiT exactly."""
    cfg: Any                     # MMDiTConfig
    lo: int
    hi: int
    hp: int                      # patch-grid geometry (static per bind)
    wp: int
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, jnp.ndarray]):
        from cremage_tpu.models.mmdit import (
            JointBlock, _modulate, _no_affine_ln,
        )
        from cremage_tpu.models.layers import Conv

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        if self.first:
            x = carry["x"]
            b = x.shape[0]
            xe = Conv(cfg.hidden_size, kernel_size=p, stride=p, padding=0,
                      name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
            tokens = xe.reshape(b, self.hp * self.wp, cfg.hidden_size)
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.01),
                (1, cfg.pos_embed_max_size * cfg.pos_embed_max_size,
                 cfg.hidden_size),
                cfg.param_dtype,
            )
            grid = pos.reshape(cfg.pos_embed_max_size,
                               cfg.pos_embed_max_size, cfg.hidden_size)
            top = (cfg.pos_embed_max_size - self.hp) // 2
            left = (cfg.pos_embed_max_size - self.wp) // 2
            cropped = grid[top:top + self.hp, left:left + self.wp]
            tokens = tokens + cropped.reshape(
                1, self.hp * self.wp, cfg.hidden_size).astype(cfg.dtype)
            t_emb = timestep_embedding(carry["t"], 256).astype(cfg.dtype)
            t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_0",
                          **dd)(t_emb)
            t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_2",
                          **dd)(silu(t_vec))
            y_vec = Dense(cfg.hidden_size, name="y_embedder_mlp_0", **dd)(
                carry["pooled"].astype(cfg.dtype))
            y_vec = Dense(cfg.hidden_size, name="y_embedder_mlp_2",
                          **dd)(silu(y_vec))
            vec = t_vec + y_vec
            ctx = Dense(cfg.hidden_size, name="context_embedder", **dd)(
                carry["context"].astype(cfg.dtype))
        else:
            ctx, tokens, vec = carry["ctx"], carry["tokens"], carry["vec"]

        for i in range(self.lo, self.hi):
            ctx, tokens = JointBlock(
                cfg, final=(i == cfg.depth - 1), name=f"joint_blocks_{i}"
            )(ctx, tokens, vec)

        if self.last:
            b = tokens.shape[0]
            shift, scale = jnp.split(
                Dense(2 * cfg.hidden_size,
                      name="final_layer_adaLN_modulation_1",
                      **dd)(silu(vec)), 2, axis=-1)
            out = _modulate(_no_affine_ln(tokens), shift, scale)
            out = Dense(p * p * cfg.in_channels, name="final_layer_linear",
                        **dd)(out)
            out = out.reshape(b, self.hp, self.wp, p, p, cfg.in_channels)
            return out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, self.hp * p, self.wp * p, cfg.in_channels)
        # the depth-1 block is always in the last stage, so ctx is a
        # tensor (never the final block's dropped context) here
        return {"ctx": ctx, "tokens": tokens, "vec": vec}


def _mmdit_stage_param_names(lo: int, hi: int, first: bool,
                             last: bool) -> List[str]:
    names = [f"joint_blocks_{i}" for i in range(lo, hi)]
    if first:
        names += ["x_embedder_proj", "pos_embed", "t_embedder_mlp_0",
                  "t_embedder_mlp_2", "y_embedder_mlp_0",
                  "y_embedder_mlp_2", "context_embedder"]
    if last:
        names += ["final_layer_adaLN_modulation_1", "final_layer_linear"]
    return names


class MMDiTPP:
    """Pipeline-parallel SD3 MMDiT forward over explicit devices.

    One instance is bound to an (hp, wp) patch-grid geometry.  Call
    with full-batch operands; `microbatch` splits the batch and streams
    the chunks so stages overlap via async dispatch (with CFG's doubled
    batch, microbatch=b gives two chunks for free)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 hp: int, wp: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-0-local); use tome without pp")
        if cfg.sp_axis is not None:
            raise ValueError("choose one of sequence parallelism "
                             "(use_mesh_sp) or pipeline parallelism")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(uniform_pp_plan(cfg.depth, n_stages)):
            first, last = si == 0, si == n_stages - 1
            mod = MMDiTStage(cfg, lo, hi, hp=hp, wp=wp,
                             first=first, last=last)
            sub = _slice_params(
                params, _mmdit_stage_param_names(lo, hi, first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply),
                params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, context, pooled,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl],
                          "context": context[sl], "pooled": pooled[sl]}
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


# ---------------- PixArt-Σ pipeline parallelism ----------------
#
# Another homogeneous chain (uniform_pp_plan); the carry between stages
# is (tokens, y, t6, t_vec) — cross-attention text y and the shared
# adaLN table t6 ride along because every block consumes them, t_vec
# because the final layer does.


class PixArtStage(nn.Module):
    """One PP stage of PixArt-Σ: optional embedders (first), a
    contiguous run of blocks, optional final layer + unpatchify (last).
    Module/param names match models/pixart.py PixArt exactly."""
    cfg: Any                     # PixArtConfig
    lo: int
    hi: int
    hp: int
    wp: int
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, jnp.ndarray]):
        from cremage_tpu.models.layers import Conv
        from cremage_tpu.models.pixart import PixArtBlock, _ln, sincos_2d

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        if self.first:
            x = carry["x"]
            b = x.shape[0]
            tokens = Conv(cfg.hidden_size, kernel_size=p, stride=p,
                          padding=0, name="x_embedder_proj",
                          **dd)(x.astype(cfg.dtype))
            tokens = tokens.reshape(b, self.hp * self.wp, cfg.hidden_size)
            pos = jnp.asarray(sincos_2d(cfg.hidden_size, self.hp, self.wp))
            tokens = tokens + pos[None].astype(cfg.dtype)
            t_emb = timestep_embedding(carry["t"], 256).astype(cfg.dtype)
            t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_0",
                          **dd)(t_emb)
            t_vec = Dense(cfg.hidden_size, name="t_embedder_mlp_2",
                          **dd)(silu(t_vec))
            t6 = Dense(6 * cfg.hidden_size, name="t_block_1",
                       **dd)(silu(t_vec))
            t6 = t6.reshape(b, 6, cfg.hidden_size).astype(jnp.float32)
            y = Dense(cfg.hidden_size, name="y_embedder_y_proj_fc1", **dd)(
                carry["y"].astype(cfg.dtype))
            y = nn.gelu(y, approximate=True)
            y = Dense(cfg.hidden_size, name="y_embedder_y_proj_fc2",
                      **dd)(y)
        else:
            tokens, y = carry["tokens"], carry["y"]
            t6, t_vec = carry["t6"], carry["t_vec"]

        for i in range(self.lo, self.hi):
            tokens = PixArtBlock(cfg, name=f"blocks_{i}")(tokens, y, t6)

        if self.last:
            b = tokens.shape[0]
            table = self.param("final_layer_scale_shift_table",
                               nn.initializers.normal(0.02),
                               (2, cfg.hidden_size), cfg.param_dtype)
            t2 = table[None].astype(jnp.float32) + jnp.stack(
                [t_vec.astype(jnp.float32)] * 2, axis=1)
            shift, scale = t2[:, 0][:, None], t2[:, 1][:, None]
            out = _ln(tokens) * (1 + scale.astype(tokens.dtype)) + \
                shift.astype(tokens.dtype)
            out = Dense(p * p * cfg.out_channels, name="final_layer_linear",
                        **dd)(out)
            out = out.reshape(b, self.hp, self.wp, p, p, cfg.out_channels)
            return out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, self.hp * p, self.wp * p, cfg.out_channels)
        return {"tokens": tokens, "y": y, "t6": t6, "t_vec": t_vec}


def _pixart_stage_param_names(lo: int, hi: int, first: bool,
                              last: bool) -> List[str]:
    names = [f"blocks_{i}" for i in range(lo, hi)]
    if first:
        names += ["x_embedder_proj", "t_embedder_mlp_0", "t_embedder_mlp_2",
                  "t_block_1", "y_embedder_y_proj_fc1",
                  "y_embedder_y_proj_fc2"]
    if last:
        names += ["final_layer_scale_shift_table", "final_layer_linear"]
    return names


class PixArtPP:
    """Pipeline-parallel PixArt-Σ forward over explicit devices (see
    MMDiTPP; same deployment, eps-model output with the learned-sigma
    half still attached — the caller slices like the monolithic path)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 hp: int, wp: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-0-local); use tome without pp")
        if cfg.sp_axis is not None:
            raise ValueError("choose one of sequence parallelism "
                             "(use_mesh_sp) or pipeline parallelism")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(uniform_pp_plan(cfg.depth, n_stages)):
            first, last = si == 0, si == n_stages - 1
            mod = PixArtStage(cfg, lo, hi, hp=hp, wp=wp,
                              first=first, last=last)
            sub = _slice_params(
                params, _pixart_stage_param_names(lo, hi, first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply),
                params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, y,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl], "y": y[sl]}
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


# ---------------- Hunyuan-DiT pipeline parallelism ----------------
#
# The U-ViT long skips are the twist: encoder block i's output is
# consumed by decoder block depth-1-i, so the not-yet-consumed skip
# stack rides the stage boundary (stacked along a leading axis; its
# depth is static per boundary, largest at the encoder/decoder midline
# — that is PP's activation-traffic cost on a U-ViT, and it is why TP/
# SP are the first choice for this family unless weights must span
# chips).  Each stage recomputes the 2D-RoPE table from its static
# (hp, wp) — host numpy, constant-folded, never shipped.


class HunyuanStage(nn.Module):
    """One PP stage of Hunyuan-DiT.  Module/param names match
    models/hunyuan.py HunyuanDiT exactly."""
    cfg: Any                     # HunyuanConfig
    lo: int
    hi: int
    hp: int
    wp: int
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, jnp.ndarray]):
        from cremage_tpu.models.flux import rope_freqs as _rope_freqs
        from cremage_tpu.models.hunyuan import HunyuanBlock, _silu_fp32
        from cremage_tpu.models.layers import Conv
        from cremage_tpu.ops.attention import attention

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        p = cfg.patch_size
        c = cfg.hidden_size
        d_head = c // cfg.num_heads
        ys, xs = np.meshgrid(np.arange(self.hp), np.arange(self.wp),
                             indexing="ij")
        ids = np.stack([ys, xs], -1).reshape(-1, 2)
        freqs = jnp.asarray(_rope_freqs(
            ids, (d_head - d_head // 2, d_head // 2), 10000.0))

        if self.first:
            x = carry["x"]
            b = x.shape[0]
            tokens = Conv(c, kernel_size=p, stride=p, padding=0,
                          name="x_embedder_proj", **dd)(x.astype(cfg.dtype))
            tokens = tokens.reshape(b, self.hp * self.wp, c)
            t_emb = timestep_embedding(carry["t"], 256).astype(cfg.dtype)
            t_vec = Dense(c, name="t_embedder_mlp_0", **dd)(t_emb)
            t_vec = Dense(c, name="t_embedder_mlp_2", **dd)(silu(t_vec))
            ph = cfg.pooler_heads
            pd = cfg.mt5_dim // ph
            mt5 = carry["mt5_text"].astype(cfg.dtype)
            lm = mt5.shape[1]
            pooled_in = jnp.concatenate(
                [mt5.mean(axis=1, keepdims=True), mt5], axis=1)
            pool_pos = self.param(
                "pooler_positional_embedding",
                nn.initializers.normal(cfg.mt5_dim ** -0.5),
                (cfg.text_len_t5 + 1, cfg.mt5_dim), cfg.param_dtype)
            pooled_in = pooled_in + pool_pos[: lm + 1].astype(cfg.dtype)
            pq = Dense(cfg.mt5_dim, name="pooler_q_proj", **dd)(
                pooled_in[:, :1]).reshape(b, 1, ph, pd)
            pk = Dense(cfg.mt5_dim, name="pooler_k_proj", **dd)(
                pooled_in).reshape(b, lm + 1, ph, pd)
            pv = Dense(cfg.mt5_dim, name="pooler_v_proj", **dd)(
                pooled_in).reshape(b, lm + 1, ph, pd)
            pooled = attention(pq, pk, pv).reshape(b, cfg.mt5_dim)
            pooled = Dense(cfg.pooled_dim, name="pooler_c_proj",
                           **dd)(pooled)
            extra = Dense(4 * c, name="extra_embedder_fc1", **dd)(pooled)
            extra = Dense(c, name="extra_embedder_fc2", **dd)(
                _silu_fp32(extra, cfg.dtype))
            t_vec = t_vec + extra
            mt5_proj = Dense(4 * cfg.mt5_dim, name="text_embedder_linear_1",
                             **dd)(mt5)
            mt5_proj = Dense(cfg.clip_dim, name="text_embedder_linear_2",
                             **dd)(_silu_fp32(mt5_proj, cfg.dtype))
            text = jnp.concatenate(
                [carry["clip_text"].astype(cfg.dtype), mt5_proj], axis=1)
            skips: List[jnp.ndarray] = []
        else:
            tokens, text = carry["tokens"], carry["text"]
            t_vec = carry["t_vec"]
            skips = ([s for s in carry["skips"]]
                     if "skips" in carry else [])

        half = cfg.depth // 2
        for i in range(self.lo, self.hi):
            if i < half:
                tokens = HunyuanBlock(cfg, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs)
                skips.append(tokens)
            else:
                tokens = HunyuanBlock(cfg, skip=True, name=f"blocks_{i}")(
                    tokens, text, t_vec, freqs, skips.pop())

        if self.last:
            b = tokens.shape[0]
            mod = Dense(2 * c, name="final_adaLN_1", **dd)(silu(t_vec))
            scale, shift = jnp.split(mod, 2, axis=-1)
            tf32 = tokens.astype(jnp.float32)
            mean = tf32.mean(axis=-1, keepdims=True)
            var = tf32.var(axis=-1, keepdims=True)
            out = ((tf32 - mean) / jnp.sqrt(var + 1e-6)).astype(cfg.dtype)
            out = out * (1 + scale[:, None]) + shift[:, None]
            out = Dense(p * p * cfg.out_channels, name="final_linear",
                        **dd)(out)
            out = out.reshape(b, self.hp, self.wp, p, p, cfg.out_channels)
            return out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, self.hp * p, self.wp * p, cfg.out_channels)
        nxt = {"tokens": tokens, "text": text, "t_vec": t_vec}
        if skips:
            nxt["skips"] = jnp.stack(skips, axis=0)
        return nxt


def _hunyuan_stage_param_names(lo: int, hi: int, first: bool,
                               last: bool) -> List[str]:
    names = [f"blocks_{i}" for i in range(lo, hi)]
    if first:
        names += ["x_embedder_proj", "t_embedder_mlp_0", "t_embedder_mlp_2",
                  "pooler_positional_embedding", "pooler_q_proj",
                  "pooler_k_proj", "pooler_v_proj", "pooler_c_proj",
                  "extra_embedder_fc1", "extra_embedder_fc2",
                  "text_embedder_linear_1", "text_embedder_linear_2"]
        # text_embedding_padding is carried for checkpoint parity only
        # (never read) — no stage declares it, so it is not sliced
    if last:
        names += ["final_adaLN_1", "final_linear"]
    return names


class HunyuanPP:
    """Pipeline-parallel Hunyuan-DiT forward over explicit devices (see
    MMDiTPP; the U-ViT skip stack rides the stage boundaries, so prefer
    TP/SP for this family unless weights must span chips)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 hp: int, wp: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-0-local); use tome without pp")
        if cfg.sp_axis is not None:
            raise ValueError("choose one of sequence parallelism "
                             "(use_mesh_sp) or pipeline parallelism")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(uniform_pp_plan(cfg.depth, n_stages)):
            first, last = si == 0, si == n_stages - 1
            mod = HunyuanStage(cfg, lo, hi, hp=hp, wp=wp,
                               first=first, last=last)
            sub = _slice_params(
                params, _hunyuan_stage_param_names(lo, hi, first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply),
                params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, clip_text, mt5_text,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl],
                          "clip_text": clip_text[sl],
                          "mt5_text": mt5_text[sl]}
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


# ---------------- UNet (SD1.5 / SD2 / SDXL) pipeline parallelism ----------------
#
# The conv UNet is a linear chain once flattened (input conv, input
# blocks + downsamples, middle, output blocks + upsamples, out head) —
# but unlike the DiT chains it is heterogeneous (cost varies ~10x
# between a 64x64x320 res block and a 8x8x1280 one) and skip-connected:
# a skip produced by input block i is consumed by the mirror output
# block, so skips produced in stage s must RIDE the pipe through every
# intermediate stage (the Hunyuan U-ViT pattern, generalized to
# per-skip shapes: the carry holds a tuple of differently-shaped
# tensors instead of one stacked array).
#
# The stage plan is balanced by an analytic FLOP model per unit (convs
# 9*H*W*Cin*Cout, attention 4*N^2*C + projections), computed for the
# bound latent geometry — a uniform block count would put ~60% of the
# work in the stage holding the high-res levels.


@dataclasses.dataclass(frozen=True)
class UNetUnit:
    """One unit of the flattened UNet chain (hashable/static — stage
    modules take a tuple of these as a module attribute)."""
    kind: str              # "in0" | "in" | "down" | "mid" | "out"
    block_idx: int         # index inside input_blocks_* / output_blocks_*
    level: int
    ds: int                # spatial downsample factor while this unit runs
    ch_in: int
    ch: int                # output channels
    attn_depth: int = 0    # transformer blocks (0 = no attention)
    has_up: bool = False   # trailing Upsample (output blocks only)


def unet_unit_list(cfg) -> List[UNetUnit]:
    """Flatten a UNetConfig into the exact unit sequence UNetModel
    executes (models/unet.py __call__ `mode=full`)."""
    mc = cfg.model_channels
    n_levels = len(cfg.channel_mult)
    depths = cfg.transformer_depth
    if isinstance(depths, int):
        depths = (depths,) * n_levels
    units = [UNetUnit("in0", 0, 0, 1, cfg.in_channels, mc)]
    ch, ds, block_idx = mc, 1, 1
    for level in range(n_levels):
        out_ch = mc * cfg.channel_mult[level]
        for _ in range(cfg.num_res_blocks):
            ad = depths[level] if ds in cfg.attention_resolutions else 0
            units.append(UNetUnit("in", block_idx, level, ds, ch, out_ch,
                                  attn_depth=ad))
            ch = out_ch
            block_idx += 1
        if level != n_levels - 1:
            units.append(UNetUnit("down", block_idx, level, ds, ch, ch))
            block_idx += 1
            ds *= 2
    units.append(UNetUnit("mid", 0, n_levels - 1, ds, ch, ch,
                          attn_depth=cfg.transformer_depth_middle))
    for level in range(n_levels - 1, -1, -1):
        out_ch = mc * cfg.channel_mult[level]
        ds = 2 ** level
        block_idx = (n_levels - 1 - level) * (cfg.num_res_blocks + 1)
        for i in range(cfg.num_res_blocks + 1):
            ad = depths[level] if ds in cfg.attention_resolutions else 0
            units.append(UNetUnit(
                "out", block_idx, level, ds, ch, out_ch, attn_depth=ad,
                has_up=(level > 0 and i == cfg.num_res_blocks)))
            ch = out_ch
            block_idx += 1
    return units


def _unet_unit_weight(u: UNetUnit, h: int, w: int, ctx_len: int = 77) -> float:
    """Analytic FLOP estimate (relative scale only) for one unit at
    latent geometry (h, w)."""
    H, W = h // u.ds, w // u.ds
    n = H * W
    c = u.ch

    def res(cin, cout, hh, ww):
        f = 9 * hh * ww * (cin * cout + cout * cout)
        if cin != cout:
            f += hh * ww * cin * cout
        return f

    def attn(depth):
        if depth <= 0:
            return 0.0
        per = 12 * n * c * c + 4 * n * n * c + 4 * n * ctx_len * c
        return depth * per + 2 * n * c * c   # + proj_in/out

    if u.kind == "in0":
        return 9 * n * u.ch_in * c
    if u.kind == "in":
        return res(u.ch_in, c, H, W) + attn(u.attn_depth)
    if u.kind == "down":
        return 9 * (H // 2) * (W // 2) * c * c
    if u.kind == "mid":
        return 2 * res(c, c, H, W) + attn(u.attn_depth)
    # "out": the concat doubles (or more) the res block input channels
    f = res(u.ch_in + u.ch, c, H, W) + attn(u.attn_depth)
    if u.has_up:
        f += 9 * (2 * H) * (2 * W) * c * c
    return f


def unet_pp_plan(cfg, h: int, w: int, n_stages: int) -> List[tuple]:
    """Contiguous (lo, hi) chunks over unet_unit_list(cfg), balanced by
    the analytic FLOP weight at latent geometry (h, w)."""
    units = unet_unit_list(cfg)
    if not 1 <= n_stages <= len(units):
        raise ValueError(
            f"n_stages must be in [1, {len(units)}] for this UNet; "
            f"got {n_stages}")
    weights = [_unet_unit_weight(u, h, w) for u in units]
    total = float(sum(weights))
    plan = []
    pos, acc = 0, 0.0
    for s in range(n_stages):
        target = total * (s + 1) / n_stages
        hi = pos
        while hi < len(units) and (
                acc + weights[hi] <= target + 1e-9 or hi == pos) and (
                len(units) - (hi + 1) >= n_stages - s - 1):
            acc += weights[hi]
            hi += 1
        if s == n_stages - 1:
            while hi < len(units):
                acc += weights[hi]
                hi += 1
        plan.append((pos, hi))
        pos = hi
    assert pos == len(units), plan
    return plan


class UNetStage(nn.Module):
    """One PP stage of the SD UNet.  Module/param names match
    models/unet.py UNetModel exactly, so stage params are top-level
    slices of the full tree (quantized weight_scale siblings included).
    Skips produced here are appended to the carried tuple; skips
    consumed here pop from its end (LIFO, exactly UNetModel's hs)."""
    cfg: Any                       # UNetConfig
    units: tuple                   # tuple of UNetUnit
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, Any]):
        from cremage_tpu.models.unet import (
            Downsample, ResBlock, SpatialTransformer, Upsample, _heads_for,
        )
        from cremage_tpu.models.layers import Conv, GroupNorm

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mc = cfg.model_channels

        if self.first:
            t_emb = timestep_embedding(carry["t"], mc).astype(cfg.dtype)
            emb = Dense(mc * 4, name="time_embed_0", **dd)(t_emb)
            emb = Dense(mc * 4, name="time_embed_2", **dd)(silu(emb))
            if cfg.adm_identity:
                emb = emb + carry["y"].astype(cfg.dtype)
            elif cfg.adm_in_channels:
                y_emb = Dense(mc * 4, name="label_emb_0_0", **dd)(
                    carry["y"].astype(cfg.dtype))
                y_emb = Dense(mc * 4, name="label_emb_0_2", **dd)(silu(y_emb))
                emb = emb + y_emb
            h = carry["x"].astype(cfg.dtype)
            skips: List[jnp.ndarray] = []
        else:
            h, emb = carry["h"], carry["emb"]
            skips = list(carry.get("skips", ()))
        context = carry.get("context")
        if context is not None:
            context = context.astype(cfg.dtype)

        for u in self.units:
            if u.kind == "in0":
                h = Conv(mc, name="input_blocks_0_0", **dd)(h)
                skips.append(h)
            elif u.kind == "in":
                h = ResBlock(u.ch, name=f"input_blocks_{u.block_idx}_0",
                             **dd)(h, emb)
                if u.attn_depth:
                    heads, dim_head = _heads_for(u.ch, cfg)
                    h = SpatialTransformer(
                        heads, dim_head, depth=u.attn_depth,
                        use_linear=cfg.use_linear_in_transformer,
                        name=f"input_blocks_{u.block_idx}_1",
                        ipa_num_tokens=cfg.ipa_num_tokens,
                        ipa_scale=cfg.ipa_scale, **dd)(h, context)
                skips.append(h)
            elif u.kind == "down":
                h = Downsample(u.ch, name=f"input_blocks_{u.block_idx}_0",
                               **dd)(h)
                skips.append(h)
            elif u.kind == "mid":
                heads, dim_head = _heads_for(u.ch, cfg)
                h = ResBlock(u.ch, name="middle_block_0", **dd)(h, emb)
                h = SpatialTransformer(
                    heads, dim_head, depth=u.attn_depth,
                    use_linear=cfg.use_linear_in_transformer,
                    name="middle_block_1",
                    ipa_num_tokens=cfg.ipa_num_tokens,
                    ipa_scale=cfg.ipa_scale, **dd)(h, context)
                h = ResBlock(u.ch, name="middle_block_2", **dd)(h, emb)
            else:  # "out"
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResBlock(u.ch, name=f"output_blocks_{u.block_idx}_0",
                             **dd)(h, emb)
                sub = 1
                if u.attn_depth:
                    heads, dim_head = _heads_for(u.ch, cfg)
                    h = SpatialTransformer(
                        heads, dim_head, depth=u.attn_depth,
                        use_linear=cfg.use_linear_in_transformer,
                        name=f"output_blocks_{u.block_idx}_1",
                        ipa_num_tokens=cfg.ipa_num_tokens,
                        ipa_scale=cfg.ipa_scale, **dd)(h, context)
                    sub = 2
                if u.has_up:
                    h = Upsample(
                        u.ch, name=f"output_blocks_{u.block_idx}_{sub}",
                        **dd)(h)

        if self.last:
            h = GroupNorm(num_groups=32, fuse_silu=True, name="out_0")(h)
            return Conv(cfg.out_channels, name="out_2", **dd)(h)
        nxt: Dict[str, Any] = {"h": h, "emb": emb}
        if context is not None:
            nxt["context"] = context
        if skips:
            nxt["skips"] = tuple(skips)
        return nxt


def _unet_stage_param_names(cfg, units: Sequence[UNetUnit], first: bool,
                            last: bool) -> List[str]:
    names: List[str] = []
    if first:
        names += ["time_embed_0", "time_embed_2"]
        if cfg.adm_in_channels and not cfg.adm_identity:
            names += ["label_emb_0_0", "label_emb_0_2"]
    for u in units:
        if u.kind in ("in0", "in", "down"):
            names.append(f"input_blocks_{u.block_idx}_0")
            if u.kind == "in" and u.attn_depth:
                names.append(f"input_blocks_{u.block_idx}_1")
        elif u.kind == "mid":
            names += ["middle_block_0", "middle_block_1", "middle_block_2"]
        else:
            names.append(f"output_blocks_{u.block_idx}_0")
            sub = 1
            if u.attn_depth:
                names.append(f"output_blocks_{u.block_idx}_1")
                sub = 2
            if u.has_up:
                names.append(f"output_blocks_{u.block_idx}_{sub}")
    if last:
        names += ["out_0", "out_2"]
    return names


class UNetPP:
    """Pipeline-parallel SD-UNet forward over explicit devices (see
    FluxPP for the schedule/microbatch contract).  Bound to one latent
    geometry (h, w) — the stage plan is FLOP-balanced for it.

    Unsupported compositions are rejected here or at the pipeline:
    tome (the merge plan is stage-local), deep_cache (the boundary is
    stage-local), ControlNet (residuals target blocks on every stage)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 h: int, w: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-local); use tome without pp")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        units = unet_unit_list(cfg)
        plan = unet_pp_plan(cfg, h, w, n_stages)
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(plan):
            first, last = si == 0, si == n_stages - 1
            mod = UNetStage(cfg, tuple(units[lo:hi]), first=first, last=last)
            sub = _slice_params(params, _unet_stage_param_names(
                cfg, units[lo:hi], first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply), params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, context, y=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        needs_y = self.cfg.adm_identity or self.cfg.adm_in_channels
        if needs_y and y is None:
            raise ValueError("this UNet expects vector conditioning y")
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl], "context": context[sl]}
            if needs_y:
                carry["y"] = y[sl]
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


def _balanced_plan(weights: Sequence[float], n_stages: int) -> List[tuple]:
    """Contiguous (lo, hi) chunks over a weighted unit chain, greedily
    balanced by cumulative weight with >= 1 unit per stage."""
    if not 1 <= n_stages <= len(weights):
        raise ValueError(
            f"n_stages must be in [1, {len(weights)}]; got {n_stages}")
    total = float(sum(weights))
    plan = []
    pos, acc = 0, 0.0
    for s in range(n_stages):
        target = total * (s + 1) / n_stages
        hi = pos
        while hi < len(weights) and (
                acc + weights[hi] <= target + 1e-9 or hi == pos) and (
                len(weights) - (hi + 1) >= n_stages - s - 1):
            acc += weights[hi]
            hi += 1
        if s == n_stages - 1:
            while hi < len(weights):
                acc += weights[hi]
                hi += 1
        plan.append((pos, hi))
        pos = hi
    assert pos == len(weights), plan
    return plan


# ---------------- Kandinsky 2.2 decoder pipeline parallelism ----------------
#
# Same shape as UNetPP: the decoder UNet flattens to a heterogeneous
# chain with skips riding the pipe; differences are the module zoo
# (ScaleShiftResBlock with in-block up/down sampling, AddedKVAttention)
# and that skip-concat happens BEFORE the res block call.


@dataclasses.dataclass(frozen=True)
class KandinskyUnit:
    kind: str          # "in0" | "in" | "down" | "mid" | "out" | "up"
    level: int
    idx: int           # i within the level (block naming)
    ds: int
    ch_in: int
    ch: int
    attn: bool = False


def kandinsky_unit_list(cfg) -> List[KandinskyUnit]:
    """Flatten a KandinskyUNetConfig into the exact unit sequence
    KandinskyUNet executes (models/kandinsky_decoder.py, mode=full)."""
    boc = cfg.block_out_channels
    n = len(boc)
    units = [KandinskyUnit("in0", 0, 0, 1, cfg.in_channels, boc[0])]
    ch, ds = boc[0], 1
    for lv in range(n):
        plain = cfg.first_block_plain and lv == 0
        for i in range(cfg.layers_per_block):
            units.append(KandinskyUnit("in", lv, i, ds, ch, boc[lv],
                                       attn=not plain))
            ch = boc[lv]
        if lv != n - 1:
            units.append(KandinskyUnit("down", lv, 0, ds, ch, ch))
            ds *= 2
    units.append(KandinskyUnit("mid", n - 1, 0, ds, ch, ch, attn=True))
    for lv in range(n - 1, -1, -1):
        plain = cfg.first_block_plain and lv == 0
        ds = 2 ** lv
        for i in range(cfg.layers_per_block + 1):
            units.append(KandinskyUnit("out", lv, i, ds, ch, boc[lv],
                                       attn=not plain))
            ch = boc[lv]
        if lv != 0:
            units.append(KandinskyUnit("up", lv, 0, ds, ch, ch))
    return units


def _kandinsky_unit_weight(u: KandinskyUnit, h: int, w: int,
                           ctx_len: int = 8) -> float:
    H, W = h // u.ds, w // u.ds
    n = H * W
    c = u.ch

    def res(cin, cout, hh, ww):
        f = 9 * hh * ww * (cin * cout + cout * cout)
        if cin != cout:
            f += hh * ww * cin * cout
        return f

    def attn():
        # to_q/k/v/out at n tokens + add_k/v at ctx_len tokens
        return (4 * n * c * c + 2 * ctx_len * c * c
                + 4 * n * (n + ctx_len) * c)

    if u.kind == "in0":
        return 9 * n * u.ch_in * c
    if u.kind == "down":
        return res(c, c, H // 2, W // 2)
    if u.kind == "up":
        return res(c, c, 2 * H, 2 * W)
    if u.kind == "mid":
        return 2 * res(c, c, H, W) + attn()
    cin = u.ch_in + (c if u.kind == "out" else 0)  # skip concat
    f = res(cin, c, H, W)
    if u.attn:
        f += attn()
    return f


class KandinskyStage(nn.Module):
    """One PP stage of the Kandinsky 2.2 decoder.  Module/param names
    match models/kandinsky_decoder.py KandinskyUNet exactly."""
    cfg: Any                       # KandinskyUNetConfig
    units: tuple                   # tuple of KandinskyUnit
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, Any]):
        from cremage_tpu.models.kandinsky_decoder import (
            AddedKVAttention, ScaleShiftResBlock,
        )
        from cremage_tpu.models.layers import Conv, GroupNorm

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        boc = cfg.block_out_channels
        n = len(boc)

        if self.first:
            t_emb = timestep_embedding(carry["t"], boc[0]).astype(cfg.dtype)
            emb = Dense(cfg.time_embed_dim, name="time_embedding_linear_1",
                        **dd)(t_emb)
            emb = Dense(cfg.time_embed_dim, name="time_embedding_linear_2",
                        **dd)(silu(emb))
            if "y" in carry:
                emb = emb + carry["y"].astype(cfg.dtype)
            h = carry["x"].astype(cfg.dtype)
            skips: List[jnp.ndarray] = []
        else:
            h, emb = carry["h"], carry["emb"]
            skips = list(carry.get("skips", ()))
        context = carry["context"].astype(cfg.dtype)

        def attn_mod(name, lv):
            return AddedKVAttention(heads=boc[lv] // cfg.attention_head_dim,
                                    name=name, **dd)

        for u in self.units:
            if u.kind == "in0":
                h = Conv(boc[0], kernel_size=3, name="conv_in", **dd)(h)
                skips.append(h)
            elif u.kind == "in":
                h = ScaleShiftResBlock(
                    boc[u.level],
                    name=f"down_blocks_{u.level}_resnets_{u.idx}",
                    **dd)(h, emb)
                if u.attn:
                    h = attn_mod(
                        f"down_blocks_{u.level}_attentions_{u.idx}",
                        u.level)(h, context)
                skips.append(h)
            elif u.kind == "down":
                h = ScaleShiftResBlock(
                    boc[u.level], sample="down",
                    name=f"down_blocks_{u.level}_downsamplers_0",
                    **dd)(h, emb)
                skips.append(h)
            elif u.kind == "mid":
                h = ScaleShiftResBlock(boc[-1], name="mid_block_resnets_0",
                                       **dd)(h, emb)
                h = attn_mod("mid_block_attentions_0", n - 1)(h, context)
                h = ScaleShiftResBlock(boc[-1], name="mid_block_resnets_1",
                                       **dd)(h, emb)
            elif u.kind == "out":
                pos = n - 1 - u.level
                skip = skips.pop()
                h = ScaleShiftResBlock(
                    boc[u.level],
                    name=f"up_blocks_{pos}_resnets_{u.idx}", **dd,
                )(jnp.concatenate([h, skip], axis=-1), emb)
                if u.attn:
                    h = attn_mod(
                        f"up_blocks_{pos}_attentions_{u.idx}",
                        u.level)(h, context)
            else:  # "up"
                pos = n - 1 - u.level
                h = ScaleShiftResBlock(
                    boc[u.level], sample="up",
                    name=f"up_blocks_{pos}_upsamplers_0", **dd)(h, emb)

        if self.last:
            h = silu(GroupNorm(32, name="conv_norm_out")(h))
            return Conv(cfg.out_channels, kernel_size=3, name="conv_out",
                        dtype=jnp.float32,
                        param_dtype=cfg.param_dtype)(h)
        nxt: Dict[str, Any] = {"h": h, "emb": emb, "context": context}
        if skips:
            nxt["skips"] = tuple(skips)
        return nxt


def _kandinsky_stage_param_names(cfg, units: Sequence[KandinskyUnit],
                                 first: bool, last: bool) -> List[str]:
    n = len(cfg.block_out_channels)
    names: List[str] = []
    if first:
        names += ["time_embedding_linear_1", "time_embedding_linear_2"]
    for u in units:
        if u.kind == "in0":
            names.append("conv_in")
        elif u.kind == "in":
            names.append(f"down_blocks_{u.level}_resnets_{u.idx}")
            if u.attn:
                names.append(f"down_blocks_{u.level}_attentions_{u.idx}")
        elif u.kind == "down":
            names.append(f"down_blocks_{u.level}_downsamplers_0")
        elif u.kind == "mid":
            names += ["mid_block_resnets_0", "mid_block_attentions_0",
                      "mid_block_resnets_1"]
        elif u.kind == "out":
            pos = n - 1 - u.level
            names.append(f"up_blocks_{pos}_resnets_{u.idx}")
            if u.attn:
                names.append(f"up_blocks_{pos}_attentions_{u.idx}")
        else:
            names.append(f"up_blocks_{n - 1 - u.level}_upsamplers_0")
    if last:
        names += ["conv_norm_out", "conv_out"]
    return names


class KandinskyPP:
    """Pipeline-parallel Kandinsky 2.2 decoder forward over explicit
    devices (see FluxPP for the schedule/microbatch contract)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 h: int, w: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-local); use tome without pp")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        units = kandinsky_unit_list(cfg)
        weights = [_kandinsky_unit_weight(u, h, w) for u in units]
        plan = _balanced_plan(weights, n_stages)
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(plan):
            first, last = si == 0, si == n_stages - 1
            mod = KandinskyStage(cfg, tuple(units[lo:hi]),
                                 first=first, last=last)
            sub = _slice_params(params, _kandinsky_stage_param_names(
                cfg, units[lo:hi], first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply), params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, context, y=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl], "context": context[sl]}
            if y is not None:
                carry["y"] = y[sl]
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


# ---------------- SVD video UNet pipeline parallelism ----------------
#
# The video UNet flattens to the SAME unit chain as the SD UNet
# (unet_unit_list applies verbatim — block indices, skip push/pop and
# naming are identical); only the module zoo differs (VideoResBlock,
# SpatialVideoTransformer) and two extra per-microbatch operands ride
# the carry: time_context (first-frame context) and the frame count
# baked into the modules.  The batch axis is B*T frames and temporal
# attention mixes frames within each num_frames group, so microbatches
# must align to num_frames.


class VideoUNetStage(nn.Module):
    """One PP stage of the SVD video UNet.  Module/param names match
    models/video_unet.py VideoUNet exactly."""
    cfg: Any                       # UNetConfig
    num_frames: int
    units: tuple                   # tuple of UNetUnit
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, Any]):
        from cremage_tpu.models.unet import _heads_for
        from cremage_tpu.models.video_unet import (
            Downsample, SpatialVideoTransformer, VideoResBlock,
        )
        from cremage_tpu.models.layers import Conv, GroupNorm
        from cremage_tpu.models.unet import Upsample

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mc = cfg.model_channels
        tf = self.num_frames

        if self.first:
            t_emb = timestep_embedding(carry["t"], mc).astype(cfg.dtype)
            emb = Dense(mc * 4, name="time_embed_0", **dd)(t_emb)
            emb = Dense(mc * 4, name="time_embed_2", **dd)(silu(emb))
            if cfg.adm_in_channels:
                y_emb = Dense(mc * 4, name="label_emb_0_0", **dd)(
                    carry["y"].astype(cfg.dtype))
                y_emb = Dense(mc * 4, name="label_emb_0_2",
                              **dd)(silu(y_emb))
                emb = emb + y_emb
            h = carry["x"].astype(cfg.dtype)
            skips: List[jnp.ndarray] = []
        else:
            h, emb = carry["h"], carry["emb"]
            skips = list(carry.get("skips", ()))
        context = carry["context"].astype(cfg.dtype)
        time_context = context[::tf]

        def svt(name, ch, depth):
            heads, dim_head = _heads_for(ch, cfg)
            return SpatialVideoTransformer(heads, dim_head, tf,
                                           depth=depth, name=name, **dd)

        for u in self.units:
            if u.kind == "in0":
                h = Conv(mc, name="input_blocks_0_0", **dd)(h)
                skips.append(h)
            elif u.kind == "in":
                h = VideoResBlock(u.ch, tf,
                                  name=f"input_blocks_{u.block_idx}_0",
                                  **dd)(h, emb, None)
                if u.attn_depth:
                    h = svt(f"input_blocks_{u.block_idx}_1", u.ch,
                            u.attn_depth)(h, context, time_context, None)
                skips.append(h)
            elif u.kind == "down":
                h = Downsample(u.ch, name=f"input_blocks_{u.block_idx}_0",
                               **dd)(h)
                skips.append(h)
            elif u.kind == "mid":
                h = VideoResBlock(u.ch, tf, name="middle_block_0",
                                  **dd)(h, emb, None)
                h = svt("middle_block_1", u.ch,
                        u.attn_depth)(h, context, time_context, None)
                h = VideoResBlock(u.ch, tf, name="middle_block_2",
                                  **dd)(h, emb, None)
            else:  # "out"
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = VideoResBlock(u.ch, tf,
                                  name=f"output_blocks_{u.block_idx}_0",
                                  **dd)(h, emb, None)
                sub = 1
                if u.attn_depth:
                    h = svt(f"output_blocks_{u.block_idx}_1", u.ch,
                            u.attn_depth)(h, context, time_context, None)
                    sub = 2
                if u.has_up:
                    h = Upsample(
                        u.ch, name=f"output_blocks_{u.block_idx}_{sub}",
                        **dd)(h)

        if self.last:
            h = GroupNorm(num_groups=32, fuse_silu=True, name="out_0")(h)
            return Conv(cfg.out_channels, name="out_2", **dd)(h)
        nxt: Dict[str, Any] = {"h": h, "emb": emb, "context": context}
        if skips:
            nxt["skips"] = tuple(skips)
        return nxt


class VideoUNetPP:
    """Pipeline-parallel SVD video UNet forward over explicit devices.
    The unit chain/plan is UNetPP's; microbatches must be multiples of
    num_frames (temporal attention mixes frames within a group)."""

    def __init__(self, model, params, devices: Sequence[Any],
                 h: int, w: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-local); use tome without pp")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.num_frames = model.num_frames
        self.n_stages = n_stages
        units = unet_unit_list(cfg)
        plan = unet_pp_plan(cfg, h, w, n_stages)
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(plan):
            first, last = si == 0, si == n_stages - 1
            mod = VideoUNetStage(cfg, self.num_frames, tuple(units[lo:hi]),
                                 first=first, last=last)
            sub = _slice_params(params, _unet_stage_param_names(
                cfg, units[lo:hi], first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply), params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def __call__(self, x, t, context, y=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (b,))
        if b % self.num_frames != 0:
            raise ValueError(
                f"batch {b} must be a multiple of num_frames "
                f"{self.num_frames} (frames ride the batch axis)")
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        if mb % self.num_frames != 0:
            raise ValueError(
                f"microbatch {mb} must be a multiple of num_frames "
                f"{self.num_frames} (temporal attention mixes frames "
                "within a group)")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {"x": x[sl], "t": t[sl], "context": context[sl]}
            if self.cfg.adm_in_channels:
                carry["y"] = y[sl]
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


# ---------------- Stable Cascade (Würstchen B/C) pipeline parallelism ----------------
#
# The Würstchen trunks are flat chains of (Res, Time[, Attn]) groups
# with ONE skip per resolution level, consumed by index (not LIFO) on
# the way up — and levels with repeat-mappers re-run the same groups,
# so those levels are atomic units (their params cannot be split
# without re-entering the stage).  All group params are root-level
# names (the trunk runs in the caller's compact scope), so stage params
# remain top-level slices.


@dataclasses.dataclass(frozen=True)
class CascadeUnit:
    kind: str          # "dscale" | "dgroup" | "dlevel" | "ugroup" | "ulevel" | "uscale"
    level: int         # lv for down units, pos for up units
    idx: int = 0
    push_skip: bool = False
    take_skip: bool = False


def _cascade_attn_levels(cfg) -> tuple:
    return tuple(getattr(cfg, "attn_levels", range(len(cfg.c_hidden))))


def cascade_unit_list(cfg) -> List[CascadeUnit]:
    """Flatten a StageB/StageC config into the exact unit sequence
    _run_trunk executes (models/cascade.py:248, mode=full).  Skips are
    pushed after the last unit of each down level (deepest level's skip
    is never consumed — not pushed) and taken by the first group of the
    matching up level."""
    n = len(cfg.c_hidden)
    units: List[CascadeUnit] = []
    for lv in range(n):
        if lv > 0:
            units.append(CascadeUnit("dscale", lv))
        reps = cfg.down_repeats[lv]
        pushes = lv < n - 1
        if reps == 1:
            for i in range(cfg.blocks[lv]):
                units.append(CascadeUnit(
                    "dgroup", lv, i,
                    push_skip=pushes and i == cfg.blocks[lv] - 1))
        else:
            units.append(CascadeUnit("dlevel", lv, push_skip=pushes))
    blocks_up = cfg.blocks[::-1]
    for pos in range(n):
        lv = n - 1 - pos
        reps = cfg.up_repeats[pos]
        take = pos > 0
        if reps == 1:
            for i in range(blocks_up[pos]):
                units.append(CascadeUnit("ugroup", pos, i,
                                         take_skip=take and i == 0))
        else:
            units.append(CascadeUnit("ulevel", pos, take_skip=take))
        if lv > 0:
            units.append(CascadeUnit("uscale", pos))
    return units


def _cascade_unit_weight(u: CascadeUnit, cfg, h: int, w: int) -> float:
    n = len(cfg.c_hidden)
    attn_levels = _cascade_attn_levels(cfg)
    p = cfg.patch_size
    h, w = h // p, w // p

    def group_w(lv):
        c = cfg.c_hidden[lv]
        H, W = h // 2 ** lv, w // 2 ** lv
        N = H * W
        f = 9 * N * c + 8 * N * c * c        # depthwise conv + GRN mlp
        if lv in attn_levels:
            M = 12                           # cond tokens (approx)
            f += 4 * N * c * c + 4 * N * (N + M) * c + 2 * M * c * c
        return f

    if u.kind == "dscale":
        lv = u.level
        H, W = h // 2 ** lv, w // 2 ** lv
        return H * W * cfg.c_hidden[lv - 1] * cfg.c_hidden[lv]
    if u.kind == "uscale":
        lv = n - 1 - u.level
        H, W = h // 2 ** lv, w // 2 ** lv
        return 4 * H * W * cfg.c_hidden[lv] * cfg.c_hidden[lv - 1]
    if u.kind == "dgroup":
        return group_w(u.level)
    if u.kind == "dlevel":
        return cfg.down_repeats[u.level] * cfg.blocks[u.level] * \
            group_w(u.level)
    lv = n - 1 - u.level
    if u.kind == "ugroup":
        return group_w(lv)
    return cfg.up_repeats[u.level] * cfg.blocks[::-1][u.level] * group_w(lv)


class CascadeStage(nn.Module):
    """One PP stage of a Würstchen trunk.  Module/param names match
    models/cascade.py StageB/StageC exactly (root-level)."""
    kind: str                     # "b" | "c"
    cfg: Any
    units: tuple                  # tuple of CascadeUnit
    first: bool = False
    last: bool = False

    @nn.compact
    def __call__(self, carry: Dict[str, Any]):
        from cremage_tpu.models.cascade import (
            CascadeAttnBlock, CascadeResBlock, CascadeTimestepBlock,
            ConvTranspose2x2, _channel_ln, _pixel_shuffle, _pixel_unshuffle,
            _resize_bilinear_ac,
        )
        from cremage_tpu.models.layers import Conv

        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        n = len(cfg.c_hidden)
        attn_levels = _cascade_attn_levels(cfg)

        if self.first:
            r = carry["r"]
            b = carry["x"].shape[0]
            if self.kind == "c":
                txt = Dense(cfg.c_cond, name="clip_txt_mapper", **dd)(
                    carry["clip_text"].astype(cfg.dtype))
                pooled = Dense(4 * cfg.c_cond, name="clip_txt_pooled_mapper",
                               **dd)(carry["clip_text_pooled"].astype(
                                   cfg.dtype)).reshape(b, 4, cfg.c_cond)
                streams = [txt, pooled]
                if "clip_img" in carry:
                    img = Dense(4 * cfg.c_cond, name="clip_img_mapper",
                                **dd)(carry["clip_img"].astype(
                                    cfg.dtype)).reshape(b, 4, cfg.c_cond)
                    streams.append(img)
                cond = _channel_ln(jnp.concatenate(streams, axis=1))
            else:
                pooled = Dense(4 * cfg.c_cond, name="clip_txt_pooled_mapper",
                               **dd)(carry["clip_text_pooled"].astype(
                                   cfg.dtype)).reshape(b, 4, cfg.c_cond)
                cond = _channel_ln(pooled)
            zeros = jnp.zeros_like(r)
            parts = [timestep_embedding(r, cfg.c_r)]
            for cname in cfg.conds:
                parts.append(timestep_embedding(carry.get(cname, zeros),
                                                cfg.c_r))
            r_embed = jnp.concatenate(parts, axis=-1)
            p = cfg.patch_size
            h = carry["x"].astype(cfg.dtype)
            if p > 1:
                h = _pixel_unshuffle(h, p)
            h = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                     name="embedding_1", **dd)(h)
            h = _channel_ln(h)
            if self.kind == "b":
                hh, ww = h.shape[1], h.shape[2]
                eff = _resize_bilinear_ac(
                    carry["effnet"].astype(cfg.dtype), hh, ww)
                eff = Conv(4 * cfg.c_hidden[0], kernel_size=1, padding=0,
                           name="effnet_mapper_0", **dd)(eff)
                eff = nn.gelu(eff, approximate=False)
                eff = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                           name="effnet_mapper_2", **dd)(eff)
                h = h + _channel_ln(eff)
                pixels = carry.get("pixels")
                if pixels is None:
                    pixels = jnp.zeros((b, 8, 8, cfg.pixels_channels),
                                       cfg.dtype)
                px = Conv(4 * cfg.c_hidden[0], kernel_size=1, padding=0,
                          name="pixels_mapper_0",
                          **dd)(pixels.astype(cfg.dtype))
                px = nn.gelu(px, approximate=False)
                px = Conv(cfg.c_hidden[0], kernel_size=1, padding=0,
                          name="pixels_mapper_2", **dd)(px)
                h = h + _resize_bilinear_ac(_channel_ln(px), hh, ww)
            skips: Dict[str, jnp.ndarray] = {}
        else:
            h, r_embed, cond = carry["h"], carry["r_embed"], carry["cond"]
            skips = dict(carry.get("skips", {}))

        def group(pre, c, skip_channels, with_attn, lv):
            res = CascadeResBlock(c, skip_channels=skip_channels,
                                  name=pre + "_res", **dd)
            tim = CascadeTimestepBlock(c, cfg.c_r, cfg.conds,
                                       name=pre + "_time", **dd)
            att = (CascadeAttnBlock(c, cfg.c_cond, cfg.num_heads,
                                    name=pre + "_attn", **dd)
                   if with_attn else None)
            return res, tim, att

        for u in self.units:
            if u.kind == "dscale":
                lv = u.level
                h = Conv(cfg.c_hidden[lv], kernel_size=2, stride=2,
                         padding=0, name=f"downscalers_{lv}_1",
                         **dd)(_channel_ln(h))
            elif u.kind == "dgroup":
                lv = u.level
                res, tim, att = group(f"down_blocks_{lv}_{u.idx}",
                                      cfg.c_hidden[lv], 0,
                                      lv in attn_levels, lv)
                h = res(h)
                h = tim(h, r_embed)
                if att is not None:
                    h = att(h, cond)
                if u.push_skip:
                    skips[str(lv)] = h
            elif u.kind == "dlevel":
                lv = u.level
                c = cfg.c_hidden[lv]
                groups = [group(f"down_blocks_{lv}_{i}", c, 0,
                                lv in attn_levels, lv)
                          for i in range(cfg.blocks[lv])]
                reps = cfg.down_repeats[lv]
                mappers = [Conv(c, kernel_size=1, padding=0,
                                name=f"down_repeat_mappers_{lv}_{j}", **dd)
                           for j in range(reps - 1)]
                for j in range(reps):
                    for res, tim, att in groups:
                        h = res(h)
                        h = tim(h, r_embed)
                        if att is not None:
                            h = att(h, cond)
                    if j < reps - 1:
                        h = mappers[j](h)
                if u.push_skip:
                    skips[str(lv)] = h
            elif u.kind == "ugroup":
                pos = u.level
                lv = n - 1 - pos
                c = cfg.c_hidden[lv]
                skip = skips.pop(str(lv)) if u.take_skip else None
                res, tim, att = group(f"up_blocks_{pos}_{u.idx}", c,
                                      c if skip is not None else 0,
                                      lv in attn_levels, lv)
                h = res(h, skip)
                h = tim(h, r_embed)
                if att is not None:
                    h = att(h, cond)
            elif u.kind == "ulevel":
                pos = u.level
                lv = n - 1 - pos
                c = cfg.c_hidden[lv]
                skip = skips.pop(str(lv)) if u.take_skip else None
                nblocks = cfg.blocks[::-1][pos]
                groups = [group(f"up_blocks_{pos}_{i}", c,
                                c if (skip is not None and i == 0) else 0,
                                lv in attn_levels, lv)
                          for i in range(nblocks)]
                reps = cfg.up_repeats[pos]
                mappers = [Conv(c, kernel_size=1, padding=0,
                                name=f"up_repeat_mappers_{pos}_{j}", **dd)
                           for j in range(reps - 1)]
                for j in range(reps):
                    for i, (res, tim, att) in enumerate(groups):
                        # the first res block re-concats the skip on
                        # EVERY repeat (_up_decode semantics)
                        h = res(h, skip if i == 0 else None)
                        h = tim(h, r_embed)
                        if att is not None:
                            h = att(h, cond)
                    if j < reps - 1:
                        h = mappers[j](h)
            else:  # "uscale"
                pos = u.level
                lv = n - 1 - pos
                h = ConvTranspose2x2(cfg.c_hidden[lv - 1],
                                     name=f"upscalers_{pos}_1",
                                     **dd)(_channel_ln(h))

        if self.last:
            p = cfg.patch_size
            out = Conv(cfg.out_channels * p * p, kernel_size=1, padding=0,
                       name="clf_1", dtype=jnp.float32,
                       param_dtype=cfg.param_dtype)(_channel_ln(h))
            if p > 1:
                out = _pixel_shuffle(out, p)
            return out
        nxt: Dict[str, Any] = {"h": h, "r_embed": r_embed, "cond": cond}
        if skips:
            nxt["skips"] = skips
        return nxt


def _cascade_stage_param_names(kind: str, cfg,
                               units: Sequence[CascadeUnit],
                               first: bool, last: bool) -> List[str]:
    n = len(cfg.c_hidden)
    names: List[str] = []
    if first:
        names += ["clip_txt_pooled_mapper", "embedding_1"]
        if kind == "c":
            # clip_img_mapper exists only when the checkpoint carries it;
            # _slice_params skips absent keys
            names += ["clip_txt_mapper", "clip_img_mapper"]
        else:
            names += ["effnet_mapper_0", "effnet_mapper_2",
                      "pixels_mapper_0", "pixels_mapper_2"]
    attn_levels = _cascade_attn_levels(cfg)

    def group_names(pre, lv):
        out = [pre + "_res", pre + "_time"]
        if lv in attn_levels:
            out.append(pre + "_attn")
        return out

    for u in units:
        if u.kind == "dscale":
            names.append(f"downscalers_{u.level}_1")
        elif u.kind == "dgroup":
            names += group_names(f"down_blocks_{u.level}_{u.idx}", u.level)
        elif u.kind == "dlevel":
            for i in range(cfg.blocks[u.level]):
                names += group_names(f"down_blocks_{u.level}_{i}", u.level)
            names += [f"down_repeat_mappers_{u.level}_{j}"
                      for j in range(cfg.down_repeats[u.level] - 1)]
        elif u.kind == "ugroup":
            names += group_names(f"up_blocks_{u.level}_{u.idx}",
                                 n - 1 - u.level)
        elif u.kind == "ulevel":
            for i in range(cfg.blocks[::-1][u.level]):
                names += group_names(f"up_blocks_{u.level}_{i}",
                                     n - 1 - u.level)
            names += [f"up_repeat_mappers_{u.level}_{j}"
                      for j in range(cfg.up_repeats[u.level] - 1)]
        else:
            names.append(f"upscalers_{u.level}_1")
    if last:
        names.append("clf_1")
    return names


class _CascadePPBase:
    kind = "c"

    def __init__(self, model, params, devices: Sequence[Any],
                 h: int, w: int, n_stages: Optional[int] = None):
        cfg = model.cfg
        if cfg.tome_ratio > 0:
            raise ValueError(
                "tome_ratio does not compose with pipeline parallelism "
                "(the merge plan is stage-local); use tome without pp")
        devices = list(devices)
        n_stages = int(n_stages or len(devices))
        if n_stages > len(devices):
            raise ValueError(f"{n_stages} stages need {n_stages} devices, "
                             f"got {len(devices)}")
        self.cfg = cfg
        self.n_stages = n_stages
        units = cascade_unit_list(cfg)
        weights = [_cascade_unit_weight(u, cfg, h, w) for u in units]
        plan = _balanced_plan(weights, n_stages)
        self.stages: List[_BoundStage] = []
        for si, (lo, hi) in enumerate(plan):
            first, last = si == 0, si == n_stages - 1
            mod = CascadeStage(self.kind, cfg, tuple(units[lo:hi]),
                               first=first, last=last)
            sub = _slice_params(params, _cascade_stage_param_names(
                self.kind, cfg, units[lo:hi], first, last))
            dev = devices[si]
            self.stages.append(_BoundStage(
                fn=jax.jit(mod.apply), params=jax.device_put(sub, dev),
                freqs=None, device=dev))

    @property
    def out_device(self):
        return self.stages[-1].device

    def _run(self, carry0: Dict[str, Any], b: int,
             microbatch: Optional[int]) -> jnp.ndarray:
        mb = int(microbatch or b)
        if b % mb != 0:
            raise ValueError(f"batch {b} must divide by microbatch {mb}")
        outs = []
        for lo in range(0, b, mb):
            sl = slice(lo, lo + mb)
            carry: Any = {k: v[sl] for k, v in carry0.items()}
            for st in self.stages:
                carry = jax.device_put(carry, st.device)
                carry = st.fn(st.params, carry)
            outs.append(carry)
        return outs[0] if len(outs) == 1 else jnp.concatenate(
            [jax.device_put(o, self.out_device) for o in outs], axis=0)


class StageCPP(_CascadePPBase):
    """Pipeline-parallel Würstchen Stage C forward (see FluxPP for the
    schedule/microbatch contract)."""
    kind = "c"

    def __call__(self, x, r, clip_text, clip_text_pooled, clip_img=None,
                 sca=None, crp=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        r = jnp.broadcast_to(jnp.asarray(r, jnp.float32), (b,))
        carry = {"x": x, "r": r, "clip_text": clip_text,
                 "clip_text_pooled": clip_text_pooled}
        if clip_img is not None:
            carry["clip_img"] = clip_img
        if sca is not None:
            carry["sca"] = jnp.broadcast_to(jnp.asarray(sca, jnp.float32),
                                            (b,))
        if crp is not None:
            carry["crp"] = jnp.broadcast_to(jnp.asarray(crp, jnp.float32),
                                            (b,))
        return self._run(carry, b, microbatch)


class StageBPP(_CascadePPBase):
    """Pipeline-parallel Würstchen Stage B forward."""
    kind = "b"

    def __call__(self, x, r, effnet, clip_text_pooled, sca=None,
                 pixels=None,
                 microbatch: Optional[int] = None) -> jnp.ndarray:
        b = x.shape[0]
        r = jnp.broadcast_to(jnp.asarray(r, jnp.float32), (b,))
        carry = {"x": x, "r": r, "effnet": effnet,
                 "clip_text_pooled": clip_text_pooled}
        if sca is not None:
            carry["sca"] = jnp.broadcast_to(jnp.asarray(sca, jnp.float32),
                                            (b,))
        if pixels is not None:
            carry["pixels"] = pixels
        return self._run(carry, b, microbatch)
