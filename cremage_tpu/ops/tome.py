"""Token merging (ToMe) for diffusion transformer blocks — TPU-native.

Bolya & Hoffman, "Token Merging for Fast Stable Diffusion" (2023,
https://arxiv.org/abs/2303.17604): before a block's self-attention,
merge the r most-similar src tokens into their best-matching dst token
(bipartite soft matching over a strided 2D grid), run attention on the
reduced N-r token set, then copy each merged dst output back to the src
positions.  An opt-in speed feature beyond reference parity (the
reference `/root/reference` has no equivalent); quality degrades
gracefully with `ratio` (paper: ratio 0.5 is near-lossless on SD1.5).

Two integration shapes:
- UNets (SD1.5/SDXL/SVD spatial): per-block merge around attn1 only,
  exactly ToMeSD (models/unet.py BasicTransformerBlock).
- DiTs (SD3/FLUX/PixArt-Σ/Hunyuan): ONE merge at the block-stack input
  — the whole depth (self/joint attention, cross attention q side, and
  the MLPs, i.e. every per-token matmul) runs on the reduced stream and
  the final per-token projection output is unmerged at the end.  RoPE
  models gather the kept tokens' freq rows with `select` (a merged
  token adopts its dst position).  This is the DiT analog where MLPs
  dominate: attention-only merging would leave most of the FLOPs
  untouched.

TPU-first design (vs the public pytorch ToMeSD):
- All shapes are static: `r` is a Python int fixed at trace time, the
  sx*sy candidate dst/src index grids are compile-time constants and
  the per-step random dst choice is one row-select on a stacked
  constant — no dynamic shapes anywhere, so the whole thing lives
  inside the jitted `lax.scan` sampler programs.
- Unmerge is ONE gather: instead of scattering attention outputs back
  per token class (unmerged / merged / dst), we scatter into a small
  int32 position map once and then `take_along_axis` the feature
  tensor once — index math on (B, N) int32, feature traffic N x C.
- The dst "random" offset is derived from the sampler timestep (the
  pytorch version draws from a host RNG per call, which would either
  bake one offset into the compiled program or force host callbacks;
  a timestep-derived offset varies the grid across steps, which is
  what the randomness is for — avoiding a static merge pattern that
  would imprint on the image).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ToMePlan:
    """Index plan for one merge/unmerge pair (all member arrays carry
    the batch dim; shapes static)."""

    src_idx: jnp.ndarray      # (Ns,) int32 — token ids of src set
    dst_idx: jnp.ndarray      # (Nd,) int32 — token ids of dst set
    unm_sel: jnp.ndarray      # (B, Ns-r) int32 — src-set rows kept
    mrg_sel: jnp.ndarray      # (B, r) int32 — src-set rows merged away
    mrg_tgt: jnp.ndarray      # (B, r) int32 — dst-set row each merges into
    n: int                    # original token count
    r: int                    # tokens removed

    @property
    def kept(self) -> int:
        return self.n - self.r


def candidate_grids(h: int, w: int, sx: int = 2,
                    sy: int = 2) -> Tuple[np.ndarray, np.ndarray]:
    """All sx*sy (dst_idx, src_idx) index pairs for an h x w token grid,
    one dst per sx x sy window at window-offset k = dy*sx + dx.
    Returns (dst_all (sx*sy, Nd), src_all (sx*sy, Ns)) as numpy int32 —
    compile-time constants."""
    assert h % sy == 0 and w % sx == 0, (h, w, sx, sy)
    n = h * w
    dst_all, src_all = [], []
    for dy in range(sy):
        for dx in range(sx):
            ii, jj = np.meshgrid(np.arange(dy, h, sy), np.arange(dx, w, sx),
                                 indexing="ij")
            dst = (ii * w + jj).reshape(-1).astype(np.int32)
            mask = np.ones(n, bool)
            mask[dst] = False
            src_all.append(np.nonzero(mask)[0].astype(np.int32))
            dst_all.append(dst)
    return np.stack(dst_all), np.stack(src_all)


def build_plan(metric: jnp.ndarray, h: int, w: int, r: int,
               offset, sx: int = 2, sy: int = 2) -> ToMePlan:
    """Bipartite soft matching (ToMe §3; ToMeSD §4.1 with a 2D strided
    dst grid).  metric (B, N, C) — token features used for cosine
    similarity (ToMeSD uses the block input x itself).  offset: scalar
    int (python or traced) in [0, sx*sy) choosing the dst position
    inside each window."""
    b, n, _ = metric.shape
    assert n == h * w, (n, h, w)
    dst_all, src_all = candidate_grids(h, w, sx, sy)
    nd, ns = dst_all.shape[1], src_all.shape[1]
    r = int(min(r, ns))
    assert r > 0, "use r>0 (skip ToMe entirely when off)"
    off = jnp.asarray(offset, jnp.int32) % (sx * sy)
    dst_idx = jnp.asarray(dst_all)[off]
    src_idx = jnp.asarray(src_all)[off]

    m = metric.astype(jnp.float32)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    m = m.astype(metric.dtype)
    src_m = jnp.take(m, src_idx, axis=1)          # (B, Ns, C)
    dst_m = jnp.take(m, dst_idx, axis=1)          # (B, Nd, C)
    scores = jnp.einsum("bsc,bdc->bsd", src_m, dst_m)
    node_max = jnp.max(scores, axis=-1)           # (B, Ns)
    node_tgt = jnp.argmax(scores, axis=-1).astype(jnp.int32)

    order = jnp.argsort(-node_max, axis=-1, stable=True).astype(jnp.int32)
    mrg_sel = order[:, :r]
    unm_sel = order[:, r:]
    mrg_tgt = jnp.take_along_axis(node_tgt, mrg_sel, axis=1)
    return ToMePlan(src_idx=src_idx, dst_idx=dst_idx, unm_sel=unm_sel,
                    mrg_sel=mrg_sel, mrg_tgt=mrg_tgt, n=n, r=r)


def check_dit_options(sp_mesh) -> None:
    """Pipeline-level validation shared by the DiT integrations
    (SD3/FLUX/PixArt/Hunyuan).  deep_cache COMPOSES with ToMe there:
    the Δ-cache is stored in full-token space (capture unmerges the
    reduced delta; shallow re-merges it under the current step's plan,
    group-averaging constituent deltas), so per-step plan changes are
    fine.  Sequence parallelism does not: the bipartite soft match
    needs the global token set on one device."""
    if sp_mesh is not None:
        raise ValueError(
            "tome_ratio does not compose with use_mesh_sp: the bipartite "
            "soft match needs the global token set on one device")


def plan_for_grid(metric: jnp.ndarray, hp: int, wp: int, ratio: float,
                  t: jnp.ndarray) -> Optional[ToMePlan]:
    """Standard whole-grid plan used by the DiT integrations: r =
    min(int(N*ratio), 3N/4) over the hp x wp token grid, dst-grid offset
    derived from the (traced) sampler timestep's fp32 bit pattern (int
    truncation would freeze the grid for fractional sigmas).  Returns
    None when the grid is odd-sided or r rounds to 0 — callers skip
    ToMe entirely then."""
    if hp % 2 or wp % 2:
        return None
    n = hp * wp
    r = min(int(n * ratio), (n * 3) // 4)
    if r <= 0:
        return None
    off = jax.lax.bitcast_convert_type(
        jnp.reshape(t, (-1,))[0].astype(jnp.float32), jnp.int32) & 0x7FFF
    return build_plan(metric, hp, wp, r, off)


def merge(plan: ToMePlan, x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, N-r, C): [kept src tokens; dst tokens], with
    each dst slot the mean of itself and every src merged into it."""
    b = x.shape[0]
    c = x.shape[-1]
    x_src = jnp.take(x, plan.src_idx, axis=1)
    x_dst = jnp.take(x, plan.dst_idx, axis=1)
    nd = x_dst.shape[1]
    unm = jnp.take_along_axis(x_src, plan.unm_sel[..., None], axis=1)
    mrg = jnp.take_along_axis(x_src, plan.mrg_sel[..., None], axis=1)

    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    acc = x_dst.astype(jnp.float32).at[bi, plan.mrg_tgt].add(
        mrg.astype(jnp.float32))
    cnt = jnp.ones((b, nd), jnp.float32).at[bi, plan.mrg_tgt].add(1.0)
    dst = (acc / cnt[..., None]).astype(x.dtype)
    return jnp.concatenate([unm, dst], axis=1)


def select(plan: ToMePlan, x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, ...) -> (B, N-r, ...): per-token side data (RoPE freq
    rows, position tables) reordered into merge()'s slot order
    [kept src tokens; dst tokens] WITHOUT averaging — a merged slot
    keeps its dst token's row (ToMe convention: the merged token
    adopts the dst position)."""
    b, n = x.shape[:2]
    trail = x.shape[2:]
    xf = x.reshape(b, n, -1)
    x_src = jnp.take(xf, plan.src_idx, axis=1)
    x_dst = jnp.take(xf, plan.dst_idx, axis=1)
    unm = jnp.take_along_axis(x_src, plan.unm_sel[..., None], axis=1)
    out = jnp.concatenate([unm, x_dst], axis=1)
    return out.reshape(b, out.shape[1], *trail)


def unmerge(plan: ToMePlan, y: jnp.ndarray) -> jnp.ndarray:
    """(B, N-r, C) -> (B, N, C): kept tokens return to their positions,
    each merged-away src position receives its dst token's output.
    One int32 position-map scatter + one feature gather."""
    b = y.shape[0]
    ns = plan.src_idx.shape[0]
    nd = plan.dst_idx.shape[0]
    n_unm = ns - plan.r
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]

    # src-set rows -> row index into y
    src_map = jnp.zeros((b, ns), jnp.int32)
    src_map = src_map.at[bi, plan.unm_sel].set(
        jnp.broadcast_to(jnp.arange(n_unm, dtype=jnp.int32), (b, n_unm)))
    src_map = src_map.at[bi, plan.mrg_sel].set(n_unm + plan.mrg_tgt)

    # full token ids -> row index into y
    full_map = jnp.zeros((b, plan.n), jnp.int32)
    full_map = full_map.at[:, plan.src_idx].set(src_map)
    full_map = full_map.at[:, plan.dst_idx].set(
        n_unm + jnp.arange(nd, dtype=jnp.int32)[None])
    return jnp.take_along_axis(y, full_map[..., None], axis=1)
