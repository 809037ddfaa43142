"""Converters from diffusers checkpoint layouts to our module layouts.

The reference consumes the newer families through diffusers pipelines,
so their downloaded weights use diffusers naming. These converters remap
(and re-fuse) those state dicts into the layouts our Flax modules
flatten to.

Currently: PixArt-Σ (diffusers PixArtTransformer2DModel ->
models/pixart.py). Further families (Kandinsky decoder UNet, Cascade
stages, Hunyuan) are tracked in COVERAGE.md.
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np


def pixart_from_diffusers(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers PixArtTransformer2DModel state dict -> our PixArt layout.

    diffusers keys:
      pos_embed.proj.{weight,bias}                  -> x_embedder.proj
      adaln_single.emb.timestep_embedder.linear_1/2 -> t_embedder.mlp.0/2
      adaln_single.linear                           -> t_block.1
      caption_projection.linear_1/2                 -> y_embedder.y_proj.fc1/fc2
      transformer_blocks.N.scale_shift_table        -> blocks.N.scale_shift_table
      transformer_blocks.N.attn1.to_{q,k,v}         -> blocks.N.attn.qkv (fused)
      transformer_blocks.N.attn1.to_out.0           -> blocks.N.attn.proj
      transformer_blocks.N.attn2.to_q               -> blocks.N.cross_attn.q_linear
      transformer_blocks.N.attn2.to_{k,v}           -> blocks.N.cross_attn.kv_linear (fused)
      transformer_blocks.N.attn2.to_out.0           -> blocks.N.cross_attn.proj
      transformer_blocks.N.ff.net.0.proj            -> blocks.N.mlp.fc1
      transformer_blocks.N.ff.net.2                 -> blocks.N.mlp.fc2
      scale_shift_table                             -> final_layer.scale_shift_table
      proj_out                                      -> final_layer.linear
    """
    out: Dict[str, np.ndarray] = {}
    fuse_q: Dict[str, Dict[str, np.ndarray]] = {}

    renames = [
        (re.compile(r"^pos_embed\.proj\."), "x_embedder.proj."),
        (re.compile(r"^adaln_single\.emb\.timestep_embedder\.linear_1\."),
         "t_embedder.mlp.0."),
        (re.compile(r"^adaln_single\.emb\.timestep_embedder\.linear_2\."),
         "t_embedder.mlp.2."),
        (re.compile(r"^adaln_single\.linear\."), "t_block.1."),
        (re.compile(r"^caption_projection\.linear_1\."),
         "y_embedder.y_proj.fc1."),
        (re.compile(r"^caption_projection\.linear_2\."),
         "y_embedder.y_proj.fc2."),
        (re.compile(r"^proj_out\."), "final_layer.linear."),
    ]

    for k, v in sd.items():
        v = np.asarray(v)
        if k == "scale_shift_table":
            out["final_layer.scale_shift_table"] = v
            continue
        m = re.match(r"^transformer_blocks\.(\d+)\.(.+)$", k)
        if m:
            i, rest = m.group(1), m.group(2)
            base = f"blocks.{i}."
            if rest == "scale_shift_table":
                out[base + "scale_shift_table"] = v
            elif re.match(r"^attn1\.to_([qkv])\.(weight|bias)$", rest):
                mm = re.match(r"^attn1\.to_([qkv])\.(weight|bias)$", rest)
                fuse_q.setdefault(base + "attn.qkv." + mm.group(2), {})[
                    mm.group(1)] = v
            elif rest.startswith("attn1.to_out.0."):
                out[base + "attn.proj." + rest.split(".")[-1]] = v
            elif rest.startswith("attn2.to_q."):
                out[base + "cross_attn.q_linear." + rest.split(".")[-1]] = v
            elif re.match(r"^attn2\.to_([kv])\.(weight|bias)$", rest):
                mm = re.match(r"^attn2\.to_([kv])\.(weight|bias)$", rest)
                fuse_q.setdefault(base + "cross_attn.kv_linear." + mm.group(2),
                                  {})[mm.group(1)] = v
            elif rest.startswith("attn2.to_out.0."):
                out[base + "cross_attn.proj." + rest.split(".")[-1]] = v
            elif rest.startswith("ff.net.0.proj."):
                out[base + "mlp.fc1." + rest.split(".")[-1]] = v
            elif rest.startswith("ff.net.2."):
                out[base + "mlp.fc2." + rest.split(".")[-1]] = v
            # norms are affine-free in PixArt; skip any residual keys
            continue
        for pat, repl in renames:
            if pat.match(k):
                out[pat.sub(repl, k)] = v
                break

    # fuse q/k/v (and k/v) along the torch out-dim (rows)
    for key, parts in fuse_q.items():
        if set(parts) == {"q", "k", "v"}:
            out[key] = np.concatenate([parts["q"], parts["k"], parts["v"]],
                                      axis=0)
        elif set(parts) == {"k", "v"}:
            out[key] = np.concatenate([parts["k"], parts["v"]], axis=0)
    return out
