"""ControlNet (zero-conv hint network) in Flax.

Architecture contract: reference `modules/cldm/cldm.py` ControlNet —
a copy of the UNet encoder (input_blocks + middle_block) whose per-block
outputs pass through zero-initialized 1x1 convs; a hint network maps the
512^2 control image (canny/depth/pose...) down to latent resolution
(:182-199 strides 1,1,2,1,2,1,2,1, channels 16,16,32,32,96,96,256,mc).
The residuals are injected into the host UNet (`ControlledUnetModel`
:28: hs[i] += input_res[i], middle += middle_res) — our UNetModel's
`control` argument.

Checkpoint prefix: `control_model.` (zero_convs.{i}.0, input_hint_block.
{even indices}, middle_block_out.0). TPU note: the ControlNet runs
batched together with the CFG-doubled UNet batch inside the same jitted
scan step.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cremage_tpu.models.layers import Conv, Dense, silu, timestep_embedding
from cremage_tpu.models.unet import (
    Downsample, ResBlock, SpatialTransformer, UNetConfig, _heads_for,
)

_HINT_SPEC = [  # (out_ch_base, stride); final conv uses model_channels
    (16, 1), (16, 1), (32, 2), (32, 1), (96, 2), (96, 1), (256, 2),
]


class ControlNet(nn.Module):
    cfg: UNetConfig
    hint_channels: int = 3

    @nn.compact
    def __call__(self, x, hint, timesteps, context):
        cfg = self.cfg
        dd = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        mc = cfg.model_channels
        time_embed_dim = mc * 4

        t_emb = timestep_embedding(timesteps, mc).astype(cfg.dtype)
        emb = Dense(time_embed_dim, name="time_embed_0", **dd)(t_emb)
        emb = Dense(time_embed_dim, name="time_embed_2", **dd)(silu(emb))

        if cfg.adm_in_channels:
            raise NotImplementedError("vector-conditioned controlnet")

        # hint network: input_hint_block.{0,2,4,...,14}
        h = hint.astype(cfg.dtype)
        for i, (ch_out, stride) in enumerate(_HINT_SPEC):
            h = Conv(ch_out, stride=stride, name=f"input_hint_block_{2*i}", **dd)(h)
            h = silu(h)
        guided_hint = Conv(mc, name="input_hint_block_14", **dd)(h)

        depths = cfg.transformer_depth
        if isinstance(depths, int):
            depths = (depths,) * len(cfg.channel_mult)

        outs: List[jnp.ndarray] = []
        x = x.astype(cfg.dtype)
        context = context.astype(cfg.dtype)

        h = Conv(mc, name="input_blocks_0_0", **dd)(x) + guided_hint
        outs.append(Conv(mc, kernel_size=1, padding=0,
                         name="zero_convs_0_0", **dd)(h))
        block_idx = 1
        ds = 1
        ch = mc
        for level, mult in enumerate(cfg.channel_mult):
            out_ch = mc * mult
            for _ in range(cfg.num_res_blocks):
                h = ResBlock(out_ch, name=f"input_blocks_{block_idx}_0", **dd)(h, emb)
                ch = out_ch
                if ds in cfg.attention_resolutions:
                    heads, dim_head = _heads_for(ch, cfg)
                    h = SpatialTransformer(
                        heads, dim_head, depth=depths[level],
                        use_linear=cfg.use_linear_in_transformer,
                        name=f"input_blocks_{block_idx}_1", **dd,
                    )(h, context)
                outs.append(Conv(ch, kernel_size=1, padding=0,
                                 name=f"zero_convs_{block_idx}_0", **dd)(h))
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, name=f"input_blocks_{block_idx}_0", **dd)(h)
                outs.append(Conv(ch, kernel_size=1, padding=0,
                                 name=f"zero_convs_{block_idx}_0", **dd)(h))
                block_idx += 1
                ds *= 2

        heads, dim_head = _heads_for(ch, cfg)
        h = ResBlock(ch, name="middle_block_0", **dd)(h, emb)
        h = SpatialTransformer(
            heads, dim_head, depth=cfg.transformer_depth_middle,
            use_linear=cfg.use_linear_in_transformer, name="middle_block_1", **dd,
        )(h, context)
        h = ResBlock(ch, name="middle_block_2", **dd)(h, emb)
        middle = Conv(ch, kernel_size=1, padding=0,
                      name="middle_block_out_0", **dd)(h)
        return outs, middle


PREFIX_CONTROLNET = "control_model."
