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


def sd_unet_from_diffusers(
    sd: Mapping[str, np.ndarray],
    channel_mult=(1, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_levels=(0, 1, 2),
) -> Dict[str, np.ndarray]:
    """diffusers UNet2DConditionModel state dict -> CompVis/our layout.

    Structural mapping (same enumeration as the model builder):
      time_embedding.linear_1/2        -> time_embed.0/2
      add_embedding.linear_1/2         -> label_emb.0.0/label_emb.0.2 (SDXL)
      conv_in                          -> input_blocks.0.0
      down_blocks.L.resnets.B          -> input_blocks.{i}.0
      down_blocks.L.attentions.B       -> input_blocks.{i}.1
      down_blocks.L.downsamplers.0.conv-> input_blocks.{i}.0.op
      mid_block.resnets.0/1            -> middle_block.0/2
      mid_block.attentions.0           -> middle_block.1
      up_blocks.L.resnets.B            -> output_blocks.{i}.0
      up_blocks.L.attentions.B         -> output_blocks.{i}.1
      up_blocks.L.upsamplers.0.conv    -> output_blocks.{i}.{1|2}.conv
      conv_norm_out / conv_out         -> out.0 / out.2
    Resnet internals: norm1->in_layers.0, conv1->in_layers.2,
    time_emb_proj->emb_layers.1, norm2->out_layers.0, conv2->out_layers.3,
    conv_shortcut->skip_connection.
    """
    out: Dict[str, np.ndarray] = {}
    res_map = [
        ("norm1.", "in_layers.0."), ("conv1.", "in_layers.2."),
        ("time_emb_proj.", "emb_layers.1."), ("norm2.", "out_layers.0."),
        ("conv2.", "out_layers.3."), ("conv_shortcut.", "skip_connection."),
    ]

    def put_resnet(src_prefix: str, dst_prefix: str):
        for ds, cs in res_map:
            for leaf in ("weight", "bias"):
                k = src_prefix + ds + leaf
                if k in sd:
                    out[dst_prefix + cs + leaf] = np.asarray(sd[k])

    def put_verbatim(src_prefix: str, dst_prefix: str):
        for k, v in sd.items():
            if k.startswith(src_prefix):
                out[dst_prefix + k[len(src_prefix):]] = np.asarray(v)

    for k in ("conv_in.weight", "conv_in.bias"):
        if k in sd:
            out["input_blocks.0.0." + k.split(".")[-1]] = np.asarray(sd[k])
    for a, b in (("time_embedding.linear_1.", "time_embed.0."),
                 ("time_embedding.linear_2.", "time_embed.2."),
                 ("add_embedding.linear_1.", "label_emb.0.0."),
                 ("add_embedding.linear_2.", "label_emb.0.2."),
                 ("conv_norm_out.", "out.0."), ("conv_out.", "out.2.")):
        put_verbatim(a, b)

    n_levels = len(channel_mult)
    idx = 1
    for level in range(n_levels):
        for b in range(num_res_blocks):
            put_resnet(f"down_blocks.{level}.resnets.{b}.",
                       f"input_blocks.{idx}.0.")
            if level in attention_levels:
                put_verbatim(f"down_blocks.{level}.attentions.{b}.",
                             f"input_blocks.{idx}.1.")
            idx += 1
        if level != n_levels - 1:
            put_verbatim(f"down_blocks.{level}.downsamplers.0.conv.",
                         f"input_blocks.{idx}.0.op.")
            idx += 1

    put_resnet("mid_block.resnets.0.", "middle_block.0.")
    put_verbatim("mid_block.attentions.0.", "middle_block.1.")
    put_resnet("mid_block.resnets.1.", "middle_block.2.")

    idx = 0
    for pos, level in enumerate(reversed(range(n_levels))):
        for b in range(num_res_blocks + 1):
            put_resnet(f"up_blocks.{pos}.resnets.{b}.",
                       f"output_blocks.{idx}.0.")
            has_attn = level in attention_levels
            if has_attn:
                put_verbatim(f"up_blocks.{pos}.attentions.{b}.",
                             f"output_blocks.{idx}.1.")
            if level > 0 and b == num_res_blocks:
                sub = 2 if has_attn else 1
                put_verbatim(f"up_blocks.{pos}.upsamplers.0.conv.",
                             f"output_blocks.{idx}.{sub}.conv.")
            idx += 1
    return out


def sd_vae_from_diffusers(sd: Mapping[str, np.ndarray],
                          num_levels: int = 4,
                          num_res_blocks: int = 2) -> Dict[str, np.ndarray]:
    """diffusers AutoencoderKL -> CompVis first_stage layout (encoder
    down_blocks->down.N.block, mid_block->mid.block_1/attn_1/block_2,
    decoder up_blocks reversed->up.N.block; attention linear (C,C)
    weights reshaped to the CompVis (C,C,1,1) convs)."""
    out: Dict[str, np.ndarray] = {}
    res_map = [("norm1.", "norm1."), ("conv1.", "conv1."),
               ("norm2.", "norm2."), ("conv2.", "conv2."),
               ("conv_shortcut.", "nin_shortcut.")]
    attn_map = [("group_norm.", "norm."), ("to_q.", "q."), ("to_k.", "k."),
                ("to_v.", "v."), ("to_out.0.", "proj_out.")]

    def put(src: str, dst: str, reshape_attn: bool = False):
        for k, v in sd.items():
            if not k.startswith(src):
                continue
            arr = np.asarray(v)
            if reshape_attn and arr.ndim == 2 and k.endswith("weight"):
                arr = arr[:, :, None, None]  # linear -> 1x1 conv OIHW
            out[dst + k[len(src):]] = arr

    for side in ("encoder", "decoder"):
        put(f"{side}.conv_in.", f"{side}.conv_in.")
        put(f"{side}.conv_norm_out.", f"{side}.norm_out.")
        put(f"{side}.conv_out.", f"{side}.conv_out.")
        for a, b in res_map:
            put(f"{side}.mid_block.resnets.0.{a}", f"{side}.mid.block_1.{b}")
            put(f"{side}.mid_block.resnets.1.{a}", f"{side}.mid.block_2.{b}")
        for a, b in attn_map:
            put(f"{side}.mid_block.attentions.0.{a}",
                f"{side}.mid.attn_1.{b}", reshape_attn=True)

    for lv in range(num_levels):
        for b in range(num_res_blocks):
            for a, c in res_map:
                put(f"encoder.down_blocks.{lv}.resnets.{b}.{a}",
                    f"encoder.down.{lv}.block.{b}.{c}")
        put(f"encoder.down_blocks.{lv}.downsamplers.0.conv.",
            f"encoder.down.{lv}.downsample.conv.")
    for pos in range(num_levels):
        level = num_levels - 1 - pos  # diffusers up_blocks are reversed
        for b in range(num_res_blocks + 1):
            for a, c in res_map:
                put(f"decoder.up_blocks.{pos}.resnets.{b}.{a}",
                    f"decoder.up.{level}.block.{b}.{c}")
        put(f"decoder.up_blocks.{pos}.upsamplers.0.conv.",
            f"decoder.up.{level}.upsample.conv.")

    put("quant_conv.", "quant_conv.")
    put("post_quant_conv.", "post_quant_conv.")
    return out


def kandinsky_prior_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """diffusers PriorTransformer state dict -> our DiffusionPrior layout
    (models/kandinsky.py; reference consumes this checkpoint through
    AutoPipeline in modules/kandinsky/txt2img.py:26,66).

    diffusers keys:
      time_embedding.linear_1/2           -> time_embedding.linear_1/2
      proj_in                             -> image_embed_proj
      embedding_proj                      -> pooled_proj
      encoder_hidden_states_proj          -> text_proj
      positional_embedding (1,N,C)        -> positional_embedding (N,C)
      prd_embedding (1,1,C)               -> prd_embedding
      transformer_blocks.N.norm1          -> blocks.N.ln_1
      transformer_blocks.N.attn1.to_{q,k,v} -> blocks.N.{q,k,v}_proj
      transformer_blocks.N.attn1.to_out.0 -> blocks.N.out_proj
      transformer_blocks.N.norm3          -> blocks.N.ln_2
      transformer_blocks.N.ff.net.0.proj  -> blocks.N.mlp_fc
      transformer_blocks.N.ff.net.2       -> blocks.N.mlp_proj
      norm_out                            -> final_ln
      proj_to_clip_embeddings             -> out_proj
      clip_mean / clip_std (buffers)      -> clip_mean / clip_std (aux;
        the pipeline unnormalizes prior outputs with these)
    """
    out: Dict[str, np.ndarray] = {}
    block_map = [
        ("norm1.", "ln_1."), ("attn1.to_q.", "q_proj."),
        ("attn1.to_k.", "k_proj."), ("attn1.to_v.", "v_proj."),
        ("attn1.to_out.0.", "out_proj."), ("norm3.", "ln_2."),
        ("ff.net.0.proj.", "mlp_fc."), ("ff.net.2.", "mlp_proj."),
    ]
    top_map = [
        ("time_embedding.linear_1.", "time_embedding.linear_1."),
        ("time_embedding.linear_2.", "time_embedding.linear_2."),
        ("proj_in.", "image_embed_proj."),
        ("embedding_proj.", "pooled_proj."),
        ("encoder_hidden_states_proj.", "text_proj."),
        ("norm_out.", "final_ln."),
        ("proj_to_clip_embeddings.", "out_proj."),
    ]
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "positional_embedding":
            out[k] = v[0] if v.ndim == 3 else v
            continue
        if k in ("prd_embedding", "clip_mean", "clip_std"):
            out[k] = v
            continue
        m = re.match(r"^transformer_blocks\.(\d+)\.(.+)$", k)
        if m:
            i, rest = m.group(1), m.group(2)
            for src, dst in block_map:
                if rest.startswith(src):
                    out[f"blocks.{i}.{dst}{rest[len(src):]}"] = v
                    break
            continue
        for src, dst in top_map:
            if k.startswith(src):
                out[dst + k[len(src):]] = v
                break
    return out


def kandinsky_image_conditioner_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Image-embed heads of the diffusers Kandinsky decoder UNet ->
    models/kandinsky.py KandinskyImageConditioner layout:

      add_embedding.image_proj / image_norm -> image_proj / image_norm
      encoder_hid_proj.image_embeds / norm  -> context_proj / context_norm

    (The decoder UNet *body* uses simple-attention / scale-shift resnet
    blocks in diffusers — its body map is tracked in COVERAGE.md.)
    """
    out: Dict[str, np.ndarray] = {}
    for src, dst in (
        ("add_embedding.image_proj.", "image_proj."),
        ("add_embedding.image_norm.", "image_norm."),
        ("encoder_hid_proj.image_embeds.", "context_proj."),
        ("encoder_hid_proj.norm.", "context_norm."),
    ):
        for k, v in sd.items():
            if k.startswith(src):
                out[dst + k[len(src):]] = np.asarray(v)
    return out


def kandinsky_decoder_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> tuple:
    """diffusers Kandinsky 2.2 decoder UNet state dict -> (body, heads).

    The body keys load verbatim into models/kandinsky_decoder.py
    (module names were chosen to flatten to the diffusers key strings:
    down_blocks.N.resnets.M.conv1, ...attentions.M.add_k_proj,
    ...downsamplers.0.<resnet leaves>, mid_block.*, conv_norm_out, ...).
    The add_embedding / encoder_hid_proj heads go to
    KandinskyImageConditioner via kandinsky_image_conditioner_from_
    diffusers. Any attention norm_cross keys are left in the body dict
    and surface in build_flax_params' `unused` report.
    """
    cond = kandinsky_image_conditioner_from_diffusers(sd)
    body = {
        k: np.asarray(v) for k, v in sd.items()
        if not k.startswith(("add_embedding.", "encoder_hid_proj."))
    }
    return body, cond


def cascade_unet_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """diffusers StableCascadeUNet (Stage C or B) -> models/cascade.py
    StageC/StageB layout.

    The leaf names match by construction (depthwise.*, channelwise.0/2/4,
    mapper/mapper_<cond>, kv_mapper.1, attention.to_{q,k,v}/to_out.0,
    embedding.1, clip_*_mapper, clf.1, down/up scaler convs). The only
    structural difference: diffusers stores each level as ONE flat list
    of mixed block types (down_blocks.{lv}.{j}) while we group them as
    (res, time, attn) triples (down_blocks.{lv}.{i}._{role}). Blocks are
    classified by their leaves (depthwise -> res, mapper -> time,
    kv_mapper/attention -> attn) and renumbered per level in encounter
    order — a new group starts at each res block, so levels without
    attention (Stage B's narrow levels) renumber correctly too.
    """
    out: Dict[str, np.ndarray] = {}
    # collect per-(side, level) the flat block indices and their keys
    blocks: Dict[tuple, Dict[int, Dict[str, np.ndarray]]] = {}
    for k, v in sd.items():
        m = re.match(r"^(down_blocks|up_blocks)\.(\d+)\.(\d+)\.(.+)$", k)
        if m:
            side, lv, j, rest = (m.group(1), int(m.group(2)),
                                 int(m.group(3)), m.group(4))
            blocks.setdefault((side, lv), {}).setdefault(j, {})[rest] = v
            continue
        m = re.match(r"^(down_downscalers|up_upscalers)\.(\d+)\.(.+)$", k)
        if m:
            side = ("downscalers" if m.group(1).startswith("down")
                    else "upscalers")
            out[f"{side}.{m.group(2)}.{m.group(3)}"] = np.asarray(v)
            continue
        # embedding.1 / clf.1 / clip_*_mapper / effnet mappers: verbatim
        out[k] = np.asarray(v)

    def role_of(leaves) -> str:
        if any(l.startswith("depthwise") or l.startswith("channelwise")
               for l in leaves):
            return "res"
        if any(l.startswith("mapper") for l in leaves):
            return "time"
        return "attn"

    for (side, lv), jmap in blocks.items():
        group = -1
        for j in sorted(jmap):
            leaves = jmap[j]
            role = role_of(leaves)
            if role == "res":
                group += 1
            for leaf, v in leaves.items():
                out[f"{side}.{lv}.{max(group, 0)}.{role}.{leaf}"] = \
                    np.asarray(v)
    return out


def movq_decoder_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """diffusers VQModel (norm_type='spatial', Kandinsky MoVQ) ->
    models/vq.py MoVQDecoder (+ 'quantize.embedding' codebook /
    'post_quant_conv' passthrough). Decoder module names flatten to the
    diffusers decoder.* strings, so this is a prefix strip plus the
    to_out.0 attention leaf."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("decoder."):
            out[k[len("decoder."):]] = np.asarray(v)
        elif k == "quantize.embedding.weight":
            out["quantize.embedding"] = np.asarray(v)
        elif k.startswith("post_quant_conv."):
            out[k] = np.asarray(v)
    return out


def hunyuan_from_diffusers(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """diffusers HunyuanDiT2DModel state dict -> our HunyuanDiT layout
    (models/hunyuan.py; the reference consumes this checkpoint through
    HunyuanDiTPipeline, modules/hunyuan_dit/txt2img.py).

    diffusers keys:
      pos_embed.proj                         -> x_embedder.proj
      time_extra_emb.timestep_embedder.linear_1/2 -> t_embedder.mlp_0/2
      time_extra_emb.pooler.positional_embedding  -> pooler.positional_embedding
      time_extra_emb.pooler.{q,k,v,c}_proj   -> pooler.{q,k,v,c}_proj
      time_extra_emb.extra_embedder.linear_1/2 -> extra_embedder.fc1/fc2
      text_embedder.linear_1/2               -> text_embedder.linear_1/2
      text_embedding_padding                 -> text_embedding_padding
      blocks.N.norm1.norm                    -> blocks.N.norm1
      blocks.N.norm1.linear                  -> blocks.N.default_modulation_1
      blocks.N.attn1.to_{q,k,v}              -> blocks.N.attn1_qkv (fused)
      blocks.N.attn1.norm_{q,k}              -> blocks.N.attn1_{q,k}_norm
      blocks.N.attn1.to_out.0                -> blocks.N.attn1_proj
      blocks.N.attn2.to_q                    -> blocks.N.attn2_q
      blocks.N.attn2.to_{k,v}                -> blocks.N.attn2_kv (fused)
      blocks.N.attn2.norm_{q,k}              -> blocks.N.attn2_{q,k}_norm
      blocks.N.attn2.to_out.0                -> blocks.N.attn2_proj
      blocks.N.norm2/norm3, ff.net.0.proj/ff.net.2, skip_norm/skip_linear
                                             -> same names / mlp_fc1/fc2
      norm_out.linear                        -> final_adaLN_1
      proj_out                               -> final_linear
    """
    out: Dict[str, np.ndarray] = {}
    fuse: Dict[str, Dict[str, np.ndarray]] = {}
    top = [
        ("pos_embed.proj.", "x_embedder.proj."),
        ("time_extra_emb.timestep_embedder.linear_1.", "t_embedder.mlp_0."),
        ("time_extra_emb.timestep_embedder.linear_2.", "t_embedder.mlp_2."),
        ("time_extra_emb.pooler.", "pooler."),
        ("time_extra_emb.extra_embedder.linear_1.", "extra_embedder.fc1."),
        ("time_extra_emb.extra_embedder.linear_2.", "extra_embedder.fc2."),
        ("text_embedder.linear_1.", "text_embedder.linear_1."),
        ("text_embedder.linear_2.", "text_embedder.linear_2."),
        ("norm_out.linear.", "final_adaLN_1."),
        ("proj_out.", "final_linear."),
    ]
    blk = [
        ("norm1.norm.", "norm1."),
        ("norm1.linear.", "default_modulation_1."),
        ("attn1.norm_q.", "attn1_q_norm."),
        ("attn1.norm_k.", "attn1_k_norm."),
        ("attn1.to_out.0.", "attn1_proj."),
        ("attn2.to_q.", "attn2_q."),
        ("attn2.norm_q.", "attn2_q_norm."),
        ("attn2.norm_k.", "attn2_k_norm."),
        ("attn2.to_out.0.", "attn2_proj."),
        ("norm2.", "norm2."),
        ("norm3.", "norm3."),
        ("ff.net.0.proj.", "mlp_fc1."),
        ("ff.net.2.", "mlp_fc2."),
        ("skip_norm.", "skip_norm."),
        ("skip_linear.", "skip_linear."),
    ]
    for k, v in sd.items():
        v = np.asarray(v)
        if k == "text_embedding_padding":
            out[k] = v
            continue
        m = re.match(r"^blocks\.(\d+)\.(.+)$", k)
        if m:
            i, rest = m.group(1), m.group(2)
            base = f"blocks.{i}."
            mm = re.match(r"^attn1\.to_([qkv])\.(weight|bias)$", rest)
            if mm:
                fuse.setdefault(base + "attn1_qkv." + mm.group(2),
                                {})[mm.group(1)] = v
                continue
            mm = re.match(r"^attn2\.to_([kv])\.(weight|bias)$", rest)
            if mm:
                fuse.setdefault(base + "attn2_kv." + mm.group(2),
                                {})[mm.group(1)] = v
                continue
            for src, dst in blk:
                if rest.startswith(src):
                    out[base + dst + rest[len(src):]] = v
                    break
            continue
        for src, dst in top:
            if k.startswith(src):
                out[dst + k[len(src):]] = v
                break
    for key, parts in fuse.items():
        if set(parts) == {"q", "k", "v"}:
            out[key] = np.concatenate([parts["q"], parts["k"], parts["v"]],
                                      axis=0)
        elif set(parts) == {"k", "v"}:
            out[key] = np.concatenate([parts["k"], parts["v"]], axis=0)
    return out


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


def paella_vq_decoder_from_diffusers(
    sd: Mapping[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """diffusers PaellaVQModel -> models/vq.py PaellaVQDecoder (decode
    path; Stable Cascade Stage A — the reference decodes Stage B
    latents through it in StableCascadeDecoderPipeline,
    modules/stable_cascade/txt2img.py).  Decoder module names flatten to
    the diffusers up_blocks/out_block strings, so this is a subset
    filter; the encoder/vquantizer keys are dropped (the reference's
    Cascade module is txt2img-only, so only decode is exercised)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("up_blocks.") or k.startswith("out_block."):
            out[k] = np.asarray(v)
    return out
