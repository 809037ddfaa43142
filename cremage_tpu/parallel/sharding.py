"""Multi-chip sharding strategies.

The reference has no distributed runtime (SURVEY.md §2.2); this is a
fresh TPU-native design over the ('data','model') ICI mesh:

- **data parallel** (default throughput axis): batch-axis sharding of
  latents/conditioning, replicated params — core/mesh.py helpers;
- **tensor parallel** (latency axis for SDXL/FLUX-class models):
  attention heads and MLP columns sharded over 'model' via GSPMD —
  qkv/ff-in kernels column-sharded, out-proj/ff-out kernels row-sharded,
  convs/norms replicated. XLA inserts the all-reduces; there is no
  hand-written collective in the model code.

Apply `shard_params_tp(mesh, params)` to any of our Flax param trees; the
rules match parameters by path name so they cover UNet, MMDiT, FLUX and
the text towers uniformly.
"""
from __future__ import annotations

import logging
import re
from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cremage_tpu.core.mesh import DATA_AXIS, MODEL_AXIS

logger = logging.getLogger(__name__)

# param-name patterns, matched against the full '/'-joined param path
_COL_SHARD = re.compile(
    r"(to_q|to_k|to_v|to_k_ipa|to_v_ipa|q_proj|k_proj|v_proj|net_0_proj|"
    r"mlp_fc1|attn_qkv|qkv|linear1|img_attn_qkv|txt_attn_qkv|img_mlp_0|"
    r"txt_mlp_0|cross_attn_q_linear|cross_attn_kv_linear|wi_0|wi_1|"
    r"emb_layers_1)/weight$"
)
_ROW_SHARD = re.compile(
    r"(to_out_0|out_proj|net_2|mlp_fc2|attn_proj|proj|linear2|"
    r"img_attn_proj|txt_attn_proj|img_mlp_2|txt_mlp_2|cross_attn_proj|wo)"
    r"/weight$"
)
# conv channel sharding (HWIO kernels).  Producer convs shard the
# output-channel axis; the consumer conv of the pair shards its
# input-channel axis (partial sums -> GSPMD all-reduce):
#   UNet ResBlock: in_layers_2 (O) -> out_layers_3 (I), with the
#   emb_layers_1 Dense column-sharded to match the intermediate;
#   VAE ResnetBlock: conv1 (O) -> conv2 (I);
#   VAE mid-block AttnBlock: q/k/v 1x1 convs (O) -> proj_out (I).
_CONV_OUT_SHARD = re.compile(
    r"(in_layers_2|conv1|mid_attn_\d+/(q|k|v))/weight$"
)
_CONV_IN_SHARD = re.compile(
    r"(out_layers_3|conv2|mid_attn_\d+/proj_out)/weight$"
)


def tp_spec_for(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter under tensor parallelism."""
    name = "/".join(path)
    if leaf.ndim == 2:
        if _COL_SHARD.search(name):
            return P(None, MODEL_AXIS)
        if _ROW_SHARD.search(name):
            return P(MODEL_AXIS, None)
    if leaf.ndim == 4:
        if _CONV_OUT_SHARD.search(name):
            return P(None, None, None, MODEL_AXIS)
        if _CONV_IN_SHARD.search(name):
            return P(None, None, MODEL_AXIS, None)
    if leaf.ndim == 1 and (
        _COL_SHARD.search(name.replace("/bias", "/weight"))
        or _CONV_OUT_SHARD.search(name.replace("/bias", "/weight"))
    ):
        # bias of a column/out-channel-sharded layer follows its dim
        return P(MODEL_AXIS)
    return P()  # replicate


def shard_params_tp(mesh: Mesh, params):
    """Place a param tree with tensor-parallel shardings over `mesh`."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    placed = []
    for (path, leaf) in flat[0]:
        keys = tuple(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = tp_spec_for(keys, leaf)
        try:
            placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
        except ValueError:
            # dims not divisible by the axis: fall back to replication
            placed.append(jax.device_put(leaf, NamedSharding(mesh, P())))
    return jax.tree_util.tree_unflatten(treedef, placed)


def count_sharded(params, mesh: Mesh) -> Tuple[int, int]:
    """(n_model_sharded, n_total) — introspection for tests/telemetry."""
    n_sharded = n_total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n_total += 1
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding) and MODEL_AXIS in jax.tree_util.tree_leaves(
            tuple(s for s in sh.spec if s is not None)
        ):
            n_sharded += 1
    return n_sharded, n_total
