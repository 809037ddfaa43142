"""8-bit weight storage for the large DiT families (FLUX / SD3 / ...).

Behavior contract: the reference's FLUX engine quantizes the 12B
transformer and the T5-XXL tower to 8-bit float with optimum-quanto
(`/root/reference/modules/flux/txt2img.py:56-68 quantize_and_freeze`,
qfloat8) because FLUX does not fit consumer VRAM otherwise; the same
wall exists on a 16 GB v5e chip (12B bf16 params = 24 GB).

TPU-native design: matmul kernels are STORED as float8_e4m3fn leaves in
the params pytree with a per-output-channel `weight_scale` sibling
(quanto-qfloat8 semantics: W approx= W_q * s, s = colmax|W| / 448).
`models/layers.py Dense` casts the fp8 kernel to the compute dtype at
use — XLA fuses the convert into the matmul operand read, so weights
live in HBM at 1 byte/param and no dequantized copy is materialized —
and applies the scale to the matmul OUTPUT (exact column rescaling, a
(features,) multiply).  No model or converter changes are needed;
quantization is a load-time tree transform, and unquantized trees are
untouched (Dense reads the scale leaf only if present).

Per-channel max-abs scaling keeps every column's weights inside e4m3's
normal range (the format's subnormal zone below 2^-6 costs mantissa
bits), holding per-weight relative error at ~2^-4.6 RMS — which is also
the per-matmul output error (random-sign contractions do not average
rounding noise away); that ~2% floor is the accepted weight-only-8-bit
quality level the reference ships via quanto.

Only 2-D matmul kernels above `min_size` are cast: conv kernels (4-D,
VAE — the reference leaves the VAE unquantized too), norm scales and
biases (1-D), and embedding tables (gather sources, matched by path
substring) keep their original dtype.
"""
from __future__ import annotations

from typing import Any, Iterable, Optional, Tuple

import jax  # noqa: F401  (kept: callers tree-map over jax arrays)
import jax.numpy as jnp

E4M3_MAX = 448.0

QUANT_DTYPES = {
    "float8_e4m3": (jnp.float8_e4m3fn, 448.0),
    "float8_e5m2": (jnp.float8_e5m2, 57344.0),
    # w8a8: int8 weight storage; models/layers.py Dense detects the
    # int8 kernel dtype and switches to dynamic per-token activation
    # quantization with an s8 x s8 -> s32 MXU dot (the v5e int8 MXU
    # path peaks at 2x the bf16 rate).  Opt-in (quality grade is
    # SmoothQuant-without-calibration: ~0.4% weight rounding + dynamic
    # per-token activation rounding); float8_e4m3 stays the default.
    "int8": (jnp.int8, 127.0),
}

# Protects gather-source embedding TABLES (token/word lookup matrices).
# Deliberately specific: a bare "embed" token would also match the DiT
# families' *_embedder projection layers (x_embedder_proj,
# t_embedder_mlp, context_embedder, text_embedder_linear, ...), and a
# "pos_embed" token would match the SVD video UNet's time_pos_embed_*
# Dense MLPs — real matmul/conv kernels that SHOULD quantize.  In
# practice every in-repo table is already safe by leaf name
# (token_embedding, shared, pos_embed, positional_embedding,
# embeddings_word_embeddings_weight — none is a bare weight/kernel
# leaf); the list is belt-and-braces for future converters.
DEFAULT_EXCLUDE = ("token_embedding", "shared", "wte", "embed_tokens",
                   "word_embeddings")


def _is_mapping(x) -> bool:
    return hasattr(x, "items") and not hasattr(x, "shape")


def _walk_kernels(tree, on_kernel, *, min_size, exclude, include_convs,
                  on_other=lambda v: v):
    """Shared traversal for the quantizers: rebuilds the tree, replacing
    each quantizable kernel leaf with on_kernel(leaf) -> (stored, scale)
    — the scale lands in a '<name>_scale' sibling — and every other
    leaf with on_other(leaf)."""
    def walk(node, path):
        out = {}
        for k, v in node.items():
            key = str(k)
            if _is_mapping(v):
                out[k] = walk(v, path + "/" + key)
            elif should_quantize(key, path + "/" + key, v,
                                 min_size=min_size, exclude=exclude,
                                 include_convs=include_convs):
                q, s = on_kernel(v)
                out[k] = q
                out[key + "_scale"] = s
            else:
                out[k] = on_other(v)
        return out

    if hasattr(tree, "unfreeze"):            # FrozenDict
        tree = tree.unfreeze()
    return walk(tree, "")


def should_quantize(name: str, path: str, leaf, *, min_size: int,
                    exclude: Iterable[str],
                    include_convs: bool = False) -> bool:
    """Matmul kernels only: 2-D float 'weight' leaves of at least
    min_size elements whose path hits no exclude substring.
    include_convs additionally admits 4-D HWIO conv kernels (int8 w8a8
    only — models/layers.py Conv has no float8 branch).

    Only the 'weight' spelling is admitted: layers.py Dense/Conv read
    the scale sibling as 'weight_scale' specifically, so quantizing a
    flax-style 'kernel' leaf would store a scale nothing ever reads.
    Leaves narrower than 2 bytes/elem (float8) are already quantized —
    skipping them makes re-quantization a no-op instead of a silent
    double-quantize with a stale scale."""
    ndims = (2, 4) if include_convs else (2,)
    if getattr(leaf, "ndim", 0) not in ndims or leaf.size < min_size:
        return False
    if name != "weight":
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    if jnp.dtype(leaf.dtype).itemsize < 2:     # float8: already 8-bit
        return False
    return not any(tok in path.lower() for tok in exclude)


def quantize_params_8bit(
    params: Any,
    dtype: str = "float8_e4m3",
    min_size: int = 65536,
    exclude: Tuple[str, ...] = DEFAULT_EXCLUDE,
    include_convs: bool = False,
) -> Tuple[Any, dict]:
    """Cast matmul kernel leaves to 8-bit storage with a per-output-
    channel `weight_scale` sibling leaf.

    include_convs (int8 only) also quantizes 4-D HWIO conv kernels with
    per-output-channel scales over the (h, w, in) reduction axes — the
    w8a8 path for the conv-bound UNet families.

    Returns (new_params, report) where report counts tensors/bytes so
    callers can log the memory win (reference logs "Quantizing ... to 8
    bits", txt2img.py:126-135).
    """
    qdt, qmax = QUANT_DTYPES[dtype]
    if include_convs and not jnp.issubdtype(qdt, jnp.integer):
        raise ValueError(
            "include_convs requires dtype='int8' (Conv has no float8 "
            "branch)")
    report = {"tensors": 0, "bytes_before": 0, "bytes_after": 0,
              "dtype": dtype}

    def on_kernel(v):
        v = jnp.asarray(v)
        # per-output-channel scale; kernels are stored with the output
        # channel last ((in, out) matmul / HWIO conv).  abs/max are
        # exact in the source dtype — reduce there, cast only the tiny
        # (features,) result (no fp32 copy of a multi-GB kernel).
        red = tuple(range(v.ndim - 1))
        s = jnp.max(jnp.abs(v), axis=red).astype(jnp.float32)
        s = jnp.maximum(s / qmax, 1e-12)
        q = v.astype(jnp.float32) / s
        if jnp.issubdtype(qdt, jnp.integer):
            # astype truncates toward zero; integer codes need
            # round-to-nearest (and a clip against fp wobble)
            q = jnp.clip(jnp.round(q), -qmax, qmax)
        report["tensors"] += 1
        report["bytes_before"] += v.size * v.dtype.itemsize
        report["bytes_after"] += v.size + s.size * 4
        return q.astype(qdt), s

    return _walk_kernels(params, on_kernel, min_size=min_size,
                         exclude=exclude,
                         include_convs=include_convs), report


def quantized_zeros(shapes: Any, dtype: str = "float8_e4m3",
                    min_size: int = 65536,
                    exclude: Tuple[str, ...] = DEFAULT_EXCLUDE,
                    other_dtype: Optional[Any] = None,
                    include_convs: bool = False) -> Any:
    """Build an all-zeros params tree directly at quantized storage
    dtypes (with unit scales) from a `jax.eval_shape` tree — never
    materializes the full-precision tree (12B fp32 = 48 GB would not
    fit the chip the quantization is for).  Non-kernel leaves take
    `other_dtype` when given (e.g. bf16 for a bench) or keep their
    template dtype."""
    qdt, _ = QUANT_DTYPES[dtype]
    return _walk_kernels(
        shapes,
        lambda v: (jnp.zeros(v.shape, qdt),
                   jnp.ones((v.shape[-1],), jnp.float32)),
        on_other=lambda v: jnp.zeros(v.shape, other_dtype or v.dtype),
        min_size=min_size, exclude=exclude, include_convs=include_convs)
