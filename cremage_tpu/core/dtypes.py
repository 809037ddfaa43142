"""Dtype policy for TPU execution.

TPU-first stance: matmuls/convs run in bfloat16 on the MXU with float32
accumulation; anything numerically sensitive (sigma schedules, sampler
state, GroupNorm statistics, RoPE/timestep frequency math) stays float32.

The reference (HowToSD/cremage) casts whole models to fp16 on CUDA
(`modules/sd/image_generator.py:489` `model.half()`); on TPU bf16 has the
fp32 exponent range so no loss-scale tricks are needed.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    """Computation dtype policy threaded through every model.

    Attributes:
      param_dtype:   dtype model parameters are stored in (HBM footprint).
      compute_dtype: dtype of matmul/conv inputs (MXU native = bfloat16).
      accum_dtype:   preferred_element_type for matmul accumulation.
      sampler_dtype: sampler/sigma state dtype — always float32; sampler
                     numerics diverge visibly in bf16 across 20-50 steps.
    """

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32
    sampler_dtype: jnp.dtype = jnp.float32

    def cast_for_compute(self, x):
        return x.astype(self.compute_dtype) if hasattr(x, "astype") else x


DEFAULT_POLICY = DTypePolicy()

# Full-precision policy for parity/golden tests on CPU.
FP32_POLICY = DTypePolicy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    accum_dtype=jnp.float32,
    sampler_dtype=jnp.float32,
)
