"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.2: no DP/TP/PP anywhere); on TPU
multi-chip scaling is a first-class design instead:

- mesh axes `('data', 'model')`: batch data-parallel over `data` (the
  n_samples axis — the natural throughput axis for image generation) and
  optional tensor-parallel over `model` (attention heads / MLP columns)
  for latency on big models (SDXL/FLUX).
- Shardings are `NamedSharding(mesh, PartitionSpec(...))`; XLA/GSPMD
  inserts the ICI collectives. No explicit NCCL-style calls anywhere.
"""
from __future__ import annotations

import contextlib
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Sequence[jax.Device] | None = None,
    data: int | None = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data','model') mesh over `devices` (default: all).

    If `data` is None it absorbs all devices not used by `model`.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"data*model = {data*model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    """1x1 mesh on the default device — lets all code paths be mesh-shaped."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest.

    Latents are NHWC => axis 0 is batch for every activation tensor.
    """
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of activations with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate_params(mesh: Mesh, params):
    """Replicate a parameter pytree across the mesh (pure data parallel)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), params)


@contextlib.contextmanager
def maybe_mesh(mesh: Mesh | None):
    """Enter `mesh` as the ambient mesh if given, else no-op."""
    if mesh is None:
        yield
    else:
        with mesh:
            yield


def pad_batch_to_multiple(x, multiple: int):
    """Pad batch axis up to a multiple of the data-axis size.

    Returns (padded, real_batch). Generation batches are user-chosen
    (n_samples) and must divide the data axis for even sharding; extra
    rows are dropped after decode.
    """
    b = x.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return x, b
    pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad_width, mode="edge"), b
