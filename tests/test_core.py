import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cremage_tpu.core import config as cfg
from cremage_tpu.core import mesh as meshlib
from cremage_tpu.core import rng
from cremage_tpu.core.registry import Registry


def test_mesh_shapes(mesh8, mesh_4x2):
    assert mesh8.devices.shape == (8, 1)
    assert mesh8.axis_names == ("data", "model")
    assert mesh_4x2.devices.shape == (4, 2)


def test_data_sharding_shards_batch(mesh8):
    x = jnp.zeros((8, 4, 4, 4))
    xs = jax.device_put(x, meshlib.data_sharding(mesh8))
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(1, 4, 4, 4)}


def test_replicate_params(mesh8):
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    rep = meshlib.replicate_params(mesh8, params)
    assert rep["w"].sharding.spec == P()
    assert len(rep["w"].addressable_shards) == 8


def test_pad_batch_to_multiple():
    x = np.ones((3, 2))
    padded, real = meshlib.pad_batch_to_multiple(x, 8)
    assert padded.shape == (8, 2) and real == 3
    padded2, real2 = meshlib.pad_batch_to_multiple(np.ones((8, 2)), 8)
    assert padded2.shape == (8, 2) and real2 == 8


def test_seed_semantics():
    assert rng.resolve_seed(42) == 42
    assert rng.resolve_seed(-1) >= 0
    assert rng.resolve_seed(None) >= 0
    # per-image key = seed + i, reproducible
    k0 = rng.key_for_image(100, 0)
    k3 = rng.key_for_image(100, 3)
    k3b = rng.key_for_image(103, 0)
    n3 = rng.noise_like(k3, (2, 2))
    n3b = rng.noise_like(k3b, (2, 2))
    assert np.allclose(n3, n3b)
    assert not np.allclose(rng.noise_like(k0, (2, 2)), n3)


def test_noise_dtype_invariance():
    k = rng.key_for_image(7)
    a = rng.noise_like(k, (4, 4), jnp.bfloat16)
    b = rng.noise_like(k, (4, 4), jnp.float32)
    assert a.dtype == jnp.bfloat16
    assert np.allclose(np.asarray(b, np.float32), np.asarray(a, np.float32), atol=0.01)


def test_registry():
    r = Registry("thing")

    @r.register("a")
    def a():
        return 1

    assert r.get("a") is a
    assert "a" in r and "b" not in r
    with pytest.raises(KeyError):
        r.get("b")


def test_preferences_roundtrip(tmp_path):
    p = tmp_path / "config.yaml"
    prefs = cfg.load_preferences(str(p))  # creates defaults
    assert p.exists()
    assert prefs.sampling_steps == 50 and prefs.cfg == 7.5
    prefs2 = dataclasses.replace(prefs, cfg=3.0, sampler="Euler A")
    cfg.save_preferences(prefs2, str(p))
    prefs3 = cfg.load_preferences(str(p))
    assert prefs3.cfg == 3.0 and prefs3.sampler == "Euler A"


def test_generation_options_json_roundtrip():
    o = cfg.GenerationOptions(prompt="a cat", seed=5, sampler="Euler A")
    s = o.to_json()
    o2 = cfg.GenerationOptions.from_json(s)
    assert o2 == o


def test_override_options_replay():
    o = cfg.GenerationOptions(prompt="new", seed=1, scale=7.5)
    past = json.dumps({"prompt": "old", "seed": 99, "scale": 3.0})
    replayed = cfg.override_options(o, past)
    assert replayed.prompt == "old" and replayed.seed == 99
    kept = cfg.override_options(o, past, preserve=["prompt"])
    assert kept.prompt == "new" and kept.seed == 99


def test_options_unknown_keys_go_to_extra():
    o = cfg.GenerationOptions.from_dict({"prompt": "x", "future_flag": 1})
    assert o.prompt == "x" and o.extra["future_flag"] == 1
