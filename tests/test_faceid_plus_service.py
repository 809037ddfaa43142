"""FaceID Plus CLIP-vision service: penultimate-hidden-state semantics
(HF hidden_states[-2], reference ip_adapter_faceid.py:432-447), BGR
crop parity, and the mean-image uncond."""
import jax
import jax.numpy as jnp
import numpy as np

from cremage_tpu.models.clip_vision import (
    CLIP_MEAN, CLIPVisionConfig, CLIPVisionModel,
)

TINY = CLIPVisionConfig(image_size=16, patch_size=8, width=32,
                        num_layers=3, num_heads=4, output_dim=24,
                        dtype=jnp.float32)


def test_penultimate_shape_and_last_block_invariance():
    model = CLIPVisionModel(TINY)
    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    variables = model.init(jax.random.key(1), x)  # full init: all params
    pen = model.apply(variables, x, penultimate=True)
    # 16/8 = 2 -> 4 patches + cls = 5 tokens at width
    assert pen.shape == (2, 5, 32)
    assert pen.dtype == jnp.float32
    pooled = model.apply(variables, x)
    assert pooled.shape == (2, 24)

    # hidden_states[-2]: the LAST block must not influence the output
    import flax

    params = flax.core.unfreeze(variables)["params"]
    last = f"transformer_resblocks_{TINY.num_layers - 1}"
    assert last in params
    params[last] = jax.tree.map(lambda a: a * 0 + 7.0, params[last])
    pen2 = model.apply({"params": params}, x, penultimate=True)
    np.testing.assert_array_equal(np.asarray(pen), np.asarray(pen2))
    # ...but it must influence the pooled path
    pooled2 = model.apply({"params": params}, x)
    assert np.abs(np.asarray(pooled) - np.asarray(pooled2)).max() > 1e-6


def test_weights_path_resolution(monkeypatch, tmp_path):
    from cremage_tpu.services import faceid_plus as FP

    assert FP.clip_vision_weights_path("/x/y.bin") == "/x/y.bin"
    monkeypatch.setenv("FACEID_CLIP_VISION_PATH", "/env/tower.bin")
    assert FP.clip_vision_weights_path() == "/env/tower.bin"
    monkeypatch.delenv("FACEID_CLIP_VISION_PATH")
    monkeypatch.setenv("CREMAGE_ANNOTATOR_DIR", str(tmp_path))
    local = tmp_path / FP.CLIP_VISION_FILE
    local.write_bytes(b"x")
    assert FP.clip_vision_weights_path() == str(local)


def test_clip_face_embeds_bgr_and_mean_uncond(monkeypatch):
    """The cond leg sees the BGR-swapped crop; the uncond leg sees the
    channel-mean image (zeros in normalized space)."""
    from cremage_tpu.services import faceid_plus as FP

    class FakeTower:
        """The service call is jitted (core/jitcache.py), so the fake
        must be trace-compatible: it RETURNS its input, and the test
        verifies the batch content from the (shape-preserved) output."""

        def apply(self, _vars, batch, penultimate=False):
            assert penultimate
            return batch

    monkeypatch.setattr(FP, "load_clip_tower",
                        lambda path: (FakeTower(), {}))
    monkeypatch.setattr(FP, "clip_vision_weights_path", lambda p=None: "t")

    rng = np.random.RandomState(0)
    crop = rng.rand(224, 224, 3).astype(np.float32)
    ce, uce = FP.clip_face_embeds(crop)
    np.testing.assert_allclose(ce, crop[..., ::-1], atol=1e-6)
    np.testing.assert_allclose(
        uce, np.broadcast_to(CLIP_MEAN, (224, 224, 3)), atol=1e-6)
