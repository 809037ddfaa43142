"""Image safety checker tests.

Tower+projection: random-weight parity vs transformers torch
CLIPVisionModelWithProjection (diffusers' checker wraps exactly this
tower; diffusers itself is not installed here). Concept logic: numpy
oracle of the documented diffusers scoring. End-to-end: flagged images
swap to the replacement through ImageSafetyChecker.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.safety_checker import (
    SafetyCheckerConfig, StableDiffusionSafetyChecker,
    load_safety_classifier, preprocess_images01,
)

torch = pytest.importorskip("torch")

TINY = SafetyCheckerConfig(image_size=56, patch_size=14, hidden_size=32,
                           num_layers=2, num_heads=4, intermediate_size=48,
                           projection_dim=16, n_concepts=5, n_special=2)


def _hf_tower(seed=0):
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection as HFModel

    cfg = HFConfig(image_size=56, patch_size=14, hidden_size=32,
                   num_hidden_layers=2, num_attention_heads=4,
                   intermediate_size=48, projection_dim=16,
                   hidden_act="quick_gelu", attention_dropout=0.0)
    torch.manual_seed(seed)
    return HFModel(cfg).eval()


def _checker_sd(hf, rng):
    """Assemble a checker state dict: HF tower under the double
    vision_model prefix + synthetic concept tables."""
    sd = {}
    for k, v in hf.state_dict().items():
        if k.startswith("vision_model."):
            sd["vision_model." + k] = v.numpy()
        else:
            sd[k] = v.numpy()
    sd["concept_embeds"] = rng.normal(size=(5, 16)).astype(np.float32)
    sd["special_care_embeds"] = rng.normal(size=(2, 16)).astype(np.float32)
    # thresholds high enough that random images never flag (random
    # 16-d cosines are ~N(0, 0.25)); the flag test plants concept 0
    sd["concept_embeds_weights"] = rng.uniform(
        0.95, 0.99, (5,)).astype(np.float32)
    sd["special_care_embeds_weights"] = rng.uniform(
        0.95, 0.99, (2,)).astype(np.float32)
    return sd


def test_tower_and_scores_parity():
    hf = _hf_tower()
    rng = np.random.RandomState(1)
    sd = _checker_sd(hf, rng)

    model = StableDiffusionSafetyChecker(TINY)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 56, 56, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    x = rng.uniform(-2, 2, (3, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        emb = hf(pixel_values=torch.tensor(
            x.transpose(0, 3, 1, 2))).image_embeds.numpy()

    # numpy oracle of the diffusers cosine/threshold logic
    def _norm(a):
        return a / np.linalg.norm(a, axis=-1, keepdims=True)

    special_cos = _norm(emb) @ _norm(sd["special_care_embeds"]).T
    concept_cos = _norm(emb) @ _norm(sd["concept_embeds"]).T
    want_special = special_cos - sd["special_care_embeds_weights"]
    adj = (want_special > 0).any(-1, keepdims=True) * 0.01
    want_concept = concept_cos - sd["concept_embeds_weights"] + adj

    got_concept, got_special = model.apply({"params": params},
                                           jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_special), want_special,
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_concept), want_concept,
                               atol=2e-5, rtol=2e-5)


def test_preprocess_matches_hf_extractor():
    pytest.importorskip("transformers")
    from transformers import CLIPImageProcessor
    from PIL import Image

    proc = CLIPImageProcessor(size={"shortest_edge": 224},
                              crop_size={"height": 224, "width": 224})
    # smooth image: PIL and cv2 bicubic agree closely away from noise
    yy, xx = np.mgrid[0:300, 0:260].astype(np.float32)
    img = np.stack([xx / 260 * 255, yy / 300 * 255,
                    (xx + yy) / 560 * 255], -1).astype(np.uint8)
    want = proc(Image.fromarray(img), return_tensors="np"
                )["pixel_values"][0].transpose(1, 2, 0)
    got = preprocess_images01(img.astype(np.float32) / 255.0)[0]
    assert got.shape == want.shape == (224, 224, 3)
    assert np.abs(got - want).mean() < 0.02


def test_flagged_image_swaps_to_replacement(tmp_path):
    from safetensors.numpy import save_file

    from cremage_tpu.services.safety import ImageSafetyChecker

    hf = _hf_tower(seed=2)
    rng = np.random.RandomState(3)
    sd = _checker_sd(hf, rng)
    # force a guaranteed flag: make concept 0 = a real image embedding
    x_bad = rng.uniform(0, 1, (224, 224, 3)).astype(np.float32)
    x_ok = np.zeros((224, 224, 3), np.float32)
    from cremage_tpu.models.safety_checker import preprocess_images01 as pp
    with torch.no_grad():
        embs = hf(pixel_values=torch.tensor(
            pp(np.stack([x_bad, x_ok]),
               size=56).transpose(0, 3, 1, 2))).image_embeds.numpy()
    nrm = embs / np.linalg.norm(embs, axis=-1, keepdims=True)
    cos_ok_bad = float(nrm[1] @ nrm[0])
    sd["concept_embeds"][0] = nrm[0]
    # threshold between cos(ok,bad) and cos(bad,bad)=1: bad flags, ok not
    sd["concept_embeds_weights"][0] = (cos_ok_bad + 1.0) / 2.0
    path = str(tmp_path / "safety.safetensors")
    save_file(sd, path)

    classifier = load_safety_classifier(path, TINY)
    replacement = np.full((8, 8, 3), 0.5, np.float32)
    checker = ImageSafetyChecker(classifier=classifier,
                                 replacement=replacement)
    out, flags = checker.check(np.stack([x_bad, x_ok]))
    assert flags[0] is True
    assert np.allclose(out[0], 0.5)          # replaced
    assert np.allclose(out[1], x_ok)          # untouched
