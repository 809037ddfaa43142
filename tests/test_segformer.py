"""SegFormer tests: random-weight differential parity vs the HF torch
implementation (the clothes parser the reference loads via
transformers, tools/image_segmenter.py:32), plus the seg annotator and
segmentation-inpainting mask end to end.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cremage_tpu.io import checkpoint as CK
from cremage_tpu.models.segformer import (
    SegformerConfig, SegformerModel, SegformerSegmenter,
)

torch = pytest.importorskip("torch")

TINY = SegformerConfig(dims=(8, 16, 24, 32), heads=(1, 2, 3, 4),
                       blocks=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1),
                       decoder_dim=16, num_classes=18)
# b0-ADE geometry at reduced width: the 150-class head the ControlNet
# 'seg' role runs (nvidia/segformer-b0-finetuned-ade-512-512 layout)
TINY_ADE = SegformerConfig(dims=(8, 16, 24, 32), heads=(1, 2, 3, 4),
                           blocks=(2, 2, 2, 2), sr_ratios=(8, 4, 2, 1),
                           decoder_dim=16, num_classes=150)


def _hf_model(seed=0, cfg=TINY):
    from transformers import SegformerConfig as HFConfig
    from transformers import SegformerForSemanticSegmentation as HFModel

    hf_cfg = HFConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(cfg.blocks),
        sr_ratios=list(cfg.sr_ratios), hidden_sizes=list(cfg.dims),
        num_attention_heads=list(cfg.heads),
        decoder_hidden_size=cfg.decoder_dim,
        num_labels=cfg.num_classes, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(seed)
    return HFModel(hf_cfg).eval()


@pytest.mark.parametrize("cfg", [TINY, TINY_ADE],
                         ids=["clothes18", "ade150"])
def test_segformer_parity_with_transformers(cfg):
    hf = _hf_model(cfg=cfg)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    model = SegformerModel(cfg)
    tmpl = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    params, missing, unused = CK.build_flax_params(tmpl, sd, prefix="")
    assert not missing, missing
    assert not unused, unused

    rng = np.random.RandomState(1)
    x = rng.uniform(-2, 2, (1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.tensor(
            x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == (1, 16, 16, cfg.num_classes)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=5e-5, rtol=5e-5)


def test_ade_palette_is_the_published_one():
    """Classes 0..149 must use the mmseg ADE20K colors (what
    ControlNet-seg was trained on), not arbitrary stable colors."""
    from cremage_tpu.models.segformer import ade_palette

    pal = ade_palette()
    assert pal.shape == (256, 3)
    np.testing.assert_array_equal(pal[0], [120, 120, 120])   # wall
    np.testing.assert_array_equal(pal[1], [180, 120, 120])   # building
    np.testing.assert_array_equal(pal[2], [6, 230, 230])     # sky
    np.testing.assert_array_equal(pal[12], [150, 5, 61])     # person
    np.testing.assert_array_equal(pal[149], [92, 0, 255])


def test_seg_annotator_emits_ade_colors(tmp_path):
    """annotate('seg', img) output pixels are all rows of the ADE
    palette (VERDICT r2 item 2 done-criterion)."""
    from safetensors.numpy import save_file

    from cremage_tpu.models.segformer import ade_palette
    from cremage_tpu.services.annotators import annotate

    hf = _hf_model(seed=4, cfg=TINY_ADE)
    path = str(tmp_path / "segformer_ade.safetensors")
    save_file({k: v.numpy() for k, v in hf.state_dict().items()}, path)

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (64, 48, 3), np.uint8)
    seg = annotate("seg", img, weights_path=path, cfg=TINY_ADE)
    assert seg.shape == (64, 48, 3)
    colors = {tuple(c) for c in seg.reshape(-1, 3)}
    ade = {tuple(c) for c in ade_palette()[:150]}
    assert colors <= ade


def test_seg_annotator_and_inpaint_mask(tmp_path):
    from safetensors.numpy import save_file

    from cremage_tpu.app.tools import segment_for_inpaint
    from cremage_tpu.services.annotators import annotate

    hf = _hf_model(seed=2)
    path = str(tmp_path / "segformer.safetensors")
    save_file({k: v.numpy() for k, v in hf.state_dict().items()}, path)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (96, 72, 3), np.uint8)
    seg = annotate("seg", img, weights_path=path, cfg=TINY)
    assert seg.shape == (96, 72, 3) and seg.dtype == np.uint8

    mask = segment_for_inpaint(img.astype(np.float32) / 255.0,
                               ["Hair", "Face"], weights_path=path, cfg=TINY)
    assert mask.shape == (96, 72)
    assert set(np.unique(mask)) <= {0.0, 1.0}
