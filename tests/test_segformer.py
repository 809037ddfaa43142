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


def _hf_model(seed=0):
    from transformers import SegformerConfig as HFConfig
    from transformers import SegformerForSemanticSegmentation as HFModel

    hf_cfg = HFConfig(
        num_channels=3, num_encoder_blocks=4, depths=list(TINY.blocks),
        sr_ratios=list(TINY.sr_ratios), hidden_sizes=list(TINY.dims),
        num_attention_heads=list(TINY.heads), decoder_hidden_size=16,
        num_labels=18, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, classifier_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(seed)
    return HFModel(hf_cfg).eval()


def test_segformer_parity_with_transformers():
    hf = _hf_model()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()
          if not k.endswith("num_batches_tracked")}

    model = SegformerModel(TINY)
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
    assert got.shape == (1, 16, 16, 18)
    np.testing.assert_allclose(got, want.transpose(0, 2, 3, 1),
                               atol=5e-5, rtol=5e-5)


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
