import os

import numpy as np
import pytest

from cremage_tpu.app import dirs as D
from cremage_tpu.app.llm import LLMInteractor, LLMUnavailable


def test_first_init_and_library_ops(tmp_path):
    root = D.first_init(str(tmp_path / "approot"))
    for sub in D.SUBDIRS:
        assert os.path.isdir(os.path.join(root, sub))
    # create a fake output
    p = os.path.join(root, "outputs", "img.png")
    with open(p, "wb") as f:
        f.write(b"png")
    imgs = D.list_images(root)
    assert imgs[0]["name"] == "img.png"
    fav = D.favorite_image(root, p)
    assert os.path.exists(fav) and os.path.exists(p)
    tr = D.trash_image(root, p)
    assert os.path.exists(tr) and not os.path.exists(p)


def test_llm_interactor_gate_and_backend():
    it = LLMInteractor()
    with pytest.raises(LLMUnavailable):   # no weights, internet gated off
        it.chat("hi")

    def backend(prompt, image):
        return prompt + f" ECHO:{image is not None}"

    it2 = LLMInteractor(backend)
    out = it2.chat("hello")
    assert out == "ECHO:False"
    cap = it2.caption(np.zeros((4, 4, 3), np.float32))
    assert cap.endswith(":True")
    assert len(it2.content) == 4
    it2.reset()
    assert it2.raw_history == [] and it2.content == []
