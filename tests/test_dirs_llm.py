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


def test_face_storage_reference_goldens(tmp_path):
    """Reference app_misc_utils_test.py cases for face-file id
    assignment, plus save/list round-trip."""
    from cremage_tpu.app import dirs as D

    assert D.next_face_file_id([]) == 0
    assert D.next_face_file_id(["hello.txt"]) == 0
    assert D.next_face_file_id(["hello.txt", "face_000000.png"]) == 1
    assert D.next_face_file_id(
        ["face_000001.png", "hello.txt", "face_000000.png"]) == 2
    assert D.next_face_file_id(
        ["face_1.png", "hello.txt", "face_000000.png"]) == 2

    root = str(tmp_path)
    img = np.random.RandomState(0).uniform(0, 1, (16, 16, 3))
    p1 = D.save_face_image(root, img)
    p2 = D.save_face_image(root, img)
    assert p1.endswith("face_000000.png") and p2.endswith("face_000001.png")
    assert D.list_faces(root) == [p1, p2]


def test_face_regex_rejects_lookalikes():
    from cremage_tpu.app import dirs as D

    # unescaped-dot / unanchored lookalikes must not count
    assert D.next_face_file_id(["face_123png"]) == 0
    assert D.next_face_file_id(["face_12.png.bak", "preface_3.png"]) == 0
    assert D.next_face_file_id(["face_000004.png"]) == 5
