"""End-to-end job path: HTTP-shaped job dict -> worker -> SD1.5 backend
-> pipeline -> PNG bytes + metadata on the status channel (the complete
reference flow SURVEY §3.2, headless)."""
import io
import json
import queue
import time

import numpy as np
import pytest
from PIL import Image

from cremage_tpu.app import backends as B
from cremage_tpu.app.worker import EngineWorker, MP_MESSAGE_TYPE_INFERENCE
from cremage_tpu.core.config import Preferences


def test_full_job_path(monkeypatch, tmp_path):
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    # bypass the real checkpoint load: return the tiny bundle
    monkeypatch.setattr(
        "cremage_tpu.pipelines.loader.load_sd15_bundle",
        lambda *a, **k: bundle,
    )

    w = EngineWorker()
    B.register_default_backends(w, Preferences())
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {
            "prompt": "a small cat",
            "negative_prompt": "blurry",
            "H": 64, "W": 64, "sampling_steps": 2, "seed": 9,
            "sampler": "Euler A", "ckpt": "tiny.safetensors",
            "safety_check": False,
        },
    })

    msgs = []
    end = time.time() + 240
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=1.0)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            break
    w.stop()

    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert done and done[0]["job_done"]["ok"], done
    # progress strings flowed
    assert any(isinstance(m, str) and "/ 2" in m for m in msgs)
    # PNG result with embedded generation metadata
    results = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(results) == 1
    img = Image.open(io.BytesIO(results[0]["image"]))
    assert img.size == (64, 64)
    meta = json.loads(results[0]["generation_parameters"])
    assert meta["prompt"] == "a small cat" and meta["seed"] == 9
    assert img.info.get("generation_data") is not None


def _drain(w, timeout=240):
    msgs = []
    end = time.time() + timeout
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=1.0)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            break
    return msgs


def test_job_path_delivery_and_ordering(monkeypatch, tmp_path):
    """result_delivery='path': PNGs land in the outputs library and the
    status channel carries file references; all images post BEFORE
    job_done and in generation (seed) order even though encode runs on
    the off-thread pool."""
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    monkeypatch.setattr(
        "cremage_tpu.pipelines.loader.load_sd15_bundle",
        lambda *a, **k: bundle,
    )

    w = EngineWorker(save_root=str(tmp_path))
    B.register_default_backends(w, Preferences())
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {
            "prompt": "a small cat", "H": 64, "W": 64,
            "sampling_steps": 2, "seed": 9, "n_iter": 2,
            "sampler": "Euler A", "ckpt": "tiny.safetensors",
            "safety_check": False, "result_delivery": "path",
        },
    })
    msgs = _drain(w)
    w.stop()

    assert msgs and isinstance(msgs[-1], dict) and "job_done" in msgs[-1]
    assert msgs[-1]["job_done"]["ok"], msgs[-1]
    results = [m for m in msgs if isinstance(m, dict) and "image_path" in m]
    assert len(results) == 2
    assert not any(isinstance(m, dict) and "image" in m for m in msgs)
    seeds = [json.loads(m["generation_parameters"])["seed"]
             for m in results]
    assert seeds == [9, 10]          # generation order preserved
    for m in results:
        p = m["image_path"]
        assert p.startswith(str(tmp_path))
        img = Image.open(p)
        assert img.size == (64, 64)
        assert img.info.get("generation_data") is not None


def test_job_inline_delivery_encode_offthread(monkeypatch):
    """Default inline delivery still posts PNG bytes (bench/e2e-lane
    compatibility), all before job_done."""
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    monkeypatch.setattr(
        "cremage_tpu.pipelines.loader.load_sd15_bundle",
        lambda *a, **k: bundle,
    )
    w = EngineWorker(save_root="/nonexistent-should-not-be-used")
    B.register_default_backends(w, Preferences())
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {
            "prompt": "x", "H": 64, "W": 64, "sampling_steps": 2,
            "seed": 3, "n_samples": 2, "sampler": "Euler A",
            "ckpt": "tiny.safetensors", "safety_check": False,
        },
    })
    msgs = _drain(w)
    w.stop()
    assert isinstance(msgs[-1], dict) and msgs[-1]["job_done"]["ok"]
    results = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(results) == 2
    idx = [msgs.index(m) for m in results]
    assert max(idx) < msgs.index(msgs[-1])   # images precede job_done
