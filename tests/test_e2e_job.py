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
