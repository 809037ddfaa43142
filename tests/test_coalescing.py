"""Cross-request coalescing (app/batching.py + EngineWorker(coalesce=N)).

Serving mode: adjacent queued txt2img jobs whose compiled-program /
loaded-weights signature matches run as ONE device batch; prompt,
negative_prompt and seed stay free per request.  Proven here:

- compatible jobs coalesce (one pipeline batch, N job_done messages);
- for deterministic samplers the coalesced result equals the solo run
  with the same seed (per-request x0 noise from the request's own key);
- requests with different prompt-chunk counts batch via filler padding;
- incompatible jobs (different shapes, image modes, ControlNet) do not
  coalesce and still complete;
- a failing batch falls back to serial execution per job.
"""
import queue
import time

import numpy as np
import pytest

from cremage_tpu.app import backends as B
from cremage_tpu.app.batching import sd15_coalesce_key
from cremage_tpu.app.worker import EngineWorker, MP_MESSAGE_TYPE_INFERENCE


def _job(prompt="a cat", seed=9, **kw):
    params = {
        "prompt": prompt, "negative_prompt": "blurry",
        "H": 64, "W": 64, "sampling_steps": 2, "seed": seed,
        "sampler": "Euler", "ckpt": "tiny.safetensors",
        "safety_check": False, "watermark": False,
    }
    params.update(kw)
    return {
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": params.get("mode", "text_to_image"),
        "parameters": params,
    }


def _drain(w, n_done, timeout=300):
    msgs, done = [], 0
    end = time.time() + timeout
    while time.time() < end and done < n_done:
        try:
            m = w.status_queue.get(timeout=1.0)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            done += 1
    return msgs


def _worker(monkeypatch, coalesce):
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    monkeypatch.setattr("cremage_tpu.pipelines.loader.load_sd15_bundle",
                        lambda *a, **k: bundle)
    from cremage_tpu.core.config import Preferences

    w = EngineWorker(coalesce=coalesce)
    B.register_default_backends(w, Preferences())
    return w


# ---------------- coalesce_key ----------------------------------------------


def test_coalesce_key_semantics():
    base = _job()["parameters"]
    k0 = sd15_coalesce_key(base)
    assert k0 is not None
    # prompt / negative / seed are free
    assert sd15_coalesce_key({**base, "prompt": "a dog", "seed": 4}) == k0
    # program-shaping options are not
    assert sd15_coalesce_key({**base, "H": 128}) != k0
    assert sd15_coalesce_key({**base, "sampling_steps": 3}) != k0
    assert sd15_coalesce_key({**base, "scale": 5.0}) != k0
    # load-relevant extras are not
    assert sd15_coalesce_key({**base, "unet_quantize": "int8"}) != k0
    # non-batchable jobs are rejected outright
    assert sd15_coalesce_key({**base, "mode": "image_to_image"}) is None
    assert sd15_coalesce_key({**base, "control_net": "canny.ckpt"}) is None
    assert sd15_coalesce_key({**base, "auto_face_fix": True}) is None
    assert sd15_coalesce_key({**base, "n_iter": 2}) is None


# ---------------- worker coalescing ------------------------------------------


def test_compatible_jobs_coalesce(monkeypatch):
    w = _worker(monkeypatch, coalesce=4)
    # enqueue BEFORE start so the worker sees all three at once
    for i, prompt in enumerate(["a cat", "a dog", "a fox"]):
        w.submit(_job(prompt=prompt, seed=10 + i))
    w.start()
    msgs = _drain(w, 3)
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert len(done) == 3 and all(d["job_done"]["ok"] for d in done), done
    imgs = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(imgs) == 3
    # the pipeline saw ONE batched invocation of all three requests
    assert getattr(B._instance, "_last_coalesced", None) == 3
    # each request kept its own seed in the metadata
    import json

    seeds = sorted(json.loads(m["generation_parameters"])["seed"]
                   for m in imgs)
    assert seeds == [10, 11, 12]


def test_coalesced_equals_solo_for_deterministic_sampler(monkeypatch):
    from tests.test_pipeline_sd15 import make_bundle
    from cremage_tpu.core.config import GenerationOptions
    from cremage_tpu.pipelines.sd15 import SD15Pipeline

    bundle = make_bundle()
    solo = {}
    for seed, prompt in ((21, "a cat"), (22, "a dog")):
        pipe = SD15Pipeline(bundle)
        opts = GenerationOptions(
            prompt=prompt, negative_prompt="blurry", H=64, W=64,
            sampling_steps=2, seed=seed, sampler="Euler",
            safety_check=False, watermark=False)
        solo[seed] = pipe.generate(opts)[0][0]

    monkeypatch.setattr("cremage_tpu.pipelines.loader.load_sd15_bundle",
                        lambda *a, **k: bundle)
    from cremage_tpu.core.config import Preferences

    w = EngineWorker(coalesce=2)
    B.register_default_backends(w, Preferences())
    w.submit(_job(prompt="a cat", seed=21))
    w.submit(_job(prompt="a dog", seed=22))
    w.start()
    msgs = _drain(w, 2)
    w.stop()
    assert getattr(B._instance, "_last_coalesced", None) == 2

    import io
    import json

    from PIL import Image

    got = {}
    for m in msgs:
        if isinstance(m, dict) and "image" in m:
            meta = json.loads(m["generation_parameters"])
            arr = np.asarray(
                Image.open(io.BytesIO(m["image"]))).astype(np.float32) / 255
            got[meta["seed"]] = arr
    assert set(got) == {21, 22}
    for seed in (21, 22):
        # PNG round-trip quantizes to 8 bits; compare at that tolerance
        assert np.abs(got[seed] - solo[seed]).max() <= (1.5 / 255), seed


def test_mixed_prompt_lengths_batch_via_filler(monkeypatch):
    w = _worker(monkeypatch, coalesce=2)
    long_prompt = " ".join(["intricate"] * 90)  # > 77 tokens -> 2 chunks
    w.submit(_job(prompt="a cat", seed=31))
    w.submit(_job(prompt=long_prompt, seed=32))
    w.start()
    msgs = _drain(w, 2)
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert len(done) == 2 and all(d["job_done"]["ok"] for d in done), done
    assert getattr(B._instance, "_last_coalesced", None) == 2


def test_incompatible_jobs_run_separately(monkeypatch):
    w = _worker(monkeypatch, coalesce=4)
    w.submit(_job(prompt="a cat", seed=41))
    w.submit(_job(prompt="a dog", seed=42, H=128))   # different bucket
    w.start()
    msgs = _drain(w, 2)
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert len(done) == 2 and all(d["job_done"]["ok"] for d in done), done
    # no batched invocation happened
    assert getattr(B._instance, "_last_coalesced", None) is None


def test_batch_failure_falls_back_to_serial(monkeypatch):
    w = _worker(monkeypatch, coalesce=2)

    def boom(*a, **k):
        raise RuntimeError("injected batch failure")

    monkeypatch.setattr("cremage_tpu.app.batching.run_sd15_batch", boom)
    w.submit(_job(prompt="a cat", seed=51))
    w.submit(_job(prompt="a dog", seed=52))
    w.start()
    msgs = _drain(w, 2)
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert len(done) == 2 and all(d["job_done"]["ok"] for d in done), done
    imgs = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(imgs) == 2
