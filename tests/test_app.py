import json
import queue
import time

import numpy as np

from cremage_tpu.app.worker import (
    EngineWorker, MP_MESSAGE_TYPE_INFERENCE, make_result_message,
)


def drain_until_done(w: EngineWorker, timeout=30):
    msgs = []
    end = time.time() + timeout
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=0.5)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            break
    return msgs


def test_worker_dispatch_and_result():
    w = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            status_cb("1 / 2")
            status_cb("2 / 2")
            img = np.zeros((8, 8, 3), np.float32)
            result_cb(img, {"prompt": params["prompt"], "seed": 7})
        return generate

    w.register_backend("SD 1.5", factory)
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {"prompt": "hi"},
    })
    msgs = drain_until_done(w)
    w.stop()
    strs = [m for m in msgs if isinstance(m, str)]
    assert "1 / 2" in strs and "2 / 2" in strs
    results = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(results) == 1
    meta = json.loads(results[0]["generation_parameters"])
    assert meta["prompt"] == "hi"
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m]
    assert done and done[0]["job_done"]["ok"]


def test_worker_structured_failure_keeps_running():
    w = EngineWorker()
    calls = []

    def bad_factory():
        def generate(params, status_cb, result_cb):
            raise RuntimeError("boom")
        return generate

    def good_factory():
        def generate(params, status_cb, result_cb):
            calls.append(1)
        return generate

    w.register_backend("BAD", bad_factory)
    w.register_backend("GOOD", good_factory)
    w.start()
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "BAD", "parameters": {}})
    msgs = drain_until_done(w)
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m][0]
    assert not done["job_done"]["ok"]
    assert "boom" in done["job_done"]["error"]
    # worker survives and handles the next job
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "GOOD", "parameters": {}})
    msgs = drain_until_done(w)
    w.stop()
    assert calls == [1]


def test_unknown_backend_reports_error():
    w = EngineWorker()
    w.start()
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "NOPE", "parameters": {}})
    msgs = drain_until_done(w)
    w.stop()
    done = [m for m in msgs if isinstance(m, dict) and "job_done" in m][0]
    assert not done["job_done"]["ok"]


def test_result_message_png_roundtrip(tmp_path):
    import io
    from PIL import Image

    from cremage_tpu.io.metadata import GENERATION_DATA_KEY

    img = np.random.RandomState(0).uniform(0, 1, (16, 16, 3)).astype(np.float32)
    msg = make_result_message(img, {"seed": 3})
    pil = Image.open(io.BytesIO(msg["image"]))
    assert pil.size == (16, 16)
    assert json.loads(pil.info[GENERATION_DATA_KEY]) == {"seed": 3}


def test_cli_parser_matches_reference_flags():
    from cremage_tpu.app.cli import build_parser

    p = build_parser()
    # reference sd/options.py flag spot checks
    args = p.parse_args([
        "--ckpt", "m.safetensors", "--prompt", "cat", "--sampler", "Euler A",
        "--sampling_steps", "20", "--n_samples", "2", "--scale", "6.0",
        "--lora_models", "a,b", "--lora_weights", "0.5,0.6",
        "--hires_fix_upscaler", "Latent", "--seed", "5",
    ])
    assert args.prompt == "cat" and args.sampler == "Euler A"
    assert args.lora_models == "a,b" and args.seed == 5


def test_cli_faceid_from_photo_uses_arcface_path(tmp_path, monkeypatch):
    """--face_input_img with an image file must route through the
    in-repo ArcFace helper (app/backends._face_embedding_for), not
    raise (the round-2 CLI stub demanded a precomputed .npy)."""
    from PIL import Image

    import cremage_tpu.app.backends as backends
    import cremage_tpu.pipelines.loader as loader_mod
    import cremage_tpu.pipelines.sd15 as sd15_mod

    face = tmp_path / "face.png"
    Image.new("RGB", (32, 32), (128, 90, 70)).save(face)

    seen = {}

    class _Bundle:
        faceid_kind = "plus"

    class _Pipe:
        def __init__(self, bundle):
            pass

        def generate(self, opts, status_cb=None, init_image=None,
                     mask_image=None, face_embedding=None):
            seen["face_embedding"] = face_embedding
            return []

    sentinel = {"id": np.zeros(512, np.float32)}
    monkeypatch.setattr(loader_mod, "load_sd15_bundle",
                        lambda *a, **k: _Bundle())
    monkeypatch.setattr(sd15_mod, "SD15Pipeline", _Pipe)

    def fake_embed(params, opts, status_cb, plus=False):
        seen["plus"] = plus
        assert opts.face_input_img == str(face)
        return sentinel

    monkeypatch.setattr(backends, "_face_embedding_for", fake_embed)

    from cremage_tpu.app.cli import main

    rc = main(["--ckpt", "m.safetensors", "--prompt", "cat",
               "--face_input_img", str(face),
               "--face_model", "faceid.bin", "--skip_save",
               "--outdir", str(tmp_path / "out")])
    assert rc == 0
    assert seen["face_embedding"] is sentinel
    assert seen["plus"] is True
