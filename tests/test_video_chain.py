"""One-click video chain (reference tools/video_generator.py:427-478):
a single img2vid job runs SVD generation -> FILM interpolation -> mp4,
with per-stage progress, and the browser-facing pieces (video panel +
video_path status handling) exist in the webui."""
import json
import os
import queue
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from cremage_tpu.app import backends as B
from cremage_tpu.app.worker import EngineWorker, MP_MESSAGE_TYPE_INFERENCE
from cremage_tpu.core.config import GMT_SVD, Preferences


def _tiny_svd_bundle():
    from cremage_tpu.models.vae import AutoencoderKL, VAEConfig
    from cremage_tpu.pipelines.svd import SVDBundle
    from tests.test_svd import tiny_video_unet

    m, params = tiny_video_unet()
    vae = AutoencoderKL(VAEConfig(ch=32, ch_mult=(1, 1, 1, 1),
                                  num_res_blocks=1, dtype=jnp.float32))
    vp = vae.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)))
    return SVDBundle(unet=m, unet_params=params, vae=vae, vae_params=vp)


def test_img2vid_film_mp4_one_job(monkeypatch, tmp_path):
    from tests.test_svd import T

    monkeypatch.setattr("cremage_tpu.pipelines.loader.load_svd_bundle",
                        lambda *a, **k: _tiny_svd_bundle())
    monkeypatch.setattr("cremage_tpu.app.dirs.first_init",
                        lambda base=None: str(tmp_path))

    init_p = str(tmp_path / "init.png")
    Image.fromarray(np.full((64, 64, 3), 128, np.uint8)).save(init_p)

    w = EngineWorker()
    B.register_default_backends(w, Preferences())
    w.start()
    w.submit({
        "type": MP_MESSAGE_TYPE_INFERENCE,
        "generator_model_type": GMT_SVD,
        "mode": "image_to_video",
        "parameters": {
            "init_img": init_p, "ckpt": "tiny-svd.safetensors",
            "num_frames": T, "sampling_steps": 2, "seed": 4,
            "interpolation_frames": 1, "make_mp4": True,
            "safety_check": False,
        },
    })
    msgs = []
    end = time.time() + 300
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=1.0)
        except queue.Empty:
            continue
        msgs.append(m)
        if isinstance(m, dict) and "job_done" in m:
            break
    w.stop()

    assert isinstance(msgs[-1], dict) and msgs[-1]["job_done"]["ok"], \
        msgs[-1]
    # per-stage progress: sampling steps, then interpolation passes,
    # then the mp4 write
    assert any(isinstance(m, str) and "/ 2" in m for m in msgs)
    assert any(isinstance(m, str) and "interpolating (pass 1 / 1)" in m
               for m in msgs)
    assert any(isinstance(m, str) and m == "writing mp4" for m in msgs)
    # one interpolation pass: T frames -> 2T-1 frames
    frames = [m for m in msgs if isinstance(m, dict) and "image" in m]
    assert len(frames) == 2 * T - 1
    # the mp4 landed in the outputs library and was announced
    vids = [m for m in msgs if isinstance(m, dict) and "video_path" in m]
    assert len(vids) == 1
    vp = vids[0]["video_path"]
    assert vp.startswith(str(tmp_path)) and vp.endswith(".mp4")
    assert os.path.getsize(vp) > 1000
    meta = json.loads(vids[0]["generation_parameters"])
    assert meta["num_frames"] == T


def test_webui_video_panel_static():
    """Static DOM guard for the one-click chain: the video panel's
    controls and the video_path status handling ship in the client."""
    from cremage_tpu.app.webui import INDEX_HTML

    for needle in ('id="videobox"', 'id="video_frames"',
                   'id="video_interp"', 'id="video_mp4"',
                   "interpolation_frames", "make_mp4", "video_path",
                   "download mp4"):
        assert needle in INDEX_HTML, needle


def test_images_file_serves_mp4_content_type(tmp_path, monkeypatch):
    """GET /v1/images/file streams .mp4 with video/mp4 content type."""
    import urllib.request

    from cremage_tpu.app.server import ApiServer

    monkeypatch.setattr("cremage_tpu.app.dirs.first_init",
                        lambda base=None: str(tmp_path))
    p = tmp_path / "outputs"
    p.mkdir()
    f = p / "clip.mp4"
    f.write_bytes(b"\x00\x00\x00\x18ftypmp42" + b"x" * 64)
    srv = ApiServer(worker=EngineWorker(save_root=str(tmp_path)), port=0)
    srv.start()
    try:
        r = urllib.request.urlopen(
            "http://127.0.0.1:%d/v1/images/file?path=%s"
            % (srv.port, urllib.request.quote(str(f))), timeout=10)
        assert r.headers.get("Content-Type") == "video/mp4"
        assert r.read().startswith(b"\x00\x00\x00\x18ftyp")
    finally:
        srv.stop()
