import base64
import io
import json
import os
import time
import urllib.parse
import urllib.request

import numpy as np
import pytest

from cremage_tpu.app import tools as T
from cremage_tpu.app.server import ApiServer, _image_to_b64
from cremage_tpu.app.worker import EngineWorker


def test_crop_and_make_mask():
    img = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3) / 1e5
    out = T.crop_image(img, 10, 20, 30, 30)
    assert out.shape == (30, 30, 3)
    np.testing.assert_allclose(out[0, 0], img[20, 10])
    m = T.make_mask(32, 32, [(4, 4, 8, 8)])
    assert m.sum() == 64 and m[5, 5] == 1.0 and m[0, 0] == 0.0


def test_draw_strokes():
    out = T.draw_strokes(None, 32, 32, [
        {"points": [(2, 2), (30, 2)], "color": (1, 0, 0), "width": 2}
    ])
    assert out.shape == (32, 32, 3)
    assert out[2, 16, 0] == 1.0 and out[2, 16, 1] < 0.5


def test_prompt_builder(tmp_path):
    cat = tmp_path / "hair"
    cat.mkdir()
    (cat / "long_hair.png").write_bytes(b"x")
    (cat / "short_hair.png").write_bytes(b"x")
    cats = T.list_prompt_builder_categories(str(tmp_path))
    assert cats == {"hair": ["long_hair.png", "short_hair.png"]}
    prompt = T.build_prompt_from_tags(str(tmp_path),
                                      ["hair/long_hair.png", "red_eyes.png"])
    assert prompt == "long hair, red eyes"


def test_mix_models_tool(tmp_path):
    from cremage_tpu.io.checkpoint import load_state_dict, save_safetensors

    p1 = str(tmp_path / "a.safetensors")
    p2 = str(tmp_path / "b.safetensors")
    save_safetensors(p1, {"w": np.ones((2, 2), np.float32)})
    save_safetensors(p2, {"w": np.zeros((2, 2), np.float32)})
    out = T.mix_models([p1, p2], [1.0, 1.0], str(tmp_path / "mix.safetensors"))
    sd = load_state_dict(out)
    np.testing.assert_allclose(sd["w"], 0.5)


@pytest.fixture()
def server():
    w = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            status_cb("1 / 1")
            result_cb(np.zeros((8, 8, 3), np.float32), {"prompt": params["prompt"]})
        return generate

    w.register_backend("SD 1.5", factory)
    srv = ApiServer(worker=w, port=0)
    srv.start()
    yield srv
    srv.stop()


def _req(srv, path, body=None):
    url = f"http://127.0.0.1:{srv.port}{path}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=10)
    else:
        data = json.dumps(body).encode()
        req = urllib.request.Request(url, data=data, method="POST",
                                     headers={"Content-Type": "application/json"})
        r = urllib.request.urlopen(req, timeout=10)
    return json.loads(r.read())


def test_server_health(server):
    out = _req(server, "/v1/health")
    assert out["ok"] and len(out["devices"]) >= 1


def test_server_generate_and_status(server):
    out = _req(server, "/v1/generate", {
        "generator_model_type": "SD 1.5",
        "mode": "text_to_image",
        "parameters": {"prompt": "hi"},
    })
    assert out["job_id"] == 1
    msgs = []
    for _ in range(50):
        time.sleep(0.1)
        msgs += _req(server, "/v1/status")["messages"]
        if any(isinstance(m, dict) and "job_done" in m for m in msgs):
            break
    imgs = [m for m in msgs if isinstance(m, dict) and "image_b64" in m]
    assert len(imgs) == 1
    meta = json.loads(imgs[0]["generation_parameters"])
    assert meta["prompt"] == "hi"


def test_server_annotate_and_crop(server):
    img = np.zeros((64, 64, 3), np.float32)
    img[16:48, 16:48] = 1.0
    b64 = _image_to_b64(img)
    out = _req(server, "/v1/tools/annotate", {"method": "canny", "image": b64})
    assert "image" in out
    out2 = _req(server, "/v1/tools/crop",
                {"image": b64, "x": 0, "y": 0, "w": 10, "h": 12})
    from PIL import Image

    im = Image.open(io.BytesIO(base64.b64decode(out2["image"])))
    assert im.size == (10, 12)


def test_server_404(server):
    with pytest.raises(urllib.error.HTTPError):
        _req(server, "/v1/nope")


def test_downloader_gate(tmp_path, monkeypatch):
    from cremage_tpu.io.downloader import download_model_if_not_exist

    target = tmp_path / "m.bin"
    target.write_bytes(b"x")
    assert download_model_if_not_exist(str(target), "r", "f") == str(target)
    monkeypatch.setenv("ENABLE_HF_INTERNET_CONNECTION", "false")
    with pytest.raises(FileNotFoundError):
        download_model_if_not_exist(str(tmp_path / "missing.bin"), "r", "f")


def test_observability():
    import jax.numpy as jnp

    from cremage_tpu.utils import observability as O

    m = O.Metrics()
    m.incr("jobs")
    m.gauge("x", 2.0)
    with O.span("test_span", m):
        pass
    snap = m.snapshot()
    assert snap["counters"]["jobs"] == 1
    assert "test_span" in snap["span_seconds"]
    assert O.model_memory_usage_in_bytes(
        {"w": jnp.zeros((4, 4), jnp.float32)}) == 64
    stats = O.device_memory_stats()
    assert isinstance(stats, dict)


def _status_of(srv, path, body):
    url = f"http://127.0.0.1:{srv.port}{path}"
    data = json.dumps(body).encode()
    req = urllib.request.Request(url, data=data, method="POST",
                                 headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        return 200
    except urllib.error.HTTPError as e:
        return e.code


def test_server_rejects_bad_json(server):
    url = f"http://127.0.0.1:{server.port}/v1/generate"
    req = urllib.request.Request(url, data=b"{not json", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=10)
    assert ei.value.code == 400


def test_server_rejects_unknown_model_type(server):
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "DALL-E 9"}) == 400


def test_server_rejects_bad_dimensions_and_steps(server):
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "SD 1.5", "H": 100}) == 400
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "SD 1.5", "W": 1 << 20}) == 400
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "SD 1.5",
                       "sampling_steps": 0}) == 400
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "SD 1.5",
                       "n_samples": 10**6}) == 400
    # valid request still accepted after rejections
    assert _status_of(server, "/v1/generate",
                      {"generator_model_type": "SD 1.5", "H": 512,
                       "parameters": {"prompt": "ok"}}) == 200


def test_server_rejects_oversized_or_undecodable_image(server):
    # undecodable base64 payload -> 400, server keeps serving
    assert _status_of(server, "/v1/tools/annotate",
                      {"method": "canny", "image": "!!notb64!!"}) == 400
    out = _req(server, "/v1/health")
    assert out["ok"]


def test_server_webui_and_meta(server):
    # thin client page served at /
    url = f"http://127.0.0.1:{server.port}/"
    html = urllib.request.urlopen(url, timeout=10).read().decode()
    assert "<!doctype html>" in html and "/v1/generate" in html
    # meta enumerates model types + samplers for the UI dropdowns
    meta = _req(server, "/v1/meta")
    assert "SD 1.5" in meta["model_types"]
    assert "Euler A" in meta["samplers"] and "DDIM" in meta["samplers"]
    # progress capability: "step" where io_callback compiles (CPU),
    # "chunked" on the axon TPU tunnel (samplers/chunked.py)
    assert meta["progress"]["granularity"] in ("step", "chunked")


def test_server_image_file_guard(server):
    # only files inside the image library root are served
    url = (f"http://127.0.0.1:{server.port}/v1/images/file"
           f"?path=/etc/passwd")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url, timeout=10)
    assert ei.value.code == 404


def test_server_image_meta_replay(server, tmp_path):
    """'Use generation info' endpoint: metadata of a library image is
    returned for form replay (reference generate_handler.py:274-279)."""
    from PIL import Image

    from cremage_tpu.app import dirs as D
    from cremage_tpu.io.metadata import save_png_with_metadata

    root = D.first_init()
    p = os.path.join(root, "outputs", "meta_test.png")
    save_png_with_metadata(
        Image.new("RGB", (8, 8)), p,
        {"prompt": "replayed", "sampling_steps": 12})
    out = _req(server, "/v1/images/meta?path=" + urllib.parse.quote(p))
    assert out["generation_data"]["prompt"] == "replayed"
    assert out["generation_data"]["sampling_steps"] == 12
    os.remove(p)


def test_server_flat_generate_reaches_backend(server):
    """The browser client posts generation fields at the top level; the
    worker only reads job["parameters"] — the server must fold them in."""
    out = _req(server, "/v1/generate", {
        "generator_model_type": "SD 1.5",
        "prompt": "flat form works",
        "H": 512, "W": 512,
    })
    assert out["job_id"] >= 1
    msgs = []
    for _ in range(50):
        time.sleep(0.1)
        msgs += _req(server, "/v1/status")["messages"]
        if any(isinstance(m, dict) and "job_done" in m for m in msgs):
            break
    imgs = [m for m in msgs if isinstance(m, dict) and "image_b64" in m]
    assert imgs, msgs
    meta = json.loads(imgs[-1]["generation_parameters"])
    assert meta["prompt"] == "flat form works"


def test_server_upload_roundtrip(server):
    img = np.zeros((16, 16, 3), np.float32)
    img[4:12, 4:12] = 1.0
    out = _req(server, "/v1/upload", {"image": _image_to_b64(img)})
    p = out["path"]
    assert os.path.exists(p) and p.endswith(".png")
    from PIL import Image

    back = np.asarray(Image.open(p), np.float32) / 255.0
    assert back.shape == (16, 16, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255)
    os.remove(p)


def test_webui_dom_ids_consistent():
    """Every $('id') the page's JS references must exist as an element
    id in the markup (static guard; no browser in CI)."""
    import re

    from cremage_tpu.app.webui import INDEX_HTML

    dom_ids = set(re.findall(r'id="([\w-]+)"', INDEX_HTML))
    used = set(re.findall(r"\$\('([\w-]+)'\)", INDEX_HTML))
    missing = used - dom_ids
    assert not missing, f"JS references unknown element ids: {missing}"
    # the generate form fields the server folds into parameters
    for fid in ("prompt", "negative", "model", "sampler", "steps", "W",
                "H", "scale", "seed", "mode", "strength", "init_file",
                "mask_file", "paint_canvas", "paintbox", "brush",
                "paint_state"):
        assert fid in dom_ids, fid
    # round-4 client surfaces: preferences editor, model mixer, and the
    # keyboard image browser (reference image_listbox_handlers flows)
    for fid in ("tab-prefs", "prefsec", "pref_rows", "pref_state",
                "mix_paths", "mix_weights", "mix_output", "mix_state",
                "libhelp"):
        assert fid in dom_ids, fid
    for fn in ("prefsLoad", "prefsSave", "mixRun", "libKeydown",
               "libSelect", "libTrash", "useSettingsFrom"):
        assert f"function {fn}" in INDEX_HTML, fn
    for key in ("'Home'", "'End'", "'Delete'", "'Backspace'", "'Enter'"):
        assert key in INDEX_HTML, key


def test_generate_normalization_mirrors_envelope_and_drops_null():
    from cremage_tpu.app.server import _normalize_generate

    job = _normalize_generate({
        "generator_model_type": "SDXL", "mode": "inpainting",
        "sampling_steps": None, "prompt": "x",
        "parameters": {"seed": 7},
    })
    p = job["parameters"]
    # the worker passes ONLY parameters to the backend: mode and model
    # type must ride inside it (backends read opts.mode for inpaint)
    assert p["mode"] == "inpainting"
    assert p["generator_model_type"] == "SDXL"
    assert p["seed"] == 7 and p["prompt"] == "x"
    # JSON nulls must not override GenerationOptions defaults
    assert "sampling_steps" not in p


def test_meta_samplers_by_type(server):
    meta = _req(server, "/v1/meta")
    assert "EulerEDMSampler" in meta["samplers_by_type"]["SDXL"]
    assert "Euler A" in meta["samplers_by_type"]["SD 1.5"]
    assert "EulerEDMSampler" in meta["sgm_samplers"]


def test_prompt_history_and_embedding_viewer(server, tmp_path):
    # generate records the prompt; /v1/history returns it
    _req(server, "/v1/generate", {
        "generator_model_type": "SD 1.5",
        "parameters": {"prompt": "history entry one"}})
    hist = _req(server, "/v1/history")["prompts"]
    assert "history entry one" in hist

    # TI viewer lists embedding files with shapes
    import torch

    d = tmp_path / "emb"
    d.mkdir()
    torch.save({"emb_params": torch.zeros(4, 16)}, str(d / "a1111.pt"))
    out = _req(server, "/v1/tools/embeddings", {"dir": str(d)})
    assert out["embeddings"] and out["embeddings"][0]["name"] == "a1111.pt"
    e = out["embeddings"][0]
    assert e.get("shape") == [4, 16] or e.get("shapes")


def test_preferences_endpoint(tmp_path):
    from cremage_tpu.core.config import Preferences, load_preferences

    cfg = str(tmp_path / "config.yaml")
    prefs = load_preferences(cfg)
    w = EngineWorker()
    srv = ApiServer(worker=w, port=0, prefs=prefs, config_path=cfg)
    srv.start()
    try:
        got = _req(srv, "/v1/preferences")["preferences"]
        assert got["sampler"] == prefs.sampler
        out = _req(srv, "/v1/preferences", {"sampling_steps": 35})
        assert out["preferences"]["sampling_steps"] == 35
        # the SHARED instance mutated (backends see it) + persisted
        assert prefs.sampling_steps == 35
        assert load_preferences(cfg).sampling_steps == 35
        # unknown keys rejected
        assert _status_of(srv, "/v1/preferences", {"bogus_key": 1}) == 400
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# round-3 tool endpoints: mask / graffiti / segment / prompt_builder /
# spot_inpaint / llm chat (VERDICT r2 item 4: every app.tools / app.llm
# capability reachable over HTTP)
# ---------------------------------------------------------------------------

def _mask_from_b64(b64):
    from PIL import Image

    return np.asarray(
        Image.open(io.BytesIO(base64.b64decode(b64))).convert("L"),
        np.float32) / 255.0


def test_server_mask_ops(server):
    out = _req(server, "/v1/tools/mask",
               {"op": "make", "h": 32, "w": 32, "rects": [[4, 4, 8, 8]]})
    m = _mask_from_b64(out["mask"])
    assert m.shape == (32, 32) and m[5, 5] == 1.0 and m[0, 0] == 0.0

    inv = _req(server, "/v1/tools/mask",
               {"op": "invert", "mask": out["mask"]})
    mi = _mask_from_b64(inv["mask"])
    assert mi[5, 5] == 0.0 and mi[0, 0] == 1.0

    dil = _req(server, "/v1/tools/mask",
               {"op": "dilate", "mask": out["mask"], "pixels": 2})
    assert _mask_from_b64(dil["mask"]).sum() > m.sum()
    ero = _req(server, "/v1/tools/mask",
               {"op": "erode", "mask": out["mask"], "pixels": 2})
    assert _mask_from_b64(ero["mask"]).sum() < m.sum()

    assert _status_of(server, "/v1/tools/mask",
                      {"op": "sharpen", "mask": out["mask"]}) == 400


def test_server_graffiti(server):
    out = _req(server, "/v1/tools/graffiti", {
        "h": 32, "w": 32,
        "strokes": [{"points": [[2, 2], [30, 2]], "color": [1, 0, 0],
                     "width": 2}],
    })
    img = np.asarray(_mask_from_b64(out["image"]))
    assert img.shape == (32, 32)


def test_server_segment_labels_and_negative(server):
    # no image -> the label vocabulary (clothes parser classes)
    out = _req(server, "/v1/tools/segment", {})
    assert "Hair" in out["labels"] and "Face" in out["labels"]
    # image but empty labels -> 400
    img_b64 = _image_to_b64(np.zeros((16, 16, 3), np.float32))
    assert _status_of(server, "/v1/tools/segment",
                      {"image": img_b64, "labels": []}) == 400


def test_server_prompt_builder(server, tmp_path):
    cat = tmp_path / "hair"
    cat.mkdir()
    (cat / "long_hair.png").write_bytes(b"x")
    out = _req(server, "/v1/tools/prompt_builder", {"dir": str(tmp_path)})
    assert out["categories"] == {"hair": ["long_hair.png"]}
    out = _req(server, "/v1/tools/prompt_builder",
               {"dir": str(tmp_path),
                "selections": ["hair/long_hair.png", "red_eyes.png"]})
    assert out["prompt"] == "long hair, red eyes"


def test_server_spot_inpaint_routes_job(tmp_path):
    """spot_inpaint submits a spot_inpainting-mode job; the backend sees
    mode + staged image paths."""
    from PIL import Image

    seen = {}
    w = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            seen.update(params)
            result_cb(np.zeros((8, 8, 3), np.float32), {"ok": True})
        return generate

    w.register_backend("SD 1.5", factory)
    srv = ApiServer(worker=w, port=0)
    srv.start()
    try:
        init = str(tmp_path / "init.png")
        mask = str(tmp_path / "mask.png")
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(init)
        Image.fromarray(np.full((64, 64), 255, np.uint8), "L").save(mask)
        # missing images -> 400
        assert _status_of(srv, "/v1/tools/spot_inpaint",
                          {"parameters": {"prompt": "x"}}) == 400
        out = _req(srv, "/v1/tools/spot_inpaint", {
            "parameters": {"prompt": "fix", "init_img": init,
                           "mask_img": mask, "sampling_steps": 2},
        })
        assert out["job_id"] >= 1
        for _ in range(50):
            time.sleep(0.1)
            if seen:
                break
        assert seen.get("mode") == "spot_inpainting"
        assert seen.get("init_img") == init
    finally:
        srv.stop()


def test_server_llm_chat(server):
    """Chat endpoint drives the LLMInteractor engine; injectable backend
    (the reference's LLaVA weights are environment-gated)."""
    from cremage_tpu.app.llm import LLMInteractor

    server._llm = LLMInteractor(
        backend=lambda prompt, img: "[INST] x [/INST] a fine reply")
    out = _req(server, "/v1/llm/chat", {"message": "hello"})
    assert out["reply"] == "a fine reply"
    assert out["content"][-1]["speaker"] == "agent"
    out = _req(server, "/v1/llm/chat", {"reset": True})
    assert out["content"] == []
    assert _status_of(server, "/v1/llm/chat", {"message": ""}) == 400


def test_spot_inpaint_backend_mode(tmp_path, monkeypatch):
    """backends.sd15_factory spot mode: crops around the mask, runs the
    pipeline's inpaint path, pastes back, emits one result."""
    from PIL import Image

    from cremage_tpu.app import backends as B
    from cremage_tpu.core.config import Preferences
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle(inpaint=True)
    monkeypatch.setattr("cremage_tpu.pipelines.loader.load_sd15_bundle",
                        lambda *a, **k: bundle)
    init = str(tmp_path / "init.png")
    mask = str(tmp_path / "mask.png")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(init)
    m = np.zeros((64, 64), np.uint8)
    m[20:40, 20:40] = 255
    Image.fromarray(m, "L").save(mask)

    results = []
    gen = B.sd15_factory(Preferences())
    gen({"prompt": "a cat", "mode": "spot_inpainting",
         "init_img": init, "mask_img": mask, "sampling_steps": 2,
         "seed": 1, "H": 64, "W": 64, "safety_check": False,
         "ckpt": "ignored.safetensors"},
        lambda msg: None, lambda img, meta: results.append((img, meta)))
    assert len(results) == 1
    img, meta = results[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    assert meta["mode"] == "spot_inpainting"


def test_server_face_tool_weight_gates(server, monkeypatch):
    """Weight-gated face endpoints must 400 with an actionable message,
    not 500 (YuNet/CremageModelV6/GFPGAN are runtime downloads in the
    reference too)."""
    for var in ("YUNET_MODEL_PATH", "UNBLUR_MODEL_PATH",
                "COLORIZE_MODEL_PATH", "GFPGAN_MODEL_PATH"):
        monkeypatch.delenv(var, raising=False)
    b64 = _image_to_b64(np.zeros((32, 32, 3), np.float32))
    for p in ("/v1/tools/face_detect", "/v1/tools/unblur",
              "/v1/tools/colorize", "/v1/tools/gfpgan"):
        assert _status_of(server, p, {"image": b64}) == 400


def test_server_face_fix_routes_job(tmp_path):
    """face_fix submits a face_fix-mode job; the backend sees mode,
    the staged image path and the user-marked boxes (reference
    tools/face_detector.py)."""
    from PIL import Image

    seen = {}
    w = EngineWorker()

    def factory():
        def generate(params, status_cb, result_cb):
            seen.update(params)
            result_cb(np.zeros((8, 8, 3), np.float32), {"ok": True})
        return generate

    w.register_backend("SD 1.5", factory)
    srv = ApiServer(worker=w, port=0)
    srv.start()
    try:
        init = str(tmp_path / "init.png")
        Image.fromarray(np.zeros((64, 64, 3), np.uint8)).save(init)
        # missing init_img -> 400
        assert _status_of(srv, "/v1/tools/face_fix",
                          {"parameters": {"prompt": "x"}}) == 400
        out = _req(srv, "/v1/tools/face_fix", {
            "parameters": {"prompt": "fix", "init_img": init,
                           "face_boxes": [{"x": 1, "y": 2, "w": 8, "h": 9}],
                           "sampling_steps": 2},
        })
        assert out["job_id"] >= 1
        for _ in range(50):
            time.sleep(0.1)
            if seen:
                break
        assert seen.get("mode") == "face_fix"
        assert seen.get("init_img") == init
        assert seen.get("face_boxes") == [{"x": 1, "y": 2, "w": 8, "h": 9}]
    finally:
        srv.stop()


def test_face_fix_backend_mode(tmp_path, monkeypatch):
    """backends.sd15_factory face_fix mode: repairs the user-marked box
    via the pipeline's img2img and emits one pasted-back result."""
    from PIL import Image

    from cremage_tpu.app import backends as B
    from cremage_tpu.core.config import Preferences
    import cremage_tpu.services.facefix as FF
    from tests.test_pipeline_sd15 import make_bundle

    bundle = make_bundle()
    monkeypatch.setattr("cremage_tpu.pipelines.loader.load_sd15_bundle",
                        lambda *a, **k: bundle)
    real_fixer = FF.pipeline_face_fixer
    monkeypatch.setattr(  # shrink the repair square for CPU CI speed
        FF, "pipeline_face_fixer",
        lambda pipe, **kw: real_fixer(
            pipe, detection_method=kw.get("detection_method", "OpenCV"),
            target_size=64, steps=2))
    init = str(tmp_path / "init.png")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(init)

    results = []
    gen = B.sd15_factory(Preferences())
    gen({"prompt": "a face", "mode": "face_fix", "init_img": init,
         "face_boxes": [{"x": 16, "y": 16, "w": 24, "h": 24}],
         "sampling_steps": 2, "seed": 1, "H": 64, "W": 64,
         "safety_check": False, "auto_face_fix_strength": 0.5,
         "ckpt": "ignored.safetensors"},
        lambda msg: None, lambda img, meta: results.append((img, meta)))
    assert len(results) == 1
    img, meta = results[0]
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    assert meta["mode"] == "face_fix"
