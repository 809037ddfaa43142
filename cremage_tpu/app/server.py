"""HTTP API server — the headless front end replacing the GTK UI layer.

The reference's product surface is a GTK window over the job queue
(SURVEY.md L5/L4). Here the same capabilities are a JSON HTTP API over
the EngineWorker:

  POST /v1/generate        job dict (reference mp protocol), returns job id
  GET  /v1/status          drain pending status/result messages
  GET  /v1/health          liveness + device info + metrics
  POST /v1/tools/annotate  {"method": "canny", "image": b64png}
  POST /v1/tools/scale     {"image": b64png, "scale": 2.0}
  POST /v1/tools/crop      {"image": b64png, "x","y","w","h"}
  POST /v1/tools/mix       {"paths": [...], "weights": [...], "output": p}
  POST /v1/tools/interpolate {"frames": [b64...], "passes": 2}
  POST /v1/tools/face_detect {"image": b64png, "method": "OpenCV"}
  POST /v1/tools/face_fix  {"init_img": path, "face_boxes": [...]} -> job
  POST /v1/tools/unblur    {"image": b64png}   (also /colorize, /gfpgan)

stdlib ThreadingHTTPServer — no extra dependencies; any thin client
(web UI, notebook, GTK shell) can sit on top.
"""
from __future__ import annotations

import base64
import io
import json
import logging
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from cremage_tpu.app.worker import EngineWorker, MP_MESSAGE_TYPE_INFERENCE

logger = logging.getLogger(__name__)


class BadRequest(ValueError):
    """Maps to HTTP 400 (vs 500 for internal failures)."""


# request validation bounds (reference GTK UI constrains these through
# its widgets; a headless API must enforce them server-side)
MAX_EDGE = 4096
MAX_STEPS = 1000
MAX_BATCH = 64
MAX_B64_BYTES = 64 * 1024 * 1024


# job-dict envelope keys (reference mp protocol); everything else is a
# generation parameter and belongs under job["parameters"]
_JOB_ENVELOPE_KEYS = ("type", "generator_model_type", "mode", "parameters")


def _normalize_generate(body: dict) -> dict:
    """Accept both the reference job shape ({"generator_model_type",
    "mode", "parameters": {...}}) and a flat dict with generation
    fields at the top level (folded into "parameters") — the worker
    passes ONLY job["parameters"] to the backend, so mode and
    generator_model_type are mirrored into it (GenerationOptions carries
    both; backends read opts.mode to pick the inpaint model). JSON null
    values are dropped so they never override GenerationOptions
    defaults."""
    job = {k: body[k] for k in _JOB_ENVELOPE_KEYS if k in body}
    extra = {k: v for k, v in body.items() if k not in _JOB_ENVELOPE_KEYS}
    params = dict(job.get("parameters") or {})
    for k, v in extra.items():
        params.setdefault(k, v)
    for k in ("mode", "generator_model_type"):
        if k in job:
            params.setdefault(k, job[k])
    job["parameters"] = {k: v for k, v in params.items() if v is not None}
    return job


def _validate_generate(job) -> Optional[str]:
    """Validates the NORMALIZED job (what the worker will consume)."""
    from cremage_tpu.core.config import GENERATOR_MODEL_TYPES

    gmt = job.get("generator_model_type")
    if gmt is not None and gmt not in GENERATOR_MODEL_TYPES:
        return (f"unknown generator_model_type {gmt!r}; "
                f"one of {GENERATOR_MODEL_TYPES}")
    p = job["parameters"]
    for dim in ("H", "W"):
        v = p.get(dim)
        if v is None:
            continue
        if not isinstance(v, int) or not (8 <= v <= MAX_EDGE) or v % 8:
            return f"{dim} must be a multiple of 8 in [8, {MAX_EDGE}]"
    steps = p.get("sampling_steps")
    if steps is not None and (not isinstance(steps, int)
                              or not 1 <= steps <= MAX_STEPS):
        return f"sampling_steps must be an int in [1, {MAX_STEPS}]"
    for k in ("n_samples", "n_iter"):
        v = p.get(k)
        if v is not None and (not isinstance(v, int)
                              or not 1 <= v <= MAX_BATCH):
            return f"{k} must be an int in [1, {MAX_BATCH}]"
    return None


def _b64_to_image(data: str) -> np.ndarray:
    from PIL import Image

    if len(data) > MAX_B64_BYTES:
        raise BadRequest(f"image payload exceeds {MAX_B64_BYTES} bytes")
    try:
        raw = base64.b64decode(data)
        img = Image.open(io.BytesIO(raw)).convert("RGB")
    except Exception as e:
        raise BadRequest(f"undecodable image payload: {e}") from e
    if max(img.size) > MAX_EDGE:
        raise BadRequest(f"image edge exceeds {MAX_EDGE}")
    return np.asarray(img, np.float32) / 255.0


def _image_to_b64(img01: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.clip(img01, 0, 1) * 255).astype(np.uint8)).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _b64_to_mask(data: str) -> np.ndarray:
    """b64 PNG -> (H,W) float mask in [0,1] (white = selected)."""
    from PIL import Image

    if len(data) > MAX_B64_BYTES:
        raise BadRequest(f"mask payload exceeds {MAX_B64_BYTES} bytes")
    try:
        raw = base64.b64decode(data)
        img = Image.open(io.BytesIO(raw)).convert("L")
    except Exception as e:
        raise BadRequest(f"undecodable mask payload: {e}") from e
    if max(img.size) > MAX_EDGE:
        raise BadRequest(f"mask edge exceeds {MAX_EDGE}")
    return np.asarray(img, np.float32) / 255.0


def _mask_to_b64(mask: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.clip(mask, 0, 1) * 255).astype(np.uint8), "L").save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


class ApiServer:
    def __init__(self, worker: Optional[EngineWorker] = None,
                 host: str = "127.0.0.1", port: int = 8787,
                 prefs=None, config_path: Optional[str] = None):
        self.worker = worker or EngineWorker()
        if self.worker.save_root is None:
            # enable path-delivery results: generated PNGs land in the
            # outputs library (reference behavior) and the status
            # channel carries a file reference instead of b64 payload
            from cremage_tpu.app import dirs as D

            self.worker.save_root = D.first_init()
        self.host = host
        self.port = port
        self.prefs = prefs          # shared instance: backends see edits
        self.config_path = config_path
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._job_counter = 0
        self._prompt_history = None
        self._llm = None

    def _llm_interactor(self):
        if self._llm is None:
            from cremage_tpu.app.llm import LLMInteractor

            self._llm = LLMInteractor()
        return self._llm

    def _history(self):
        if self._prompt_history is None:
            from cremage_tpu.app import dirs as D
            from cremage_tpu.prompt.history import PromptHistory

            self._prompt_history = PromptHistory(
                os.path.join(D.first_init(), "data", "prompt_history.json"))
        return self._prompt_history

    # ----- route handlers -----

    def handle(self, method: str, path: str, body: Dict[str, Any]):
        if path == "/v1/meta":
            from cremage_tpu.core.config import GENERATOR_MODEL_TYPES
            from cremage_tpu.samplers.edm import SGM_SAMPLER_NAMES
            from cremage_tpu.samplers.kdiffusion import SAMPLER_SCHEDULE

            kdiff = ["DDIM"] + sorted(SAMPLER_SCHEDULE)
            # engine-reachable beyond the reference's 12-name menu
            # (reference vendors these but never lists them:
            # sampler_utils.py:21-34 vs image_generator.py:42-43)
            extra = ["PLMS", "DPM Solver", "LCM"]
            sgm = list(SGM_SAMPLER_NAMES)
            # SDXL/SVD run the SGM sampler menu; everything else takes
            # the k-diffusion/DDIM names (flow families ignore it)
            by_type = {t: (sgm if t in ("SDXL", "SVD") else kdiff)
                       for t in GENERATOR_MODEL_TYPES}
            # progress granularity capability: "step" when the backend
            # compiles in-scan io_callback progress; "chunked" when the
            # segmented-sampler path provides per-step-ish updates
            # (samplers/chunked.py, e.g. the axon TPU tunnel); clients
            # can size their progress UI accordingly
            from cremage_tpu.samplers.chunked import default_segments
            from cremage_tpu.samplers.kdiffusion import (
                CHUNKABLE_PLANS, progress_callbacks_supported)

            if progress_callbacks_supported():
                progress = {"granularity": "step"}
            else:
                progress = {
                    "granularity": "chunked",
                    "segments": default_segments(),
                    "chunked_samplers": sorted(CHUNKABLE_PLANS)
                    + ["DDIM", "EulerEDMSampler", "EulerAncestralSampler",
                       "DPMPP2MSampler"],
                }
            return {
                "model_types": list(GENERATOR_MODEL_TYPES),
                "samplers": kdiff,
                "extra_samplers": extra,
                "sgm_samplers": sgm,
                "samplers_by_type": by_type,
                "progress": progress,
            }
        if path == "/v1/health":
            import jax

            from cremage_tpu.utils.observability import METRICS

            return {
                "ok": True,
                "devices": [str(d) for d in jax.devices()],
                "metrics": METRICS.snapshot(),
            }
        if path == "/v1/generate" and method == "POST":
            if not isinstance(body, dict):
                raise BadRequest("body must be a JSON object")
            if "parameters" in body and not isinstance(
                    body["parameters"], dict):
                raise BadRequest("parameters must be a JSON object")
            job = _normalize_generate(body)
            err = _validate_generate(job)
            if err:
                raise BadRequest(err)
            self._job_counter += 1
            job.setdefault("type", MP_MESSAGE_TYPE_INFERENCE)
            prompt = job["parameters"].get("prompt")
            if prompt:
                # reference records every submitted prompt for the
                # prompt-history viewer (utils/prompt_history.py)
                try:
                    self._history().add(prompt)
                except Exception:
                    logger.debug("prompt history update failed")
            self.worker.submit(job)
            return {"job_id": self._job_counter}
        if path == "/v1/status":
            msgs = []
            while True:
                try:
                    m = self.worker.status_queue.get_nowait()
                except queue.Empty:
                    break
                if isinstance(m, dict) and "image" in m:
                    m = {
                        "image_b64": base64.b64encode(m["image"]).decode(),
                        "generation_parameters": m["generation_parameters"],
                    }
                msgs.append(m)
            return {"messages": msgs}
        if path == "/v1/tools/annotate" and method == "POST":
            from cremage_tpu.services.annotators import annotate

            img = _b64_to_image(body["image"])
            out = annotate(body.get("method", "canny"), img)
            return {"image": _image_to_b64(out / 255.0 if out.dtype == np.uint8
                                           else out)}
        if path == "/v1/tools/scale" and method == "POST":
            from cremage_tpu.app.tools import scale_image

            img = _b64_to_image(body["image"])
            out = scale_image(img, float(body.get("scale", 2.0)),
                              body.get("esrgan_weights"))
            return {"image": _image_to_b64(out)}
        if path == "/v1/tools/crop" and method == "POST":
            from cremage_tpu.app.tools import crop_image

            img = _b64_to_image(body["image"])
            out = crop_image(img, int(body["x"]), int(body["y"]),
                             int(body["w"]), int(body["h"]))
            return {"image": _image_to_b64(out)}
        if path == "/v1/tools/mix" and method == "POST":
            from cremage_tpu.app.tools import mix_models

            out = mix_models(body["paths"], body["weights"], body["output"])
            return {"output": out}
        if path == "/v1/tools/interpolate" and method == "POST":
            from cremage_tpu.services.film import interpolate_recursively

            frames = [_b64_to_image(f) for f in body["frames"]]
            out = interpolate_recursively(frames, int(body.get("passes", 1)))
            return {"frames": [_image_to_b64(f) for f in out]}
        if path == "/v1/tools/tokenize" and method == "POST":
            from cremage_tpu.app.tools import tokenize_preview

            return tokenize_preview(body.get("prompt", ""))
        if path == "/v1/tools/mask" and method == "POST":
            # mask editor ops (reference tools/mask_image_editor.py:33)
            from cremage_tpu.app.tools import (
                dilate_mask, erode_mask, invert_mask, make_mask,
            )

            op = body.get("op", "make")
            if op == "make":
                rects = [tuple(int(v) for v in r)
                         for r in body.get("rects", [])]
                mask = make_mask(int(body["h"]), int(body["w"]), rects)
            else:
                mask = _b64_to_mask(body["mask"])
                if op == "dilate":
                    mask = dilate_mask(mask, int(body.get("pixels", 8)))
                elif op == "erode":
                    mask = erode_mask(mask, int(body.get("pixels", 8)))
                elif op == "invert":
                    mask = invert_mask(mask)
                else:
                    raise BadRequest(f"unknown mask op {op!r}")
            return {"mask": _mask_to_b64(mask)}
        if path == "/v1/tools/graffiti" and method == "POST":
            # graffiti editor strokes (reference tools/graffiti_editor.py)
            from cremage_tpu.app.tools import draw_strokes

            img = (_b64_to_image(body["image"])
                   if body.get("image") else None)
            h = int(body.get("h", img.shape[0] if img is not None else 512))
            w = int(body.get("w", img.shape[1] if img is not None else 512))
            out = draw_strokes(img, h, w, body.get("strokes", []))
            return {"image": _image_to_b64(out)}
        if path == "/v1/tools/face_detect" and method == "POST":
            # mark faces (reference tools/face_detector.py "Mark faces",
            # face_detector_engine.mark_faces; both UI menu methods)
            from cremage_tpu.app.tools import detect_face_boxes
            from cremage_tpu.services.facefix import WeightsUnavailable

            img = _b64_to_image(body["image"])
            try:
                boxes = detect_face_boxes(img, body.get("method", "OpenCV"),
                                          body.get("model_path"))
            except (WeightsUnavailable, ValueError) as e:
                raise BadRequest(str(e))
            return {"boxes": boxes}
        if path == "/v1/tools/face_fix" and method == "POST":
            # standalone face fix routed as a job (tools/face_detector.py:
            # img2img-repair each detected or user-marked box)
            from cremage_tpu.core.config import MODE_FACE_FIX

            job = _normalize_generate(body)
            job["parameters"]["mode"] = MODE_FACE_FIX
            job.setdefault("generator_model_type", "SD 1.5")
            if not job["parameters"].get("init_img"):
                raise BadRequest(
                    "face_fix needs an init_img path (stage it via "
                    "/v1/upload); optional face_boxes [{x,y,w,h}] skip "
                    "detection")
            err = _validate_generate(job)
            if err:
                raise BadRequest(err)
            self._job_counter += 1
            job.setdefault("type", MP_MESSAGE_TYPE_INFERENCE)
            self.worker.submit(job)
            return {"job_id": self._job_counter}
        if path in ("/v1/tools/unblur", "/v1/tools/colorize") \
                and method == "POST":
            # face unblur / colorize menu tools (reference
            # face_unblur.py:57-68; CremageModelV6 on aligned crops)
            from cremage_tpu.app.tools import colorize_faces, unblur_faces
            from cremage_tpu.services.facefix import WeightsUnavailable

            img = _b64_to_image(body["image"])
            fn = (unblur_faces if path.endswith("unblur")
                  else colorize_faces)
            try:
                out = fn(img, body.get("weights_path"),
                         body.get("yunet_path"))
            except (WeightsUnavailable, RuntimeError, ValueError) as e:
                raise BadRequest(str(e))
            return {"image": _image_to_b64(out)}
        if path == "/v1/tools/gfpgan" and method == "POST":
            # GFPGAN restoration tool (reference tools/gfpgan_wrapper.py)
            from cremage_tpu.app.tools import gfpgan_restore

            img = _b64_to_image(body["image"])
            try:
                out = gfpgan_restore(img, body.get("weights_path"),
                                     float(body.get("scale", 1.0)))
            except FileNotFoundError as e:
                raise BadRequest(str(e))
            return {"image": _image_to_b64(out)}
        if path == "/v1/tools/segment" and method == "POST":
            # segmentation-inpainting mask (reference image_segmenter.py:90)
            from cremage_tpu.app.tools import (
                SEGMENT_CLASS_TO_LABEL, segment_for_inpaint,
            )

            if method == "POST" and not body.get("image"):
                return {"labels": sorted(SEGMENT_CLASS_TO_LABEL.values())}
            img = _b64_to_image(body["image"])
            labels = body.get("labels", [])
            if not labels:
                raise BadRequest("labels must be a non-empty list")
            mask = segment_for_inpaint(img, labels,
                                       body.get("weights_path"))
            return {"mask": _mask_to_b64(mask)}
        if path == "/v1/tools/prompt_builder" and method in ("GET", "POST"):
            # visual prompt builder (reference tools/prompt_builder.py:24)
            from cremage_tpu.app import dirs as D
            from cremage_tpu.app.tools import (
                build_prompt_from_tags, list_prompt_builder_categories,
            )

            pdir = (body or {}).get("dir") or os.path.join(
                D.first_init(), "data", "prompt_builder")
            if method == "GET" or "selections" not in (body or {}):
                return {"categories": list_prompt_builder_categories(pdir)}
            return {"prompt": build_prompt_from_tags(
                pdir, body["selections"])}
        if path == "/v1/tools/spot_inpaint" and method == "POST":
            # spot inpainter routed as a job (reference spot_inpainter.py:100)
            from cremage_tpu.core.config import MODE_SPOT_INPAINTING

            job = _normalize_generate(body)
            job["parameters"]["mode"] = MODE_SPOT_INPAINTING
            job.setdefault("generator_model_type", "SD 1.5")
            p = job["parameters"]
            if not p.get("init_img") or not p.get("mask_img"):
                raise BadRequest(
                    "spot_inpaint needs init_img and mask_img paths "
                    "(stage them via /v1/upload)")
            err = _validate_generate(job)
            if err:
                raise BadRequest(err)
            self._job_counter += 1
            job.setdefault("type", MP_MESSAGE_TYPE_INFERENCE)
            self.worker.submit(job)
            return {"job_id": self._job_counter}
        if path == "/v1/llm/chat" and method == "POST":
            # LLM interactor (reference tools/llm_interactor.py:345)
            from cremage_tpu.app.llm import LLMUnavailable

            llm = self._llm_interactor()
            if body.get("reset"):
                llm.reset()
                if not body.get("message"):
                    return {"reply": None, "content": []}
            msg = body.get("message")
            if not msg:
                raise BadRequest("message must be a non-empty string")
            img = (_b64_to_image(body["image"])
                   if body.get("image") else None)
            try:
                reply = llm.chat(msg, img)
            except LLMUnavailable as e:
                raise BadRequest(f"LLM backend unavailable: {e}")
            return {"reply": reply, "content": llm.content}
        # image library (reference listbox capabilities: list/favorite/trash)
        if path == "/v1/images" and method == "GET":
            from cremage_tpu.app import dirs as D

            root = D.first_init()
            return {"images": D.list_images(root)}
        if path == "/v1/images/favorite" and method == "POST":
            from cremage_tpu.app import dirs as D

            root = D.first_init()
            return {"favorite": D.favorite_image(root, body["path"])}
        if path == "/v1/preferences" and method == "GET":
            # preferences dialog equivalent (reference ui preferences)
            if self.prefs is None:
                return {"preferences": None}
            return {"preferences": self.prefs.to_dict()}
        if path == "/v1/preferences" and method == "POST":
            if self.prefs is None:
                raise BadRequest("server started without a config")
            import dataclasses as _dc

            fields = {f.name: f.type for f in _dc.fields(self.prefs)}
            unknown = [k for k in body if k not in fields]
            if unknown:
                raise BadRequest(f"unknown preference keys: {unknown}")
            for k, v in body.items():
                # mutate the SHARED instance so registered backends see
                # the change (same object semantics as the reference's
                # app.preferences dict)
                setattr(self.prefs, k, v)
            if self.config_path:
                from cremage_tpu.core.config import save_preferences

                save_preferences(self.prefs, self.config_path)
            return {"preferences": self.prefs.to_dict()}
        if path == "/v1/history" and method == "GET":
            # prompt-history viewer (reference ui prompt history)
            return {"prompts": self._history().entries()}
        if path == "/v1/tools/embeddings" and method == "POST":
            # TI-embedding viewer (reference ui embedding viewer):
            # list embedding files with their vector shapes
            from cremage_tpu.io.ti import load_embedding

            d = body.get("dir") or ""
            out = []
            if os.path.isdir(d):
                for name in sorted(os.listdir(d)):
                    if not name.lower().endswith(
                            (".pt", ".bin", ".safetensors")):
                        continue
                    entry = {"name": name}
                    try:
                        emb = load_embedding(os.path.join(d, name))
                        if isinstance(emb, dict):
                            entry["shapes"] = {k: list(v.shape)
                                               for k, v in emb.items()}
                        else:
                            entry["shape"] = list(np.asarray(emb).shape)
                    except Exception as e:
                        entry["error"] = str(e)
                    out.append(entry)
            return {"embeddings": out}
        if path == "/v1/upload" and method == "POST":
            # stage an input image (init_img / mask_img / control image)
            # into the library tmp dir and return its server path — the
            # backends consume file paths (reference job protocol)
            import uuid

            from PIL import Image

            from cremage_tpu.app import dirs as D

            img = _b64_to_image(body["image"])
            root = D.first_init()
            name = f"upload_{uuid.uuid4().hex[:12]}.png"
            p2 = os.path.join(root, "tmp", name)
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)).save(p2)
            return {"path": p2}
        if path == "/v1/faces" and method == "GET":
            from cremage_tpu.app import dirs as D

            return {"faces": D.list_faces(D.first_init())}
        if path == "/v1/faces" and method == "POST":
            from cremage_tpu.app import dirs as D

            img = _b64_to_image(body["image"])
            return {"path": D.save_face_image(D.first_init(), img)}
        if path == "/v1/images/trash" and method == "POST":
            from cremage_tpu.app import dirs as D

            root = D.first_init()
            return {"trash": D.trash_image(root, body["path"])}
        return None

    # ----- plumbing -----

    def _make_handler(server):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):
                logger.debug(fmt, *args)

            def _reply(self, code, payload):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _reply_raw(self, code, data, ctype):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def _dispatch(self, method):
                from urllib.parse import parse_qs, urlparse

                parsed = urlparse(self.path)
                if method == "GET" and parsed.path in ("/", "/ui"):
                    from cremage_tpu.app.webui import INDEX_HTML

                    return self._reply_raw(200, INDEX_HTML.encode(),
                                           "text/html; charset=utf-8")
                if method == "GET" and parsed.path in (
                        "/v1/images/file", "/v1/images/meta"):
                    import os as _os

                    from cremage_tpu.app import dirs as D

                    q = parse_qs(parsed.query)
                    p = (q.get("path") or [""])[0]
                    root = _os.path.realpath(D.first_init())
                    rp = _os.path.realpath(p)
                    # only files inside the image library are served
                    if (not rp.startswith(root + _os.sep)
                            or not _os.path.isfile(rp)):
                        return self._reply(404, {"error": "not found"})
                    if parsed.path == "/v1/images/meta":
                        # "Use generation info": replay a past image's
                        # parameters (reference generate_handler.py:274)
                        from cremage_tpu.io.metadata import (
                            read_generation_data,
                        )

                        return self._reply(
                            200, {"generation_data":
                                  read_generation_data(rp)})
                    ctype = ("video/mp4" if rp.lower().endswith(".mp4")
                             else "image/png")
                    with open(rp, "rb") as f:
                        return self._reply_raw(200, f.read(), ctype)
                length = int(self.headers.get("Content-Length") or 0)
                body = {}
                if length:
                    try:
                        body = json.loads(self.rfile.read(length))
                    except json.JSONDecodeError:
                        return self._reply(400, {"error": "bad json"})
                try:
                    out = server.handle(method, self.path, body)
                except BadRequest as e:
                    return self._reply(400, {"error": str(e)})
                except Exception as e:  # structured errors
                    logger.exception("request failed")
                    return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                if out is None:
                    return self._reply(404, {"error": "not found"})
                return self._reply(200, out)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

        return Handler

    def start(self, block: bool = False):
        from cremage_tpu.core.cache import enable_compilation_cache

        enable_compilation_cache()
        self.worker.start()
        self._httpd = ThreadingHTTPServer(
            (self.host, self.port), self._make_handler())
        self.port = self._httpd.server_address[1]
        if block:
            self._httpd.serve_forever()
        else:
            threading.Thread(target=self._httpd.serve_forever,
                             daemon=True).start()
        logger.info("api server on %s:%d", self.host, self.port)

    def stop(self):
        if self._httpd:
            self._httpd.shutdown()
            self._httpd = None
        self.worker.stop()


def make_text_safety(model_dir: Optional[str] = None, deny_terms=()):
    """TextSafetyChecker for the worker's pre-queue prompt gate: the
    native BERT classifier when a model dir is given (the reference
    downloads HowToSD/text_prompt_safety_checker), else a deny-list."""
    from cremage_tpu.services.safety import TextSafetyChecker

    predictor = None
    if model_dir:
        from cremage_tpu.services.text_safety_bert import load_bert_predictor

        predictor = load_bert_predictor(model_dir)
    return TextSafetyChecker(predictor=predictor, deny_terms=deny_terms)


def main():  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser("cremage-tpu-server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8787)
    p.add_argument("--text-safety-model-dir", default=None,
                   help="dir with the BERT prompt-safety classifier "
                        "(vocab.txt + model weights)")
    p.add_argument("--deny-term", action="append", default=[],
                   help="prompt deny-list fallback term (repeatable)")
    p.add_argument("--config", default=None,
                   help="config.yaml path (created with defaults if absent)")
    p.add_argument("--coalesce", type=int, default=1,
                   help="serving mode: batch up to N adjacent compatible "
                        "txt2img jobs into one device batch "
                        "(app/batching.py). 1 = off (reference behavior)")
    args = p.parse_args()
    from cremage_tpu.app.backends import register_default_backends
    from cremage_tpu.core.config import load_preferences

    prefs = load_preferences(args.config) if args.config else None
    worker = EngineWorker(text_safety=make_text_safety(
        args.text_safety_model_dir, args.deny_term),
        coalesce=args.coalesce)
    register_default_backends(worker, prefs)
    ApiServer(worker=worker, host=args.host, port=args.port,
              prefs=prefs, config_path=args.config).start(block=True)


if __name__ == "__main__":  # pragma: no cover
    main()
