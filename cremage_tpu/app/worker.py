"""Job queue + engine worker — the L4 equivalent of the reference's
UI<->ML process bridge (`modules/cremage/mp/mp.py`).

Same message protocol:
- jobs are dicts {"type": "inference", "generator_model_type": <GMT_*>,
  "mode": <text_to_image|image_to_image|inpainting>, "parameters": {...}}
  (mp.py:46-121 dispatch);
- the status channel carries str progress messages and
  {"image": png_bytes, "generation_parameters": json_str} results
  (image_generator.py:1231-1238).

TPU-native design difference: one process, a worker *thread* — a TPU
device can't be shared across forked processes, and all heavy work runs
on device anyway. Improvements over the reference (SURVEY.md §5 "failure
detection"): every job produces a structured terminal message
{"job_done": {"ok": bool, "error": str|None}} instead of dying silently,
and backends are registered lazily per model family like the reference's
lazy imports.
"""
from __future__ import annotations

import io
import json
import logging
import queue
import threading
from typing import Any, Callable, Dict, Optional

logger = logging.getLogger(__name__)

MP_MESSAGE_TYPE_EXIT = "exit"
MP_MESSAGE_TYPE_INFERENCE = "inference"


class EngineWorker:
    """Single worker thread draining a job queue into pipeline backends.

    `backends` maps generator_model_type -> factory() -> callable
    generate(parameters: dict, status_cb, result_cb). Factories run
    lazily on first use (model load happens in the worker thread)."""

    def __init__(self, text_safety=None, coalesce: int = 1,
                 save_root: Optional[str] = None):
        from concurrent.futures import ThreadPoolExecutor

        self.job_queue: "queue.Queue[dict]" = queue.Queue()
        self.status_queue: "queue.Queue[Any]" = queue.Queue()
        self._factories: Dict[str, Callable[[], Callable]] = {}
        self._backends: Dict[str, Callable] = {}
        self._thread: Optional[threading.Thread] = None
        self._running = False
        # PNG encode runs OFF the worker thread so the device starts
        # the next batch while the previous batch's images compress —
        # on the serving path the encode was serial with device compute
        # (the device idled ~0.2-0.4 s per batch).  ONE encode worker
        # guarantees results post in generation order.
        self._encode_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="cremage-encode")
        # app-root for path-delivery results (reference behavior: every
        # generated PNG is saved to the outputs dir before queueing,
        # image_generator.py:1204-1212); set by the API server
        self.save_root = save_root
        # services.safety.TextSafetyChecker; gates inference jobs before
        # they enqueue, like the reference's pre-queue prompt check
        # (generate_handler.py:77-83)
        self.text_safety = text_safety
        # serving mode: group up to N adjacent compatible jobs into one
        # device batch (app/batching.py). 1 = reference behavior (off).
        self.coalesce = max(1, int(coalesce))
        # jobs set aside while scanning for batch members; consumed
        # before the queue so their relative order is preserved
        self._backlog: list = []

    def register_backend(self, model_type: str,
                         factory: Callable[[], Callable]) -> None:
        self._factories[model_type] = factory

    def start(self) -> None:
        if self._thread is not None:
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="cremage-tpu-worker")
        self._thread.start()

    def stop(self, join: bool = True) -> None:
        self.job_queue.put({"type": MP_MESSAGE_TYPE_EXIT})
        if join and self._thread is not None:
            self._thread.join(timeout=30)
            self._thread = None

    def submit(self, job: dict) -> None:
        if (self.text_safety is not None
                and job.get("type") == MP_MESSAGE_TYPE_INFERENCE):
            params = job.get("parameters", {})
            prompt = params.get("prompt", params.get("positive_prompt", ""))
            if params.get("safety_check", True) and prompt \
                    and self.text_safety.should_block(prompt):
                # reference behavior: the job never reaches the queue
                # (generate_handler.py:77-83 error dialog + return)
                self.status_queue.put({"job_done": {
                    "ok": False,
                    "error": "Safety check detected potentially sensitive "
                             "word(s) in prompt. To disable safety check, "
                             "set safety_check=false.",
                }})
                return
        self.job_queue.put(job)

    # -------------------------------------------------------------

    def _backend_for(self, model_type: str) -> Callable:
        if model_type not in self._backends:
            if model_type not in self._factories:
                raise KeyError(f"no backend registered for {model_type!r}")
            self._backends[model_type] = self._factories[model_type]()
        return self._backends[model_type]

    def _next_job(self) -> dict:
        if self._backlog:
            return self._backlog.pop(0)
        return self.job_queue.get()

    def _gather_group(self, job: dict) -> list:
        """Collect up to `coalesce` adjacent queued jobs batch-compatible
        with `job` (same model type + equal coalesce_key). Jobs that do
        not match go to the backlog in order."""
        try:
            backend = self._backend_for(job["generator_model_type"])
        except Exception:
            return [job]
        key_fn = getattr(backend, "coalesce_key", None)
        if key_fn is None or getattr(backend, "generate_batch", None) is None:
            return [job]
        k0 = key_fn(job.get("parameters", {}))
        if k0 is None:
            return [job]
        group = [job]
        scan: list = []
        while len(group) < self.coalesce:
            if scan:
                nxt = scan.pop(0)
            else:
                try:
                    nxt = self.job_queue.get_nowait()
                except queue.Empty:
                    break
            if (nxt.get("type") == MP_MESSAGE_TYPE_INFERENCE
                    and nxt.get("generator_model_type")
                    == job["generator_model_type"]
                    and key_fn(nxt.get("parameters", {})) == k0):
                group.append(nxt)
            else:
                self._backlog.append(nxt)
        self._backlog.extend(scan)
        return group

    def _result_cb(self, job: dict, pending: list) -> Callable:
        """Result callback that offloads PNG encode (and the optional
        outputs-dir save for path delivery) to the encode pool; the
        worker thread returns immediately and dispatches the next batch
        while this batch compresses."""
        delivery = job.get("parameters", {}).get("result_delivery",
                                                 "inline")
        to_path = delivery == "path" and self.save_root is not None

        def encode_and_post(img, meta):
            msg = make_result_message(img, meta)
            if to_path:
                from cremage_tpu.app import dirs as D

                path = D.save_output_image(self.save_root, msg["image"])
                msg = {"image_path": path,
                       "generation_parameters":
                           msg["generation_parameters"]}
            self.status_queue.put(msg)

        def cb(img, meta):
            pending.append(self._encode_pool.submit(encode_and_post,
                                                    img, meta))
        return cb

    def _run_one(self, job: dict) -> None:
        ok, err = True, None
        pending: list = []
        try:
            backend = self._backend_for(job["generator_model_type"])
            backend(
                job.get("parameters", {}),
                self.status_queue.put,
                self._result_cb(job, pending),
            )
            for f in pending:     # job_done must follow all images
                f.result()
        except Exception as e:  # structured failure, keep worker alive
            logger.exception("job failed")
            ok, err = False, f"{type(e).__name__}: {e}"
        self.status_queue.put({"job_done": {"ok": ok, "error": err}})

    def _run_group(self, group: list) -> None:
        backend = self._backend_for(group[0]["generator_model_type"])
        pending: list = []
        try:
            backend.generate_batch(
                [g.get("parameters", {}) for g in group],
                self.status_queue.put,
                [self._result_cb(g, pending) for g in group],
            )
            for f in pending:     # job_done must follow all images
                f.result()
        except Exception:
            # one poison request must not fail its neighbors: fall back
            # to running the group serially (each gets its own job_done)
            logger.exception("coalesced batch failed; retrying serially")
            for g in group:
                self._run_one(g)
            return
        from cremage_tpu.utils.observability import METRICS

        METRICS.incr("coalesced_batches")
        METRICS.incr("coalesced_jobs", len(group))
        for _ in group:
            self.status_queue.put({"job_done": {"ok": True, "error": None}})

    def _loop(self) -> None:
        while self._running:
            job = self._next_job()
            if job.get("type") == MP_MESSAGE_TYPE_EXIT:
                self._running = False
                break
            if job.get("type") != MP_MESSAGE_TYPE_INFERENCE:
                logger.warning("unknown job type %r", job.get("type"))
                continue
            group = ([job] if self.coalesce <= 1
                     else self._gather_group(job))
            if len(group) > 1:
                self._run_group(group)
            else:
                self._run_one(job)


def make_result_message(img, meta: Dict[str, Any]) -> Dict[str, Any]:
    """Encode an image result exactly like the reference's status payload:
    PNG bytes + generation_parameters JSON (with metadata embedded in the
    PNG as well)."""
    from cremage_tpu.io.metadata import image_from_array, GENERATION_DATA_KEY
    from PIL.PngImagePlugin import PngInfo

    pil = image_from_array(img)
    meta_json = json.dumps(meta)
    info = PngInfo()
    info.add_text(GENERATION_DATA_KEY, meta_json)
    buf = io.BytesIO()
    pil.save(buf, format="PNG", pnginfo=info)
    return {"image": buf.getvalue(), "generation_parameters": meta_json}
