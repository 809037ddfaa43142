import queue
import time

import pytest

from cremage_tpu.app.backends import register_default_backends
from cremage_tpu.app.worker import EngineWorker, MP_MESSAGE_TYPE_INFERENCE
from cremage_tpu.core.config import GENERATOR_MODEL_TYPES, Preferences


def test_all_reference_model_types_registered():
    w = EngineWorker()
    register_default_backends(w, Preferences())
    for gmt in GENERATOR_MODEL_TYPES:
        assert gmt in w._factories, gmt


def test_unconfigured_model_reports_structured_error():
    """A job for an unconfigured family must produce job_done{ok:False}
    with a clear message, not kill the worker (reference behavior gap:
    its ML loop died silently — SURVEY.md §5)."""
    w = EngineWorker()
    register_default_backends(w, Preferences(ldm_model="None"))
    w.start()
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "SD 1.5",
              "parameters": {"prompt": "x"}})
    done = None
    end = time.time() + 30
    while time.time() < end:
        try:
            m = w.status_queue.get(timeout=0.5)
        except queue.Empty:
            continue
        if isinstance(m, dict) and "job_done" in m:
            done = m
            break
    w.stop()
    assert done is not None and not done["job_done"]["ok"]
    assert "ldm_model" in done["job_done"]["error"]


def test_all_families_have_real_backends_with_actionable_errors():
    """No weight-gated stubs remain: every family routes to a real
    loader, and a job without weights fails with a message naming the
    checkpoint inputs it needs (not a COVERAGE pointer)."""
    w = EngineWorker()
    register_default_backends(w, Preferences())
    w.start()
    expectations = {
        "Kandinsky 2.2": "prior_ckpt",
        "Stable Cascade": "stage_c_ckpt",
        "Hunyuan DiT": "dit_ckpt",
    }
    for gmt, needle in expectations.items():
        w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
                  "generator_model_type": gmt,
                  "parameters": {"prompt": "x"}})
        done = None
        end = time.time() + 30
        while time.time() < end:
            try:
                m = w.status_queue.get(timeout=0.5)
            except queue.Empty:
                continue
            if isinstance(m, dict) and "job_done" in m:
                done = m
                break
        assert done is not None and not done["job_done"]["ok"], gmt
        assert needle in done["job_done"]["error"], (gmt, done)
    w.stop()


def test_loader_signatures_importable():
    from cremage_tpu.pipelines import loader as L

    assert callable(L.load_sd15_bundle)
    assert callable(L.load_sdxl_bundle)
    assert callable(L.load_sd3_bundle)
    assert callable(L.load_flux_bundle)
    assert callable(L.load_pixart_bundle)
    assert callable(L.load_svd_bundle)
    assert callable(L.load_kandinsky_prior)
    assert callable(L.load_kandinsky_decoder)
    assert callable(L.load_hunyuan_dit)
    assert callable(L.load_movq_decoder)
    assert callable(L.load_cascade_stage_c)


def test_cached_instance_keep_instance_semantics():
    """Reference keep_instance behavior (flux/txt2img.py:74,125)
    generalized: same key reuses the resident pipeline (its jitted
    program cache survives across jobs); a key change evicts and
    rebuilds; a single global slot mirrors one-model-resident HBM."""
    from cremage_tpu.app.backends import cached_instance, clear_instance_cache

    clear_instance_cache()
    builds = []

    def make(tag):
        def build():
            builds.append(tag)
            return object()
        return build

    a1 = cached_instance(("sd15", "a.ckpt"), make("a"))
    a2 = cached_instance(("sd15", "a.ckpt"), make("a"))
    assert a1 is a2 and builds == ["a"]

    b1 = cached_instance(("sd15", "b.ckpt"), make("b"))
    assert b1 is not a1 and builds == ["a", "b"]

    # returning to the first key rebuilds (single resident slot)
    a3 = cached_instance(("sd15", "a.ckpt"), make("a"))
    assert a3 is not a1 and builds == ["a", "b", "a"]
    clear_instance_cache()


def test_sd15_backend_reuses_pipeline_across_jobs(monkeypatch, tmp_path):
    """Two identical jobs through the real sd15 factory must build the
    bundle once; flipping auto_face_fix must not leak a stale fixer."""
    import numpy as np

    import cremage_tpu.app.backends as B

    loads = []

    class FakePipe:
        def __init__(self, bundle):
            self.bundle = bundle
            self.face_fixer = "stale"

        def generate(self, opts, status_cb=None, result_cb=None, **kw):
            result_cb(np.zeros((8, 8, 3), np.float32), {"seed": 0})

    ckpt = tmp_path / "m.safetensors"
    ckpt.write_bytes(b"")
    monkeypatch.setattr(
        "cremage_tpu.pipelines.loader.load_sd15_bundle",
        lambda *a, **k: loads.append(1) or object())
    monkeypatch.setattr("cremage_tpu.pipelines.sd15.SD15Pipeline", FakePipe)

    gen = B.sd15_factory(Preferences())
    results = []
    params = {"prompt": "x", "ckpt": str(ckpt), "auto_face_fix": False}
    gen(dict(params), lambda m: None, lambda i, m: results.append(i))
    gen(dict(params), lambda m: None, lambda i, m: results.append(i))
    assert len(loads) == 1 and len(results) == 2
    # the per-job fixer reset cleared the FakePipe's 'stale' marker
    assert B._instance.face_fixer is None
    B.clear_instance_cache()
