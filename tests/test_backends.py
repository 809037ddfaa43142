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


def test_weightgated_families_report_coverage_note():
    w = EngineWorker()
    register_default_backends(w, Preferences())
    w.start()
    w.submit({"type": MP_MESSAGE_TYPE_INFERENCE,
              "generator_model_type": "Kandinsky 2.2",
              "parameters": {}})
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
    assert done and "COVERAGE" in done["job_done"]["error"]


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
