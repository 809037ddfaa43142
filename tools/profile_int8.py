#!/usr/bin/env python
"""int8 w8a8 vs bf16 UNet eval on device, with op-level attribution.

Times the chained UNet eval (sd15 b8 CFG / sdxl b2 CFG hot shapes) with
bf16 params and with int8 w8a8 params (io/quantize.py quantized_zeros,
convs included), prints the speedup, then the hlo_stats table of the
int8 variant so the quantize/dequantize epilogues are visible next to
the s8 convolution/dot fusions.

Usage: python tools/profile_int8.py [sd15|sdxl] [trace_dir]
Method per memory `tpu-tunnel-profiling` (chained fori in one dispatch;
np.asarray to force completion; xprof hlo_stats for op truth).
"""
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.lax as lax
import jax.numpy as jnp

from cremage_tpu.core.cache import enable_compilation_cache
from cremage_tpu.io.quantize import quantized_zeros

REPS = int(os.environ.get("PROF_REPS", "8"))


def build(family):
    from cremage_tpu.models.unet import (
        UNetModel, sd15_unet_config, sdxl_base_unet_config,
    )

    if family == "sd15":
        unet = UNetModel(sd15_unet_config())
        b, h, w = 8, 64, 64                      # batch 4 + CFG
        args = (
            jax.random.normal(jax.random.key(0), (b, h, w, 4), jnp.bfloat16),
            jnp.full((b,), 500.0),
            jax.random.normal(jax.random.key(1), (b, 77, 768), jnp.bfloat16),
        )
    else:
        unet = UNetModel(sdxl_base_unet_config())
        b, h, w = 2, 128, 128                    # batch 1 + CFG
        args = (
            jax.random.normal(jax.random.key(0), (b, h, w, 4), jnp.bfloat16),
            jnp.full((b,), 500.0),
            jax.random.normal(jax.random.key(1), (b, 77, 2048), jnp.bfloat16),
            jax.random.normal(jax.random.key(2), (b, 2816), jnp.bfloat16),
        )
    shapes = jax.eval_shape(unet.init, jax.random.key(0), *args)
    return unet, shapes, args


def timed(unet, params, args):
    x, rest = args[0], args[1:]

    def run(params, x):
        def body(i, xx):
            out = unet.apply(params, xx, *rest)
            return xx + 0.01 * out.astype(xx.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    fn = jax.jit(run)
    np.asarray(fn(params, x))         # compile + warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(params, x))
        best = min(best, time.perf_counter() - t0)
    return best / REPS, fn


def main():
    enable_compilation_cache()
    family = sys.argv[1] if len(sys.argv) > 1 else "sd15"
    unet, shapes, args = build(family)

    # fp32 storage is the bench lanes' default (measured equal to bf16
    # storage on both UNet lanes, bench.py zeros_params); time BOTH so
    # the int8 ratio is attributable — against a true bf16 baseline a
    # weight-HBM-bound win would otherwise be overstated up to 2x
    fp32 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    t_fp32, _ = timed(unet, fp32, args)
    print(f"{family} unet eval fp32 store: {t_fp32 * 1e3:8.2f} ms",
          flush=True)
    del fp32
    bf16 = jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16 if s.dtype == jnp.float32 else s.dtype),
        shapes)
    t_bf16, _ = timed(unet, bf16, args)
    print(f"{family} unet eval bf16 store: {t_bf16 * 1e3:8.2f} ms",
          flush=True)
    del bf16

    qparams = quantized_zeros(shapes, dtype="int8", include_convs=True)
    t_int8, fn = timed(unet, qparams, args)
    print(f"{family} unet eval int8 w8a8:  {t_int8 * 1e3:8.2f} ms "
          f"({t_fp32 / t_int8:.2f}x vs fp32, {t_bf16 / t_int8:.2f}x vs "
          f"bf16)", flush=True)

    trace_dir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{family}_int8_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(fn(qparams, args[0]))

    import glob
    import json
    from collections import defaultdict

    from xprof.convert import raw_to_tool_data

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))[-1:]
    if not files:
        raise SystemExit(f"no .xplane.pb trace files under {trace_dir} — "
                         "the profiler wrote nothing (timings above are "
                         "still valid)")
    data, _ = raw_to_tool_data.xspace_to_tool_data(files, "hlo_stats", {})
    tab = json.loads(data)
    cols = [c["id"] for c in tab["cols"]]
    rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]]))
            for r in tab["rows"]]
    agg = defaultdict(float)
    for r in rows:
        agg[r["category"]] += float(r.get("total_self_time") or 0)
    total = sum(agg.values())
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v / 1e3:10.2f} ms {100 * v / total:7.2f}%")
    print(f"total device self time: {total / 1e3:.1f} ms ({REPS} evals)")
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    print(f"\n{'self ms':>9s} {'bound':8s} {'bw GB/s':>8s}  op")
    for r in rows[:25]:
        bw = float(r.get("measured_memory_bw") or 0)
        name = (r.get("tf_op_name") or "").split("UNetModel/")[-1][:80]
        print(f"{float(r['total_self_time']) / 1e3:9.2f} "
              f"{(r.get('bound_by') or '?'):8s} {bw:8.1f}  {name}")


if __name__ == "__main__":
    main()
