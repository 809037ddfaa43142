#!/usr/bin/env python
"""Op-level profile of the SDXL base UNet eval on device (1024^2, CFG
batch 2). Same method as tools/profile_svd.py: chained evals in one jit,
jax.profiler trace, xprof hlo_stats table."""
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

REPS = int(os.environ.get("PROF_REPS", "8"))
B = int(os.environ.get("PROF_BATCH", "2"))        # CFG pair


def main():
    enable_compilation_cache()
    from cremage_tpu.models.unet import UNetModel, sdxl_base_unet_config

    h = w = 128
    unet = UNetModel(sdxl_base_unet_config())
    x = jax.random.normal(jax.random.key(0), (B, h, w, 4), jnp.bfloat16)
    t = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.key(1), (B, 77, 2048), jnp.bfloat16)
    vec = jax.random.normal(jax.random.key(2), (B, 2816), jnp.bfloat16)

    shapes = jax.eval_shape(unet.init, jax.random.key(0), x, t, ctx, vec)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def run(params, x):
        def body(i, xx):
            out = unet.apply(params, xx, t, ctx, vec)
            return xx + 0.01 * out.astype(xx.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    fn = jax.jit(run)
    np.asarray(fn(params, x))

    t0 = time.perf_counter()
    np.asarray(fn(params, x))
    wall = time.perf_counter() - t0
    print(f"sdxl-unet eval (b{B}): {wall / REPS * 1e3:.2f} ms "
          f"({REPS} chained evals)", flush=True)

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sdxl_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(fn(params, x))

    import glob
    import json
    from collections import defaultdict
    from xprof.convert import raw_to_tool_data

    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True))[-1:]
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
