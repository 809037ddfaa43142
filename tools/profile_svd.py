#!/usr/bin/env python
"""Op-level profile of the SVD video-UNet eval on device.

Chains PROF_REPS UNet evals inside one jitted program (amortizes the
axon tunnel's ~30 ms dispatch), captures a jax.profiler trace, and
prints the XLA op-stats table (the ground truth for where device time
goes — wall-clock division lies through the tunnel).

Usage: python tools/profile_svd.py [trace_dir]
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

REPS = int(os.environ.get("PROF_REPS", "8"))


def main():
    enable_compilation_cache()
    from cremage_tpu.models.video_unet import VideoUNet, svd_unet_config

    frames, h, w = 14, 72, 128
    unet = VideoUNet(svd_unet_config(), num_frames=frames)
    x = jax.random.normal(jax.random.key(0), (frames, h, w, 8), jnp.bfloat16)
    t = jnp.full((frames,), 500.0)
    ctx = jax.random.normal(jax.random.key(1), (frames, 1, 1024), jnp.bfloat16)
    vec = jax.random.normal(jax.random.key(2), (frames, 768), jnp.float32)

    shapes = jax.eval_shape(unet.init, jax.random.key(0), x, t, ctx, vec)
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def run(params, x):
        def body(i, xx):
            out = unet.apply(params, xx[..., :8], t, ctx, vec)
            return jnp.concatenate(
                [xx[..., :4] + 0.01 * out.astype(xx.dtype), xx[..., 4:]],
                axis=-1)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    fn = jax.jit(run)
    np.asarray(fn(params, x))          # compile + warm

    t0 = time.perf_counter()
    np.asarray(fn(params, x))
    wall = time.perf_counter() - t0
    print(f"video-unet eval: {wall / REPS * 1e3:.2f} ms "
          f"({REPS} chained evals)", flush=True)

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/svd_trace"
    with jax.profiler.trace(trace_dir):
        np.asarray(fn(params, x))

    # xprof hlo-stats extraction: pass ONE session's xplane.pb (multiple
    # sessions in one call return None), parse the gviz JSON table.
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
    print(f"{'category':28s} {'self ms':>10s} {'%':>7s}")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v / 1e3:10.2f} {100 * v / total:7.2f}")
    print(f"total device self time: {total / 1e3:.1f} ms "
          f"({REPS} evals)")
    rows.sort(key=lambda r: -float(r.get("total_self_time") or 0))
    print(f"\n{'self ms':>9s} {'bound':8s} {'bw GB/s':>8s}  op")
    for r in rows[:25]:
        bw = float(r.get("measured_memory_bw") or 0)
        name = (r.get("tf_op_name") or "").split("VideoUNet/")[-1][:80]
        print(f"{float(r['total_self_time']) / 1e3:9.2f} "
              f"{(r.get('bound_by') or '?'):8s} {bw:8.1f}  {name}")


if __name__ == "__main__":
    main()
