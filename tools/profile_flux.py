#!/usr/bin/env python
"""Op-level profile of the FLUX.1-schnell transformer eval on device
(1024^2 = 4096 img tokens + 512 txt tokens, fp8 weights). Same method
as tools/profile_sdxl.py: chained evals in one jit, jax.profiler trace,
xprof hlo_stats table.

RESULTS (v5e-1, 2026-08-17, fp8 weights, 610 ms/eval): dots
("convolution fusion") 56.5% running at ~173 TF/s (single_blocks
linear1 = 609 GFlop in 3.5 ms — at the clean-chain ceiling), Pallas
flash attention 20.5% at ~120 TF/s (d=128 is MXU-bound), loop fusion
13.4% (GELU/modulation/RoPE elementwise), data formatting 6.8%.
Whole-eval effective rate ~125 TF/s of the 196 bf16 peak — the graph
is at its compute floor; the only soft target left is the ~20%
elementwise/layout slice (RoPE runs in fp32 pairs), worth a few
percent at most."""
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

REPS = int(os.environ.get("PROF_REPS", "4"))


def main():
    enable_compilation_cache()
    from cremage_tpu.io.quantize import quantized_zeros
    from cremage_tpu.models.flux import (
        FluxModel, flux_schnell_config, make_position_ids,
    )

    txt_len = 512
    hp = wp = 64
    model = FluxModel(flux_schnell_config())
    txt_ids, img_ids = make_position_ids(hp, wp, txt_len)
    x = jax.random.normal(jax.random.key(0), (1, hp * wp, 64), jnp.bfloat16)
    txt = jax.random.normal(jax.random.key(1), (1, txt_len, 4096),
                            jnp.bfloat16)
    vec = jax.random.normal(jax.random.key(2), (1, 768), jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda rng: model.init(rng, x[:, :16], txt[:, :8], jnp.zeros((1,)),
                               vec, img_ids[:16], txt_ids[:8], None),
        jax.random.key(0))
    qd = os.environ.get("PROF_QUANT", "float8_e4m3")
    params = quantized_zeros(shapes, dtype=qd)

    def run(params, x):
        def body(i, xx):
            out = model.apply(params, xx, txt,
                              jnp.full((1,), 0.5), vec, img_ids, txt_ids,
                              None)
            return xx + jnp.bfloat16(0.01) * out.astype(xx.dtype)
        return jnp.mean(lax.fori_loop(0, REPS, body, x).astype(jnp.float32))

    fn = jax.jit(run)
    np.asarray(fn(params, x))

    t0 = time.perf_counter()
    np.asarray(fn(params, x))
    wall = time.perf_counter() - t0
    print(f"flux eval: {wall / REPS * 1e3:.2f} ms ({REPS} chained evals)",
          flush=True)

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/flux_trace"
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
        name = (r.get("tf_op_name") or "").split("FluxModel/")[-1][:80]
        print(f"{float(r['total_self_time']) / 1e3:9.2f} "
              f"{(r.get('bound_by') or '?'):8s} {bw:8.1f}  {name}")


if __name__ == "__main__":
    main()
