"""Segmented sampler execution: per-step-ish progress without io_callback.

The reference posts "N / M" once per sampler step through its status
queue (`modules/cremage/utils/generation_status_updater.py:9-16`,
consumed by the UI at `modules/cremage/ui/initializer.py:52-75`).  Our
samplers normally report steps with `jax.experimental.io_callback`
inside the one jitted scan program — but a scan+io_callback program
never finishes compiling through the axon TPU tunnel (measured round 4,
>560 s on a graph that compiles in seconds elsewhere), so per-step
progress was gated off on exactly the backend that matters
(`kdiffusion.progress_callbacks_supported`).

This module restores the behavior with a CHUNKED-SCAN design instead of
a host callback: the sampler's uniform scan region is split into K
host-dispatched segments, each executed by the SAME jitted segment
program (the segment start index is a traced argument feeding
`lax.dynamic_slice_in_dim`, so one compiled program serves every
segment), with the scan carry threaded through.  The host enqueues all
segments back-to-back (no device bubble), then observes each segment's
completion through a 1-element pull and emits "N / M" between
observations.

Numerics contract: a sampler is expressed ONCE as a `ScanPlan` (pure
step math, `denoise` passed explicitly); the monolithic entry points
(`kdiffusion.sample_euler` et al.) and the chunked executor both run
the plan's `body`, so the two paths execute identical per-step ops.
`tests/test_chunked_progress.py` asserts the chunked result is
bit-identical to the monolithic scan on CPU.

Compiled-program accounting (each distinct program is one slow tunnel
compile, amortized by the persistent XLA cache): a uniform-scan sampler
(Euler, Euler A, DDIM, FlowEuler) costs a "first" program (prologue +
carry init + first segment) plus a "mid" program (one segment) — the
"last" role reuses "mid" when the plan has no peeled tail.  DPM++ 2M
adds a "last" program for its peeled final step.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ScanPlan:
    """A sampler factored into chunk-executable pieces.

    All callables take `denoise` explicitly (no model closure), so a
    jitted segment program can rebuild the denoiser from its own traced
    arguments — closing over device arrays would embed them as HLO
    constants (see pipelines/sd15.py jit-structure note).

    init:     (x) -> carry            pure cast/packing, no model calls
    make_xs:  (key) -> xs pytree      per-scan-step arrays, leading dim
                                      n_scan (key-derived noise keys ride
                                      here so they stay traced)
    body:     (denoise, carry, per) -> carry     one scan step
    pre:      (denoise, carry) -> carry          peeled head steps
    post:     (denoise, carry) -> x_out          peeled tail steps (also
                                                 extracts x from carry)
    out:      (carry) -> x_out        used when post is None
    """
    n_scan: int
    init: Callable[[Any], Any]
    make_xs: Callable[[Optional[jax.Array]], Any]
    body: Callable[[Callable, Any, Any], Any]
    pre: Optional[Callable[[Callable, Any], Any]] = None
    pre_steps: int = 0
    post: Optional[Callable[[Callable, Any], Any]] = None
    post_steps: int = 0
    out: Callable[[Any], Any] = lambda carry: carry

    @property
    def n_report(self) -> int:
        return self.pre_steps + self.n_scan + self.post_steps


def run_plan(plan: ScanPlan, denoise, x, *, key=None, progress_cb=None,
             report=None):
    """Monolithic execution: one traced region, identical to the
    pre-plan sampler bodies.  `report` is the in-scan io_callback hook
    (kdiffusion._report signature) — injected to avoid a circular
    import."""
    if report is None:                      # pragma: no cover - default
        from cremage_tpu.samplers.kdiffusion import _report as report
    carry = plan.init(x)
    if plan.pre is not None:
        carry = plan.pre(denoise, carry)
        report(progress_cb, plan.pre_steps - 1)
    if plan.n_scan:
        def body(c, per_i):
            per, i = per_i
            c = plan.body(denoise, c, per)
            report(progress_cb, i)
            return c, None

        xs = plan.make_xs(key)
        idx = jnp.arange(plan.pre_steps, plan.pre_steps + plan.n_scan)
        carry, _ = jax.lax.scan(body, carry, (xs, idx))
    if plan.post is not None:
        x_out = plan.post(denoise, carry)
        report(progress_cb, plan.n_report - 1)
        return x_out
    return plan.out(carry)


def chunked_progress_active(status_cb, noop) -> bool:
    """Whether a pipeline generate() should use segmented execution:
    a real status callback is attached AND in-scan io_callback progress
    is unavailable on this backend (the axon tunnel).  Where io_callback
    compiles, the monolithic program keeps true per-step granularity.
    Override with CREMAGE_CHUNKED_PROGRESS=0 to force the coarse
    statuses instead."""
    env = os.environ.get("CREMAGE_CHUNKED_PROGRESS")
    if env is not None and env.lower() in ("0", "false", "no"):
        return False
    if status_cb is None or status_cb is noop:
        return False
    from cremage_tpu.samplers.kdiffusion import progress_callbacks_supported

    return not progress_callbacks_supported()


def default_segments() -> int:
    """Segments per sampling run (progress updates per job);
    CREMAGE_PROGRESS_SEGMENTS overrides the default 5."""
    return max(1, int(os.environ.get("CREMAGE_PROGRESS_SEGMENTS", "5")))


def segment_length(n_scan: int, segments: int) -> int:
    """Largest divisor of n_scan not exceeding ceil(n_scan/segments) —
    every segment is the same length, so ONE compiled program serves
    all of them (20 steps / 5 segments -> 4; 18/5 -> 3; prime counts
    fall back to 1, which is just host-stepping)."""
    if n_scan <= 0:
        return 0
    target = max(1, math.ceil(n_scan / max(1, segments)))
    return max(d for d in range(1, target + 1) if n_scan % d == 0)


def _observe(carry):
    """Enqueue a 1-element pull that completes when `carry` is ready —
    block_until_ready is unreliable through the axon tunnel, so
    completion is observed by transferring 1 element (4 bytes)."""
    leaf = jax.tree.leaves(carry)[0]
    return leaf.ravel()[0]


def run_chunked(
    plan: ScanPlan,
    *,
    get_program: Callable[[str, Callable], Callable],
    make_denoise: Callable,
    args: tuple,
    x,
    key=None,
    prologue: Optional[Callable] = None,
    progress: Optional[Callable[[int], None]] = None,
    segments: int = 5,
):
    """Execute `plan` as K host-dispatched segment programs.

    get_program(role, build) returns a cached jitted program for this
    (pipeline bucket, role); build() -> the python function to jit.
    Roles: "first" (prologue + init + pre + segment 0), "mid" (one
    segment), "last" ("mid" + post/out; merged into "mid" when the plan
    has no peeled tail and `out` is identity).

    make_denoise(*args) rebuilds the denoiser from traced args inside
    each program.  prologue(x, key) -> x runs inside the "first"
    program (e.g. the img2img k-space noise-add).

    All segments are enqueued back-to-back before any observation, so
    the device runs without bubbles; progress is emitted as each
    segment's 1-element observation lands on the host.
    """
    if key is None:
        key = jax.random.key(0)
    seg_len = segment_length(plan.n_scan, segments)
    n_segs = plan.n_scan // seg_len if seg_len else 0
    # a tail program is only needed when the plan peels final steps or
    # extracts x from a structured carry; otherwise the last segment's
    # carry IS the output
    plain_out = plan.post is None and plan.out is ScanPlan.out

    def build(head: bool, tail: bool, run_scan: bool):
        def seg(a, k, carry, seg_start):
            den = make_denoise(*a)
            if head:
                if prologue is not None:
                    carry = prologue(carry, k)
                carry = plan.init(carry)
                if plan.pre is not None:
                    carry = plan.pre(den, carry)
            if run_scan:
                xs = plan.make_xs(k)
                xs_seg = jax.tree.map(
                    lambda arr: jax.lax.dynamic_slice_in_dim(
                        arr, seg_start, seg_len, 0), xs)
                carry, _ = jax.lax.scan(
                    lambda c, per: (plan.body(den, c, per), None),
                    carry, xs_seg)
            if tail:
                if plan.post is not None:
                    return plan.post(den, carry)
                return plan.out(carry)
            return carry
        return seg

    def program(head, tail, run_scan):
        role = f"seg:{int(head)}{int(tail)}{int(run_scan)}"
        return get_program(role,
                           lambda: build(head, tail, run_scan))

    # enqueue everything first (device runs bubble-free), observe after
    pending = []            # (steps_shown, observation) in order
    carry = x
    if n_segs == 0:
        fn = program(True, True, False)
        carry = fn(args, key, carry, jnp.asarray(0, jnp.int32))
        pending.append((plan.n_report, _observe(carry)))
    else:
        for s in range(n_segs):
            head = s == 0
            last = s == n_segs - 1
            # the peeled tail rides inside the LAST scan segment's
            # program (one fewer compile); identity-out plans need no
            # tail at all — their final carry IS the output, so the
            # last segment reuses the "mid" program
            tail = last and not plain_out
            fn = program(head, tail, True)
            carry = fn(args, key, carry,
                       jnp.asarray(s * seg_len, jnp.int32))
            steps_shown = plan.pre_steps + (s + 1) * seg_len
            if last:
                steps_shown = plan.n_report
            pending.append((steps_shown, _observe(carry)))
    for steps_shown, obs in pending:
        np.asarray(obs)     # blocks until that segment is done
        if progress is not None:
            progress(steps_shown - 1)      # same i convention as _report
    return carry
