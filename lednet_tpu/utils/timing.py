"""Honest device timing through an asynchronous/acking dispatch stack.

Discovered on the axon-tunneled TPU (2026-08-21, round 3): the PJRT
interposer's ``block_until_ready`` acknowledges DISPATCH, not COMPLETION,
so the classic ``dispatch; block_until_ready; stopwatch`` loop measures the
tunnel's ack rate — for LED-Net 720p it reported 0.36 ms "latency" for a
forward whose true device time is ~5.9 ms (16x off).  Every timing in this
repo therefore goes through the two measurements below, which only trust
``jax.device_get`` of a SCALAR (a real round trip that cannot return until
the value exists):

- ``chain_slope``: run K data-chained copies of the op inside ONE jitted
  program (iteration i+1's input is perturbed by iteration i's scalar
  result times 1e-20, so XLA can neither hoist nor dead-code them), hard
  sync once, and fit the line through two K values.  The slope is pure
  per-op device time; the intercept (tunnel RTT + dispatch) cancels.
- ``chained_steps``: for train steps the chaining is natural (state_{i+1}
  depends on state_i); N steps + one final ``device_get(loss)`` bounds the
  whole pipeline, so wall/N is the honest sustained step time.

Sanity anchor: an 8192^3 bf16 matmul chain measures 180 TFLOP/s (46% of
v5e peak) with this method — the method does not pessimize the device.
"""
from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _chain(fn: Callable, k: int) -> Callable:
    """K data-chained evaluations of ``fn(*args, eps)`` -> scalar sum
    (statically unrolled; kept for cost-analysis consumers that need a
    plain single-copy program — measurement uses :func:`_chain_loop`)."""

    def chained(*args):
        s = jnp.float32(0)
        for _ in range(k):
            s = s + fn(*args, s * jnp.float32(1e-20)).astype(jnp.float32)
        return s

    return jax.jit(chained)


def _chain_loop(fn: Callable) -> Callable:
    """One jitted program computing K data-chained evaluations of
    ``fn(*args, eps)`` with K a RUNTIME argument (``lax.fori_loop``).

    vs the old per-k unrolled chains: one compile instead of one per k
    (each ~200 s through the tunnel on model-sized programs), and the
    serialized executable stays body-sized (the k=8 unrolled 720p chain
    serialized to 182 MB; the loop form is ~23 MB).  The loop carry is the
    same eps-feedback that defeats hoisting/DCE — XLA cannot batch or
    collapse iterations across a sequential dependence."""

    def chained(k, *args):
        def body(_, s):
            return s + fn(*args, s * jnp.float32(1e-20)).astype(jnp.float32)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    return jax.jit(chained)


def chain_slope(fn: Callable, args: Sequence, k: Tuple[int, int] = (1, 5),
                reps: int = 6) -> dict:
    """Per-op device seconds for ``fn(*args, eps)->scalar``.

    ``fn`` must accept a trailing ``eps`` scalar and fold it into its input
    (e.g. ``x + eps``) and reduce its output to a scalar (e.g.
    ``jnp.sum(out)``) — the chaining contract that defeats hoisting/DCE.
    Returns {'per_op_s', 'intercept_s', 'walls': {k: best_wall_s}}.
    """
    k0, k1 = k
    f = _chain_loop(fn)
    float(jax.device_get(f(k0, *args)))  # compile + first hard sync
    walls, walls_med = {}, {}
    for kk in (k0, k1):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jax.device_get(f(kk, *args)))
            times.append(time.perf_counter() - t0)
        walls[kk] = min(times)
        walls_med[kk] = float(np.median(times))
    per_op = (walls[k1] - walls[k0]) / (k1 - k0)
    # Median-based slope as a jitter cross-check: with enough chained
    # signal (k1-k0 >> RTT jitter / per_op) the two agree within ~1%;
    # a large disagreement flags an unstable measurement.
    per_op_med = (walls_med[k1] - walls_med[k0]) / (k1 - k0)
    return dict(per_op_s=per_op, per_op_med_s=per_op_med,
                intercept_s=walls[k0] - k0 * per_op, walls=walls)


def chained_steps(step_fn: Callable, state, batch: Sequence, n: int = 20,
                  loss_key: str = 'loss', reps: int = 3) -> dict:
    """Honest sustained train-step seconds: N naturally-chained steps, one
    ``device_get`` of the final loss."""
    state, logs = step_fn(state, *batch)
    float(jax.device_get(logs[loss_key]))  # compile + sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step_fn(state, *batch)
        float(jax.device_get(logs[loss_key]))
        best = min(best, time.perf_counter() - t0)
    return dict(per_step_s=best / n, state=state)
