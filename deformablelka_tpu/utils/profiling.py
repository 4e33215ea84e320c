"""Profiling / tracing / FLOPs reporting.

Reference behaviour being replaced (SURVEY §5):
  fvcore FLOP counting at model build (train_MaxViT_deform_LKA.py:124-127,
  d_lka_former_trainer_synapse.py:185-193) → XLA cost analysis.
  CUDA-event latency harness (2D/test_inference_speed.py:23-55,
  50 warmup + 1000 reps, mean±std) → block_until_ready wall timing.
  (unused torch-tb-profiler) → jax.profiler device traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import numpy as np
import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> dict:
    """XLA's own FLOPs/bytes estimate for jit(fn)(*args)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca) if ca else {}


def flops_report(fn: Callable, *args, name: str = "model",
                 **kwargs) -> dict:
    """fvcore-FLOPs-printout analog: GFLOPs + traffic for one call."""
    ca = cost_analysis(fn, *args, **kwargs)
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    report = {"name": name, "gflops": flops / 1e9,
              "gbytes_accessed": bytes_acc / 1e9,
              "arithmetic_intensity": (flops / bytes_acc
                                       if bytes_acc else float("nan"))}
    print(f"{name}: {report['gflops']:.2f} GFLOPs, "
          f"{report['gbytes_accessed']:.2f} GB accessed, "
          f"AI={report['arithmetic_intensity']:.1f}")
    return report


def count_params(params) -> int:
    return int(sum(np.prod(p.shape)
                   for p in jax.tree_util.tree_leaves(params)))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace"):
    """Device trace for TensorBoard / xprof (torch-tb-profiler analog)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def latency_bench(fn: Callable, args: tuple, warmup: int = 50,
                  reps: int = 1000, inner: int = 10) -> dict:
    """test_inference_speed.py:23-55 analog: warmup then timed reps,
    mean ± std (timing granularity: `inner` calls per sync to amortise
    dispatch, matching CUDA-event-style device timing).

    Sync: the jitted fn is wrapped to reduce its output to ONE scalar,
    which is fetched to host each sync point — on the tunneled axon
    backend `block_until_ready` is a no-op and only a host fetch
    synchronises (PERF.md). The scalar transfer is negligible.
    """
    base = jax.jit(fn)

    def scalarized(*a):
        out = base(*a)
        return jax.tree.reduce(
            lambda acc, t: acc + t.astype(np.float32).sum(), out, 0.0)

    jitted = jax.jit(scalarized)
    np.asarray(jitted(*args))
    for _ in range(warmup):
        out = jitted(*args)
    np.asarray(out)
    times = []
    n_sync = max(1, reps // inner)
    for _ in range(n_sync):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = jitted(*args)
        np.asarray(out)
        times.append((time.perf_counter() - t0) / inner)
    times = np.asarray(times) * 1000.0
    return {"mean_ms": float(times.mean()), "std_ms": float(times.std()),
            "reps": n_sync * inner}


def latency_bench_scan(fn: Callable, args: tuple, reps: int = 100,
                       rounds: int = 5) -> dict:
    """Device-only latency: `reps` forwards inside ONE program via
    lax.scan, so per-dispatch/tunnel overhead amortises to ~1/reps —
    the TPU analog of the reference's CUDA-event timing
    (test_inference_speed.py:23-45, which also excludes host dispatch).

    The scanned input is perturbed by an iteration-dependent epsilon so
    XLA cannot hoist the loop-invariant forward out of the scan, and
    every step's output feeds the carry so none is dead code.
    """
    import jax.numpy as jnp

    def run(*a):
        def body(carry, i):
            pert = (a[-1] + i.astype(a[-1].dtype) *
                    jnp.asarray(1e-12, a[-1].dtype))
            out = fn(*a[:-1], pert)
            s = jax.tree.reduce(
                lambda acc, t: acc + t.astype(jnp.float32).sum(), out, 0.0)
            return carry + s, None
        total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(reps))
        return total

    jitted = jax.jit(run)
    np.asarray(jitted(*args))  # compile + warm
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        times.append((time.perf_counter() - t0) / reps)
    times = np.asarray(times) * 1000.0
    return {"mean_ms": float(times.mean()), "std_ms": float(times.std()),
            "reps": reps * rounds}
