"""Model-level A/B gate for dispatch-default changes.

PERF.md documents five independent times that isolated-op wins did NOT
compose into model-level wins on this backend (im2col r1, zdecomp r1+r2,
fused-LKA 3D+2D, and the round-3 end-of-round regression where three
dispatch defaults shipped on isolated probes and the flagship forward
went 71 -> 104 ms). THE RULE: any change to a dispatch default
(DLKA_*_IMPL and friends) requires a same-session model-level
before/after pair from THIS script recorded in PERF.md.

Usage:
    python benchmarks/gate_model_ab.py                # default bisect matrix
    python benchmarks/gate_model_ab.py name:K=V,K2=V2 name2:K=V ...
    python benchmarks/gate_model_ab.py --model=2d a: b:DLKA_X=1
        (2d = MaxViTDeformableLKAFormer batch-1 224², the bench.py
        secondary protocol, reps=100)
    python benchmarks/gate_model_ab.py --model=bench a: b:DLKA_X=1
        (bench = scan-mode SlidingWindowInference on a 2-tile volume —
        the SAME while-nested program shape as bench.py's full
        protocol. Round-4 lesson: v5x shipped as default after winning
        the bare-forward gate, then VMEM-OOMed ONLY inside this
        program; a dispatch-default change is gated on this mode too,
        not just the bare-forward scan. A config that fails to
        compile/run reports "FAIL: <err>" instead of a time.)

Each config is measured as flagship device-only ms/fwd via
`latency_bench_scan` (20 forwards inside ONE jit program, 2 rounds),
64x128x128 bf16 — the exact `extras.device_ms_per_fwd` protocol of
bench.py. Env vars are set before tracing (all DLKA knobs are read at
trace time) and restored after. Params are initialised once and shared
(every dispatch path uses the same param tree). Configs run
interleaved twice (A B C A B C) so a mid-run chip-speed drift cannot
masquerade as a win; the report shows both passes plus the min.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

KNOBS = (
    "DLKA_DWCONV_IMPL", "DLKA_CONV_IMPL", "DLKA_CONV_TINY_IM2COL",
    "DLKA_RESBLOCK_S2D", "DLKA_DEFORM_IMPL", "DLKA_DEFORM_RADIUS",
    "DLKA_HYBRID_FAST", "DLKA_PALLAS_KERNEL", "DLKA_LKA_IMPL",
    "DLKA_GATHER_IMPL", "DLKA_HYBRID_RADIUS", "DLKA_WINDOW_CUSTOM_VJP",
    "DLKA_HYBRID_FAST_2D",
)

DEFAULT_MATRIX = [
    ("r3-snapshot", {}),
    ("dw-lax", {"DLKA_DWCONV_IMPL": "lax"}),
    ("no-tiny-im2col", {"DLKA_CONV_TINY_IM2COL": "0"}),
    ("no-resblock-s2d", {"DLKA_RESBLOCK_S2D": "0"}),
    ("all-reverted", {"DLKA_DWCONV_IMPL": "lax",
                      "DLKA_CONV_TINY_IM2COL": "0",
                      "DLKA_RESBLOCK_S2D": "0"}),
]


def parse_configs(argv):
    if not argv:
        return DEFAULT_MATRIX
    out = []
    for spec in argv:
        name, _, kvs = spec.partition(":")
        env = {}
        if kvs:
            for kv in kvs.split(","):
                k, _, v = kv.partition("=")
                env[k] = v
        out.append((name, env))
    return out


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deformablelka_tpu.utils.profiling import latency_bench_scan

    argv = sys.argv[1:]
    model_kind = "3d"
    if argv and argv[0].startswith("--model="):
        model_kind = argv[0].split("=", 1)[1]
        argv = argv[1:]
    configs = parse_configs(argv)
    if model_kind == "2d":
        from deformablelka_tpu.models.maxvit_dlka import (
            MaxViTDeformableLKAFormer)
        model = MaxViTDeformableLKAFormer(num_classes=9)
        x = jnp.zeros((1, 224, 224, 1), jnp.bfloat16)
        reps = 100
    elif model_kind == "bench":
        from deformablelka_tpu.models.dlka_former import (
            dlka_former_synapse)
        model = dlka_former_synapse(num_classes=14, do_ds=False)
        x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
        reps = 0  # unused; bench mode times predict_segmentation
    else:
        from deformablelka_tpu.models.dlka_former import (
            dlka_former_synapse)
        model = dlka_former_synapse(num_classes=14, do_ds=False)
        x = jnp.zeros((1, 64, 128, 128, 1), jnp.bfloat16)
        reps = 20
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    saved = {k: os.environ.get(k) for k in KNOBS}

    def _measure_bench_protocol():
        """Compile + run scan-mode sliding-window on a 2-tile volume:
        the while-nested program shape that the bare-forward gate does
        NOT exercise (round-4 v5x OOMed only here). Returns s/vol."""
        from deformablelka_tpu.inference.sliding_window import (
            SlidingWindowInference)
        sw = SlidingWindowInference(
            lambda v, xx: model.apply(v, xx.astype(jnp.bfloat16)),
            patch_size=(64, 128, 128), num_classes=14, step_size=0.5,
            do_mirroring=True, loop_mode="scan",
            input_dtype=jnp.bfloat16, tta_batch=8)
        vol = np.random.RandomState(0).randn(64, 128, 192, 1).astype(
            np.float32)
        sw.predict_segmentation(variables, vol)  # compile + warm
        t0 = time.time()
        seg = sw.predict_segmentation(variables, vol)
        dt = time.time() - t0
        assert seg.shape == (64, 128, 192)
        return dt * 1000.0

    def measure(env):
        for k in KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        try:
            if model_kind == "bench":
                return _measure_bench_protocol()
            # fresh lambda -> fresh trace -> env knobs re-read
            r = latency_bench_scan(lambda v, x: model.apply(v, x),
                                   (variables, x), reps=reps, rounds=2)
            return r["mean_ms"]
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    results = {name: [] for name, _ in configs}
    n_passes = 1 if model_kind == "bench" else 2
    for pazz in range(n_passes):
        for name, env in configs:
            t0 = time.time()
            try:
                ms = measure(env)
            except Exception as e:
                ms = f"FAIL: {type(e).__name__}: " \
                     f"{str(e).splitlines()[0][:200]}"
            results[name].append(
                round(ms, 2) if isinstance(ms, float) else ms)
            shown = f"{ms:7.2f} ms" if isinstance(ms, float) else ms
            print(f"[pass {pazz}] {name:<18} {shown}  "
                  f"(wall {time.time()-t0:.0f}s)  env={env}",
                  file=sys.stderr, flush=True)

    proto = ("latency_bench_scan reps=100 rounds=2, 224x224 bf16 (2D)"
             if model_kind == "2d" else
             "scan-mode SlidingWindowInference 64x128x192 2-tile vol,"
             " x8 TTA (ms/vol)" if model_kind == "bench" else
             "latency_bench_scan reps=20 rounds=2, 64x128x128 bf16")
    def _min(vals):
        nums = [v for v in vals if isinstance(v, float)]
        return min(nums) if nums else None
    report = {
        "protocol": proto,
        "configs": {name: {"passes_ms": results[name],
                           "min_ms": _min(results[name]),
                           "env": env}
                    for name, env in configs},
    }
    ok = [(n, c) for n, c in report["configs"].items()
          if c["min_ms"] is not None]
    report["best"] = (min(ok, key=lambda kv: kv[1]["min_ms"])[0]
                      if ok else "ALL-FAILED")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
