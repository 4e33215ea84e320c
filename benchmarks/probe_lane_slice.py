"""Probe: does remote Mosaic compile STATIC lane-dim slices?

The fused-LKA kernel design (PERF.md "Next optimization targets #1")
needs the chain's 11-voxel receptive halo inside VMEM without the 21x
halo'd-tile pre-slice blowup _make_tiles would cost at m=11. The only
layout that avoids overlapping blocks puts a spatial dim (X) in the
LANE dim, per-channel volumes in the grid — which requires slicing the
lane dim at STATIC offsets (known-banned: DYNAMIC lane indexing,
PERF.md remote-Mosaic constraint #1; static is untested).

Cases:
  1. static python-int lane slice `x_ref[:, s:s+64]`
  2. the same inside an unrolled python loop (5 offsets)
  3. static lane slice nested inside a fori over sublane offsets
  4. (control) pl.ds sublane slice

Usage: python benchmarks/probe_lane_slice.py [case ...]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def run(name, kern, in_shape, out_shape):
    x = jnp.arange(np.prod(in_shape), dtype=jnp.float32).reshape(in_shape)
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(in_shape, lambda: (0,) * len(in_shape),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(out_shape, lambda: (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(),
    )
    t0 = time.time()
    try:
        y = jax.jit(f)(x)
        y.block_until_ready()
        # interpret-mode reference
        yi = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(in_shape, lambda: (0,) * len(in_shape),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(out_shape,
                                   lambda: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            grid=(), interpret=True)(x)
        ok = np.allclose(np.asarray(y), np.asarray(yi))
        print(f"[{name}] OK compile {time.time()-t0:.1f}s parity={ok}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[{name}] FAIL {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def k_static(x_ref, o_ref):
    o_ref[...] = x_ref[:, 3:3 + 64] + x_ref[:, 7:7 + 64]


def k_unrolled(x_ref, o_ref):
    acc = jnp.zeros((16, 64), jnp.float32)
    for s in range(5):
        acc = acc + x_ref[:, s:s + 64]
    o_ref[...] = acc


def k_fori_mixed(x_ref, o_ref):
    def body(i, acc):
        row = x_ref[pl.ds(i, 8), :]
        return acc + row[:, 3:3 + 64] + row[:, 9:9 + 64]
    o_ref[...] = jax.lax.fori_loop(
        0, 4, body, jnp.zeros((8, 64), jnp.float32))


def k_sublane(x_ref, o_ref):
    o_ref[...] = x_ref[pl.ds(2, 16), :64]


CASES = {
    "static": (k_static, (16, 128), (16, 64)),
    "unrolled": (k_unrolled, (16, 128), (16, 64)),
    "fori_mixed": (k_fori_mixed, (16, 128), (8, 64)),
    "sublane": (k_sublane, (32, 128), (16, 64)),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print("backend:", jax.default_backend(), flush=True)
    for n in names:
        run(n, *CASES[n])
