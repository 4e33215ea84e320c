"""2D volumetric evaluation: slice-loop inference with zoom to model size.

Parity target: /root/reference/2D/utils.py:63-110 `test_single_volume` —
for each axial slice: scipy-zoom to 224² (order 3), forward, argmax,
zoom back (order 0), stack to a volume; per-class medpy dice/HD95 against
the label volume; optional NIfTI export with spacing (1, 1, z).

TPU-first: all slices of a case are batched into ONE padded forward
(bucketed batch) instead of a per-slice python loop; the zoom stays on
host (scipy order-3 parity).
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np
from scipy.ndimage import zoom

import jax
import jax.numpy as jnp

from deformablelka_tpu.evaluation.metrics import dice, hd95


class Predictor2D:
    def __init__(self, apply_fn: Callable, params, patch_size=(224, 224),
                 num_classes: int = 9, slice_batch: int = 24):
        self.apply_fn = apply_fn
        self.params = params
        self.patch_size = tuple(patch_size)
        self.num_classes = num_classes
        self.slice_batch = slice_batch
        self._jit = jax.jit(self._forward)

    def _forward(self, params, x):
        logits = self.apply_fn(params, x)
        return jnp.argmax(logits, axis=-1)

    def predict_volume(self, image: np.ndarray) -> np.ndarray:
        """image: (S, H, W) float (slices first, matching the reference's
        h5 case layout). Returns (S, H, W) int labels."""
        S, H, W = image.shape
        ph, pw = self.patch_size
        # host zoom to model resolution (order 3, utils.py:70-73)
        if (H, W) != (ph, pw):
            slices = np.stack([
                zoom(image[i], (ph / H, pw / W), order=3)
                for i in range(S)])
        else:
            slices = image
        slices = slices[..., None].astype(np.float32)
        preds = []
        B = self.slice_batch
        for i in range(0, S, B):
            chunk = slices[i:i + B]
            n = chunk.shape[0]
            if n < B:  # pad to bucket to avoid recompilation
                chunk = np.concatenate(
                    [chunk, np.zeros((B - n, ph, pw, 1), np.float32)])
            out = np.asarray(self._jit(self.params, jnp.asarray(chunk)))
            preds.append(out[:n])
        pred = np.concatenate(preds)
        if (H, W) != (ph, pw):
            pred = np.stack([
                zoom(pred[i], (H / ph, W / pw), order=0)
                for i in range(S)])
        return pred.astype(np.int32)

    def evaluate_case(self, image: np.ndarray, label: np.ndarray,
                      classes: Optional[Sequence[int]] = None,
                      spacing=None):
        """Per-class (dice, hd95) like utils.py:50-60."""
        pred = self.predict_volume(image)
        classes = classes or list(range(1, self.num_classes))
        out = []
        for c in classes:
            p = pred == c
            g = label == c
            if p.sum() > 0 and g.sum() > 0:
                out.append((dice(p, g), hd95(p, g, spacing)))
            elif p.sum() > 0 and g.sum() == 0:
                out.append((0.0, 0.0))
            else:
                out.append((1.0 if g.sum() == 0 else 0.0, 0.0))
        return pred, out


def benchmark_inference_speed(apply_fn, params, patch_size=(224, 224),
                              warmup: int = 50, reps: int = 1000,
                              batch: int = 1):
    """Latency harness mirroring 2D/test_inference_speed.py:23-55
    (batch-1 224² forward, 50 warmup + 1000 timed reps, mean±std)."""
    import time
    x = jnp.zeros((batch, *patch_size, 1), jnp.float32)
    f = jax.jit(lambda p, x: apply_fn(p, x))
    for _ in range(warmup):
        jax.block_until_ready(f(params, x))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, x))
        times.append((time.perf_counter() - t0) * 1000)
    return float(np.mean(times)), float(np.std(times))
