"""End-to-end 3D case prediction: preprocess → sliding window → restore
original geometry → export NIfTI.

Parity targets:
  inference/predict.py:133-805 — `predict_cases` (multi-fold softmax
  averaging, background preprocessing), `predict_from_folder` CLI driver.
  segmentation_export.py:27-233 — `save_segmentation_nifti_from_softmax`:
  resample softmax back to the pre-resampling shape (separate-z logic
  mirrored from preprocessing), reinsert into the original full-size
  volume via the stored crop bbox, write NIfTI.
  model_restore.py:43-130 — restore trainer/params from checkpoint.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from deformablelka_tpu.data.preprocessing import (
    GenericPreprocessor, resample_data_or_seg, get_do_separate_z,
    get_lowres_axis)
from deformablelka_tpu.data import nifti
from deformablelka_tpu.inference.sliding_window import SlidingWindowInference


def restore_softmax_to_original(softmax: np.ndarray, properties: dict,
                                order: int = 1) -> np.ndarray:
    """softmax: (x, y, z, C) in preprocessed space → argmax seg in the
    ORIGINAL image geometry (segmentation_export.py:27-157)."""
    shape_after_crop = [hi - lo for lo, hi in properties["crop_bbox"]]
    cur = list(softmax.shape[:3])
    if cur != shape_after_crop:
        spacing_now = properties["target_spacing"]
        spacing_orig = properties["original_spacing"]
        do_sep = (get_do_separate_z(spacing_now)
                  or get_do_separate_z(spacing_orig))
        axis = (get_lowres_axis(spacing_orig) if do_sep else None)
        data = np.moveaxis(softmax, -1, 0)  # (C, x, y, z)
        data = resample_data_or_seg(data, shape_after_crop, is_seg=False,
                                    axis=axis, order=order,
                                    do_separate_z=do_sep, order_z=0)
        softmax = np.moveaxis(data, 0, -1)
    seg = np.argmax(softmax, axis=-1).astype(np.uint8)
    out = np.zeros(properties["original_shape"], np.uint8)
    slicer = tuple(slice(lo, hi) for lo, hi in properties["crop_bbox"])
    out[slicer] = seg
    return out


class Predictor3D:
    """Single- or multi-fold case predictor."""

    def __init__(self, apply_fn: Callable, params_per_fold: Sequence,
                 preprocessor: GenericPreprocessor, patch_size,
                 num_classes: int, step_size: float = 0.5,
                 do_mirroring: bool = True):
        self.params_per_fold = list(params_per_fold)
        self.preprocessor = preprocessor
        self.sw = SlidingWindowInference(
            apply_fn, patch_size=patch_size, num_classes=num_classes,
            step_size=step_size, do_mirroring=do_mirroring)

    def predict_case(self, data: np.ndarray, spacing) -> tuple:
        """data: (C, x, y, z) raw. Returns (seg_in_original_space,
        softmax, properties)."""
        pre, _, props = self.preprocessor.preprocess(data, spacing)
        vol = np.moveaxis(pre, 0, -1)  # channels-last
        probs = None
        for params in self.params_per_fold:
            p = self.sw.predict(params, vol)
            probs = p if probs is None else probs + p
        probs = probs / len(self.params_per_fold)
        seg = restore_softmax_to_original(probs, props)
        return seg, probs, props

    def predict_file(self, in_path: str | Path, out_path: str | Path):
        img = nifti.load(in_path)
        # NIfTI is (x, y, z); reference feeds (z, y, x) after SimpleITK —
        # we keep the on-disk axis order and spacing consistently.
        data = np.asarray(img.data, np.float32)[None]
        seg, _, props = self.predict_case(data, img.spacing)
        nifti.save(seg.astype(np.uint8), out_path, affine=img.affine)
        return seg


def predict_from_folder(predictor: Predictor3D, input_folder, output_folder,
                        suffix=".nii.gz"):
    """Folder driver (predict.py:579)."""
    input_folder = Path(input_folder)
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    results = []
    for f in sorted(input_folder.glob(f"*{suffix}")):
        out = output_folder / f.name
        predictor.predict_file(f, out)
        results.append(out)
    return results
