"""Score aggregation → summary.json.

Parity target: /root/reference/3D/d_lka_former/evaluation/evaluator.py
:30-483 — `aggregate_scores` evaluates (pred, gt) pairs per label, writes
a summary.json with per-case results and label-wise means. The reference
parallelises with a process Pool; here evaluation is a plain map (the EDT
surface metrics are the cost; a Pool hook is provided)."""

from __future__ import annotations

import json
import multiprocessing
from pathlib import Path

import numpy as np

from deformablelka_tpu.evaluation.metrics import per_class_metrics


def _eval_case(args):
    pred, gt, labels, spacing, compute_surface = args
    return per_class_metrics(pred, gt, labels, spacing, compute_surface)


def aggregate_scores(test_ref_pairs, labels, voxel_spacings=None,
                     json_output_file=None, json_name="", json_author="",
                     json_task="", num_threads: int = 0,
                     compute_surface: bool = True):
    """test_ref_pairs: list of (pred_seg, gt_seg) arrays (or callables
    returning them). Returns the summary dict (evaluator.py:322-402
    layout: {"all": [...], "mean": {...}})."""
    pairs = []
    for pred, gt in test_ref_pairs:
        if callable(pred):
            pred = pred()
        if callable(gt):
            gt = gt()
        pairs.append((pred, gt))
    spacings = voxel_spacings or [None] * len(pairs)
    args = [(p, g, labels, s, compute_surface)
            for (p, g), s in zip(pairs, spacings)]
    if num_threads and num_threads > 1:
        with multiprocessing.Pool(num_threads) as pool:
            all_scores = pool.map(_eval_case, args)
    else:
        all_scores = [_eval_case(a) for a in args]

    mean = {}
    for lab in labels:
        lab = str(lab)
        mean[lab] = {}
        keys = all_scores[0][lab].keys() if all_scores else []
        for k in keys:
            vals = [s[lab][k] for s in all_scores]
            mean[lab][k] = float(np.nanmean(
                np.asarray(vals, dtype=np.float64)))
    summary = {"name": json_name, "author": json_author, "task": json_task,
               "results": {"all": all_scores, "mean": mean}}
    if json_output_file is not None:
        Path(json_output_file).write_text(json.dumps(summary, indent=2))
    return summary


SYNAPSE_LABEL_MAP = {1: 1, 2: 2, 3: 3, 4: 4, 6: 5, 7: 6, 8: 7, 11: 8}
SYNAPSE_ORGANS = ["spleen", "right_kidney", "left_kidney", "gallbladder",
                  "liver", "stomach", "aorta", "pancreas"]


def remap_synapse_labels(seg: np.ndarray) -> np.ndarray:
    """The 8-organ Synapse label remap {1,2,3,4,6,7,8,11} → 1..8
    (3D/inference_synapse.py:23-33); everything else → 0."""
    out = np.zeros_like(seg)
    for src, dst in SYNAPSE_LABEL_MAP.items():
        out[seg == src] = dst
    return out


def evaluate_synapse_cases(pairs, voxel_spacings=None, out_file=None):
    """inference_synapse.py:35-120 equivalent: remap to 8 organs, compute
    per-organ Dice + HD95, report per-case and mean."""
    remapped = [(remap_synapse_labels(p), remap_synapse_labels(g))
                for p, g in pairs]
    summary = aggregate_scores(remapped, labels=list(range(1, 9)),
                               voxel_spacings=voxel_spacings,
                               json_output_file=out_file,
                               json_name="synapse")
    organs = {str(i + 1): SYNAPSE_ORGANS[i] for i in range(8)}
    mean = summary["results"]["mean"]
    dsc = float(np.nanmean([mean[k]["Dice"] for k in organs]))
    hd = float(np.nanmean([mean[k].get("Hausdorff Distance 95", np.nan)
                           for k in organs]))
    summary["mean_dice"] = dsc
    summary["mean_hd95"] = hd
    return summary
