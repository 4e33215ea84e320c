"""Model restore: rebuild a model + params from a saved run directory.

Reference behaviour (re-derived):
  /root/reference/3D/d_lka_former/inference/model_restore.py:43-130 —
  `restore_model(pkl_file, checkpoint)` re-instantiates the trainer class
  from its pickled init args, then loads the fold checkpoint;
  `load_model_and_checkpoint_files(:118)` collects every `fold_*`
  checkpoint for multi-fold ensembling.

TPU-native layout: instead of pickled class paths we store a small
`model_config.json` next to the orbax checkpoints —
{"factory": "<name in deformablelka_tpu.models>", "kwargs": {...}} —
so restore is declarative and version-robust.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp

from deformablelka_tpu.training.checkpoint import CheckpointManager

MODEL_CONFIG = "model_config.json"


def save_model_config(run_dir: str | Path, factory: str, kwargs: dict,
                      example_shape: Sequence[int]):
    """Write the restore manifest (the analog of nnUNet's init-args pkl)."""
    cfg = {"factory": factory, "kwargs": kwargs,
           "example_shape": list(example_shape)}
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    (Path(run_dir) / MODEL_CONFIG).write_text(json.dumps(cfg, indent=2))
    return cfg


def build_model_from_config(cfg: dict):
    import deformablelka_tpu.models as M
    factory = getattr(M, cfg["factory"])
    return factory(**cfg.get("kwargs", {}))


def restore_model(run_dir: str | Path, checkpoint: str = "model_final_checkpoint"):
    """model_restore.restore_model equivalent: returns (model, variables).

    run_dir must hold `model_config.json` + the named orbax checkpoint
    (with 'params' and optional 'batch_stats' entries)."""
    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / MODEL_CONFIG).read_text())
    model = build_model_from_config(cfg)
    x0 = jnp.zeros((1, *cfg["example_shape"]), jnp.float32)
    template = model.init(jax.random.PRNGKey(0), x0)
    target = {"params": template["params"]}
    if "batch_stats" in template:
        target["batch_stats"] = template["batch_stats"]
    mgr = CheckpointManager(run_dir)
    # trainers store extra fields (step/opt_state) in their own layouts;
    # restore permissively by trying the common shapes
    try:
        state, _ = mgr.load(checkpoint, target)
    except Exception:
        state, _ = mgr.load(checkpoint, {**target, "step": 0})
    variables = {"params": state["params"]}
    if "batch_stats" in state and state["batch_stats"]:
        variables["batch_stats"] = state["batch_stats"]
    return model, variables


def load_model_and_checkpoint_files(model_base: str | Path,
                                    folds: Sequence[int] = (0,),
                                    checkpoint: str = "model_final_checkpoint"):
    """model_restore.py:118 equivalent: one (model, [variables per fold])
    for ensembling across folds (fold dirs `fold_<i>/` under model_base)."""
    model_base = Path(model_base)
    model = None
    all_vars = []
    for f in folds:
        m, v = restore_model(model_base / f"fold_{f}", checkpoint)
        model = model or m
        all_vars.append(v)
    return model, all_vars
