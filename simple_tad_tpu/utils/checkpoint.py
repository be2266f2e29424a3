"""Checkpoint save/restore with the reference's retention semantics, on orbax.

Behavioral reference: /root/reference/utils.py:450-545 and
run_frame_finetuning.py:668-700:
  * 'checkpoint-last' — full train state {params, opt_state, step, epoch,
    rng, ema}, overwritten every epoch, used by auto-resume,
  * 'checkpoint-best-<metric>' — weights-only snapshots kept per tracked
    metric (auroc, ap, acc, mccauc),
  * 'checkpoint-<N>' — periodic weights-only snapshots (save_ckpt_freq).

auto_load_model equivalent: ``auto_resume`` restores checkpoint-last if
present.  All writes go through orbax (atomic, async-capable).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(output_dir: str, name: str) -> str:
    return os.path.join(os.path.abspath(output_dir), name)


def save_train_state(output_dir: str, state, epoch: int,
                     name: str = "checkpoint-last") -> None:
    """Full training state for resume (params + optimizer + counters)."""
    ckpt = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "rng": jax.random.key_data(state.rng),
        "epoch": np.asarray(epoch),
    }
    if state.ema_params is not None:
        ckpt["ema_params"] = state.ema_params
    path = _path(output_dir, name)
    with ocp.PyTreeCheckpointer() as ckptr:
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, ckpt)


def load_train_state(output_dir: str, state,
                     name: str = "checkpoint-last"):
    """-> (state, epoch) with arrays restored into the given state's
    structure, or (state, 0) if no checkpoint exists."""
    path = _path(output_dir, name)
    if not os.path.exists(path):
        return state, 0
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "rng": jax.random.key_data(state.rng),
        "epoch": np.asarray(0),
    }
    if state.ema_params is not None:
        template["ema_params"] = state.ema_params
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    state = state.replace(
        params=restored["params"], opt_state=restored["opt_state"],
        step=restored["step"],
        rng=jax.random.wrap_key_data(np.asarray(restored["rng"])),
        ema_params=restored.get("ema_params", state.ema_params))
    return state, int(restored["epoch"]) + 1


def save_weights(output_dir: str, params, name: str) -> None:
    """Weights-only snapshot (best-metric / periodic)."""
    path = _path(output_dir, name)
    with ocp.PyTreeCheckpointer() as ckptr:
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, {"params": params})


def load_weights(path: str, params_template):
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path),
                                 item={"params": params_template})
    return restored["params"]


class BestTracker:
    """Tracks best-so-far metrics and writes best-metric snapshots
    (run_frame_finetuning.py:668-700 semantics: auroc, ap, acc, mccauc)."""

    METRICS = ("auroc", "ap", "acc", "mccauc")

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self.best: Dict[str, float] = {m: -np.inf for m in self.METRICS}

    def update(self, params, values: Dict[str, float]) -> Dict[str, float]:
        improved = {}
        for m in self.METRICS:
            if m in values and values[m] > self.best[m]:
                self.best[m] = values[m]
                save_weights(self.output_dir, params,
                             f"checkpoint-best{m}")
                improved[m] = values[m]
        return improved
