"""Orbax checkpointing with the reference's last/bestAP/bestAR semantics.

Mirrors finetune_uav.py:175-210 (resume) and :272-295 (save): a training
state (params, opt_state, iteration, best metrics, results text) is kept
under three names — ``last`` every save, ``bestAP``/``bestAR`` whenever the
corresponding validation metric improves.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import orbax.checkpoint as ocp


def _path(directory: str, name: str) -> str:
    return os.path.join(os.path.abspath(directory), name)


def save_state(directory: str, name: str, state: dict[str, Any]) -> None:
    from flax import serialization

    ckpt = ocp.PyTreeCheckpointer()
    # Canonicalize namedtuple-rich trees (optax states) to plain dicts.
    ckpt.save(_path(directory, name), serialization.to_state_dict(state), force=True)


def load_state(directory: str, name: str = "last", template: dict[str, Any] | None = None) -> dict[str, Any] | None:
    """Restore a state tree (arrays come back as numpy; jit re-devices them).

    With ``template`` (a live state of the same structure, e.g. freshly
    initialized), the raw tree is rebuilt into the original structure —
    restoring optax namedtuple states intact."""
    path = _path(directory, name)
    if not os.path.exists(path):
        return None
    ckpt = ocp.PyTreeCheckpointer()
    raw = ckpt.restore(path)
    if template is None:
        return raw
    from flax import serialization

    return serialization.from_state_dict(template, raw)


class CheckpointManager:
    """last/bestAP/bestAR manager (finetune_uav.py:272-295)."""

    def __init__(self, directory: str):
        self.directory = directory
        os.makedirs(directory, exist_ok=True)
        self.best_ap = -np.inf
        self.best_ar = -np.inf

    def resume(self, template: dict[str, Any] | None = None) -> dict[str, Any] | None:
        state = load_state(self.directory, "last", template)
        if state is not None:
            self.best_ap = float(state.get("best_ap", -np.inf))
            self.best_ar = float(state.get("best_ar", -np.inf))
        return state

    def save(self, state: dict[str, Any], ap: float | None = None, ar: float | None = None) -> list[str]:
        saved = []
        if ap is not None and ap > self.best_ap:
            self.best_ap = ap
        if ar is not None and ar > self.best_ar:
            self.best_ar = ar
        state = {**state, "best_ap": self.best_ap, "best_ar": self.best_ar}
        save_state(self.directory, "last", state)
        saved.append("last")
        if ap is not None and ap >= self.best_ap:
            save_state(self.directory, "bestAP", state)
            saved.append("bestAP")
        if ar is not None and ar >= self.best_ar:
            save_state(self.directory, "bestAR", state)
            saved.append("bestAR")
        return saved


def append_results_line(path: str, iteration: int, stats: dict[str, float]) -> None:
    """results.txt line: tab-separated iteration + metrics (finetune_uav.py:253-268)."""
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write("iteration\t" + "\t".join(stats.keys()) + "\n")
        f.write(f"{iteration}\t" + "\t".join(f"{v:.6g}" for v in stats.values()) + "\n")


def plot_training_results(results_path: str, out_png: str | None = None) -> str:
    """results.txt -> metric curves PNG (dcnn/utils/utils.py:92-134)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(results_path) as f:
        header = f.readline().strip().split("\t")
        rows = [[float(v) for v in line.strip().split("\t")] for line in f if line.strip()]
    data = np.asarray(rows)
    out_png = out_png or results_path.replace(".txt", ".png")
    fig, ax = plt.subplots(figsize=(10, 6))
    for i, name in enumerate(header[1:], start=1):
        ax.plot(data[:, 0], data[:, i], label=name)
    ax.set_xlabel("iteration")
    ax.legend(fontsize=7)
    fig.savefig(out_png, dpi=120)
    plt.close(fig)
    return out_png
