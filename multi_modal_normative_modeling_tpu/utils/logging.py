"""Loss history logging and plotting (utils_vae.py:114-145 equivalents) plus a
structured JSONL run log for observability."""
from __future__ import annotations

import json
import time
from os.path import join
from pathlib import Path

import numpy as np


class Logger:
    """Dict-of-lists loss history (utils_vae.py:134-145)."""

    def __init__(self):
        self.logs = {}

    def on_train_init(self, keys):
        for k in keys:
            self.logs[k] = []

    def on_step_fi(self, logs_dict):
        for k, v in logs_dict.items():
            self.logs[k].append(np.asarray(v))

    def extend(self, logs_dict):
        """Bulk-append per-epoch arrays (the jitted trainer returns the whole
        history at once)."""
        for k, v in logs_dict.items():
            self.logs.setdefault(k, [])
            self.logs[k].extend(np.asarray(v).tolist())


def plot_losses(logger: Logger, path, title: str = "") -> None:
    """Two-panel (absolute + max-normalized) loss-curve PNG, saved as
    ``Losses<title>.png`` (utils_vae.py:114-132)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.subplot(1, 2, 1)
    plt.title("Loss values")
    for k, v in logger.logs.items():
        plt.plot(v, label=str(k))
    plt.xlabel("epochs", fontsize=10)
    plt.ylabel("loss", fontsize=10)
    plt.legend()
    plt.subplot(1, 2, 2)
    plt.title("Loss relative values")
    for k, v in logger.logs.items():
        max_loss = 1e-8 + np.max(np.abs(v))
        plt.plot(np.asarray(v) / max_loss, label=str(k))
    plt.legend()
    plt.xlabel("epochs", fontsize=10)
    plt.ylabel("loss", fontsize=10)
    plt.savefig(join(str(path), "Losses{0}.png".format(title)))
    plt.close()


class RunLog:
    """Append-only JSONL event log (one file per run directory)."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def event(self, kind: str, **fields) -> None:
        record = {"t": time.time(), "event": kind}
        record.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")
