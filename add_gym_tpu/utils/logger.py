"""Console / file / TensorBoard logging.

Equivalent of the reference's ``util/logger.py`` + ``util/tb_logger.py``:
tabular console output with headers fixed at first write, optional text log
file, TensorBoard scalars keyed by sample count, process-0-only output.
"""

from __future__ import annotations

import os
from typing import Dict

import jax


class TrainLogger:
    def __init__(self, log_dir: str | None = None, enable_tb: bool = True):
        self.is_main = jax.process_index() == 0
        self._rows = []
        self._keys = None
        self._file = None
        self._tb = None
        self._jsonl = None
        if self.is_main and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "log.txt"), "a")
            # machine-readable sink for curve plotting / analysis
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if enable_tb:
                try:
                    from torch.utils.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
                except Exception:
                    self._tb = None

    def log(self, metrics: Dict, step: int):
        """Write one row of metrics (step key = sample count, as in the
        reference's TBLogger.set_step_key('Samples'))."""
        if not self.is_main:
            return
        metrics = {k: float(v) for k, v in metrics.items()}
        if self._keys is None:
            self._keys = list(metrics.keys())
            header = " | ".join(f"{k:>18s}" for k in ["samples"] + self._keys)
            print(header)
            if self._file:
                self._file.write(header + "\n")
        row = " | ".join(
            [f"{step:>18d}"]
            + [f"{metrics.get(k, float('nan')):>18.5f}" for k in self._keys]
        )
        print(row, flush=True)
        if self._file:
            self._file.write(row + "\n")
            self._file.flush()
        if self._jsonl:
            import json

            self._jsonl.write(json.dumps({"samples": step, **metrics}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def log_sampler_image(self, errors, step: int):
        """Render the adaptive-sampler error/probability tables to TB.

        Ref: add_agent.py:240-265 (matplotlib histogram images per output
        iteration).  ``errors`` is the [num_clips, num_segments] EMA table.
        """
        if not self.is_main or self._tb is None:
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            import numpy as np

            errors = np.asarray(errors)
            t = errors.max() + 1e-6
            e = np.exp(errors / t - (errors / t).max(axis=-1, keepdims=True))
            probs = e / e.sum(axis=-1, keepdims=True)

            fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
            for ax, table, title in (
                (axes[0], errors, "segment error (EMA)"),
                (axes[1], probs, "sampling probability"),
            ):
                im = ax.imshow(table, aspect="auto", cmap="viridis")
                ax.set_title(title)
                ax.set_ylabel("clip")
                fig.colorbar(im, ax=ax)
            axes[1].set_xlabel("segment")
            fig.tight_layout()
            fig.canvas.draw()
            img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            self._tb.add_image("sampler", img, step, dataformats="HWC")
            plt.close(fig)
        except Exception:
            pass  # diagnostics must never kill training

    def close(self):
        if self._file:
            self._file.close()
        if self._tb:
            self._tb.close()
