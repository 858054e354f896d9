"""Run logging: run-dir creation with dedup counter, per-group CSV writers,
optional SVG curves, parameter snapshot.

Mirrors the outputs of reference utilities/logger.py:64-159 (CSV_Writer,
InfoPlotter, Progress_Saver, run-dir naming with a _v{n} dedup suffix and a
Parameter_Info.txt dump) so downstream tooling keeps working.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional


class CSVWriter:
    """Append-mode CSV with a fixed header (reference logger.py:8-25)."""

    def __init__(self, path: str, columns: List[str]):
        self.path = path
        self.columns = list(columns)
        if not os.path.exists(path):
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self.columns)

    def log(self, values):
        with open(self.path, "a", newline="") as f:
            csv.writer(f).writerow(list(values))


class RunLogger:
    def __init__(self, opt, sub_loggers=("Train", "Test"), start_new: bool = True):
        self.opt = opt
        base = getattr(opt, "save_path", "./Training_Results")
        group = getattr(opt, "group", "default")
        seed = getattr(opt, "seed", 0)
        name = f"{group}_s{seed}"  # run identity (train_baseline.py:35)
        run_dir = os.path.join(base, getattr(opt, "dataset", ""), name)
        if start_new:
            counter = 1
            probe = run_dir
            while os.path.exists(probe):
                probe = f"{run_dir}_v{counter}"
                counter += 1
            run_dir = probe
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir

        self.csvs: Dict[str, CSVWriter] = {}
        self.history: Dict[str, Dict[str, list]] = {
            s: defaultdict(list) for s in sub_loggers
        }
        self._dump_params()

    def _dump_params(self):
        with open(os.path.join(self.run_dir, "Parameter_Info.txt"), "w") as f:
            d = (
                dataclasses.asdict(self.opt)
                if dataclasses.is_dataclass(self.opt)
                else vars(self.opt)
            )
            for k, v in sorted(d.items()):
                f.write(f"{k}: {v}\n")
        with open(os.path.join(self.run_dir, "hypa.json"), "w") as f:
            json.dump({k: str(v) for k, v in sorted(d.items())}, f, indent=1)

    def init_online(self, project: str = "vit_reranking_tpu", backend: str = "wandb"):
        """Optional online logging (reference utilities/logger.py:168-181
        wandb/comet hooks); silently disabled when the library is absent."""
        self._online = None
        try:
            if backend == "wandb":
                import wandb

                wandb.init(project=project, dir=self.run_dir)
                self._online = ("wandb", wandb)
            elif backend == "comet":
                from comet_ml import Experiment

                self._online = ("comet", Experiment(project_name=project))
        except Exception:
            self._online = None

    def log(self, sub: str, metrics: Dict[str, float], step: int):
        if sub not in self.history:  # new group (e.g. 'Drift'), lazily added
            self.history[sub] = defaultdict(list)
        for k, v in metrics.items():
            self.history[sub][k].append(float(v))
        online = getattr(self, "_online", None)
        if online is not None:
            kind, handle = online
            payload = {f"{sub}/{k}": float(v) for k, v in metrics.items()}
            if kind == "wandb":
                handle.log(payload, step=step)
            else:
                handle.log_metrics(payload, step=step)
        key = sub
        if key not in self.csvs:
            self.csvs[key] = CSVWriter(
                os.path.join(self.run_dir, f"log_{sub.lower()}.csv"),
                ["step"] + sorted(metrics.keys()),
            )
        self.csvs[key].log([step] + [float(metrics[k]) for k in sorted(metrics.keys())])

    def plot_curves(self):
        """SVG training curves (reference InfoPlotter, logger.py:30-60)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except Exception:
            return
        for sub, series in self.history.items():
            if not series:
                continue
            fig, ax = plt.subplots(1, 1, figsize=(8, 5))
            for k, vals in series.items():
                ax.plot(vals, label=k)
            ax.legend(fontsize=7)
            ax.set_title(sub)
            fig.savefig(os.path.join(self.run_dir, f"curves_{sub.lower()}.svg"))
            plt.close(fig)
