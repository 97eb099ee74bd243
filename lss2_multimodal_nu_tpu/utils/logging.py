"""Structured metric logging (reference surface: print + append-only txt files
+ optional wandb, SURVEY §5). JSONL/CSV always; wandb only if installed."""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, logdir: str, run_name: str = "run", use_wandb: bool = False,
                 wandb_config: Optional[Dict] = None,
                 wandb_name: Optional[str] = None):
        os.makedirs(logdir, exist_ok=True)
        self.jsonl = open(os.path.join(logdir, f"{run_name}.jsonl"), "a")
        self.csv_path = os.path.join(logdir, f"{run_name}.csv")
        self._csv_fields = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                # wandb_name <- train-v2's --run_name
                # (train_vovnet_transformer.py:47,491-494)
                wandb.init(project=run_name, config=wandb_config or {},
                           **({"name": wandb_name} if wandb_name else {}))
            except ImportError:
                print("wandb not installed; continuing without it")

    def log(self, step: int, metrics: Dict[str, Any]):
        # Value routing: scalars go everywhere; 1-D arrays become wandb
        # histograms (and are skipped by jsonl/csv). Callers pass raw
        # arrays — all wandb-specific rendering lives here.
        def scalar(v):
            return isinstance(v, (int, float, str)) or (
                hasattr(v, "item") and getattr(v, "ndim", 0) == 0
            )

        row = {"step": step, "time": time.time(), **{
            k: (float(v) if not isinstance(v, str) else v)
            for k, v in metrics.items() if scalar(v)
        }}
        if self._wandb:
            import numpy as _np

            def render(v):
                # scalars -> plain floats (raw jax device scalars confuse
                # wandb's type sniffing); 1-D -> histogram; >=2-D flattened
                # to a histogram too (never passed through raw)
                if scalar(v):
                    return v if isinstance(v, str) else float(v)
                return self._wandb.Histogram(_np.asarray(v).reshape(-1))

            metrics = {k: render(v) for k, v in metrics.items()}
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self._csv_fields is None:
            self._csv_fields = list(row.keys())
            write_header = not os.path.exists(self.csv_path) or os.path.getsize(self.csv_path) == 0
            self._csv = open(self.csv_path, "a", newline="")
            self._writer = csv.DictWriter(self._csv, fieldnames=self._csv_fields, extrasaction="ignore")
            if write_header:
                self._writer.writeheader()
        self._writer.writerow(row)
        self._csv.flush()
        if self._wandb:
            self._wandb.log(metrics, step=step)

    def close(self):
        self.jsonl.close()
        if self._csv_fields is not None:
            self._csv.close()
        if self._wandb:
            self._wandb.finish()
