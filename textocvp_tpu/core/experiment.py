"""
Experiment-directory store.

The experiment directory is the database (reference layout, cf. reference
``lib/config.py`` and ``01_create_experiment.py:15-48``):

    experiments/<name>/
        experiment_params.json     full config
        models/                    checkpoints
        plots/                     training visualizations
        results/<run>/results.json metric outputs
        logs.txt                   experiment log
        predictors/<pname>/        nested predictor experiments (same layout)

Predictor experiments nest inside a decomposition experiment
(reference 01_create_predictor_experiment.py:26-59).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from textocvp_tpu.core.config import add_predictor_params, build_exp_params
from textocvp_tpu.core.logger import Logger


class Experiment:
    """Handle to one experiment directory (decomposition or nested predictor)."""

    PARAMS_FILE = "experiment_params.json"

    def __init__(self, exp_path: str | os.PathLike):
        self.exp_path = Path(exp_path)
        self._params: dict | None = None

    # ------------------------------------------------------------------ create
    @classmethod
    def create(cls, exp_path: str | os.PathLike, model_name: str, dataset_name: str) -> "Experiment":
        """Create a new decomposition experiment directory with materialized params."""
        exp = cls(exp_path)
        if exp.params_path.exists():
            raise FileExistsError(f"Experiment already exists at {exp.exp_path}")
        exp.exp_path.mkdir(parents=True, exist_ok=True)
        for sub in ("models", "plots", "tboard_logs"):
            (exp.exp_path / sub).mkdir(exist_ok=True)
        params = build_exp_params(model_name=model_name, dataset_name=dataset_name)
        exp.save_params(params)
        Logger(exp.exp_path)
        return exp

    @classmethod
    def create_predictor(
        cls, parent_path: str | os.PathLike, name: str, predictor_name: str,
        require_parent_ckpt: bool = True,
    ) -> "Experiment":
        """Create a nested predictor experiment under an existing decomp experiment."""
        parent = cls(parent_path)
        if not parent.params_path.exists():
            raise FileNotFoundError(f"Parent experiment not found at {parent.exp_path}")
        models_dir = parent.exp_path / "models"
        if require_parent_ckpt and not any(models_dir.glob("*")):
            raise FileNotFoundError(
                f"Parent experiment {parent.exp_path} has no trained checkpoints in models/"
            )
        exp = cls(parent.exp_path / "predictors" / name)
        if exp.params_path.exists():
            raise FileExistsError(f"Predictor experiment already exists at {exp.exp_path}")
        exp.exp_path.mkdir(parents=True, exist_ok=True)
        for sub in ("models", "plots", "tboard_logs"):
            (exp.exp_path / sub).mkdir(exist_ok=True)
        params = add_predictor_params(parent.params, predictor_name)
        exp.save_params(params)
        Logger(exp.exp_path)
        return exp

    # ------------------------------------------------------------------ access
    @property
    def params_path(self) -> Path:
        return self.exp_path / self.PARAMS_FILE

    @property
    def params(self) -> dict:
        if self._params is None:
            with open(self.params_path) as f:
                self._params = json.load(f)
        return self._params

    def save_params(self, params: dict) -> None:
        self._params = params
        with open(self.params_path, "w") as f:
            json.dump(params, f, indent=4)

    @property
    def models_dir(self) -> Path:
        d = self.exp_path / "models"
        d.mkdir(parents=True, exist_ok=True)
        return d

    @property
    def plots_dir(self) -> Path:
        d = self.exp_path / "plots"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def results_dir(self, run_name: str) -> Path:
        d = self.exp_path / "results" / run_name
        d.mkdir(parents=True, exist_ok=True)
        return d

    @property
    def parent(self) -> "Experiment | None":
        """Parent decomposition experiment, if this is a nested predictor exp."""
        if self.exp_path.parent.name == "predictors":
            return Experiment(self.exp_path.parent.parent)
        return None

    def save_results(self, run_name: str, results: dict) -> Path:
        """
        Save metric results as results/<run>/results.json, merging with any
        previously saved metrics (reference lib/metrics.py:95-126).
        """
        results_file = self.results_dir(run_name) / "results.json"
        merged = dict(results)
        if results_file.exists():
            with open(results_file) as f:
                old = json.load(f)
            for k, v in old.items():
                merged.setdefault(k, v)
        with open(results_file, "w") as f:
            json.dump(merged, f, indent=2)
        return results_file
