"""
Config system: global defaults + a JSON config registry.

Mirrors the reference's three-tier config contract (cf. reference
``src/CONFIG.py:8-72`` and ``src/configs/__init__.py:8-84``): machine-level
constants, a directory-listing-based registry of dataset/model/predictor JSON
configs, and per-experiment ``experiment_params.json`` files materialized from
``DEFAULTS`` + model + dataset configs (see :mod:`textocvp_tpu.core.experiment`).

Adding a new JSON file under ``textocvp_tpu/configs/{datasets,models,predictors}``
(or a user directory pointed to by ``TEXTOCVP_CONFIGS``) registers a new option.
"""

from __future__ import annotations

import copy
import json
import os
from pathlib import Path

_PKG_CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"

# Machine-level constants (reference src/CONFIG.py:8-18).
CONFIG = {
    "random_seed": 14,
    "epsilon_min": 1e-16,
    "epsilon_max": 1e16,
    "num_workers": int(os.environ.get("TEXTOCVP_NUM_WORKERS", "8")),
    "paths": {
        "data_path": os.environ.get("TEXTOCVP_DATA", os.path.join(os.getcwd(), "datasets")),
        "experiments_path": os.environ.get(
            "TEXTOCVP_EXPERIMENTS", os.path.join(os.getcwd(), "experiments")
        ),
        "configs_path": os.environ.get("TEXTOCVP_CONFIGS", str(_PKG_CONFIG_DIR)),
    },
}

# Training/prediction defaults (reference src/CONFIG.py:21-72).
DEFAULTS = {
    "dataset": {
        "dataset_name": "",
        "shuffle_train": True,
        "shuffle_eval": False,
    },
    "model": {
        "model_name": "",
        "model_params": {},
    },
    "predictor": {
        "predictor_name": "",
        "predictor_params": {},
    },
    "loss": [
        {"type": "mse", "weight": 1},
    ],
    "predictor_loss": [
        {"type": "pred_img_mse", "weight": 1},
        {"type": "pred_slot_mse", "weight": 1},
    ],
    "training": {
        "num_epochs": 1000,
        "save_frequency": 25,
        "log_frequency": 100,
        "image_log_frequency": 300,
        "batch_size": 64,
        "lr": 1e-4,
        "scheduler": "cosine_annealing",
        "scheduler_steps": 1e6,
        "lr_warmup": True,
        "warmup_steps": 2000,
        "gradient_clipping": True,
        "clipping_max_value": 0.05,
    },
    "prediction_params": {
        "num_context": 1,
        "num_preds": 9,
        "teacher_force": False,
        "input_buffer_size": 10,
    },
    # TPU-specific runtime knobs (no reference equivalent).
    "tpu": {
        "compute_dtype": "float32",   # "bfloat16" for max MXU throughput
        "use_pallas": False,          # fused Pallas slot-attention kernel
        "mesh_axes": {"data": -1, "model": 1},  # -1: all remaining devices
        "donate_step_buffers": True,
    },
}

def env_int(name: str):
    """Parse an integer env override (the TEXTOCVP_* perf-probe knobs read at
    jit trace time); None when unset or empty. A malformed value warns and is
    ignored instead of raising an opaque ValueError from inside tracing."""
    raw = os.environ.get(name)
    if raw is None or raw.strip() == "":
        return None
    try:
        return int(raw)
    except ValueError:
        import warnings

        warnings.warn(f"ignoring {name}={raw!r}: not an integer")
        return None


_KINDS = {"datasets", "models", "predictors"}


def _config_dirs(kind: str) -> list[Path]:
    """All directories searched for configs of the given kind (user dir first)."""
    assert kind in _KINDS, f"unknown config kind {kind!r}"
    dirs = []
    user_dir = Path(CONFIG["paths"]["configs_path"]) / kind
    if user_dir.is_dir():
        dirs.append(user_dir)
    pkg_dir = _PKG_CONFIG_DIR / kind
    if pkg_dir.is_dir() and pkg_dir not in dirs:
        dirs.append(pkg_dir)
    return dirs


def get_available_configs(kind: str) -> list[str]:
    """Names of all registered configs of a kind ('datasets'|'models'|'predictors')."""
    names: set[str] = set()
    for d in _config_dirs(kind):
        names.update(p.stem for p in d.glob("*.json"))
    return sorted(names)


def get_config(kind: str, name: str) -> dict:
    """Load one registered JSON config by kind and name."""
    for d in _config_dirs(kind):
        path = d / f"{name}.json"
        if path.is_file():
            with open(path) as f:
                return json.load(f)
    available = get_available_configs(kind)
    raise ValueError(f"Unknown {kind} config {name!r}. Available: {available}")


def get_dataset_config(name: str) -> dict:
    return get_config("datasets", name)


def get_model_config(name: str) -> dict:
    return get_config("models", name)


def get_predictor_config(name: str) -> dict:
    return get_config("predictors", name)


def build_exp_params(model_name: str, dataset_name: str) -> dict:
    """
    Materialize a full experiment-parameter dict from DEFAULTS + a registered
    model config + a registered dataset config (reference lib/config.py:33-59).
    """
    params = copy.deepcopy(DEFAULTS)
    params["dataset"] = {**params["dataset"], **get_dataset_config(dataset_name)}
    params["model"]["model_name"] = model_name
    params["model"]["model_params"] = get_model_config(model_name)
    if model_name == "ExtendedDINOSAUR":
        # dual loss: DINO-feature MSE + image MSE (reference
        # 02_train_extended_dinosaur.py:57-62)
        params["loss"] = [
            {"type": "pred_feature_mse", "weight": 1},
            {"type": "mse", "weight": 1},
        ]
    return params


def add_predictor_params(exp_params: dict, predictor_name: str) -> dict:
    """
    Merge a registered predictor config into an existing (decomposition)
    experiment's params (reference lib/config.py:92-111).
    """
    params = copy.deepcopy(exp_params)
    pred_cfg = get_predictor_config(predictor_name)
    params["predictor"] = pred_cfg
    params.setdefault("predictor_loss", copy.deepcopy(DEFAULTS["predictor_loss"]))
    params.setdefault("prediction_params", copy.deepcopy(DEFAULTS["prediction_params"]))
    return params
