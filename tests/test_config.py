"""Config registry and experiment-directory tests."""

import json

from textocvp_tpu.core.config import (
    build_exp_params,
    get_available_configs,
    get_dataset_config,
    get_model_config,
    get_predictor_config,
)
from textocvp_tpu.core.experiment import Experiment


def test_registry_lists_configs():
    assert "SAVi" in get_available_configs("models")
    assert "ExtendedDINOSAUR" in get_available_configs("models")
    assert "CATER_Easy" in get_available_configs("datasets")
    assert "TextOCVP_T5" in get_available_configs("predictors")
    assert "OCVPPar" in get_available_configs("predictors")


def test_model_config_contents():
    cfg = get_model_config("SAVi")
    assert cfg["num_slots"] == 8 and cfg["slot_dim"] == 128
    cfg = get_dataset_config("CATER_Easy")
    assert cfg["img_size"] == [64, 64]
    cfg = get_predictor_config("TextOCVP_T5")
    assert cfg["predictor_params"]["predictor_params"]["token_dim"] == 512


def test_build_exp_params_merges_defaults():
    params = build_exp_params("SAVi", "CATER_Easy")
    assert params["training"]["clipping_max_value"] == 0.05
    assert params["prediction_params"]["input_buffer_size"] == 10
    assert params["model"]["model_params"]["num_slots"] == 8
    assert params["dataset"]["dataset_name"] == "CATER_Easy"


def test_experiment_lifecycle(tmp_path):
    exp = Experiment.create(tmp_path / "exp1", "SAVi", "CATER_Easy")
    assert exp.params_path.exists()
    assert (exp.exp_path / "models").is_dir()

    # nested predictor experiment requires a parent checkpoint unless disabled
    (exp.models_dir / "dummy.ckpt").write_text("x")
    pred_exp = Experiment.create_predictor(exp.exp_path, "pred1", "TextOCVP_CustomTF")
    assert pred_exp.exp_path == exp.exp_path / "predictors" / "pred1"
    assert pred_exp.params["predictor"]["predictor_name"] == "TextOCVP_CustomTF"
    assert pred_exp.parent.exp_path == exp.exp_path

    # results merge old keys
    pred_exp.save_results("run_a", {"psnr": {"mean": 30.0}})
    pred_exp.save_results("run_a", {"ssim": {"mean": 0.9}})
    with open(pred_exp.results_dir("run_a") / "results.json") as f:
        res = json.load(f)
    assert "psnr" in res and "ssim" in res


def test_log_function_traces_and_reraises(tmp_path):
    """Method-call tracing (reference lib/logger.py:13-44): public entries are
    logged, exceptions land in logs.txt and RE-RAISE (unlike the reference's
    exit())."""
    import pytest

    from textocvp_tpu.core import logger as logmod
    from textocvp_tpu.core.logger import Logger, for_all_methods, log_function

    Logger(tmp_path)

    @for_all_methods(log_function)
    class Thing:
        def ok(self):
            return 42

        def _quiet(self):
            return 1

        @staticmethod
        def stat(x):
            return x + 1

        def boom(self):
            raise ValueError("kaput")

    t = Thing()
    assert t.ok() == 42
    assert t._quiet() == 1
    assert Thing.stat(1) == 2 and t.stat(1) == 2  # staticmethod binding kept
    with pytest.raises(ValueError):
        t.boom()
    log = (tmp_path / "logs.txt").read_text()
    assert "Calling: ok..." in log
    assert "Calling: _quiet" not in log  # private methods stay quiet
    assert "kaput" in log  # exception trace captured
    logmod._LOGGER = None  # don't leak the logger into other tests
