"""
End-to-end dry run of scripts/bootstrap_artifacts.sh in --from-local mode:
synthetic reference .pth checkpoints (REAL torch reference modules, tiny dims)
-> production importer -> parity eval -> results.json. This is the offline CI
proof that the documented fresh-machine bootstrap pipeline
(download -> convert -> evaluate, mirroring reference
download_pretrained.sh:3-6) is wired end to end.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import test_reference_parity as rp  # noqa: E402  (same-dir test helpers)

from textocvp_tpu.core.config import build_exp_params  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_json(path, obj):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, indent=2)


def test_bootstrap_from_local_to_results(tmp_path):
    rp._install_import_stubs()
    if rp.REF_SRC not in sys.path:
        sys.path.insert(0, rp.REF_SRC)
    from models.SAVi import SAVi as RefSAVi
    from models.Predictors.predictor_wrapper import PredictorWrapper
    from models.Predictors.text_cond_OCVP import TextOCVP_CustomTF

    # one tiny config shared by the torch modules and the experiment tree
    exp_params = rp._tiny_textocvp_exp("TextOCVP_CustomTF")
    exp_params["predictor"]["predictor_params"]["text_encoder_params"][
        "vocab_size"] = 128
    ds = build_exp_params("SAVi", "Synthetic")["dataset"]
    ds.update(img_size=[32, 32], num_frames=4)
    exp_params["dataset"] = ds

    # local artifact tree in the released-zip layout
    src = tmp_path / "local_artifacts"
    exp_src = src / "TextOCVP_Synth"
    _write_json(exp_src / "experiment_params.json", exp_params)
    _write_json(exp_src / "predictors" / "TextOCVP" / "experiment_params.json",
                exp_params)

    torch.manual_seed(14)
    savi = RefSAVi(**exp_params["model"]["model_params"])
    (exp_src / "models").mkdir(exist_ok=True)
    torch.save(savi.state_dict(), exp_src / "models" / "SAVi_tiny.pth")

    predictor = TextOCVP_CustomTF(**rp._ref_textocvp_kwargs(exp_params))
    wrapper = PredictorWrapper(exp_params=exp_params, predictor=predictor)
    pred_models = exp_src / "predictors" / "TextOCVP" / "models"
    pred_models.mkdir(exist_ok=True)
    torch.save(wrapper.state_dict(), pred_models / "TextOCVP_tiny.pth")

    dst = tmp_path / "experiments"
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        TEXTOCVP_NUM_WORKERS="0",
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/textocvp_jax_cache")),
    )
    res = subprocess.run(
        ["bash", "scripts/bootstrap_artifacts.sh",
         "--from-local", str(src), "--experiments-root", str(dst),
         "--skip-aux",
         "--eval-args", "--num_seed 1 --num_preds 2 --batch_size 8"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"

    # conversion artifacts
    assert (dst / "TextOCVP_Synth" / "models" / "SAVi_tiny.msgpack").exists()
    assert (dst / "TextOCVP_Synth" / "predictors" / "TextOCVP" / "models"
            / "TextOCVP_tiny.msgpack").exists()

    # eval artifacts: a results.json with finite metrics
    results = sorted((dst / "TextOCVP_Synth").rglob("results.json"))
    assert results, f"no results.json under {dst}\nstdout:\n{res.stdout}"
    with open(results[0]) as f:
        metrics = json.load(f)
    for name in ("psnr", "ssim", "lpips"):
        val = metrics[name]["mean"] if isinstance(metrics[name], dict) else metrics[name]
        assert np.isfinite(float(val)), (name, metrics[name])
