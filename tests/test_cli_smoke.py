"""
CLI contract smoke test: drives the 01->06 scripts end-to-end as subprocesses
on the synthetic dataset. Slow (several jit compiles); enable with
TEXTOCVP_RUN_CLI_TESTS=1.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TEXTOCVP_RUN_CLI_TESTS") != "1",
    reason="set TEXTOCVP_RUN_CLI_TESTS=1 to run the slow CLI smoke test",
)


def _run(args, env):
    proc = subprocess.run(
        [sys.executable] + args, env=env, capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, f"{args}\nSTDOUT:{proc.stdout[-2000:]}\nSTDERR:{proc.stderr[-2000:]}"
    return proc


def test_cli_full_workflow(tmp_path):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        TEXTOCVP_EXPERIMENTS=str(tmp_path),
        TEXTOCVP_NUM_WORKERS="2",
        # the workflow cost is ~10 subprocesses x XLA CPU compiles; the
        # persistent cache makes re-runs compile-free (~5x faster)
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/textocvp_jax_cache")),
        JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2",
    )
    exp = str(tmp_path / "exp_cli")
    _run(["src/01_create_experiment.py", "-d", exp,
          "--model_name", "SAVi", "--dataset_name", "Synthetic"], env)

    # shrink the experiment for CI speed
    params_file = os.path.join(exp, "experiment_params.json")
    with open(params_file) as f:
        params = json.load(f)
    mp = params["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2, "mlp_size": 16}
    params["dataset"].update(img_size=[16, 16], num_frames=3, num_train_seqs=8,
                             num_eval_seqs=8, tokenizer="CustomTokenizer", total_frames=6)
    params["training"].update(num_epochs=1, batch_size=8, log_frequency=1, save_frequency=1)
    params["prediction_params"].update(num_context=1, num_preds=2, input_buffer_size=3)
    with open(params_file, "w") as f:
        json.dump(params, f)

    _run(["src/02_train_decomp.py", "-d", exp], env)
    _run(["src/03_evaluate_decomp_model.py", "-d", exp,
          "--decomp_ckpt", "checkpoint_epoch_final", "--batch_size", "8"], env)
    _run(["src/01_create_predictor_experiment.py", "-d", exp,
          "--name_pred_exp", "p1", "--predictor_name", "VanillaTransformer"], env)

    pred_params_file = os.path.join(exp, "predictors", "p1", "experiment_params.json")
    with open(pred_params_file) as f:
        pp = json.load(f)
    pp["predictor"]["predictor_params"].update(token_dim=16, hidden_dim=16, num_layers=1, n_heads=2)
    pp["training"].update(num_epochs=1, batch_size=8, log_frequency=1, save_frequency=1)
    with open(pred_params_file, "w") as f:
        json.dump(pp, f)

    _run(["src/04_train_predictor.py", "-d", exp, "--name_pred_exp", "p1",
          "--decomp_ckpt", "checkpoint_epoch_final"], env)
    _run(["src/05_evaluate_predictor.py", "-d", exp, "--name_pred_exp", "p1",
          "--decomp_ckpt", "checkpoint_epoch_final",
          "--pred_ckpt", "checkpoint_epoch_final",
          "--num_seed", "1", "--num_preds", "2", "--batch_size", "8"], env)
    _run(["src/06_generate_figs_predictor.py", "-d", exp, "--name_pred_exp", "p1",
          "--decomp_ckpt", "checkpoint_epoch_final",
          "--pred_ckpt", "checkpoint_epoch_final",
          "--num_preds", "2", "--num_seqs", "1"], env)

    results = list((tmp_path / "exp_cli" / "predictors" / "p1" / "results").rglob("results.json"))
    assert results, "predictor eval produced no results.json"
    with open(results[0]) as f:
        res = json.load(f)
    assert "psnr" in res
