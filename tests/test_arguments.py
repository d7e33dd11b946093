"""CLI argument-surface tests: names and semantics match the reference
invocations (scripts/05_evaluate_TextOCVP_CATER.sh etc.)."""

import pytest

from textocvp_tpu.cli.arguments import (
    create_experiment_args,
    evaluate_decomp_args,
    evaluate_predictor_args,
    generate_figs_predictor_args,
    train_predictor_args,
)


def test_reference_eval_invocation_parses():
    args = evaluate_predictor_args([
        "-d", "/tmp/experiments/TextOCVP_CATER/",
        "--decomp_ckpt", "SAVi_CATER.pth",
        "--name_pred_exp", "TextOCVP",
        "--pred_ckpt", "TextOCVP_CATER.pth",
        "--results_name", "results_TextOCVP_NumSeed=1_NumPreds=9",
        "--num_seed", "1",
        "--num_preds", "9",
        "--batch_size", "32",
    ])
    assert args.num_seed == 1 and args.num_preds == 9 and args.batch_size == 32
    assert args.decomp_ckpt == "SAVi_CATER.pth"


def test_decomp_eval_invocation_parses():
    args = evaluate_decomp_args([
        "-d", "/tmp/x", "--decomp_ckpt", "SAVi_CATER.pth",
        "--results_name", "results_DecompModel", "--batch_size", "64",
    ])
    assert args.batch_size == 64


def test_figs_invocation_parses():
    args = generate_figs_predictor_args([
        "-d", "/tmp/x", "--decomp_ckpt", "a", "--name_pred_exp", "T",
        "--pred_ckpt", "b", "--num_preds", "19", "--num_seqs", "10",
    ])
    assert args.num_preds == 19 and args.num_seqs == 10
    assert args.num_seed is None  # optional, defaults to config


def test_model_name_validated():
    with pytest.raises(SystemExit):
        create_experiment_args(["-d", "/tmp/x", "--model_name", "NotAModel",
                                "--dataset_name", "CATER_Easy"])


def test_train_predictor_requires_decomp_ckpt():
    with pytest.raises(SystemExit):
        train_predictor_args(["-d", "/tmp/x", "--name_pred_exp", "p"])


def test_create_experiment_name_flag(tmp_path):
    """Reference contract: 01_create_experiment -d DIR --name NAME creates
    the experiment at DIR/NAME (01_create_experiment.py:21-23)."""
    from textocvp_tpu.cli.arguments import (
        create_experiment_args,
        create_predictor_experiment_args,
    )

    args = create_experiment_args(
        ["-d", str(tmp_path / "group"), "--name", "run1",
         "--model_name", "SAVi", "--dataset_name", "Synthetic"])
    assert args.exp_directory == str(tmp_path / "group" / "run1")

    # without --name, -d is the full experiment path (round-1 behavior kept)
    args = create_experiment_args(
        ["-d", str(tmp_path / "exp2"),
         "--model_name", "SAVi", "--dataset_name", "Synthetic"])
    assert args.exp_directory == str(tmp_path / "exp2")

    # predictor creation accepts the reference's --name spelling
    args = create_predictor_experiment_args(
        ["-d", str(tmp_path / "exp2"), "--name", "predA",
         "--predictor_name", "TextOCVP_T5"])
    assert args.name_pred_exp == "predA"


def test_create_experiment_cli_end_to_end_with_name(tmp_path):
    from textocvp_tpu.cli.create_experiment import main

    exp = main(["-d", str(tmp_path / "grp"), "--name", "e1",
                "--model_name", "SAVi", "--dataset_name", "Synthetic"])
    assert (tmp_path / "grp" / "e1" / "experiment_params.json").exists()
    assert str(exp.exp_path).endswith("grp/e1")
