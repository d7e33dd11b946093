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
