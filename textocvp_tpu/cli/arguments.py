"""
Argument parsers for the CLI entry points (reference src/lib/arguments.py).
Argument names match the reference scripts so existing invocations/wrappers
port unchanged.
"""

from __future__ import annotations

import argparse
import os

from textocvp_tpu.core.config import CONFIG, get_available_configs


def _norm_exp_dir(exp_directory: str) -> str:
    """Normalize an experiment dir against experiments_path
    (reference arguments.py:358-384)."""
    if os.path.isabs(exp_directory) or os.path.exists(exp_directory):
        return exp_directory
    candidate = os.path.join(CONFIG["paths"]["experiments_path"], exp_directory)
    return candidate


def create_experiment_args(argv=None):
    parser = argparse.ArgumentParser(description="Create a decomposition experiment")
    parser.add_argument("-d", "--exp_directory", required=True,
                        help="Directory for the new experiment")
    parser.add_argument("--name", default=None,
                        help="Experiment name; the experiment is created at "
                             "EXP_DIRECTORY/NAME (reference "
                             "01_create_experiment.py:21-23 contract). "
                             "Omitted: -d is the full experiment path")
    parser.add_argument("--model_name", required=True,
                        choices=get_available_configs("models"))
    parser.add_argument("--dataset_name", required=True,
                        choices=get_available_configs("datasets"))
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    if args.name:
        args.exp_directory = os.path.join(args.exp_directory, args.name)
    return args


def create_predictor_experiment_args(argv=None):
    parser = argparse.ArgumentParser(description="Create a nested predictor experiment")
    parser.add_argument("-d", "--exp_directory", required=True,
                        help="Parent decomposition experiment directory")
    parser.add_argument("--name_pred_exp", "--name", dest="name_pred_exp",
                        required=True,
                        help="Name for the new predictor experiment "
                             "(--name is the reference's creation-time "
                             "spelling, 01_create_predictor_experiment.py:22)")
    parser.add_argument("--predictor_name", required=True,
                        choices=get_available_configs("predictors"))
    parser.add_argument("--skip_ckpt_check", action="store_true",
                        help="Allow creation without a trained parent checkpoint")
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def train_decomp_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a decomposition model")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="Checkpoint to load (warm start)")
    parser.add_argument("--resume_training", action="store_true")
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def evaluate_decomp_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a decomposition checkpoint")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--decomp_ckpt", required=True)
    parser.add_argument("--results_name", default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def train_predictor_args(argv=None):
    parser = argparse.ArgumentParser(description="Train a slot predictor")
    parser.add_argument("-d", "--exp_directory", required=True,
                        help="Parent decomposition experiment directory")
    parser.add_argument("--name_pred_exp", required=True)
    parser.add_argument("--decomp_ckpt", required=True,
                        help="Checkpoint of the frozen decomposition model")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--resume_training", action="store_true")
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def evaluate_predictor_args(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate a predictor checkpoint")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--name_pred_exp", required=True)
    parser.add_argument("--decomp_ckpt", required=True)
    parser.add_argument("--pred_ckpt", required=True)
    parser.add_argument("--results_name", default=None)
    parser.add_argument("--num_seed", type=int, default=None)
    parser.add_argument("--num_preds", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def generate_figs_decomp_args(argv=None):
    parser = argparse.ArgumentParser(description="Generate decomposition figures")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--decomp_ckpt", required=True)
    parser.add_argument("--num_seqs", type=int, default=10)
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args


def generate_figs_predictor_args(argv=None):
    parser = argparse.ArgumentParser(description="Generate prediction figures and GIFs")
    parser.add_argument("-d", "--exp_directory", required=True)
    parser.add_argument("--name_pred_exp", required=True)
    parser.add_argument("--decomp_ckpt", required=True)
    parser.add_argument("--pred_ckpt", required=True)
    parser.add_argument("--num_seed", type=int, default=None)
    parser.add_argument("--num_preds", type=int, default=None)
    parser.add_argument("--num_seqs", type=int, default=10)
    args = parser.parse_args(argv)
    args.exp_directory = _norm_exp_dir(args.exp_directory)
    return args
