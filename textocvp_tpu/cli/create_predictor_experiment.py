"""CLI 01b: create a nested predictor experiment
(reference 01_create_predictor_experiment.py)."""

from textocvp_tpu.cli.arguments import create_predictor_experiment_args
from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import print_


def main(argv=None):
    args = create_predictor_experiment_args(argv)
    exp = Experiment.create_predictor(
        args.exp_directory, args.name_pred_exp, args.predictor_name,
        require_parent_ckpt=not args.skip_ckpt_check,
    )
    print_(f"Created predictor experiment at {exp.exp_path}")
    return exp


if __name__ == "__main__":
    main()
