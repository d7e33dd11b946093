"""CLI 01: create a decomposition experiment (reference 01_create_experiment.py)."""

from textocvp_tpu.cli.arguments import create_experiment_args
from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import print_


def main(argv=None):
    args = create_experiment_args(argv)
    exp = Experiment.create(args.exp_directory, args.model_name, args.dataset_name)
    print_(f"Created experiment at {exp.exp_path}")
    print_(f"  model: {args.model_name}  dataset: {args.dataset_name}")
    return exp


if __name__ == "__main__":
    main()
