"""CLI: convert a reference PyTorch .pth checkpoint into this framework's
msgpack format, placed in the experiment's models/ dir."""

import argparse

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.core.logger import print_
from textocvp_tpu.train.checkpoints import save_checkpoint
from textocvp_tpu.train.torch_import import import_checkpoint


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-d", "--exp_directory", required=True,
                        help="Experiment dir whose params describe the model")
    parser.add_argument("--torch_ckpt", required=True, help="Path to the .pth file")
    parser.add_argument("--kind", required=True, choices=["decomp", "predictor"])
    parser.add_argument("--output_name", default=None,
                        help="Checkpoint name (default: the .pth stem)")
    args = parser.parse_args(argv)

    exp = Experiment(args.exp_directory)
    state = import_checkpoint(args.torch_ckpt, exp.params, args.kind)
    from pathlib import Path

    name = args.output_name or Path(args.torch_ckpt).stem
    path = save_checkpoint(exp.models_dir, name, state)
    print_(f"Imported {args.torch_ckpt} -> {path}")
    return path


if __name__ == "__main__":
    main()
