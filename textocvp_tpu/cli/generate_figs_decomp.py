"""CLI 06a: qualitative figures for a decomposition model
(reference 06_generate_figs_decomp_model.py)."""

from textocvp_tpu.cli.arguments import generate_figs_decomp_args
from textocvp_tpu.train.fig_generation import DecompFigGenerator


def main(argv=None):
    args = generate_figs_decomp_args(argv)
    gen = DecompFigGenerator(args.exp_directory, checkpoint=args.decomp_ckpt,
                             num_seqs=args.num_seqs)
    gen.load_data()
    videos, _ = next(iter(gen.test_loader))
    gen.load_model(videos)
    return gen.generate_figs()


if __name__ == "__main__":
    main()
