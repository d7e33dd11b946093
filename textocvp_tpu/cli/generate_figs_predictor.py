"""CLI 06b: qualitative figures + GIFs for a predictor
(reference 06_generate_figs_predictor.py)."""

from textocvp_tpu.cli.arguments import generate_figs_predictor_args
from textocvp_tpu.train.fig_generation import PredictorFigGenerator


def main(argv=None):
    args = generate_figs_predictor_args(argv)
    gen = PredictorFigGenerator(
        args.exp_directory, args.name_pred_exp,
        decomp_ckpt=args.decomp_ckpt, pred_ckpt=args.pred_ckpt,
        num_seed=args.num_seed, num_preds=args.num_preds, num_seqs=args.num_seqs,
    )
    gen.load_data()
    videos, others = next(iter(gen.test_loader))
    gen.load_models(videos, others)
    return gen.generate_figs()


if __name__ == "__main__":
    main()
