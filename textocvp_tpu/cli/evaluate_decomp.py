"""CLI 03: evaluate a decomposition checkpoint
(reference 03_evaluate_decomp_model.py)."""

from textocvp_tpu.cli.arguments import evaluate_decomp_args
from textocvp_tpu.train.evaluator import DecompEvaluator


def main(argv=None):
    args = evaluate_decomp_args(argv)
    ev = DecompEvaluator(
        args.exp_directory, checkpoint=args.decomp_ckpt,
        batch_size=args.batch_size, results_name=args.results_name,
    )
    ev.load_data()
    videos, _ = next(iter(ev.test_loader))
    ev.load_model(videos)
    return ev.evaluate()


if __name__ == "__main__":
    main()
