"""CLI 05: evaluate a predictor checkpoint on video prediction
(reference 05_evaluate_predictor.py)."""

from textocvp_tpu.cli.arguments import evaluate_predictor_args
from textocvp_tpu.train.evaluator import PredictorEvaluator


def main(argv=None):
    args = evaluate_predictor_args(argv)
    ev = PredictorEvaluator(
        args.exp_directory, args.name_pred_exp,
        decomp_ckpt=args.decomp_ckpt, pred_ckpt=args.pred_ckpt,
        num_seed=args.num_seed, num_preds=args.num_preds,
        batch_size=args.batch_size, results_name=args.results_name,
    )
    ev.load_data()
    videos, others = next(iter(ev.test_loader))
    ev.load_models(videos, others)
    return ev.evaluate()


if __name__ == "__main__":
    main()
