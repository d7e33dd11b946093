"""CLI 04: train a slot predictor with a frozen decomposition model
(reference 04_train_predictor.py)."""

import os

from textocvp_tpu.cli.arguments import train_predictor_args
from textocvp_tpu.core.logger import print_
from textocvp_tpu.train.predictor_trainer import PredictorTrainer


def main(argv=None):
    args = train_predictor_args(argv)
    exp_path = os.path.join(args.exp_directory, "predictors", args.name_pred_exp)
    trainer = PredictorTrainer(
        exp_path, decomp_ckpt=args.decomp_ckpt,
        checkpoint=args.checkpoint, resume_training=args.resume_training,
    )
    trainer.load_data()
    videos, others = next(iter(trainer.valid_loader))
    trainer.setup_model(videos, others)
    print_("Starting predictor training loop")
    trainer.training_loop()
    return trainer


if __name__ == "__main__":
    main()
