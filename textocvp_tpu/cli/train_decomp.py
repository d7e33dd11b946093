"""CLI 02: train a decomposition model (SAVi or ExtendedDINOSAUR)
(reference 02_train_savi.py / 02_train_extended_dinosaur.py — a single entry
point here; the model comes from the experiment params)."""

from textocvp_tpu.cli.arguments import train_decomp_args
from textocvp_tpu.core.logger import print_
from textocvp_tpu.train.trainer import DecompTrainer


def main(argv=None):
    args = train_decomp_args(argv)
    trainer = DecompTrainer(
        args.exp_directory, checkpoint=args.checkpoint,
        resume_training=args.resume_training,
    )
    trainer.load_data()
    videos, _ = next(iter(trainer.valid_loader))
    trainer.setup_model(videos)
    print_("Starting training loop")
    trainer.training_loop()
    return trainer


if __name__ == "__main__":
    main()
