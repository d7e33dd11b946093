"""
Worker for tests/test_multiprocess.py: one REAL ``jax.distributed`` process.

Launched twice (process 0 and 1) with the TEXTOCVP_COORDINATOR env set, each
with 2 virtual CPU devices, forming a genuine 2-process x 2-device cluster
(cross-process collectives ride Gloo). Runs the actual DecompTrainer epoch
loop on the hybrid (dcn, data, model) mesh with per-process input sharding —
the same code path a multi-host TPU pod runs — then reports a params
checksum and the side-output gating state as one MPRESULT json line.

Usage: mp_worker.py <exp_root>   (process id comes from TEXTOCVP_PROCESS_ID)
"""

import json
import os
import sys


def main():
    exp_root = sys.argv[1]
    import jax

    jax.config.update("jax_platforms", "cpu")

    from textocvp_tpu.parallel.distributed import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "coordinator env missing"
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from jax.experimental import multihost_utils

    exp_path = os.path.join(exp_root, "mp_exp")
    if jax.process_index() == 0:
        from textocvp_tpu.core.experiment import Experiment

        exp = Experiment.create(exp_path, "SAVi", "Synthetic")
        params = exp.params
        mp = params["model"]["model_params"]
        mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
        mp["encoder"]["encoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
        mp["decoder"]["decoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
        mp["transition_module"] = {
            "model_name": "TransformerBlock", "num_heads": 2, "mlp_size": 16}
        params["dataset"].update(
            img_size=[16, 16], num_frames=4, num_train_seqs=8, num_eval_seqs=8,
            tokenizer="CustomTokenizer", total_frames=8,
        )
        params["training"].update(
            num_epochs=2, batch_size=8, log_frequency=1, save_frequency=1,
            warmup_steps=2,
        )
        exp.save_params(params)
    multihost_utils.sync_global_devices("textocvp_mp_exp_created")

    from textocvp_tpu.train.trainer import DecompTrainer

    trainer = DecompTrainer(exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_loop()

    import numpy as np

    checksum = float(sum(
        np.abs(np.asarray(x, dtype=np.float64)).sum()
        for x in jax.tree_util.tree_leaves(trainer.params)))
    # every process must also be able to RESUME from the ckpt process 0 wrote
    multihost_utils.sync_global_devices("textocvp_mp_trained")
    from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint

    state = load_checkpoint(
        checkpoint_path(trainer.exp.models_dir, "checkpoint_epoch_final"))
    print("MPRESULT " + json.dumps({
        "pid": jax.process_index(),
        "writer_none": trainer.writer is None,
        "checksum": checksum,
        "ckpt_epoch": int(state["epoch"]),
    }), flush=True)


if __name__ == "__main__":
    main()
