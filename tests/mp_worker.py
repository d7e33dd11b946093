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
    from textocvp_tpu.train.checkpoints import (
        checkpoint_path,
        load_checkpoint,
        save_checkpoint,
    )

    state = load_checkpoint(
        checkpoint_path(trainer.exp.models_dir, "checkpoint_epoch_final"))

    # --- evaluator leg: the same 2-process cluster runs DecompEvaluator ---
    # per-process loader slicing, on-device metric accumulation, and the
    # process-0 gate on results.json must all hold for real (not simulated).
    from textocvp_tpu.train.evaluator import DecompEvaluator

    evaluator = DecompEvaluator(
        exp_path, "checkpoint_epoch_final", metrics=("psnr",))
    evaluator.load_data()
    videos, _ = next(iter(evaluator.test_loader))
    evaluator.load_model(videos)
    results = evaluator.evaluate()
    psnr_mean = float(results["psnr"]["mean"])
    multihost_utils.sync_global_devices("textocvp_mp_evaluated")

    # --- cross-process-sharded checkpoint gather leg ---
    # A leaf sharded over an axis that SPANS processes is not fully
    # addressable on either process; save_checkpoint must process_allgather
    # it (a collective both processes join) before process 0 writes. This is
    # the multi-host-TP save path, exercised with real separate address
    # spaces instead of a single-process mesh.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()), ("data",))
    full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    sharded = multihost_utils.host_local_array_to_global_array(
        full[4 * jax.process_index():4 * (jax.process_index() + 1)],
        mesh, P("data"))
    assert not sharded.is_fully_addressable
    save_checkpoint(trainer.exp.models_dir, "sharded_gather",
                    {"w": sharded, "epoch": 7})
    multihost_utils.sync_global_devices("textocvp_mp_gathered")
    gathered = load_checkpoint(
        checkpoint_path(trainer.exp.models_dir, "sharded_gather"))
    gather_ok = (np.array_equal(np.asarray(gathered["w"]), full)
                 and int(gathered["epoch"]) == 7)

    print("MPRESULT " + json.dumps({
        "pid": jax.process_index(),
        "writer_none": trainer.writer is None,
        "checksum": checksum,
        "ckpt_epoch": int(state["epoch"]),
        "psnr_mean": psnr_mean,
        "gather_ok": bool(gather_ok),
    }), flush=True)


if __name__ == "__main__":
    main()
