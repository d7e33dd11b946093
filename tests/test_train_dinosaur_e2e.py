"""End-to-end ExtendedDINOSAUR training on the synthetic dataset (tiny ViT),
including the BatchNorm CNN image head and the frozen-encoder optimizer mask."""

import numpy as np
import pytest

from textocvp_tpu.core.experiment import Experiment


@pytest.fixture(scope="module")
def dinosaur_exp(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("dino_e2e")
    exp = Experiment.create(tmp_path / "exp_dino", "ExtendedDINOSAUR", "Synthetic")
    params = exp.params
    mp = params["model"]["model_params"]
    mp.update(img_size=28, num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=384)
    mp["encoder"] = {
        "encoder_name": "vit_small_patch14_dinov2",
        "encoder_params": {"encoder_num_blocks": 1},
    }
    # 28/14 = 2 -> 4 patches; out_dim = ViT-small feature dim (384) + alpha
    mp["decoder"]["decoder_params"].update(
        num_patches=4, in_dim=16, hidden_dim=32, out_dim=385, num_layers=2,
        patch_size=14, num_layers_cnn=2, reconstruct_images=True,
    )
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    params["dataset"].update(
        img_size=[28, 28], num_frames=3, num_train_seqs=8, num_eval_seqs=8,
        tokenizer="CustomTokenizer", total_frames=6,
    )
    params["training"].update(num_epochs=1, batch_size=8, log_frequency=1,
                              save_frequency=1, warmup_steps=2)
    exp.save_params(params)
    return exp


def test_dinosaur_training_and_eval(dinosaur_exp):
    from textocvp_tpu.train.trainer import DecompTrainer

    trainer = DecompTrainer(dinosaur_exp.exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    assert trainer.batch_stats is not None  # CNN head has BatchNorm
    trainer.training_loop()
    names = {m.stem for m in dinosaur_exp.models_dir.glob("*.msgpack")}
    assert "checkpoint_epoch_final" in names

    # dual loss was configured automatically for ExtendedDINOSAUR
    assert {s["type"] for s in dinosaur_exp.params["loss"]} == {"pred_feature_mse", "mse"}

    from textocvp_tpu.train.evaluator import DecompEvaluator

    ev = DecompEvaluator(dinosaur_exp.exp_path, "checkpoint_epoch_final",
                         batch_size=8, metrics=("psnr",))
    ev.load_data()
    vids, _ = next(iter(ev.test_loader))
    ev.load_model(vids)
    results = ev.evaluate()
    assert np.isfinite(results["psnr"]["mean"])


def test_frozen_encoder_not_updated(dinosaur_exp):
    """The DINOv2 backbone must stay frozen during training
    (reference ExtendedDINOSAUR.py:94)."""
    import jax

    from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint

    # epoch_1 vs final: encoder params identical, other params changed
    ck1 = load_checkpoint(checkpoint_path(dinosaur_exp.models_dir, "checkpoint_epoch_1"))
    # with 1 epoch, final == epoch_1; re-train another epoch for a diff
    from textocvp_tpu.train.trainer import DecompTrainer

    trainer = DecompTrainer(dinosaur_exp.exp_path, checkpoint="checkpoint_epoch_final",
                            resume_training=True)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_params["num_epochs"] = 2
    trainer.training_loop()
    ck2 = load_checkpoint(checkpoint_path(dinosaur_exp.models_dir, "checkpoint_epoch_2"))

    enc1 = jax.tree_util.tree_leaves(ck1["params"]["image_encoder"])
    enc2 = jax.tree_util.tree_leaves(ck2["params"]["image_encoder"])
    for a, b in zip(enc1, enc2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    sa1 = jax.tree_util.tree_leaves(ck1["params"]["slot_attention"])
    sa2 = jax.tree_util.tree_leaves(ck2["params"]["slot_attention"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(sa1, sa2))


def test_predictor_eval_requires_image_reconstruction(tmp_path):
    """An ExtendedDINOSAUR experiment with reconstruct_images disabled has no
    RGB frames to compare — PredictorEvaluator (and FigGenerator via
    inheritance) must fail fast with the same clear message as serving."""
    import pytest

    exp = Experiment.create(tmp_path / "exp_nofr", "ExtendedDINOSAUR", "Synthetic")
    params = exp.params
    params["model"]["model_params"]["decoder"]["decoder_params"][
        "reconstruct_images"] = False
    exp.save_params(params)
    pred_exp = Experiment.create_predictor(exp.exp_path, "p", "TextOCVP_CustomTF",
                                           require_parent_ckpt=False)
    assert pred_exp.params_path.exists()

    from textocvp_tpu.train.evaluator import PredictorEvaluator

    with pytest.raises(ValueError, match="reconstruct_images"):
        PredictorEvaluator(exp.exp_path, "p", "ck_decomp", "ck_pred")


def test_decomp_eval_requires_image_reconstruction(tmp_path):
    """DecompEvaluator computes recon PSNR/SSIM/LPIPS on RGB frames, so a
    feature-only decoder must fail fast too — while DecompFigGenerator
    (which renders what the decoder CAN produce: masks/objects) must NOT."""
    import pytest

    exp = Experiment.create(tmp_path / "exp_nofr2", "ExtendedDINOSAUR", "Synthetic")
    params = exp.params
    params["model"]["model_params"]["decoder"]["decoder_params"][
        "reconstruct_images"] = False
    exp.save_params(params)

    from textocvp_tpu.train.evaluator import DecompEvaluator
    from textocvp_tpu.train.fig_generation import DecompFigGenerator

    with pytest.raises(ValueError, match="reconstruct_images"):
        DecompEvaluator(exp.exp_path, "ck_decomp")
    assert DecompFigGenerator(exp.exp_path, "ck_decomp") is not None


def test_dinosaur_eval_tp_mesh_matches_plain(dinosaur_exp):
    """tpu.mesh_axes with model>1 TP-shards the ViT + patch decoder inside
    DecompEvaluator (parallel/partitioning.py decomp specs); metrics must
    match the single-device eval."""
    import json

    from textocvp_tpu.train.evaluator import DecompEvaluator

    def run(results_name):
        ev = DecompEvaluator(dinosaur_exp.exp_path, "checkpoint_epoch_final",
                             batch_size=8, metrics=("psnr",),
                             results_name=results_name)
        ev.load_data()
        vids, _ = next(iter(ev.test_loader))
        ev.load_model(vids)
        return ev.evaluate()

    plain = run("eval_tp_ref")

    params_file = dinosaur_exp.exp_path / "experiment_params.json"
    saved = params_file.read_text()
    try:
        params = dinosaur_exp.params
        params.setdefault("tpu", {})["mesh_axes"] = {"data": 2, "model": 4}
        dinosaur_exp.save_params(params)
        tp = run("eval_tp_mesh")
    finally:
        params_file.write_text(saved)
        dinosaur_exp._params = None  # drop the mutated cache

    np.testing.assert_allclose(tp["psnr"]["mean"], plain["psnr"]["mean"],
                               rtol=1e-4)


def test_remat_step_matches_plain(tmp_path_factory):
    """tpu.remat (jax.checkpoint with the save_only_these_names policy that
    keeps the tagged frozen-ViT features instead of replaying the encoder in
    the backward — models/extended_dinosaur.py) is semantics-preserving: one
    train step from identical init/batch/rng must reproduce the plain step's
    losses."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("dino_remat")
    videos = np.random.default_rng(2).uniform(
        0, 1, (4, 3, 28, 28, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(9)

    losses = {}
    for remat in (False, True):
        exp = Experiment.create(tmp_path / f"exp_r{int(remat)}",
                                "ExtendedDINOSAUR", "Synthetic")
        params = exp.params
        mp = params["model"]["model_params"]
        mp.update(img_size=28, num_slots=3, slot_dim=16, mlp_hidden=16,
                  mlp_encoder_dim=384)
        mp["encoder"] = {
            "encoder_name": "vit_small_patch14_dinov2",
            "encoder_params": {"encoder_num_blocks": 1},
        }
        mp["decoder"]["decoder_params"].update(
            num_patches=4, in_dim=16, hidden_dim=32, out_dim=385,
            num_layers=2, patch_size=14, num_layers_cnn=2,
            reconstruct_images=True,
        )
        params["dataset"].update(img_size=[28, 28], num_frames=3)
        params["training"]["batch_size"] = 4
        params.setdefault("tpu", {})["remat"] = remat
        exp.save_params(params)
        tr = DecompTrainer(exp.exp_path)
        tr.setup_model(videos)
        _, _, _, values = tr.train_step(
            tr.params, tr.batch_stats, tr.opt_state, jnp.asarray(videos), rng)
        losses[remat] = float(values["_total"])
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
