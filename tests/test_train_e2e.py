"""
End-to-end integration: create experiment -> train SAVi a few steps on the
synthetic dataset -> create predictor experiment -> train predictor ->
evaluate with the one-program rollout. Exercises every layer of the framework
on the 8-device CPU mesh.
"""

import json

import numpy as np
import pytest

from textocvp_tpu.core.experiment import Experiment


def _tiny_exp(tmp_path, name="exp_tiny"):
    exp = Experiment.create(tmp_path / name, "SAVi", "Synthetic")
    params = exp.params
    mp = params["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2, "mlp_size": 16}
    params["dataset"].update(
        img_size=[16, 16], num_frames=4, num_train_seqs=8, num_eval_seqs=8,
        tokenizer="CustomTokenizer", total_frames=8,
    )
    params["training"].update(
        num_epochs=2, batch_size=8, log_frequency=1, save_frequency=1, warmup_steps=2,
    )
    params["prediction_params"].update(num_context=1, num_preds=2, input_buffer_size=3)
    exp.save_params(params)
    return exp


@pytest.fixture(scope="module")
def trained_exp(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("e2e")
    exp = _tiny_exp(tmp_path)

    from textocvp_tpu.train.trainer import DecompTrainer

    trainer = DecompTrainer(exp.exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_loop()
    return exp


def test_savi_training_reduces_loss_and_checkpoints(trained_exp):
    models = list(trained_exp.models_dir.glob("*.msgpack"))
    names = {m.stem for m in models}
    assert "checkpoint_last_saved" in names
    assert "checkpoint_epoch_final" in names
    assert "checkpoint_epoch_1" in names


def test_decomp_evaluation(trained_exp):
    from textocvp_tpu.train.evaluator import DecompEvaluator

    ev = DecompEvaluator(trained_exp.exp_path, "checkpoint_epoch_final",
                         batch_size=8, metrics=("psnr", "ssim"))
    ev.load_data()
    videos, _ = next(iter(ev.test_loader))
    ev.load_model(videos)
    results = ev.evaluate()
    assert "psnr" in results and "ssim" in results
    assert np.isfinite(results["psnr"]["mean"])
    assert len(results["psnr"]["framewise"]) == 4
    with open(ev.exp.results_dir(ev.results_name) / "results.json") as f:
        saved = json.load(f)
    assert saved["psnr"]["mean"] == results["psnr"]["mean"]


def test_decomp_evaluation_autotune(trained_exp, capsys):
    """tpu.decode_autotune measures the candidate (chunks, unroll) decode
    schedules on the first batch and reuses the winner; metrics must match
    the static-policy eval exactly (the decode is exact for every schedule)."""
    from textocvp_tpu.train.evaluator import DecompEvaluator

    ref = DecompEvaluator(trained_exp.exp_path, "checkpoint_epoch_final",
                          batch_size=8, metrics=("psnr",))
    ev = DecompEvaluator(trained_exp.exp_path, "checkpoint_epoch_final",
                         batch_size=8, metrics=("psnr",))
    ev.exp_params.setdefault("tpu", {})["decode_autotune"] = True
    for e in (ref, ev):
        e.load_data()
        videos, _ = next(iter(e.test_loader))
        e.load_model(videos)
    expected = ref.evaluate()
    results = ev.evaluate()
    out = capsys.readouterr().out
    assert "autotune picked" in out
    np.testing.assert_allclose(results["psnr"]["mean"], expected["psnr"]["mean"],
                               rtol=1e-6)


@pytest.fixture(scope="module")
def trained_predictor(trained_exp):
    pred_exp = Experiment.create_predictor(
        trained_exp.exp_path, "pred_tiny", "TextOCVP_CustomTF"
    )
    params = pred_exp.params
    pp = params["predictor"]["predictor_params"]
    pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=32, num_layers=1)
    pp["fusion_params"].update(num_heads=2, head_dim=8, mlp_size=32)
    pp["text_encoder_params"].update(input_dim=16, num_layers=1, num_heads=2, vocab_size=16)
    params["training"].update(num_epochs=1, batch_size=8, log_frequency=1, save_frequency=1)
    pred_exp.save_params(params)

    from textocvp_tpu.train.predictor_trainer import PredictorTrainer

    trainer = PredictorTrainer(pred_exp.exp_path, decomp_ckpt="checkpoint_epoch_final")
    trainer.load_data()
    videos, others = next(iter(trainer.train_loader))
    trainer.setup_model(videos, others)
    trainer.training_loop()
    return pred_exp


def test_predictor_training_checkpoints(trained_predictor):
    names = {m.stem for m in trained_predictor.models_dir.glob("*.msgpack")}
    assert "checkpoint_epoch_final" in names


def test_train_decode_chunks_step_matches_flat(tmp_path_factory):
    """tpu.train_decode_chunks wires the scanned+remat decode tail into the
    jitted SAVi train step; one step from identical init/batch/rng must match
    the flat-decode step's losses (the decode is exact either way)."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("chunked_train")
    videos = np.random.default_rng(0).uniform(
        0, 1, (4, 4, 16, 16, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    losses = {}
    for chunks in (None, 2):  # None -> flat; 2 divides the 16-row decode batch
        exp = _tiny_exp(tmp_path, name=f"exp_c{chunks or 0}")
        if chunks:
            params = exp.params
            params.setdefault("tpu", {})["train_decode_chunks"] = chunks
            exp.save_params(params)
        tr = DecompTrainer(exp.exp_path)
        tr.setup_model(videos)
        _, _, _, values = tr.train_step(
            tr.params, tr.batch_stats, tr.opt_state, jnp.asarray(videos), rng)
        losses[chunks] = float(values["_total"])
    assert np.isfinite(losses[2])
    np.testing.assert_allclose(losses[2], losses[None], rtol=1e-5)


def test_valid_step_chunked_matches_flat(tmp_path_factory):
    """valid_step (forward-only) takes the evaluators' chunked-decode policy
    (tpu.decode_chunks) — the flat forward-only program is a measured 3x
    scheduling pathology on v5e (models/chunked.py::valid_decode_kwargs). The
    chunked form must reproduce the flat form's validation losses exactly
    (the scanned tail is the same math)."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("chunked_valid")
    videos = np.random.default_rng(1).uniform(
        0, 1, (4, 4, 16, 16, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(5)

    losses = {}
    for chunks in (1, 2):  # 1 -> flat; 2 divides the 16-row decode batch
        exp = _tiny_exp(tmp_path, name=f"exp_v{chunks}")
        params = exp.params
        params.setdefault("tpu", {})["decode_chunks"] = chunks
        exp.save_params(params)
        tr = DecompTrainer(exp.exp_path)
        tr.setup_model(videos)
        values = tr.valid_step(tr.params, tr.batch_stats,
                               jnp.asarray(videos), rng)
        losses[chunks] = float(values["_total"])
    assert np.isfinite(losses[2])
    np.testing.assert_allclose(losses[2], losses[1], rtol=1e-5)


def test_decomp_fig_generation(trained_exp):
    from textocvp_tpu.train.fig_generation import DecompFigGenerator

    gen = DecompFigGenerator(trained_exp.exp_path, "checkpoint_epoch_final", num_seqs=2)
    gen.load_data()
    videos, _ = next(iter(gen.test_loader))
    gen.load_model(videos)
    out_dir = gen.generate_figs()
    seq_dirs = sorted(out_dir.glob("sequence_*"))
    assert len(seq_dirs) == 2
    assert (seq_dirs[0] / "recons.png").exists()
    assert (seq_dirs[0] / "recons.gif").exists()
    assert (seq_dirs[0] / "objects.png").exists()
    assert (seq_dirs[0] / "masks.png").exists()
    assert (seq_dirs[0] / "segmentation.png").exists()


def test_predictor_fig_generation(trained_exp, trained_predictor):
    from textocvp_tpu.train.fig_generation import PredictorFigGenerator

    gen = PredictorFigGenerator(
        trained_exp.exp_path, "pred_tiny",
        decomp_ckpt="checkpoint_epoch_final", pred_ckpt="checkpoint_epoch_final",
        num_seed=1, num_preds=2, num_seqs=2,
    )
    gen.load_data()
    videos, others = next(iter(gen.test_loader))
    gen.load_models(videos, others)
    out_dir = gen.generate_figs()
    seq_dirs = sorted(out_dir.glob("sequence_*"))
    assert len(seq_dirs) == 2
    d = seq_dirs[0]
    # full reference output inventory per sequence
    # (reference 06_generate_figs_predictor.py:147-261)
    assert (d / "qual_eval_rgb.png").exists()
    assert (d / "aligned_slots.png").exists()
    assert (d / "gt_GIF_frames.gif").exists()
    assert (d / "pred_GIF_frames.gif").exists()
    assert (d / "masks_GIF_masks.gif").exists()
    assert (d / "overlay_GIF.gif").exists()
    num_slots = gen.exp_params["model"]["model_params"]["num_slots"]
    for obj_id in range(num_slots):
        assert (d / f"gt_obj_{obj_id + 1}.gif").exists()
    assert "ball" in (d / "prompt.txt").read_text()
    # per-seq metrics in the directory name (reference 06:83-92)
    assert "psnr=" in d.name and "lpips=" in d.name


def test_predictor_evaluation_one_program(trained_exp, trained_predictor):
    from textocvp_tpu.train.evaluator import PredictorEvaluator

    ev = PredictorEvaluator(
        trained_exp.exp_path, "pred_tiny",
        decomp_ckpt="checkpoint_epoch_final", pred_ckpt="checkpoint_epoch_final",
        num_seed=1, num_preds=3, batch_size=8, metrics=("psnr", "ssim"),
    )
    ev.load_data()
    videos, others = next(iter(ev.test_loader))
    ev.load_models(videos, others)
    results = ev.evaluate()
    assert np.isfinite(results["psnr"]["mean"])
    assert len(results["psnr"]["framewise"]) == 3


def test_predictor_evaluation_autotune(trained_exp, trained_predictor, capsys):
    """tpu.decode_autotune on the predictor eval's decode+metrics stage."""
    from textocvp_tpu.train.evaluator import PredictorEvaluator

    ev = PredictorEvaluator(
        trained_exp.exp_path, "pred_tiny",
        decomp_ckpt="checkpoint_epoch_final", pred_ckpt="checkpoint_epoch_final",
        num_seed=1, num_preds=3, batch_size=8, metrics=("psnr",),
    )
    ev.exp_params.setdefault("tpu", {})["decode_autotune"] = True
    ev.load_data()
    videos, others = next(iter(ev.test_loader))
    ev.load_models(videos, others)
    results = ev.evaluate()
    assert "autotune picked" in capsys.readouterr().out
    assert np.isfinite(results["psnr"]["mean"])


def test_predictor_evaluation_with_quant(trained_exp, trained_predictor):
    """tpu.decode_quant=int8 on the 05 surface: calibrates on the first
    batch's predicted slots, metrics stay finite and close to the bf16 eval,
    and results.json carries the honesty flag."""
    from textocvp_tpu.train.evaluator import PredictorEvaluator

    def run(quant):
        ev = PredictorEvaluator(
            trained_exp.exp_path, "pred_tiny",
            decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final",
            num_seed=1, num_preds=3, batch_size=8, metrics=("psnr",),
            results_name=f"quant_{quant}",
        )
        if quant:
            ev.exp_params.setdefault("tpu", {})["decode_quant"] = "int8"
        ev.load_data()
        videos, others = next(iter(ev.test_loader))
        ev.load_models(videos, others)
        return ev, ev.evaluate()

    ev_q, res_q = run(True)
    _, res_b = run(False)
    assert res_q["decode_quant"] == "int8"
    assert "decode_quant" not in res_b
    assert ev_q.decode_quant_scales.ndim == 1
    # same rollout, quantized decode: PSNR within a fraction of a dB
    assert abs(res_q["psnr"]["mean"] - res_b["psnr"]["mean"]) < 0.5


def test_accum_step_matches_flat(tmp_path_factory):
    """training.accum_steps=4 must yield the same loss and (within adam
    reassociation noise) the same parameter update as the flat step: equal
    microbatches + mean losses make the averaged gradient equal the
    full-batch gradient. Deterministic 'Learned' initializer so the
    per-microbatch rng split cannot change the forward."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("accum")
    videos = np.random.default_rng(0).uniform(
        0, 1, (8, 4, 16, 16, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(3)

    results = {}
    for accum in (1, 4):
        exp = _tiny_exp(tmp_path, name=f"exp_a{accum}")
        params = exp.params
        params["model"]["model_params"]["initializer"] = "Learned"
        params["training"]["accum_steps"] = accum
        exp.save_params(params)
        tr = DecompTrainer(exp.exp_path)
        tr.setup_model(videos)
        new_params, _, _, values = tr.train_step(
            tr.params, tr.batch_stats, tr.opt_state, jnp.asarray(videos), rng)
        results[accum] = (new_params, float(values["_total"]))

    np.testing.assert_allclose(results[4][1], results[1][1], rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(results[1][0])
    flat4 = jax.tree_util.tree_leaves(results[4][0])
    for a, b in zip(flat1, flat4):
        # atol bounds the rare first-step adam sign flip on near-zero grads
        # (update magnitude <= warmup lr); rtol covers everything else
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-4)


def test_accum_ragged_batch_keeps_microbatch_bound(tmp_path_factory):
    """A final ragged batch (size not divisible by accum_steps) must still
    run microbatched — never a near-full flat step, which is exactly the
    shape accumulation exists to avoid (HBM/toolchain limits)."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("accum_ragged")
    exp = _tiny_exp(tmp_path, name="exp_ragged")
    params = exp.params
    params["training"]["accum_steps"] = 4
    exp.save_params(params)
    videos = np.random.default_rng(0).uniform(
        0, 1, (8, 4, 16, 16, 3)).astype(np.float32)
    tr = DecompTrainer(exp.exp_path)
    tr.setup_model(videos)
    ragged = jnp.asarray(videos[:6])  # 6 % 4 != 0
    _, _, _, values = tr.train_step(
        tr.params, tr.batch_stats, tr.opt_state, ragged, jax.random.PRNGKey(0))
    assert np.isfinite(float(values["_total"]))


def test_ragged_accum_policy():
    """ragged_accum picks the smallest divisor whose microbatch fits the
    configured microbatch size (batch_size // accum)."""
    from textocvp_tpu.train.trainer import ragged_accum

    assert ragged_accum(64, 8, 64) == 8        # clean batch: unchanged
    assert ragged_accum(36, 8, 64) == 6        # 36 -> 6 microbatches of 6 (<= 8)
    assert ragged_accum(35, 4, 64) == 5        # 35 -> 5 microbatches of 7 (<= 16)
    assert ragged_accum(37, 8, 64) == 37       # prime: size-1 microbatches
    assert ragged_accum(3, 8, 64) == 1         # tiny tail fits flat
    # never exceeds the configured microbatch size
    for n in range(1, 65):
        a = ragged_accum(n, 8, 64)
        assert n % a == 0 and n // a <= 8


def test_accum_steps_zero_raises():
    """accum_steps=0 (a typo, not a request for the default) must raise, not
    silently train unaccumulated."""
    from textocvp_tpu.train.trainer import accum_steps_of

    with pytest.raises(ValueError, match="accum_steps"):
        accum_steps_of({"accum_steps": 0, "batch_size": 8})
    assert accum_steps_of({"batch_size": 8}) == 1
    assert accum_steps_of({"accum_steps": None, "batch_size": 8}) == 1


def test_accum_steps_must_divide_batch_size(tmp_path_factory):
    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("accum_bad")
    exp = _tiny_exp(tmp_path, name="exp_bad")
    params = exp.params
    params["training"]["accum_steps"] = 3  # does not divide batch_size 8
    exp.save_params(params)
    videos = np.random.default_rng(0).uniform(
        0, 1, (8, 4, 16, 16, 3)).astype(np.float32)
    tr = DecompTrainer(exp.exp_path)
    with pytest.raises(ValueError, match="accum_steps"):
        tr.setup_model(videos)


def test_predictor_accum_step_matches_flat(tmp_path_factory):
    """Predictor-trainer gradient accumulation: same loss as the flat fused
    step from identical init/batch (deterministic 'Learned' slot initializer
    in the frozen parent so microbatch rngs cannot change the slots)."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.predictor_trainer import PredictorTrainer
    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("pred_accum")
    exp = _tiny_exp(tmp_path, name="parent")
    params = exp.params
    params["model"]["model_params"]["initializer"] = "Learned"
    params["training"]["num_epochs"] = 0  # init-only: materialize final ckpt
    exp.save_params(params)
    trainer = DecompTrainer(exp.exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_loop()

    losses = {}
    for accum in (1, 2):
        pred_exp = Experiment.create_predictor(
            exp.exp_path, f"pa{accum}", "TextOCVP_CustomTF")
        pparams = pred_exp.params
        pp = pparams["predictor"]["predictor_params"]
        pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=32,
                                      num_layers=1)
        pp["fusion_params"].update(num_heads=2, head_dim=8, mlp_size=32)
        pp["text_encoder_params"].update(input_dim=16, num_layers=1,
                                         num_heads=2, vocab_size=16)
        pparams["training"].update(batch_size=8, accum_steps=accum)
        pred_exp.save_params(pparams)
        tr = PredictorTrainer(pred_exp.exp_path, decomp_ckpt="checkpoint_epoch_final")
        tr.load_data()
        videos, others = next(iter(tr.train_loader))
        tr.setup_model(videos, others)
        from textocvp_tpu.train.predictor_trainer import _text_kwargs

        _, _, values = tr.train_step(
            tr.params, tr.opt_state, jnp.asarray(videos), jax.random.PRNGKey(5),
            **_text_kwargs(others))
        losses[accum] = float(values["_total"])
    assert np.isfinite(losses[2])
    np.testing.assert_allclose(losses[2], losses[1], rtol=1e-5)


def test_accum_step_matches_flat_sharded_microbatches(tmp_path_factory):
    """accum=2 at batch 16 on the 8-device mesh: microbatches (2, 8, ...) hit
    the with_sharding_constraint path (micro_b % data_axis == 0) and must
    still match the flat step's loss."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("accum_shard")
    videos = np.random.default_rng(1).uniform(
        0, 1, (16, 4, 16, 16, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    losses = {}
    for accum in (1, 2):
        exp = _tiny_exp(tmp_path, name=f"exp_s{accum}")
        params = exp.params
        params["model"]["model_params"]["initializer"] = "Learned"
        params["training"].update(batch_size=16, accum_steps=accum)
        exp.save_params(params)
        tr = DecompTrainer(exp.exp_path)
        assert tr.mesh.shape["data"] > 1  # the sharded path is what we test
        tr.setup_model(videos)
        _, _, _, values = tr.train_step(
            tr.params, tr.batch_stats, tr.opt_state, jnp.asarray(videos), rng)
        losses[accum] = float(values["_total"])
    np.testing.assert_allclose(losses[2], losses[1], rtol=1e-5)


def test_async_checkpoint_training(tmp_path_factory):
    """tpu.async_checkpoint=true: the full training loop saves through the
    background writer; all cadence files exist, are complete (flush before
    return), and the final checkpoint restores."""
    from textocvp_tpu.train.checkpoints import load_checkpoint
    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("async_ckpt")
    exp = _tiny_exp(tmp_path, name="exp_async")
    params = exp.params
    params.setdefault("tpu", {})["async_checkpoint"] = True
    exp.save_params(params)

    trainer = DecompTrainer(exp.exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_loop()

    names = {m.stem for m in exp.models_dir.glob("*.msgpack")}
    assert {"checkpoint_last_saved", "checkpoint_epoch_final",
            "checkpoint_epoch_1", "checkpoint_epoch_2"} <= names
    final = load_checkpoint(exp.models_dir / "checkpoint_epoch_final.msgpack")
    assert final["epoch"] == 2
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(final["params"]),
                    jax.tree_util.tree_leaves(trainer.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predictor_remat_step_matches_plain(tmp_path_factory):
    """tpu.remat on the predictor trainer (jax.checkpoint with the policy
    that SAVES the tagged frozen-decomp slots instead of replaying the
    frozen encode in the backward — predictor_trainer.py) is
    semantics-preserving: one train step from identical init/batch/rng must
    reproduce the plain step's losses."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.train.predictor_trainer import PredictorTrainer, _text_kwargs
    from textocvp_tpu.train.trainer import DecompTrainer

    tmp_path = tmp_path_factory.mktemp("pred_remat")
    exp = _tiny_exp(tmp_path, name="parent")
    params = exp.params
    params["model"]["model_params"]["initializer"] = "Learned"
    params["training"]["num_epochs"] = 0  # init-only: materialize final ckpt
    exp.save_params(params)
    trainer = DecompTrainer(exp.exp_path)
    trainer.load_data()
    videos, _ = next(iter(trainer.train_loader))
    trainer.setup_model(videos)
    trainer.training_loop()

    losses = {}
    for remat in (False, True):
        pred_exp = Experiment.create_predictor(
            exp.exp_path, f"pr{int(remat)}", "TextOCVP_CustomTF")
        pparams = pred_exp.params
        pp = pparams["predictor"]["predictor_params"]
        pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=32,
                                      num_layers=1)
        pp["fusion_params"].update(num_heads=2, head_dim=8, mlp_size=32)
        pp["text_encoder_params"].update(input_dim=16, num_layers=1,
                                         num_heads=2, vocab_size=16)
        pparams["training"]["batch_size"] = 8
        pparams.setdefault("tpu", {})["remat"] = remat
        pred_exp.save_params(pparams)
        tr = PredictorTrainer(pred_exp.exp_path,
                              decomp_ckpt="checkpoint_epoch_final")
        tr.load_data()
        videos, others = next(iter(tr.train_loader))
        tr.setup_model(videos, others)
        _, _, values = tr.train_step(
            tr.params, tr.opt_state, jnp.asarray(videos),
            jax.random.PRNGKey(5), **_text_kwargs(others))
        losses[remat] = float(values["_total"])
    assert np.isfinite(losses[True])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)
