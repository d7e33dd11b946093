"""int8 decoder-tail quantization (``tpu.decode_quant`` — models/quant.py).

The quantized path changes outputs by construction, so these tests pin (a)
the error is small and bounded, (b) quality does NOT depend on the chunking
schedule the batch size happens to pick, (c) the config gates fail fast on
unsupported models/decoders, and (d) the evaluator end-to-end honors the
knob and stamps the honesty flag into results.json.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.config import build_exp_params
from textocvp_tpu.models import setup_model
from textocvp_tpu.models.quant import calibrate_decode_scales, decode_quant_mode


@pytest.fixture(scope="module")
def savi_and_slots():
    """Tiny SAVi (CPU-box-sized) with a 3-conv decoder -> 2 quantized tail
    convs. The full-size numeric check ran on real data shapes during
    development (max err 0.0099, mean 0.00086 at 8 slots x 128d, 64px)."""
    exp = build_exp_params("SAVi", "CATER_Easy")
    exp["tpu"] = {"compute_dtype": "float32"}
    mp = exp["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16,
              initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[24, 24])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8, 8],
                                           resolution=[24, 24])
    exp["dataset"]["img_size"] = [24, 24]
    model = setup_model(exp)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = jax.random.uniform(jax.random.PRNGKey(14), (2, 1, 24, 24, 3))
    variables = model.init(rngs, videos, decode=True, train=False)
    slots = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 16)) * 0.5
    return model, variables, slots


def test_quant_decode_close_to_bf16(savi_and_slots):
    model, variables, slots = savi_and_slots
    scales = calibrate_decode_scales(model, variables, slots)
    assert scales.shape == (2,) and np.all(scales > 0)  # 3 convs -> 2 hidden

    ref = model.apply(variables, slots, method="decode", tail_chunks=4)
    q = model.apply(variables, slots, method="decode", tail_chunks=4,
                    quant_scales=jnp.asarray(scales))
    a = np.clip(np.asarray(ref["recons_imgs"], np.float32), 0, 1)
    b = np.clip(np.asarray(q["recons_imgs"], np.float32), 0, 1)
    err = np.abs(a - b)
    assert err.max() < 0.05, f"int8 decode max err {err.max()} too large"
    assert err.mean() < 0.005, f"int8 decode mean err {err.mean()} too large"


def test_quant_decode_schedule_independent(savi_and_slots):
    """The quantized output must be identical whether the tail runs flat or
    chunked — quality must not change with the batch-size-dependent
    schedule."""
    model, variables, slots = savi_and_slots
    scales = jnp.asarray(calibrate_decode_scales(model, variables, slots))
    outs = [
        np.asarray(model.apply(variables, slots, method="decode",
                               tail_chunks=c, quant_scales=scales)["recons_imgs"],
                   np.float32)
        for c in (1, 2, 4)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=0, atol=1e-5)


def test_quant_mode_gate():
    exp = build_exp_params("SAVi", "CATER_Easy")
    assert decode_quant_mode(exp) is None
    exp["tpu"] = {"decode_quant": "int8"}
    assert decode_quant_mode(exp) == "int8"
    exp["tpu"] = {"decode_quant": "int4"}
    with pytest.raises(ValueError, match="decode_quant"):
        decode_quant_mode(exp)
    dino = build_exp_params("ExtendedDINOSAUR", "CLIPort")
    dino["tpu"] = {"decode_quant": "int8"}
    assert decode_quant_mode(dino) == "int8"


def test_quant_requires_fast_decode_structure():
    """A decoder outside the fast-broadcast preconditions (batch norm here)
    must fail fast, not silently skip quantization."""
    exp = build_exp_params("SAVi", "CATER_Easy")
    mp = exp["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16,
              initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[24, 24])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8],
                                           resolution=[24, 24],
                                           batch_norm=True)
    exp["dataset"]["img_size"] = [24, 24]
    model = setup_model(exp)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = jax.random.uniform(jax.random.PRNGKey(14), (1, 1, 24, 24, 3))
    variables = model.init(rngs, videos, decode=True, train=False)
    slots = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16))
    with pytest.raises(ValueError, match="decode_quant"):
        model.apply(variables, slots, method="decode",
                    quant_scales=jnp.ones(1), mutable=["batch_stats"])


def test_patch_decoder_quant_close_to_bf16():
    """MLPPatchDecoder int8: patch-MLP denses + BN-folded CNN head convs.
    Errors bounded on images AND features; calibration covers both stages
    (num_layers + num_layers_cnn scales)."""
    from textocvp_tpu.nn.decoders import MLPPatchDecoder

    dec = MLPPatchDecoder(num_patches=16, in_dim=8, hidden_dim=16, out_dim=9,
                          num_layers=3, initial_layer_norm=True,
                          reconstruct_images=True, patch_size=14, img_size=24,
                          num_layers_cnn=3)
    slots = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8))
    variables = dec.init(jax.random.PRNGKey(1), slots)

    amaxes = dec.apply(variables, slots, calibrate=True)
    assert amaxes.shape == (6,)  # 3 MLP + 3 CNN inputs
    scales = jnp.maximum(amaxes, 1e-12) / 127.0

    ref = dec.apply(variables, slots)
    q = dec.apply(variables, slots, quant_scales=scales)
    for k in ("recons_imgs", "recons_feats", "masks"):
        a = np.asarray(ref[k], np.float32)
        b = np.asarray(q[k], np.float32)
        denom = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / denom < 0.05, (
            f"{k}: int8 relative err {np.abs(a - b).max() / denom}")


def test_patch_decoder_param_paths_unchanged():
    """The setup()-style refactor of MLPPatchDecoder (needed for the
    functional quant walk) must keep the exact param tree the torch importer
    and existing checkpoints target."""
    from textocvp_tpu.nn.decoders import MLPPatchDecoder

    dec = MLPPatchDecoder(num_patches=16, in_dim=8, hidden_dim=16, out_dim=9,
                          num_layers=2, initial_layer_norm=True,
                          reconstruct_images=True, patch_size=14, img_size=24,
                          num_layers_cnn=2)
    slots = jnp.zeros((1, 3, 8))
    variables = dec.init(jax.random.PRNGKey(0), slots)
    assert sorted(variables["params"].keys()) == [
        "cnn_0", "cnn_1", "cnn_final", "initial_ln", "mlp_0", "mlp_1",
        "pos_embed"]
    assert sorted(variables["batch_stats"].keys()) == ["cnn_0", "cnn_1"]


def test_quant_robust_to_calibration_batch_shift(savi_and_slots):
    """Scales calibrated on one batch must hold up on a DIFFERENT batch
    drawn from the same distribution (serving calibrates once on the first
    request): values beyond the calibrated amax clip, so the error on a
    fresh batch must stay the same order as on the calibration batch."""
    model, variables, slots = savi_and_slots
    scales = jnp.asarray(calibrate_decode_scales(model, variables, slots))
    fresh = jax.random.normal(jax.random.PRNGKey(99), slots.shape) * 0.5

    ref = model.apply(variables, fresh, method="decode")
    q = model.apply(variables, fresh, method="decode", quant_scales=scales)
    a = np.clip(np.asarray(ref["recons_imgs"], np.float32), 0, 1)
    b = np.clip(np.asarray(q["recons_imgs"], np.float32), 0, 1)
    err = np.abs(a - b)
    assert err.max() < 0.1, f"shifted-batch int8 max err {err.max()}"
    assert err.mean() < 0.01, f"shifted-batch int8 mean err {err.mean()}"


def test_quant_chunk_policy_prefers_flat():
    """Under int8 the measured-fastest decode is FLAT (the bf16 chunking
    pathology inverts; docs/PERFORMANCE.md 'int8 decode'), so the auto
    policy must return 1 when quantizing while an explicit config wins."""
    from textocvp_tpu.models.chunked import (
        decode_candidate_schedules,
        resolve_tail_chunks,
    )

    rows, slots = 64 * 19, 8  # flagship: bf16 policy picks 4 chunks
    assert resolve_tail_chunks(None, rows, slots) > 1
    assert resolve_tail_chunks(None, rows, slots, quant=True) == 1
    assert resolve_tail_chunks("auto", rows, slots, quant=True) == 1
    assert resolve_tail_chunks(4, rows, slots, quant=True) == 4  # explicit wins
    cands = decode_candidate_schedules(rows, slots, quant=True)
    assert cands[0][0] == 1  # policy pick is flat


def test_evaluator_end_to_end_with_quant(tmp_path):
    """03-style eval with tpu.decode_quant=int8: finite metrics and the
    decode_quant honesty flag in results.json."""
    import json

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.train.checkpoints import save_checkpoint
    from textocvp_tpu.train.evaluator import DecompEvaluator

    exp = Experiment.create(tmp_path / "e", "SAVi", "Synthetic")
    p = exp.params
    mp = p["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16,
              initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8, 8], resolution=[16, 16])
    p["dataset"].update(img_size=[16, 16], num_frames=2, num_test_seqs=4)
    p["training"].update(batch_size=2)
    p["tpu"] = {"decode_quant": "int8"}
    exp.save_params(p)

    model = __import__("textocvp_tpu.models", fromlist=["setup_model"]).setup_model(p)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = np.random.default_rng(0).uniform(0, 1, (1, 2, 16, 16, 3)).astype(np.float32)
    variables = model.init(rngs, jnp.asarray(videos), train=False)
    save_checkpoint(exp.models_dir, "ck", {
        "params": variables["params"], "batch_stats": {}, "opt_state": {},
        "epoch": 0, "step": 0})

    ev = DecompEvaluator(exp.exp_path, checkpoint="ck", batch_size=2,
                         metrics=("psnr",))
    ev.load_data()
    sample = np.stack([ev.test_set[i][0] for i in range(2)])
    ev.load_model(sample)
    results = ev.evaluate()
    assert np.isfinite(results["psnr"]["mean"])
    assert results["decode_quant"] == "int8"
    assert ev.decode_quant_scales.shape == (1,)  # 2 convs -> 1 hidden
    on_disk = json.loads(
        (exp.exp_path / "results" / ev.results_name / "results.json").read_text())
    assert on_disk["decode_quant"] == "int8"
