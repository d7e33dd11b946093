"""int8 frozen-ViT encode quantization (``tpu.encode_quant`` —
models/quant.py, nn/vit.py::_dense_int8).

Like the decode-side tests (test_quant_decode.py) these pin (a) the
quantized path ENGAGES and its error is small and bounded, (b) the config
gate fails fast on unsupported models, (c) calibration produces the right
(depth, 4) scale layout, and (d) both evaluators honor the knob end-to-end
and stamp the ``encode_quant`` honesty flag into results.json — composed
with ``decode_quant`` in the same run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.models.quant import calibrate_encode_scales, encode_quant_mode
from textocvp_tpu.nn.vit import ViTEncoder


def test_vit_int8_denses_close_and_engaged():
    # no layerscale: at random init DINOv2's 1e-5 gammas suppress the block
    # outputs and would mask quantization error entirely
    model = ViTEncoder(img_size=32, patch_size=16, embed_dim=64, depth=2,
                       num_heads=4)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    ref, amaxes = model.apply(params, x, calibrate=True)
    assert amaxes.shape == (2, 4) and bool(jnp.all(amaxes > 0))
    q = model.apply(params, x, quant_scales=jnp.asarray(amaxes) / 127.0)
    a, b = np.asarray(ref, np.float32), np.asarray(q, np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert 0 < rel < 0.05, f"int8 encode rel err {rel} (0 means not engaged)"


@pytest.fixture(scope="module")
def dinosaur_exp(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("quant_encode")
    exp = Experiment.create(tmp_path / "exp_dino", "ExtendedDINOSAUR", "Synthetic")
    params = exp.params
    mp = params["model"]["model_params"]
    mp.update(img_size=28, num_slots=3, slot_dim=16, mlp_hidden=16,
              mlp_encoder_dim=384)
    mp["encoder"] = {
        "encoder_name": "vit_small_patch14_dinov2",
        "encoder_params": {"encoder_num_blocks": 2},
    }
    mp["decoder"]["decoder_params"].update(
        num_patches=4, in_dim=16, hidden_dim=32, out_dim=385, num_layers=2,
        patch_size=14, num_layers_cnn=2, reconstruct_images=True,
    )
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    params["dataset"].update(
        img_size=[28, 28], num_frames=3, num_train_seqs=8, num_eval_seqs=8,
        num_test_seqs=8, tokenizer="CustomTokenizer", total_frames=6,
    )
    params["training"].update(num_epochs=1, batch_size=4, log_frequency=1,
                              save_frequency=1, warmup_steps=2)
    # both quant knobs: the evaluator must calibrate encode AND decode on the
    # first batch and stamp both honesty flags
    params["tpu"] = {"encode_quant": "int8", "decode_quant": "int8"}
    exp.save_params(params)
    return exp


def test_encode_calibrate_layout(dinosaur_exp):
    from textocvp_tpu.models import setup_model

    p = dinosaur_exp.params
    model = setup_model(p)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 2, 28, 28, 3)), jnp.float32)
    variables = dict(model.init(rngs, videos, train=False))
    scales = calibrate_encode_scales(model, variables, videos)
    assert scales.shape == (2, 4)  # (depth, denses-per-block)
    assert np.all(scales > 0) and np.all(np.isfinite(scales))


def test_encode_quant_mode_gate():
    assert encode_quant_mode({"tpu": {}}) is None
    assert encode_quant_mode(
        {"tpu": {"encode_quant": "int8"},
         "model": {"model_name": "ExtendedDINOSAUR"}}) == "int8"
    with pytest.raises(ValueError, match="must be one of"):
        encode_quant_mode({"tpu": {"encode_quant": "fp8"}})
    with pytest.raises(ValueError, match="only.*supported for ExtendedDINOSAUR"):
        encode_quant_mode({"tpu": {"encode_quant": "int8"},
                           "model": {"model_name": "SAVi"}})


def test_decomp_evaluator_with_encode_and_decode_quant(dinosaur_exp):
    import json

    from textocvp_tpu.models import setup_model
    from textocvp_tpu.train.checkpoints import save_checkpoint
    from textocvp_tpu.train.evaluator import DecompEvaluator

    p = dinosaur_exp.params
    model = setup_model(p)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = np.random.default_rng(0).uniform(
        0, 1, (1, 3, 28, 28, 3)).astype(np.float32)
    variables = dict(model.init(rngs, jnp.asarray(videos), train=False))
    save_checkpoint(dinosaur_exp.models_dir, "ck", {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}), "opt_state": {},
        "epoch": 0, "step": 0})

    ev = DecompEvaluator(dinosaur_exp.exp_path, checkpoint="ck", batch_size=4,
                         metrics=("psnr",))
    ev.load_data()
    sample = np.stack([ev.test_set[i][0] for i in range(2)])
    ev.load_model(sample)
    results = ev.evaluate()
    assert np.isfinite(results["psnr"]["mean"])
    assert results["encode_quant"] == "int8"
    assert results["decode_quant"] == "int8"
    assert ev.encode_quant_scales.shape == (2, 4)
    on_disk = json.loads(
        (dinosaur_exp.exp_path / "results" / ev.results_name /
         "results.json").read_text())
    assert on_disk["encode_quant"] == "int8"


def test_predictor_evaluator_with_encode_quant(dinosaur_exp):
    from textocvp_tpu.core.config import add_predictor_params
    from textocvp_tpu.models import setup_model, setup_predictor
    from textocvp_tpu.train.checkpoints import save_checkpoint
    from textocvp_tpu.train.evaluator import PredictorEvaluator

    # parent decomp ckpt
    p = dinosaur_exp.params
    model = setup_model(p)
    rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    videos = np.random.default_rng(0).uniform(
        0, 1, (1, 3, 28, 28, 3)).astype(np.float32)
    variables = dict(model.init(rngs, jnp.asarray(videos), train=False))
    save_checkpoint(dinosaur_exp.models_dir, "ck", {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}), "opt_state": {},
        "epoch": 0, "step": 0})

    # predictor experiment under the parent
    pred_exp = Experiment.create_predictor(dinosaur_exp.exp_path, "p",
                                           "VanillaTransformer")
    pp = pred_exp.params
    pp["predictor"]["predictor_params"].update(
        token_dim=16, hidden_dim=32, num_layers=1, n_heads=2)
    pp["prediction_params"].update(num_context=1, num_preds=2,
                                   input_buffer_size=3)
    pp["training"]["batch_size"] = 4
    pred_exp.save_params(pp)

    predictor = setup_predictor(pred_exp.params)
    slots = jnp.zeros((1, 1, 3, 16))
    pvars = predictor.init({"params": jax.random.PRNGKey(3)}, slots)
    save_checkpoint(pred_exp.models_dir, "pk", {
        "params": pvars["params"], "batch_stats": {}, "opt_state": {},
        "epoch": 0, "step": 0})

    ev = PredictorEvaluator(dinosaur_exp.exp_path, "p", "ck", "pk",
                            num_seed=1, num_preds=2, batch_size=4,
                            metrics=("psnr",))
    ev.load_data()
    sample = np.stack([ev.test_set[i][0] for i in range(2)])
    ev.load_models(sample)
    results = ev.evaluate()
    assert np.isfinite(results["psnr"]["mean"])
    assert results["encode_quant"] == "int8"
    assert ev.encode_quant_scales.shape == (2, 4)
