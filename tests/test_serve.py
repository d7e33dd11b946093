"""Serving layer (textocvp_tpu/serve): compiled fixed-shape inference over a
trained experiment, plus the stdlib HTTP server."""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.models import setup_model, setup_predictor
from textocvp_tpu.train.checkpoints import save_checkpoint


NUM_PREDS = 2
RES = 32


@pytest.fixture(scope="module")
def served_exp(tmp_path_factory):
    """Tiny SAVi + TextOCVP_CustomTF experiment with random-init checkpoints
    (serving only needs the load/compile/dispatch path, not trained weights)."""
    root = tmp_path_factory.mktemp("serve_exp")
    parent = Experiment.create(root / "e", "SAVi", "CATER_Easy")
    params = parent.params
    mp = params["model"]["model_params"]
    mp.update(num_slots=4, slot_dim=32, mlp_hidden=32, mlp_encoder_dim=32,
              resolution=[RES, RES])
    mp["encoder"]["encoder_params"].update(num_channels=[16, 16],
                                           resolution=[RES, RES])
    mp["decoder"]["decoder_params"].update(num_channels=[16, 16],
                                           resolution=[RES, RES])
    mp["transition_module"] = {"model_name": "TransformerBlock",
                               "num_heads": 2, "mlp_size": 32}
    params["dataset"]["tokenizer"] = "CustomTokenizer"
    params["dataset"]["img_size"] = [RES, RES]  # keep dataset/model coherent
    parent.save_params(params)

    # decomp checkpoint
    model = setup_model(params)
    videos = jnp.zeros((1, 1, RES, RES, 3))
    model_vars = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        videos, decode=True, train=False)
    save_checkpoint(parent.models_dir, "checkpoint_epoch_final",
                    {"params": model_vars["params"]})

    pred_exp = Experiment.create_predictor(parent.exp_path, "tiny_tf",
                                           "TextOCVP_CustomTF")
    pparams = pred_exp.params
    pp = pparams["predictor"]["predictor_params"]
    pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=64,
                                  num_layers=2)
    pp["fusion_params"].update(num_heads=2, head_dim=16, mlp_size=64)
    pp["text_encoder_params"].update(input_dim=32, num_layers=1, num_heads=2,
                                     vocab_size=50)
    pparams["prediction_params"].update(num_context=1, num_preds=NUM_PREDS,
                                        input_buffer_size=3)
    pred_exp.save_params(pparams)

    predictor = setup_predictor(pparams)
    slots = model.apply(model_vars, videos, decode=False,
                        rngs={"slots": jax.random.PRNGKey(2)})["slot_history"]
    pred_vars = predictor.init(
        {"params": jax.random.PRNGKey(3)}, slots,
        caption_tokens=jnp.ones((1, 6), jnp.int32),
        caption_lengths=jnp.full((1,), 6, jnp.int32))
    save_checkpoint(pred_exp.models_dir, "checkpoint_epoch_final",
                    {"params": pred_vars["params"]})
    return parent.exp_path


@pytest.fixture(scope="module")
def service(served_exp):
    from textocvp_tpu.serve import PredictionService

    return PredictionService(
        served_exp, "tiny_tf",
        decomp_ckpt="checkpoint_epoch_final",
        pred_ckpt="checkpoint_epoch_final",
        batch_size=2, max_tokens=8)


def test_predict_shapes_and_padding(service):
    frames = np.random.default_rng(0).random((1, 1, RES, RES, 3), np.float32)
    out = service.predict(frames, ["the snitch is picked up"])
    assert out.shape == (1, NUM_PREDS, RES, RES, 3)
    assert np.all(out >= 0) and np.all(out <= 1)
    # full batch
    out2 = service.predict(np.repeat(frames, 2, axis=0), ["the cone is rotating", "the snitch is sliding"])
    assert out2.shape == (2, NUM_PREDS, RES, RES, 3)
    # padded row must not change row 0's result (fixed shapes, same program).
    # The slot initializer is stochastic per call (LearnedRandom, faithful to
    # the reference), so pin the service's RNG counter for the comparison.
    service._counter = 100
    a = service.predict(frames, ["the snitch is picked up"])
    service._counter = 100
    b = service.predict(np.repeat(frames, 2, axis=0),
                        ["the snitch is picked up", "the cone is rotating"])
    np.testing.assert_allclose(a[0], b[0], atol=1e-5)


def test_predict_validates_request(service):
    frames = np.zeros((1, 1, RES, RES, 3), np.float32)
    with pytest.raises(ValueError, match="empty request"):
        service.predict(np.zeros((0, 1, RES, RES, 3), np.float32), [])
    with pytest.raises(ValueError):
        service.predict(np.zeros((3, 1, RES, RES, 3), np.float32), ["the"] * 3)
    with pytest.raises(ValueError):
        service.predict(frames, ["the", "the"])
    with pytest.raises(ValueError):
        service.predict(np.zeros((1, 2, RES, RES, 3), np.float32), ["the"])


def test_oov_caption_is_a_request_error(service):
    frames = np.zeros((1, 1, RES, RES, 3), np.float32)
    with pytest.raises(ValueError, match="out-of-vocabulary"):
        service.predict(frames, ["the xylophone is picked up"])


def test_uint8_input(service):
    frames = np.zeros((1, 1, RES, RES, 3), np.uint8)
    out = service.predict(frames, ["the snitch is placed up"])
    assert out.dtype == np.float32


def test_http_server_roundtrip(service):
    from textocvp_tpu.serve import serve

    httpd = serve(service, host="127.0.0.1", port=0, warmup=False)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        health = json.loads(urllib.request.urlopen(base + "/healthz").read())
        assert health["status"] == "ok"
        assert health["num_preds"] == NUM_PREDS

        frames = (np.random.default_rng(1).random((1, 1, RES, RES, 3)) * 255
                  ).astype(np.uint8)
        buf = io.BytesIO()
        np.savez(buf, frames=frames,
                 captions=np.array(["the snitch is picked up"]))
        req = urllib.request.Request(
            base + "/predict", data=buf.getvalue(),
            headers={"Content-Type": "application/npz"})
        with urllib.request.urlopen(req) as r:
            reply = np.load(io.BytesIO(r.read()))
        assert reply["pred_frames"].shape == (1, NUM_PREDS, RES, RES, 3)
        assert reply["pred_frames"].dtype == np.uint8

        # malformed request -> 400, not a crash
        bad = urllib.request.Request(base + "/predict", data=b"junk")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad)
        assert e.value.code in (400, 500)
    finally:
        httpd.shutdown()


def test_service_arg_path_when_weights_too_big_to_bake(served_exp, monkeypatch):
    """Forcing the no-bake path (as a ViT-scale model would) must produce
    the same predictions as the const-baked path."""
    import textocvp_tpu.models.chunked as chunked
    from textocvp_tpu.serve import PredictionService

    monkeypatch.setattr(chunked, "should_bake_constants", lambda *a, **k: False)
    svc = PredictionService(
        served_exp, "tiny_tf", decomp_ckpt="checkpoint_epoch_final",
        pred_ckpt="checkpoint_epoch_final", batch_size=2, max_tokens=8)
    frames = np.random.default_rng(5).random((1, 1, RES, RES, 3), np.float32)
    out = svc.predict(frames, ["the snitch is picked up"])
    assert out.shape == (1, NUM_PREDS, RES, RES, 3)


def test_aot_export_roundtrip(service, tmp_path):
    """Export the compiled stages to StableHLO and predict through the
    deserialized artifact — same result as the live service with the same
    RNG counter, with no model code or checkpoints involved."""
    from textocvp_tpu.serve import ExportedPredictionService, export_service

    art = export_service(service, tmp_path / "artifact")
    assert (art / "predict.shlo").exists()
    assert (art / "decode.shlo").exists()

    exported = ExportedPredictionService(art)
    frames = np.random.default_rng(7).random((1, 1, RES, RES, 3), np.float32)
    service._counter = 500
    live = service.predict(frames, ["the snitch is picked up"])
    exported._counter = 500
    aot = exported.predict(frames, ["the snitch is picked up"])
    np.testing.assert_allclose(aot, live, atol=1e-5)

    with pytest.raises(ValueError, match="out-of-vocabulary"):
        exported.predict(frames, ["the zebra is picked up"])


def test_mesh_service_matches_single_device(served_exp, service):
    """Opt-in dp x tp serving (mesh_axes kwarg): batch sharded over 'data',
    predictor matmuls Megatron-sharded over 'model' — the 8-virtual-device
    service must reproduce the single-device service's predictions.

    batch_size must match the single-device fixture (2): the stochastic slot
    initializer samples per COMPILED batch, so a different batch size yields
    different row-0 predictions. (data=2, model=4) fills the 8 devices."""
    from textocvp_tpu.serve import PredictionService

    svc = PredictionService(
        served_exp, "tiny_tf", decomp_ckpt="checkpoint_epoch_final",
        pred_ckpt="checkpoint_epoch_final", batch_size=2, max_tokens=8,
        mesh_axes={"data": 2, "model": 4})
    assert svc.mesh is not None and svc.mesh.shape["model"] == 4
    frames = np.random.default_rng(9).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating"]
    service._counter = 900
    ref = service.predict(frames, caps)
    svc._counter = 900
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_seq_parallel_decode_matches_single_device(served_exp, service):
    """batch_size=2 on a data=8 mesh is NOT divisible: the service must fall
    back to sequence-parallel decode (inputs replicated, the flattened
    batch*num_preds frame dim sharded across the chips) and still reproduce
    the single-device service bit-for-bit-close. This is the single-sequence
    low-latency serving path — the batch axis cannot split, the frame axis
    can."""
    from textocvp_tpu.serve import PredictionService

    svc = PredictionService(
        served_exp, "tiny_tf", decomp_ckpt="checkpoint_epoch_final",
        pred_ckpt="checkpoint_epoch_final", batch_size=2, max_tokens=8,
        mesh_axes={"data": 8, "model": 1})
    assert svc._seq_parallel, "2 % 8 != 0 must trigger sequence-parallel decode"
    frames = np.random.default_rng(9).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating"]
    service._counter = 901
    ref = service.predict(frames, caps)
    svc._counter = 901
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_seq_parallel_decode_spans_model_axis(served_exp):
    """With model>1 and a replicated (non-ViT) decoder, sequence-parallel
    decode shards frames over BOTH mesh axes — every chip decodes frames.
    The single-device reference must use the SAME compiled batch size (1):
    the stochastic slot initializer samples per compiled batch."""
    from textocvp_tpu.serve import PredictionService

    kw = dict(decomp_ckpt="checkpoint_epoch_final",
              pred_ckpt="checkpoint_epoch_final", batch_size=1, max_tokens=8)
    ref_svc = PredictionService(served_exp, "tiny_tf", **kw)
    svc = PredictionService(served_exp, "tiny_tf",
                            mesh_axes={"data": 2, "model": 4}, **kw)
    assert svc._seq_parallel
    frames = np.random.default_rng(11).random((1, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up"]
    ref_svc._counter = 902
    ref = ref_svc.predict(frames, caps)
    svc._counter = 902
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_nondivisible_larger_batch_pads_and_batch_shards(served_exp):
    """A request batch LARGER than the data axis that isn't divisible by it
    (e.g. 3 on data=2) must NOT fall back to sequence-parallel decode — that
    would replicate the full 3-sequence encode+rollout on every chip.
    Instead the compiled batch pads up to the next axis multiple (4) and
    batch-shards; the caller's batch_size stays the REQUEST cap — the
    operator configured 3, so a 4-row request is rejected even though the
    executable could hold it (ADVICE r4). Equivalence is checked against a
    single-device service compiled at the SAME padded batch (the stochastic
    slot initializer samples per compiled batch)."""
    import pytest

    from textocvp_tpu.serve import PredictionService

    kw = dict(decomp_ckpt="checkpoint_epoch_final",
              pred_ckpt="checkpoint_epoch_final", max_tokens=8)
    svc = PredictionService(served_exp, "tiny_tf", batch_size=3,
                            mesh_axes={"data": 2, "model": 4}, **kw)
    assert not svc._seq_parallel
    assert svc.batch_size == 3  # the operator's request cap, unchanged
    assert svc._compiled_batch == 4  # padded to the next data-axis multiple
    with pytest.raises(ValueError, match="exceeds"):
        svc.predict(np.zeros((4, 1, RES, RES, 3), np.float32), ["a"] * 4)
    ref_svc = PredictionService(served_exp, "tiny_tf", batch_size=4, **kw)

    frames = np.random.default_rng(13).random((3, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating",
            "the snitch is sliding"]
    ref_svc._counter = 903
    ref = ref_svc.predict(frames, caps)
    svc._counter = 903
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_seq_parallel_with_tp_sharded_decoder(dinosaur_served_exp):
    """Sequence-parallel decode where the decomp is a ViT-scale model with
    decomp TP enabled: frames shard over ('data',) only — the 'model' axis
    carries the TP-sharded patch-decoder kernels — and the mesh service must
    reproduce the single-device service at the same compiled batch."""
    from textocvp_tpu.serve import PredictionService

    kw = dict(decomp_ckpt="checkpoint_epoch_final",
              pred_ckpt="checkpoint_epoch_final", batch_size=1, max_tokens=8)
    ref_svc = PredictionService(dinosaur_served_exp, "tiny_tf", **kw)
    svc = PredictionService(dinosaur_served_exp, "tiny_tf",
                            mesh_axes={"data": 2, "model": 4}, **kw)
    assert svc._seq_parallel
    qkv = svc.model_vars["params"]["image_encoder"]["block_0"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated  # decomp TP actually on

    frames = np.random.default_rng(17).random((1, 1, 28, 28, 3), np.float32)
    caps = ["the red ball is bouncing"]
    ref_svc._counter = 904
    ref = ref_svc.predict(frames, caps)
    svc._counter = 904
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_encode_quant_service_close_to_plain_and_exports(dinosaur_served_exp,
                                                         tmp_path):
    """tpu.encode_quant=int8 on a ViT-path service: the first request
    calibrates the (depth, 4) activation scales, predictions stay close to
    the bf16 service, and AOT export serializes the calibrated predict
    stage — after warmup only — with the honesty flag in the manifest
    (mirrors the decode_quant test above on the DINOSAUR fixture)."""
    import json

    from textocvp_tpu.serve import PredictionService
    from textocvp_tpu.serve.export import ExportedPredictionService, export_service

    kw = dict(decomp_ckpt="checkpoint_epoch_final",
              pred_ckpt="checkpoint_epoch_final", batch_size=2, max_tokens=8)
    plain = PredictionService(dinosaur_served_exp, "tiny_tf", **kw)

    cfg_path = (dinosaur_served_exp / "predictors" / "tiny_tf"
                / "experiment_params.json")
    original = cfg_path.read_text()
    cfg = json.loads(original)
    cfg.setdefault("tpu", {})["encode_quant"] = "int8"
    cfg_path.write_text(json.dumps(cfg))
    try:
        quant = PredictionService(dinosaur_served_exp, "tiny_tf", **kw)
    finally:
        cfg_path.write_text(original)

    # export before any request: encode calibration has not run yet
    with pytest.raises(ValueError, match="encode_quant.*not been calibrated"):
        export_service(quant, tmp_path / "early")

    frames = np.random.default_rng(11).random((2, 1, 28, 28, 3), np.float32)
    caps = ["the red ball is moving up", "the blue ball is moving down"]
    plain._counter = quant._counter = 55  # same rng stream
    a = plain.predict(frames, caps).astype(np.int32)
    plain._counter = quant._counter = 55
    b = quant.predict(frames, caps).astype(np.int32)  # triggers calibration
    assert quant.encode_quant_scales.shape == (1, 4)  # (depth, denses)
    # same decode, int8-encoded slots: small bounded pixel error on uint8
    assert np.abs(a - b).max() <= 16
    assert np.abs(a - b).mean() < 2.0

    art = export_service(quant, tmp_path / "art")
    manifest = json.loads((art / "manifest.json").read_text())
    assert manifest["encode_quant"] == "int8"
    restored = ExportedPredictionService(art)
    quant._counter = restored._counter = 321
    q1 = quant.predict(frames, caps)
    quant._counter = restored._counter = 321
    q2 = restored.predict(frames, caps)
    np.testing.assert_array_equal(q1, q2)


def test_warmup_uses_in_vocab_caption(service):
    """serve()'s default warmup must work with closed-vocab tokenizers
    (regression: the literal caption 'warmup' is OOV for every CustomTokenizer
    vocabulary and crashed the server at startup)."""
    cap = service._warmup_caption()
    service.tokenizer([cap])  # must not raise
    service.warmup()


def test_too_long_caption_is_rejected_not_truncated(service):
    frames = np.zeros((1, 1, RES, RES, 3), np.float32)
    long_caption = " ".join(["the"] * (service.max_tokens + 4))
    with pytest.raises(ValueError, match="caption too long"):
        service.predict(frames, [long_caption])


def test_serve_cli_rejects_tp_without_mesh(tmp_path):
    """--mesh_model without --mesh_data would silently build a single-device
    service; the CLI must reject it at parse time."""
    from textocvp_tpu.cli.serve import serve_args

    base = ["-d", str(tmp_path / "exp"), "--name_pred_exp", "p",
            "--decomp_ckpt", "a", "--pred_ckpt", "b"]
    with pytest.raises(SystemExit):
        serve_args(base + ["--mesh_model", "2"])
    args = serve_args(base + ["--mesh_data", "-1", "--mesh_model", "2"])
    assert args.mesh_model == 2 and args.mesh_data == -1


def test_autotuned_service_matches_plain(served_exp, service):
    """tpu.decode_autotune on a service: the first request measures the
    candidate decode schedules and the winner must reproduce the plain
    service's predictions exactly (every candidate is the same math)."""
    import json

    from textocvp_tpu.serve import PredictionService

    # the service reads the NESTED predictor experiment's params
    params_path = served_exp / "predictors" / "tiny_tf" / "experiment_params.json"
    original = params_path.read_text()
    p = json.loads(original)
    p.setdefault("tpu", {})["decode_autotune"] = True
    params_path.write_text(json.dumps(p))
    try:
        tuned = PredictionService(
            served_exp, "tiny_tf",
            decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final",
            batch_size=2, max_tokens=8)
    finally:
        params_path.write_text(original)

    frames = np.random.default_rng(3).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the cone is rotating", "the snitch is sliding"]
    service._counter = tuned._counter = 777  # same rng stream
    a = service.predict(frames, caps)
    service._counter = tuned._counter = 777
    b = tuned.predict(frames, caps)  # triggers the autotune measurement
    np.testing.assert_array_equal(a, b)
    service._counter = tuned._counter = 778
    a2 = service.predict(frames, caps)
    service._counter = tuned._counter = 778
    b2 = tuned.predict(frames, caps)  # winner reused
    np.testing.assert_array_equal(a2, b2)

    # AOT export refuses the autotuned service with a clear message
    from textocvp_tpu.serve.export import export_service

    with pytest.raises(ValueError, match="decode_autotune"):
        export_service(tuned, "/tmp/should_not_exist_export")


def test_quantized_service_close_to_plain_and_exports(served_exp, service,
                                                      tmp_path):
    """tpu.decode_quant=int8 on a service: warmup calibrates, predictions
    stay close to the bf16 service (uint8 wire format, so within a few
    levels), and AOT export serializes the calibrated stage — after warmup
    only — with the honesty flag in the manifest."""
    import json

    from textocvp_tpu.serve import PredictionService
    from textocvp_tpu.serve.export import ExportedPredictionService, export_service

    params_path = served_exp / "predictors" / "tiny_tf" / "experiment_params.json"
    original = params_path.read_text()
    p = json.loads(original)
    p.setdefault("tpu", {})["decode_quant"] = "int8"
    params_path.write_text(json.dumps(p))
    try:
        quant = PredictionService(
            served_exp, "tiny_tf",
            decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final",
            batch_size=2, max_tokens=8)
    finally:
        params_path.write_text(original)

    # export before any request: calibration has not run yet -> clear error
    with pytest.raises(ValueError, match="warmup"):
        export_service(quant, tmp_path / "early")

    frames = np.random.default_rng(5).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the cone is rotating", "the snitch is sliding"]
    service._counter = quant._counter = 99
    a = service.predict(frames, caps).astype(np.int32)
    service._counter = quant._counter = 99
    b = quant.predict(frames, caps).astype(np.int32)  # triggers calibration
    assert quant.decode_quant_scales.shape[0] >= 1
    # same rollout, quantized decode: small bounded pixel error on uint8
    assert np.abs(a - b).max() <= 16
    assert np.abs(a - b).mean() < 2.0

    art = export_service(quant, tmp_path / "art")
    manifest = json.loads((art / "manifest.json").read_text())
    assert manifest["decode_quant"] == "int8"
    restored = ExportedPredictionService(art)
    quant._counter = restored._counter = 123
    q1 = quant.predict(frames, caps)
    quant._counter = restored._counter = 123
    q2 = restored.predict(frames, caps)
    np.testing.assert_array_equal(q1, q2)


def test_quantized_service_warmup_calibrates_on_noise(served_exp):
    """warmup() on a quantized service must calibrate on NON-degenerate
    frames (a black video would under-estimate the int8 ranges and clip
    real requests), and calibrate() is quant-only."""
    import json

    from textocvp_tpu.serve import PredictionService

    params_path = served_exp / "predictors" / "tiny_tf" / "experiment_params.json"
    original = params_path.read_text()
    p = json.loads(original)
    p.setdefault("tpu", {})["decode_quant"] = "int8"
    params_path.write_text(json.dumps(p))
    try:
        quant = PredictionService(
            served_exp, "tiny_tf",
            decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final",
            batch_size=2, max_tokens=8)
    finally:
        params_path.write_text(original)

    quant.warmup()
    assert np.all(quant.decode_quant_scales > 0)

    plain = PredictionService(
        served_exp, "tiny_tf",
        decomp_ckpt="checkpoint_epoch_final",
        pred_ckpt="checkpoint_epoch_final",
        batch_size=2, max_tokens=8)
    frames = np.random.default_rng(0).random((1, 1, RES, RES, 3), np.float32)
    with pytest.raises(ValueError, match="decode_quant"):
        plain.calibrate(frames, ["the snitch is picked up"])


def test_mesh_service_with_quant(served_exp, service):
    """tpu.decode_quant composes with dp x tp mesh serving: the quantized
    sharded service calibrates on its first request and stays close to the
    single-device bf16 service."""
    import json

    from textocvp_tpu.serve import PredictionService

    params_path = served_exp / "predictors" / "tiny_tf" / "experiment_params.json"
    original = params_path.read_text()
    p = json.loads(original)
    p.setdefault("tpu", {})["decode_quant"] = "int8"
    params_path.write_text(json.dumps(p))
    try:
        svc = PredictionService(
            served_exp, "tiny_tf", decomp_ckpt="checkpoint_epoch_final",
            pred_ckpt="checkpoint_epoch_final", batch_size=2, max_tokens=8,
            mesh_axes={"data": 2, "model": 4})
    finally:
        params_path.write_text(original)

    frames = np.random.default_rng(9).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating"]
    service._counter = 901
    ref = service.predict(frames, caps).astype(np.int32)
    svc._counter = 901
    out = svc.predict(frames, caps).astype(np.int32)
    assert np.all(svc.decode_quant_scales > 0)
    assert np.abs(out - ref).max() <= 16
    assert np.abs(out - ref).mean() < 2.0


def test_serve_cli_exports_quantized_service(served_exp, tmp_path):
    """`07_serve.py --export DIR` on a quantized experiment must calibrate
    (warmup) before exporting instead of dying on the not-yet-calibrated
    error."""
    import json

    from textocvp_tpu.cli.serve import main as serve_main
    from textocvp_tpu.serve.export import ExportedPredictionService

    params_path = served_exp / "predictors" / "tiny_tf" / "experiment_params.json"
    original = params_path.read_text()
    p = json.loads(original)
    p.setdefault("tpu", {})["decode_quant"] = "int8"
    params_path.write_text(json.dumps(p))
    try:
        serve_main(["-d", str(served_exp), "--name_pred_exp", "tiny_tf",
                    "--decomp_ckpt", "checkpoint_epoch_final",
                    "--pred_ckpt", "checkpoint_epoch_final",
                    "--batch_size", "2", "--max_tokens", "8",
                    "--export", str(tmp_path / "art")])
    finally:
        params_path.write_text(original)

    manifest = json.loads((tmp_path / "art" / "manifest.json").read_text())
    assert manifest["decode_quant"] == "int8"
    restored = ExportedPredictionService(tmp_path / "art")
    frames = np.random.default_rng(1).random((1, 1, RES, RES, 3), np.float32)
    out = restored.predict(frames, ["the snitch is picked up"])
    assert out.shape == (1, NUM_PREDS, RES, RES, 3)


@pytest.fixture(scope="module")
def dinosaur_served_exp(tmp_path_factory):
    """Tiny ExtendedDINOSAUR (1-block ViT-small at 28px) + TextOCVP_CustomTF
    with random-init checkpoints — exercises the ViT-path serving, including
    batch_stats (BatchNorm CNN head) and decomp TP sharding."""
    root = tmp_path_factory.mktemp("serve_dino")
    parent = Experiment.create(root / "e", "ExtendedDINOSAUR", "Synthetic")
    params = parent.params
    mp = params["model"]["model_params"]
    mp.update(img_size=28, num_slots=3, slot_dim=16, mlp_hidden=16,
              mlp_encoder_dim=384)
    mp["encoder"] = {"encoder_name": "vit_small_patch14_dinov2",
                     "encoder_params": {"encoder_num_blocks": 1}}
    mp["decoder"]["decoder_params"].update(
        num_patches=4, in_dim=16, hidden_dim=32, out_dim=385, num_layers=2,
        patch_size=14, num_layers_cnn=2, reconstruct_images=True)
    mp["transition_module"] = {"model_name": "TransformerBlock",
                               "num_heads": 2, "mlp_size": 16}
    params["dataset"].update(tokenizer="CustomTokenizer", img_size=[28, 28])
    parent.save_params(params)

    model = setup_model(params)
    videos = jnp.zeros((1, 1, 28, 28, 3))
    model_vars = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        videos, decode=True, train=False)
    save_checkpoint(parent.models_dir, "checkpoint_epoch_final",
                    {"params": model_vars["params"],
                     "batch_stats": model_vars["batch_stats"]})

    pred_exp = Experiment.create_predictor(parent.exp_path, "tiny_tf",
                                           "TextOCVP_CustomTF")
    pparams = pred_exp.params
    pp = pparams["predictor"]["predictor_params"]
    pp["predictor_params"].update(token_dim=32, n_heads=2, hidden_dim=64,
                                  num_layers=2)
    pp["fusion_params"].update(num_heads=2, head_dim=16, mlp_size=64)
    pp["text_encoder_params"].update(input_dim=32, num_layers=1, num_heads=2,
                                     vocab_size=50)
    pparams["prediction_params"].update(num_context=1, num_preds=NUM_PREDS,
                                        input_buffer_size=3)
    pred_exp.save_params(pparams)

    predictor = setup_predictor(pparams)
    slots = model.apply(model_vars, videos, decode=False,
                        rngs={"slots": jax.random.PRNGKey(2)})["slot_history"]
    pred_vars = predictor.init(
        {"params": jax.random.PRNGKey(3)}, slots,
        caption_tokens=jnp.ones((1, 6), jnp.int32),
        caption_lengths=jnp.full((1,), 6, jnp.int32))
    save_checkpoint(pred_exp.models_dir, "checkpoint_epoch_final",
                    {"params": pred_vars["params"]})
    return parent.exp_path


def test_dinosaur_mesh_service_shards_decomp(dinosaur_served_exp):
    """ViT-path serving under dp x tp: the decomp model's ViT/patch-decoder
    kernels are actually sharded (not replicated) and the mesh service
    reproduces the single-device service's predictions."""
    from textocvp_tpu.serve import PredictionService

    kwargs = dict(decomp_ckpt="checkpoint_epoch_final",
                  pred_ckpt="checkpoint_epoch_final", batch_size=2,
                  max_tokens=8)
    ref_svc = PredictionService(dinosaur_served_exp, "tiny_tf", **kwargs)
    svc = PredictionService(dinosaur_served_exp, "tiny_tf",
                            mesh_axes={"data": 2, "model": 4}, **kwargs)
    qkv = svc.model_vars["params"]["image_encoder"]["block_0"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated

    frames = np.random.default_rng(5).random((2, 1, 28, 28, 3), np.float32)
    caps = ["the red ball is bouncing", "the blue ball is moving"]
    ref_svc._counter = 300
    ref = ref_svc.predict(frames, caps)
    svc._counter = 300
    out = svc.predict(frames, caps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_dynamic_batcher_coalesces_and_matches(service):
    """Two concurrent 1-row requests share ONE device batch and return
    exactly what a direct 2-row predict at the same RNG counter returns."""
    import time

    from textocvp_tpu.serve.batching import DynamicBatcher

    frames = np.random.default_rng(11).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating"]
    service._counter = 700
    ref = service.predict(frames, caps)

    batcher = DynamicBatcher(service, max_wait_ms=1000.0)
    try:
        service._counter = 700
        results = {}

        def call(i):
            results[i] = batcher.predict(frames[i:i + 1], [caps[i]])

        t0 = threading.Thread(target=call, args=(0,))
        t0.start()
        time.sleep(0.05)  # deterministic row order: request 0 enqueues first
        t1 = threading.Thread(target=call, args=(1,))
        t1.start()
        t0.join(timeout=60)
        t1.join(timeout=60)
        assert set(results) == {0, 1}
        assert batcher._dispatches == 1  # coalesced, not two padded batches
        np.testing.assert_allclose(results[0][0], ref[0], atol=1e-6)
        np.testing.assert_allclose(results[1][0], ref[1], atol=1e-6)
    finally:
        batcher.close()


def test_dynamic_batcher_partial_batch_dispatches_after_window(service):
    """A lone request must not wait for the batch to fill: the window
    expires and it runs padded, exactly like the unbatched service."""
    from textocvp_tpu.serve.batching import DynamicBatcher

    frames = np.random.default_rng(12).random((1, 1, RES, RES, 3), np.float32)
    service._counter = 800
    ref = service.predict(frames, ["the snitch is picked up"])

    batcher = DynamicBatcher(service, max_wait_ms=20.0)
    try:
        service._counter = 800
        out = batcher.predict(frames, ["the snitch is picked up"])
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        batcher.close()


def test_dynamic_batcher_rejects_bad_requests_individually(service):
    """Validation runs on the caller's thread BEFORE joining a shared batch:
    an OOV caption, wrong row count, or empty request raises for that caller
    only and never reaches the device."""
    from textocvp_tpu.serve.batching import DynamicBatcher

    batcher = DynamicBatcher(service, max_wait_ms=20.0)
    try:
        frames = np.zeros((1, 1, RES, RES, 3), np.float32)
        before = batcher._dispatches
        with pytest.raises(ValueError, match="out-of-vocabulary"):
            batcher.predict(frames, ["zorblax"])
        with pytest.raises(ValueError, match="captions"):
            batcher.predict(frames, ["a", "b"])
        with pytest.raises(ValueError, match="empty request"):
            batcher.predict(np.zeros((0, 1, RES, RES, 3), np.float32), [])
        assert batcher._dispatches == before  # nothing dispatched
        # good request still works afterwards
        out = batcher.predict(frames, ["the snitch is picked up"])
        assert out.shape == (1, NUM_PREDS, RES, RES, 3)
    finally:
        batcher.close()


def test_dynamic_batcher_pipelines_dispatch():
    """pipeline_depth=2 overlaps batch N+1's dispatch with batch N's wait:
    two spaced single-row requests against a service whose predict blocks
    200 ms complete in well under 2x200 ms, while depth=1 serializes them.
    Uses a stub service so the timing is deterministic on CPU."""
    import time

    from textocvp_tpu.serve.batching import DynamicBatcher

    class StubService:
        batch_size = 1  # every request is its own device batch
        num_context = 1
        num_preds = 2

        def _tokenize(self, captions):
            return {}

        def predict(self, frames, captions):
            time.sleep(0.2)  # stands in for the device round-trip
            return np.repeat(frames, self.num_preds, axis=1)

    def run(depth):
        batcher = DynamicBatcher(StubService(), max_wait_ms=1.0,
                                 pipeline_depth=depth)
        frames = np.zeros((1, 1, 4, 4, 3), np.float32)
        try:
            batcher.predict(frames, ["warm"])  # threads up and idle
            outs = {}

            def call(i):
                outs[i] = batcher.predict(frames + i, [f"c{i}"])

            threads = [threading.Thread(target=call, args=(i,))
                       for i in range(2)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=30)
            dt = time.perf_counter() - t0
            assert batcher._dispatches == 3  # batch_size=1: no coalescing
            for i in range(2):
                np.testing.assert_allclose(outs[i][0, 0], i)
            return dt
        finally:
            batcher.close()

    serial, pipelined = run(1), run(2)
    assert serial > 0.35  # two 200 ms dispatches back to back
    assert pipelined < 0.35  # overlapped: ~max(200, 200) + overhead


def test_dynamic_batcher_pipelined_matches_service(service):
    """Through the REAL service at pipeline_depth=2: two requests spaced
    wider than the window dispatch as two device batches whose results equal
    direct predicts at the same RNG counters."""
    from textocvp_tpu.serve.batching import DynamicBatcher

    frames = np.random.default_rng(21).random((2, 1, RES, RES, 3), np.float32)
    caps = ["the snitch is picked up", "the cone is rotating"]
    service._counter = 730
    ref0 = service.predict(frames[:1], caps[:1])
    ref1 = service.predict(frames[1:], caps[1:])

    batcher = DynamicBatcher(service, max_wait_ms=1.0, pipeline_depth=2)
    try:
        service._counter = 730
        out0 = batcher.predict(frames[:1], caps[:1])
        out1 = batcher.predict(frames[1:], caps[1:])
        np.testing.assert_allclose(out0, ref0, atol=1e-6)
        np.testing.assert_allclose(out1, ref1, atol=1e-6)
    finally:
        batcher.close()


def test_http_server_dynamic_batching(service):
    """serve(dynamic_batch_ms=...) end to end: two concurrent HTTP clients
    get correct replies from one shared device batch."""
    from textocvp_tpu.serve import serve

    httpd = serve(service, port=0, warmup=False, dynamic_batch_ms=300.0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(i, out):
            frames = np.full((1, 1, RES, RES, 3), i * 0.25, np.float32)
            buf = io.BytesIO()
            np.savez(buf, frames=frames,
                     captions=np.array(["the snitch is picked up"]))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
                headers={"Content-Type": "application/npz"})
            with urllib.request.urlopen(req, timeout=120) as r:
                out[i] = np.load(io.BytesIO(r.read()))["pred_frames"]

        outs = {}
        threads = [threading.Thread(target=post, args=(i, outs))
                   for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=120)
        assert set(outs) == {0, 1}
        for i in range(2):
            assert outs[i].shape == (1, NUM_PREDS, RES, RES, 3)
            assert outs[i].dtype == np.uint8

        # observability endpoint: request counters + batcher fill
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert stats["requests"] >= 2
        assert stats["rows"] >= 2
        assert stats["errors"] == 0
        assert stats["batches_dispatched"] >= 1
        assert 0 < stats["mean_batch_fill"] <= 1
        assert stats["latency_ms_p50"] > 0
    finally:
        httpd.shutdown()
