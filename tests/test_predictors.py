"""Predictor and rollout-wrapper tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.models.predictors import (
    OCVPPar,
    OCVPSeq,
    PredictorWrapper,
    TextOCVP,
    VanillaTransformerPredictor,
)

B, S, D = 2, 4, 16
VOCAB = 30


def _slots(key, t):
    return jax.random.normal(jax.random.PRNGKey(key), (B, t, S, D))


@pytest.mark.parametrize("cls", [VanillaTransformerPredictor, OCVPSeq, OCVPPar])
def test_uncond_predictor_shapes(cls):
    mod = cls(num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32,
              num_layers=2, n_heads=2, residual=True, input_buffer_size=5)
    x = _slots(0, 3)
    params = mod.init(jax.random.PRNGKey(1), x)
    out = mod.apply(params, x)
    assert out.shape == (B, S, D)
    # different window lengths share the same params
    out4 = mod.apply(params, _slots(2, 4))
    assert out4.shape == (B, S, D)


def _tiny_textocvp(text_encoder_type="custom_tf"):
    return TextOCVP(
        num_slots=S, slot_dim=D, token_dim=32, n_heads=2, hidden_dim=32,
        num_layers=2, residual=True, input_buffer_size=5,
        fusion_num_heads=2, fusion_head_dim=8, fusion_mlp_size=32,
        text_encoder_type=text_encoder_type,
        text_encoder_params={"input_dim": 16, "num_layers": 1, "num_heads": 2,
                             "vocab_size": VOCAB},
    )


def test_textocvp_forward_and_kv_cache_equivalence():
    mod = _tiny_textocvp()
    x = _slots(0, 3)
    text = jnp.ones((B, 6), dtype=jnp.int32)
    lengths = jnp.asarray([6, 4])
    params = mod.init(jax.random.PRNGKey(1), x, text, caption_lengths=lengths,
                      method="full_forward")

    emb = mod.apply(params, text, lengths, method="encode_text")
    assert emb.shape == (B, 6, 32)

    direct = mod.apply(params, x, text_embeddings=emb)
    kv = mod.apply(params, emb, method="precompute_text_kv")
    cached = mod.apply(params, x, text_kv=kv)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(cached), rtol=1e-5, atol=1e-6)


def test_wrapper_rollout_shapes_and_buffer():
    pred = _tiny_textocvp()
    wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=6,
                               teacher_force=False, input_buffer_size=3)
    hist = _slots(3, 8)
    text = jnp.ones((B, 5), dtype=jnp.int32)
    lengths = jnp.asarray([5, 3])
    params = wrapper.init(jax.random.PRNGKey(1), hist,
                          caption_tokens=text, caption_lengths=lengths)
    out = wrapper.apply(params, hist, caption_tokens=text, caption_lengths=lengths)
    assert out.shape == (B, 6, S, D)
    assert np.isfinite(np.asarray(out)).all()


def test_wrapper_teacher_force_uses_ground_truth():
    """With teacher forcing, step t>0 must consume GT slots: predictions differ
    from the free-running rollout whenever GT != prediction."""
    pred = VanillaTransformerPredictor(
        num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32,
        num_layers=1, n_heads=2, residual=True, input_buffer_size=5,
    )
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=3,
                               teacher_force=False, input_buffer_size=5)
    hist = _slots(4, 4)
    params = wrapper.init(jax.random.PRNGKey(1), hist)
    free = wrapper.apply(params, hist, teacher_force=False)
    forced = wrapper.apply(params, hist, teacher_force=True)
    # step 0 identical (same context), later steps differ
    np.testing.assert_allclose(np.asarray(free[:, 0]), np.asarray(forced[:, 0]),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(free[:, 1:]), np.asarray(forced[:, 1:]), atol=1e-4)


def test_wrapper_respects_buffer_size():
    """A rollout with buffer_size=1 only ever sees the newest frame, so feeding
    a different (older) context must not change predictions after step 0."""
    pred = VanillaTransformerPredictor(
        num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32,
        num_layers=1, n_heads=2, residual=True, input_buffer_size=5,
    )
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=2,
                               teacher_force=False, input_buffer_size=1)
    h1 = _slots(5, 1)
    params = wrapper.init(jax.random.PRNGKey(1), h1)
    o1 = wrapper.apply(params, h1)
    # after the first step, the window contains only the step-0 prediction
    o2 = wrapper.apply(params, jnp.concatenate([h1], axis=1))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5, atol=1e-6)


def test_scan_rollout_matches_python_unroll():
    """The lax.scan steady-state must be bit-equivalent to the reference-style
    python sliding-window rollout."""
    pred = VanillaTransformerPredictor(
        num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32,
        num_layers=1, n_heads=2, residual=True, input_buffer_size=3,
    )
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=7,
                               teacher_force=False, input_buffer_size=3)
    hist = _slots(9, 8)
    params = wrapper.init(jax.random.PRNGKey(1), hist)
    out = wrapper.apply(params, hist)

    # manual reference rollout with the inner predictor
    pred_params = {"params": params["params"]["predictor"]}
    window = [hist[:, 0]]
    manual = []
    for t in range(7):
        cur = pred.apply(pred_params, jnp.stack(window, axis=1))
        manual.append(cur)
        window.append(cur)
        window = window[-3:]
    manual = jnp.stack(manual, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), rtol=2e-5, atol=1e-5)

    # teacher-forced path equivalence
    out_tf = wrapper.apply(params, hist, teacher_force=True)
    window = [hist[:, 0]]
    manual_tf = []
    for t in range(7):
        cur = pred.apply(pred_params, jnp.stack(window, axis=1))
        manual_tf.append(cur)
        window.append(hist[:, 1 + t])
        window = window[-3:]
    manual_tf = jnp.stack(manual_tf, axis=1)
    np.testing.assert_allclose(np.asarray(out_tf), np.asarray(manual_tf),
                               rtol=2e-5, atol=1e-5)


def test_textocvp_static_rollout_matches_dynamic_window():
    """The zero-padded masked ring buffer must be exactly equivalent to the
    reference's dynamic sliding window (masked softmax == softmax over the
    valid subset)."""
    pred = _tiny_textocvp()
    wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=6,
                               teacher_force=False, input_buffer_size=4)
    hist = _slots(11, 8)
    text = jnp.ones((B, 5), dtype=jnp.int32)
    lengths = jnp.asarray([5, 3])
    params = wrapper.init(jax.random.PRNGKey(1), hist,
                          caption_tokens=text, caption_lengths=lengths)
    out = wrapper.apply(params, hist, caption_tokens=text, caption_lengths=lengths)

    # manual dynamic-window rollout with the inner predictor (reference
    # predictor_wrapper.py semantics)
    pred_params = {"params": params["params"]["predictor"]}
    emb = pred.apply(pred_params, text, lengths, method="encode_text")
    window = [hist[:, 0], hist[:, 1]]
    manual = []
    for t in range(6):
        cur = pred.apply(pred_params, jnp.stack(window, axis=1), text_embeddings=emb)
        manual.append(cur)
        window.append(cur)
        window = window[-4:]
    manual = jnp.stack(manual, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual), rtol=3e-5, atol=3e-5)

    # teacher-forced variant
    out_tf = wrapper.apply(params, hist, teacher_force=True,
                           caption_tokens=text, caption_lengths=lengths)
    window = [hist[:, 0], hist[:, 1]]
    manual_tf = []
    for t in range(6):
        cur = pred.apply(pred_params, jnp.stack(window, axis=1), text_embeddings=emb)
        manual_tf.append(cur)
        window.append(hist[:, 2 + t])
        window = window[-4:]
    manual_tf = jnp.stack(manual_tf, axis=1)
    np.testing.assert_allclose(np.asarray(out_tf), np.asarray(manual_tf),
                               rtol=3e-5, atol=3e-5)


def test_rollout_jits_as_one_program():
    pred = _tiny_textocvp()
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=4,
                               teacher_force=False, input_buffer_size=3)
    hist = _slots(6, 1)
    text = jnp.ones((B, 5), dtype=jnp.int32)
    lengths = jnp.asarray([5, 3])
    params = wrapper.init(jax.random.PRNGKey(1), hist,
                          caption_tokens=text, caption_lengths=lengths)

    @jax.jit
    def rollout(p, h, c, l):
        return wrapper.apply(p, h, caption_tokens=c, caption_lengths=l)

    out = rollout(params, hist, text, lengths)
    assert out.shape == (B, 4, S, D)


@pytest.mark.parametrize("cls", [OCVPSeq, OCVPPar])
def test_uncond_static_rollout_matches_dynamic_window(cls):
    """OCVPSeq/OCVPPar through the unified masked ring buffer must equal the
    reference-style python sliding window (incl. PE re-indexing during the
    warmup phase, where the static buffer still has padding frames)."""
    pred = cls(num_slots=S, slot_dim=D, token_dim=16, hidden_dim=32,
               num_layers=2, n_heads=2, residual=True, input_buffer_size=4)
    wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=5,
                               teacher_force=False, input_buffer_size=4)
    hist = _slots(3, 8)
    params = wrapper.init(jax.random.PRNGKey(1), hist)
    out = wrapper.apply(params, hist)

    pred_params = {"params": params["params"]["predictor"]}
    window = [hist[:, 0], hist[:, 1]]
    manual = []
    for t in range(5):
        cur = pred.apply(pred_params, jnp.stack(window, axis=1))
        manual.append(cur)
        window.append(cur)
        window = window[-4:]
    manual = jnp.stack(manual, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                               rtol=3e-5, atol=3e-5)


def test_rollout_unroll_is_semantics_preserving():
    """``rollout_unroll`` (the tpu.rollout_unroll scheduling knob) must not
    change rollout values — lax.scan unrolling only alters the schedule."""
    pred = _tiny_textocvp()
    hist = _slots(2, 8)
    text = jnp.ones((B, 5), dtype=jnp.int32)
    lengths = jnp.asarray([5, 3])
    outs = []
    for unroll in (1, 2, 5):
        wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=5,
                                   teacher_force=False, input_buffer_size=3,
                                   rollout_unroll=unroll)
        params = wrapper.init(jax.random.PRNGKey(1), hist,
                              caption_tokens=text, caption_lengths=lengths)
        outs.append(np.asarray(wrapper.apply(
            params, hist, caption_tokens=text, caption_lengths=lengths)))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-6)
