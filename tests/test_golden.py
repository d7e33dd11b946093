"""
Fixed-seed golden-value regression: slot attention and the TextOCVP rollout
must keep producing the committed outputs (tests/golden/golden_v1.npz,
generated on CPU with matmul precision 'highest'). Catches silent numeric or
initialization drift; regenerate intentionally when semantics change.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = Path(__file__).parent / "golden" / "golden_v1.npz"


def test_slot_attention_golden():
    from textocvp_tpu.ops.slot_attention import SlotAttention

    sa = SlotAttention(dim_feats=32, dim_slots=16, num_slots=4, mlp_hidden=24)
    inputs = jax.random.normal(jax.random.PRNGKey(1), (2, 25, 32))
    slots = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 16))
    params = sa.init(jax.random.PRNGKey(0), inputs, slots, num_iters=1)
    out, attn = sa.apply(params, inputs, slots, num_iters=3)
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out), golden["sa_out"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), golden["sa_attn"], rtol=1e-4, atol=1e-5)


def test_textocvp_rollout_golden():
    from textocvp_tpu.models.predictors import PredictorWrapper, TextOCVP

    pred = TextOCVP(
        num_slots=4, slot_dim=16, token_dim=32, n_heads=2, hidden_dim=32,
        num_layers=2, residual=True, input_buffer_size=5,
        fusion_num_heads=2, fusion_head_dim=8, fusion_mlp_size=32,
        text_encoder_type="custom_tf",
        text_encoder_params={"input_dim": 16, "num_layers": 1, "num_heads": 2,
                             "vocab_size": 30},
    )
    wrapper = PredictorWrapper(predictor=pred, num_context=2, num_preds=5,
                               teacher_force=False, input_buffer_size=4)
    hist = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 4, 16))
    text = jnp.asarray([[1, 5, 7, 2, 0], [1, 9, 2, 0, 0]], jnp.int32)
    lengths = jnp.asarray([4, 3], jnp.int32)
    params = wrapper.init(jax.random.PRNGKey(4), hist, caption_tokens=text,
                          caption_lengths=lengths)
    roll = wrapper.apply(params, hist, caption_tokens=text, caption_lengths=lengths)
    golden = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(roll), golden["rollout"], rtol=1e-4, atol=1e-5)
