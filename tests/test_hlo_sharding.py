"""
HLO-level sharding regression guards (8-device CPU mesh).

The numeric tests in test_parallel.py / test_partitioning.py stay green even
if a change silently REPLICATES computation (every device computing the full
batch) or starts all-gathering sharded weights — the math is still right,
just 8x the work/communication. These tests pin the compiled program's
collective structure instead:

* DP grad step: gradients reduce with all-reduce over the FULL data axis;
  no all-gather anywhere (batch-sharded activations must stay sharded).
* TP rollout: the Megatron column->row split (parallel/partitioning.py:9-16)
  emits all-reduces over model-axis pairs ONLY — no all-gather of weights,
  no full-mesh reduction in a pure forward, and a pinned op count.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from textocvp_tpu.models.predictors import PredictorWrapper, TextOCVP
from textocvp_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
)
from textocvp_tpu.parallel.partitioning import shard_predictor_params


def _all_reduce_group_sizes(hlo: str) -> list[int]:
    """Group size of every all-reduce in optimized HLO. Handles both the
    explicit ``replica_groups={{0,1},{2,3}}`` and the iota
    ``replica_groups=[1,8]<=[8]`` forms."""
    sizes = []
    for m in re.finditer(
            r"all-reduce[^\n]*?replica_groups=(\{\{.*?\}\}|\[\d+,\d+\]<=\[\d+\])",
            hlo):
        g = m.group(1)
        if g.startswith("["):
            sizes.append(int(g[1:].split("]")[0].split(",")[1]))
        else:  # {{0,1},{2,3},...}: size of the first group
            sizes.append(g[2:].split("}")[0].count(",") + 1)
    return sizes


def _count(hlo: str, op: str) -> int:
    return len(re.findall(rf"= \S+ {op}", hlo))


def test_dp_grad_step_reduces_over_full_data_axis():
    """Replicated params + batch-sharded inputs: every gradient all-reduce
    spans all 8 devices; no all-gather (a batch-sized all-gather means some
    op fell back to replicated execution)."""
    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model
    from textocvp_tpu.train.losses import build_loss_fn

    exp_params = build_exp_params("SAVi", "CATER_Easy")
    mp = exp_params["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    model = setup_model(exp_params)
    loss_fn = build_loss_fn(exp_params["loss"])

    mesh = get_mesh()
    videos = jax.random.uniform(jax.random.PRNGKey(0), (16, 2, 16, 16, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "slots": jax.random.PRNGKey(1)},
                           videos[:1], train=False)

    def loss(params, batch, rng):
        out = model.apply({"params": params}, batch, rngs={"slots": rng})
        val, _ = loss_fn(pred_imgs=jnp.clip(out["recons_imgs"], 0, 1),
                         target_imgs=jnp.clip(batch, 0, 1))
        return val

    grad_fn = jax.jit(jax.grad(loss))
    params_r = jax.device_put(variables["params"], replicated_sharding(mesh))
    videos_s = shard_batch(videos, mesh)
    with mesh:
        hlo = grad_fn.lower(params_r, videos_s,
                            jax.random.PRNGKey(2)).compile().as_text()

    sizes = _all_reduce_group_sizes(hlo)
    assert sizes, "no gradient all-reduce found — DP grads are not being reduced"
    assert all(s == 8 for s in sizes), f"non-data-axis all-reduce groups: {sizes}"
    assert _count(hlo, "all-gather") == 0, "unexpected all-gather in DP grad step"


@pytest.mark.parametrize("text_encoder", ["custom_tf", "t5"])
def test_tp_rollout_emits_per_block_model_axis_reduces(text_encoder):
    """TP-sharded rollout on a (data=4, model=2) mesh: every collective is an
    all-reduce over a model-axis PAIR (the one reduction the Megatron
    column->row split needs); sharded weights are never all-gathered and a
    pure forward has no full-mesh reduction."""
    B, S, D = 4, 4, 16
    mesh = get_mesh(data=4, model=2)
    if text_encoder == "custom_tf":
        te_params = {"input_dim": 16, "num_layers": 1, "num_heads": 2,
                     "vocab_size": 30}
    else:
        te_params = {"vocab_size": 64, "d_model": 32, "d_kv": 16, "d_ff": 64,
                     "num_layers": 2, "num_heads": 2}
    pred = TextOCVP(
        num_slots=S, slot_dim=D, token_dim=32, n_heads=2, hidden_dim=64,
        num_layers=2, residual=True, input_buffer_size=3,
        fusion_num_heads=2, fusion_head_dim=16, fusion_mlp_size=64,
        text_encoder_type=text_encoder, text_encoder_params=te_params)
    wrapper = PredictorWrapper(predictor=pred, num_context=1, num_preds=4,
                               teacher_force=False, input_buffer_size=3)
    hist = jax.random.normal(jax.random.PRNGKey(1), (B, 1, S, D))
    text = jnp.ones((B, 5), jnp.int32)
    lengths = jnp.full((B,), 5, jnp.int32)
    kwargs = ({"caption_tokens": text, "caption_lengths": lengths}
              if text_encoder == "custom_tf"
              else {"caption_tokens": text, "attn_masks": jnp.ones((B, 5), jnp.int32)})
    variables = wrapper.init(jax.random.PRNGKey(0), hist, **kwargs)
    tp = {"params": shard_predictor_params(variables["params"], mesh)}
    hist_s = jax.device_put(hist, batch_sharding(mesh))
    kwargs_s = {k: jax.device_put(v, batch_sharding(mesh))
                for k, v in kwargs.items()}

    fn = jax.jit(lambda v, h, kw: wrapper.apply(v, h, **kw))
    with mesh:
        hlo = fn.lower(tp, hist_s, kwargs_s).compile().as_text()

    sizes = _all_reduce_group_sizes(hlo)
    assert sizes, "no all-reduce found — TP matmuls are not being reduced"
    assert all(s == 2 for s in sizes), (
        f"expected only model-axis (size-2) groups, got {sizes} — a full-mesh "
        "reduction in a pure forward means sharding specs regressed")
    assert _count(hlo, "all-gather") == 0, "TP weights are being all-gathered"
    assert _count(hlo, "collective-permute") == 0
    if text_encoder == "custom_tf":
        # measured baseline for this exact program (jax 0.8.x CPU SPMD):
        # rollout scan body: 2 blocks x (attn-out + MLP-down) + cross-attn
        # fusion; text encoder adds the rest. A future count INCREASE means
        # extra communication crept in; 0 means replication. Re-derive with
        # fn.lower(...).compile().as_text() if the toolchain changes.
        assert len(sizes) == 10, f"all-reduce count changed: {len(sizes)} != 10"


def test_dp_accum_step_keeps_microbatches_sharded(tmp_path):
    """Gradient accumulation on the 8-device data mesh: the (accum, micro_b)
    reshape must NOT land the sharding on the scan axis (that would emit a
    batch all-gather and replicate each microbatch's compute on every
    device). Expected collective structure: one collective-permute (the
    microbatch reshard), gradient all-reduces over the FULL data axis, zero
    all-gathers."""
    import numpy as np

    from textocvp_tpu.core.experiment import Experiment
    from textocvp_tpu.parallel.mesh import shard_batch
    from textocvp_tpu.train.trainer import DecompTrainer

    exp = Experiment.create(tmp_path / "accum_hlo", "SAVi", "Synthetic")
    p = exp.params
    mp = p["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16,
              initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    p["dataset"].update(img_size=[16, 16], num_frames=3)
    p["training"].update(batch_size=16, accum_steps=2)
    exp.save_params(p)

    videos = np.random.default_rng(0).uniform(0, 1, (16, 3, 16, 16, 3)).astype(np.float32)
    tr = DecompTrainer(exp.exp_path)
    assert tr.mesh.shape["data"] == 8
    tr.setup_model(videos)
    vs = shard_batch(jnp.asarray(videos), tr.mesh)
    with tr.mesh:
        hlo = tr._train_step_jit.lower(
            tr.params, tr.batch_stats, tr.opt_state, vs,
            jax.random.PRNGKey(0), accum=2).compile().as_text()

    sizes = _all_reduce_group_sizes(hlo)
    assert sizes and all(s == 8 for s in sizes), (
        f"accum grad all-reduce must span the full data axis, got {sizes}")
    assert _count(hlo, "all-gather") == 0, (
        "all-gather in the accumulated step — microbatches fell back to "
        "replicated execution")
    assert _count(hlo, "collective-permute") <= 1, (
        "more than the single expected microbatch-reshard permute")


def test_microbatch_sharding_spans_hybrid_batch_axes():
    """On a hybrid (dcn, data) multi-host mesh the microbatch constraint must
    pin BOTH batch axes: constraining only 'data' would replicate every
    microbatch across the dcn (cross-host) axis — a per-step cross-host
    all-gather of the batch, the exact collective the helper exists to
    prevent."""
    import jax.sharding as shd

    from textocvp_tpu.parallel.distributed import get_hybrid_mesh
    from textocvp_tpu.train.trainer import microbatch_sharding

    mesh = get_hybrid_mesh(data=4, model=1, dcn=2)
    constrain = microbatch_sharding(mesh)
    batch_spec = shd.NamedSharding(mesh, shd.PartitionSpec(("dcn", "data")))

    def reshaped(videos):
        # (16, 3, 8, 8, 3) batch -> (accum=2, mb=8, ...) microbatches
        return constrain(videos.reshape(2, 8, *videos.shape[1:])).sum()

    videos = jnp.ones((16, 3, 8, 8, 3))
    videos = jax.device_put(videos, batch_spec)
    with mesh:
        hlo = jax.jit(reshaped).lower(videos).compile().as_text()
    assert _count(hlo, "all-gather") == 0, (
        "hybrid-mesh microbatch reshape all-gathers the batch — the "
        "constraint is not covering the dcn axis")
