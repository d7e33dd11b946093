"""SPMD tests on the 8-device CPU mesh: sharded train step, gradient
all-reduce equivalence with single-device execution, mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from textocvp_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_batch_to_multiple,
    replicated_sharding,
    shard_batch,
)


def test_mesh_shapes():
    mesh = get_mesh(data=-1, model=1)
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = get_mesh(data=4, model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    assert pad_batch_to_multiple(13, mesh) == 16


def test_shard_batch_places_on_data_axis():
    mesh = get_mesh()
    x = np.ones((16, 3, 8, 8, 3), np.float32)
    sharded = shard_batch(x, mesh)
    assert sharded.sharding.is_equivalent_to(batch_sharding(mesh), ndim=x.ndim)
    # strings pass through untouched
    batch = shard_batch({"v": x, "caption": ["a", "b"]}, mesh)
    assert batch["caption"] == ["a", "b"]


def test_sharded_grad_step_matches_single_device():
    """The canonical DP contract: a jitted loss/grad step over the 8-way
    sharded batch must produce the same update as single-device execution."""
    mesh = get_mesh()
    w = jnp.ones((4, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
    y = jax.random.normal(jax.random.PRNGKey(1), (16, 4))

    def loss(w, x, y):
        return jnp.mean(jnp.square(x @ w - y))

    g_single = jax.grad(loss)(w, x, y)

    w_r = jax.device_put(w, replicated_sharding(mesh))
    x_s = jax.device_put(x, batch_sharding(mesh))
    y_s = jax.device_put(y, batch_sharding(mesh))
    g_sharded = jax.jit(jax.grad(loss))(w_r, x_s, y_s)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-5, atol=1e-6)


def test_sharded_savi_train_step_runs():
    """A real SAVi train step with batch sharded over 8 devices."""
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
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    variables = model.init(init_rngs, videos[:1], train=False)
    params = jax.device_put(variables["params"], replicated_sharding(mesh))
    videos = jax.device_put(videos, batch_sharding(mesh))

    tx = optax.adam(1e-4)
    opt_state = jax.device_put(tx.init(variables["params"]), replicated_sharding(mesh))

    @jax.jit
    def train_step(params, opt_state, videos, rng):
        def loss_of(p):
            out = model.apply({"params": p}, videos, rngs={"slots": rng})
            total, _ = loss_fn(pred_imgs=jnp.clip(out["recons_imgs"], 0, 1),
                               target_imgs=jnp.clip(videos, 0, 1))
            return total

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    new_params, opt_state, loss = train_step(params, opt_state, videos,
                                             jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(new_params)[0]
    assert leaf.sharding.is_equivalent_to(replicated_sharding(mesh), ndim=leaf.ndim)


def test_device_prefetch_preserves_order_and_shards():
    from textocvp_tpu.parallel.mesh import device_prefetch

    mesh = get_mesh()
    batches = [(np.full((16, 2), i, np.float32), {"caption": [f"c{i}"]}) for i in range(5)]
    out = list(device_prefetch(iter(batches), mesh, size=2))
    assert len(out) == 5
    for i, (videos, others) in enumerate(out):
        assert float(np.asarray(videos)[0, 0]) == i
        assert others["caption"] == [f"c{i}"]
        assert videos.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)


def test_shard_batch_ragged_batch_replicates():
    mesh = get_mesh()
    x = np.ones((13, 4), np.float32)  # 13 % 8 != 0
    out = shard_batch(x, mesh)
    assert out.sharding.is_equivalent_to(replicated_sharding(mesh), ndim=2)


def test_bfloat16_compute_dtype():
    """bf16 compute with fp32 params stays finite through a decompose pass."""
    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model

    exp_params = build_exp_params("SAVi", "CATER_Easy")
    exp_params["tpu"]["compute_dtype"] = "bfloat16"
    mp = exp_params["model"]["model_params"]
    mp.update(num_slots=3, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["decoder"]["decoder_params"].update(num_channels=[8], resolution=[16, 16])
    mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                               "mlp_size": 16}
    model = setup_model(exp_params)
    videos = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 16, 16, 3))
    init_rngs = {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)}
    variables = model.init(init_rngs, videos, train=False)
    # params are float32, compute bfloat16
    assert jax.tree_util.tree_leaves(variables["params"])[0].dtype == jnp.float32
    out = model.apply(variables, videos, rngs={"slots": jax.random.PRNGKey(2)})
    assert out["recons_imgs"].dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out["recons_imgs"], dtype=np.float32)).all()


def test_hybrid_mesh_axes_and_batch_sharding():
    """(dcn, data, model) hybrid mesh: batch shards over ('dcn', 'data')."""
    import jax
    import jax.numpy as jnp

    from textocvp_tpu.parallel.distributed import get_hybrid_mesh
    from textocvp_tpu.parallel.mesh import batch_sharding, pad_batch_to_multiple, shard_batch

    mesh = get_hybrid_mesh(data=2, model=2, dcn=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}

    x = jnp.arange(4 * 3, dtype=jnp.float32).reshape(4, 3)
    sharded = shard_batch(x, mesh)
    assert not sharded.sharding.is_fully_replicated
    assert sharded.sharding == batch_sharding(mesh)
    # dcn*data = 4 rows per shard group
    assert pad_batch_to_multiple(5, mesh) == 8
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(x))


def test_loader_process_sharding_partitions_batches():
    """Per-process input sharding: N processes each load a disjoint contiguous
    slice of every global batch; the union reassembles the global batch in
    ('dcn','data') row order."""
    from textocvp_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return np.full((2, 4, 4, 3), i, np.float32), f"cap{i}"

    global_loader = DataLoader(Ds(), batch_size=8, shuffle=True, num_workers=0, seed=7)
    shards = [DataLoader(Ds(), batch_size=8, shuffle=True, num_workers=0, seed=7,
                         process_index=i, process_count=2) for i in range(2)]

    g_batches = [v for v, _ in global_loader]
    s_batches = [[v for v, _ in s] for s in shards]
    assert len(s_batches[0]) == len(g_batches)
    for gi, g in enumerate(g_batches):
        reassembled = np.concatenate([s_batches[0][gi], s_batches[1][gi]], axis=0)
        np.testing.assert_array_equal(reassembled, g)


def test_loader_process_sharding_ragged_batches_stay_in_lockstep():
    """Ragged final global batch (n % batch_size != 0): all processes must
    still emit the SAME number of equally-sized batches — the loader pads
    the global batch at its tail (repeating the last row) to pad_to_multiple
    and reports num_valid, so no process launches a collective the others
    skip and callers can drop the padding rows."""
    from textocvp_tpu.data.loader import DataLoader

    class Ds:
        def __len__(self):
            return 20  # 8 + 8 + ragged 4

        def __getitem__(self, i):
            return np.full((2, 4, 4, 3), i, np.float32), f"cap{i}"

    shards = [DataLoader(Ds(), batch_size=8, shuffle=False, num_workers=0,
                         process_index=i, process_count=2, pad_to_multiple=8)
              for i in range(2)]
    outs = [list(s) for s in shards]
    assert len(outs[0]) == len(outs[1]) == 3
    for (v0, i0), (v1, i1) in zip(outs[0], outs[1]):
        assert v0.shape == v1.shape  # equal local shard sizes every batch
        assert i0["num_valid"] == i1["num_valid"]
    # ragged batch: 4 valid rows, padded to 8 by repeating row id 19;
    # padding sits at the GLOBAL tail (= tail of the last process's slice)
    last = np.concatenate([outs[0][2][0], outs[1][2][0]], axis=0)
    assert outs[0][2][1]["num_valid"] == 4
    np.testing.assert_array_equal(last[:, 0, 0, 0, 0], [16, 17, 18, 19, 19, 19, 19, 19])


def test_maybe_initialize_distributed_idempotent(monkeypatch):
    """Calling the env-gated init twice (train-then-eval in one process) must
    not call jax.distributed.initialize twice."""
    from textocvp_tpu.parallel import distributed

    calls = []
    monkeypatch.setattr(distributed, "_DISTRIBUTED_INITIALIZED", False)
    monkeypatch.setenv("TEXTOCVP_COORDINATOR", "localhost:0")

    import jax

    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw), raising=False)
    monkeypatch.setattr(jax.distributed, "is_initialized",
                        lambda: False, raising=False)
    assert distributed.maybe_initialize_distributed() is True
    assert distributed.maybe_initialize_distributed() is True
    assert len(calls) == 1


def test_runtime_mesh_single_process_is_ici_mesh():
    from textocvp_tpu.parallel.distributed import get_runtime_mesh

    mesh = get_runtime_mesh({"mesh_axes": {"data": 4, "model": 2}})
    assert mesh.axis_names == ("data", "model")
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_maybe_initialize_distributed_noop_without_env(monkeypatch):
    from textocvp_tpu.parallel import distributed

    monkeypatch.delenv("TEXTOCVP_COORDINATOR", raising=False)
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert distributed.maybe_initialize_distributed() is False


def test_chunked_decode_under_data_sharding():
    """The scan-chunked decoder tail must produce the flat decode's results
    when the slot batch is SHARDED over the data axis (the chunk reshape
    crosses shard boundaries; XLA must resolve it without changing values)."""
    from textocvp_tpu.core.config import build_exp_params
    from textocvp_tpu.models import setup_model
    from textocvp_tpu.parallel.mesh import get_mesh, shard_batch

    params = build_exp_params("SAVi", "CATER_Easy")
    mp = params["model"]["model_params"]
    mp.update(num_slots=4, slot_dim=16, mlp_hidden=16, mlp_encoder_dim=16)
    mp["encoder"]["encoder_params"]["num_channels"] = [8, 8]
    mp["decoder"]["decoder_params"]["num_channels"] = [8, 8]
    model = setup_model(params)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        jnp.zeros((1, 1, 64, 64, 3)), decode=True, train=False)

    mesh = get_mesh(data=-1, model=1)
    slots = jax.random.normal(jax.random.PRNGKey(2), (16, 4, 16))
    sharded = shard_batch(slots, mesh)

    flat = model.apply(variables, slots, method="decode")["recons_imgs"]

    @jax.jit
    def chunked(s):
        return model.apply(variables, s, method="decode",
                           tail_chunks=4)["recons_imgs"]

    out = chunked(sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(flat), atol=1e-5)
