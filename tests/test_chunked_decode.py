"""Scan-chunked decode tail (nn/decoders.py tail_chunks + models/chunked.py
policy): must equal the flat decode exactly, and pick sane chunk counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from textocvp_tpu.core.config import build_exp_params
from textocvp_tpu.models import setup_model
from textocvp_tpu.models.chunked import (
    pick_tail_chunks,
    pick_tail_unroll,
    resolve_tail_chunks,
)


def test_pick_tail_chunks_policy():
    # flagship: 1216 slot-rows x 8 slots = 9728 frames -> 4 chunks of 2432
    # (measured sweet spot; docs/PERFORMANCE.md chunk sweep)
    assert pick_tail_chunks(1216, 8) == 4
    # recon eval: 512 rows x 8 = 4096 frames -> 2 chunks of 2048
    assert pick_tail_chunks(512, 8) == 2
    # small eval batch: left flat
    assert pick_tail_chunks(16, 8) == 1
    assert pick_tail_chunks(100, 4) == 1          # 400 frames << target
    # prime row count with big frames: no divisor, stays flat
    assert pick_tail_chunks(1217, 8) in (1, 1217// 1217)
    assert resolve_tail_chunks("auto", 1216, 8) == 4
    assert resolve_tail_chunks(None, 1216, 8) == 4
    assert resolve_tail_chunks(4, 1216, 8) == 4
    assert resolve_tail_chunks(0, 1216, 8) == 1
    # unroll: only the fully-unrolled 4-chunk form measured a win (v5e grid
    # in models/chunked.py); remat (training) always stays rolled
    assert pick_tail_unroll(4) == 4
    assert pick_tail_unroll(2) == 1
    assert pick_tail_unroll(8) == 1
    assert pick_tail_unroll(4, remat=True) == 1


def test_pick_tail_chunks_shard_multiple():
    """Under sequence-parallel decode the per-chunk row slice must stay a
    multiple of the mesh shard count, or GSPMD reshards inside the scan body
    (ADVICE r3). 1216 rows / 4 chunks = 304 rows: fine for 8 shards
    (304 = 38*8) but NOT for 64 — the policy must then pick a coarser count."""
    assert pick_tail_chunks(1216, 8, shard_multiple=8) == 4
    for m in (8, 64):
        c = pick_tail_chunks(1216, 8, shard_multiple=m)
        assert (1216 // c) % m == 0
    # 152 rows x 8 shards: 2 chunks would give 76-row slices (ok for 4
    # shards, not aligned checks): every admissible count keeps the multiple
    for rows, m in ((152, 8), (608, 16), (2432, 8)):
        c = pick_tail_chunks(rows, 8, shard_multiple=m)
        assert (rows // c) % m == 0
    assert resolve_tail_chunks("auto", 1216, 8, shard_multiple=64) == \
        pick_tail_chunks(1216, 8, shard_multiple=64)

    from textocvp_tpu.models.chunked import decode_candidate_schedules

    cands = decode_candidate_schedules(1216, 8, shard_multiple=64)
    assert cands, "candidate list must never be empty"
    assert all(c == 1 or (1216 % c == 0 and (1216 // c) % 64 == 0)
               for c, _ in cands)


def test_decode_candidate_schedules():
    from textocvp_tpu.models.chunked import decode_candidate_schedules

    # flagship shape: policy pick + rolled + fully-unrolled + neighbors,
    # no duplicates, all chunk counts divide n_rows
    cands = decode_candidate_schedules(1216, 8)
    assert cands[0] == (4, 4)            # static policy first
    assert (4, 1) in cands and (8, 1) in cands and (2, 1) in cands
    assert len(cands) == len(set(cands))
    assert all(c == 1 or 1216 % c == 0 for c, _ in cands)
    # tiny shape: flat + one chunked probe
    assert decode_candidate_schedules(24, 3) == [(1, 1), (2, 1)]
    # an explicit tpu.decode_chunks override leads the candidate list
    cands = decode_candidate_schedules(1216, 8, configured_chunks=16)
    assert cands[0] == (16, 1) and (4, 4) in cands
    assert len(cands) == len(set(cands))
    # a non-dividing override is dropped (it could not compile anyway)
    assert (5, 1) not in decode_candidate_schedules(1216, 8, configured_chunks=5)
    # "auto" (non-int) just defers to the policy
    assert decode_candidate_schedules(1216, 8, configured_chunks="auto")[0] == (4, 4)


@pytest.fixture(scope="module")
def tiny_savi():
    exp_params = build_exp_params("SAVi", "CATER_Easy")
    mp = exp_params["model"]["model_params"]
    mp["num_slots"], mp["slot_dim"] = 4, 16
    mp["mlp_hidden"] = 16
    mp["mlp_encoder_dim"] = 16
    mp["encoder"]["encoder_params"]["num_channels"] = [8, 8]
    mp["decoder"]["decoder_params"]["num_channels"] = [8, 8]
    model = setup_model(exp_params)
    videos = jnp.zeros((1, 1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "slots": jax.random.PRNGKey(1)},
        videos, decode=True, train=False)
    return model, variables


def test_chunked_tail_equals_flat(tiny_savi):
    model, variables = tiny_savi
    slots = jax.random.normal(jax.random.PRNGKey(2), (12, 4, 16))
    flat = model.apply(variables, slots, method="decode")
    for chunks in (2, 3, 4):
        out = model.apply(variables, slots, method="decode", tail_chunks=chunks)
        np.testing.assert_allclose(np.asarray(out["recons_imgs"]),
                                   np.asarray(flat["recons_imgs"]),
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["masks"]),
                                   np.asarray(flat["masks"]),
                                   rtol=0, atol=1e-6)


def test_non_divisible_chunks_fall_back_flat(tiny_savi):
    model, variables = tiny_savi
    slots = jax.random.normal(jax.random.PRNGKey(3), (7, 4, 16))
    # 7*4=28 conv frames, 5 does not divide 28
    out = model.apply(variables, slots, method="decode", tail_chunks=5)
    flat = model.apply(variables, slots, method="decode")
    np.testing.assert_allclose(np.asarray(out["recons_imgs"]),
                               np.asarray(flat["recons_imgs"]), atol=1e-6)


def test_chunked_under_jit_and_grad(tiny_savi):
    model, variables = tiny_savi
    slots = jax.random.normal(jax.random.PRNGKey(4), (12, 4, 16))

    @jax.jit
    def f(v, s):
        return model.apply(v, s, method="decode", tail_chunks=4)["recons_imgs"]

    np.testing.assert_allclose(
        np.asarray(f(variables, slots)),
        np.asarray(model.apply(variables, slots, method="decode")["recons_imgs"]),
        atol=1e-6)

    # gradients flow through the scanned tail and match the flat decode's
    def loss(v, s, chunks):
        out = model.apply(v, s, method="decode", tail_chunks=chunks)
        return jnp.mean(out["recons_imgs"] ** 2)

    g_flat = jax.grad(loss)(variables, slots, 1)
    g_chunk = jax.grad(loss)(variables, slots, 4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        g_flat, g_chunk)


def test_chunked_remat_grad_equals_flat(tiny_savi):
    """The training form: scanned tail with per-chunk jax.checkpoint — the
    backward recomputes each chunk but the gradients must equal the flat
    decode's exactly (values too)."""
    model, variables = tiny_savi
    slots = jax.random.normal(jax.random.PRNGKey(5), (12, 4, 16))

    def loss(v, s, chunks, remat):
        out = model.apply(v, s, method="decode", tail_chunks=chunks,
                          tail_remat=remat)
        return jnp.mean(out["recons_imgs"] ** 2)

    v_flat, g_flat = jax.value_and_grad(loss)(variables, slots, 1, False)
    v_r, g_r = jax.jit(
        jax.value_and_grad(lambda v, s: loss(v, s, 4, True)))(variables, slots)
    np.testing.assert_allclose(float(v_r), float(v_flat), atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-5),
        g_flat, g_r)


def test_const_bake_policy():
    from textocvp_tpu.models.chunked import (
        CONST_BAKE_LIMIT_BYTES, should_bake_constants, tree_bytes)

    small = {"params": {"w": jnp.zeros((16, 16), jnp.float32)}}
    assert tree_bytes(small) == 16 * 16 * 4
    assert should_bake_constants(small)
    assert not should_bake_constants(small, limit_bytes=16)
    # a ViT-B/14-sized pytree must NOT be baked (remote compile 413s)
    vit_bytes = 86_000_000 * 4
    assert vit_bytes > CONST_BAKE_LIMIT_BYTES
