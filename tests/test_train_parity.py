"""
TRAINING-DYNAMICS parity against the actual reference implementation.

tests/test_reference_parity.py proves the FORWARD contract (same weights ->
same outputs, under torch.no_grad). This module proves the TRAINING contract:
starting from identical weights and an identical batch, the reference's
training step — loss -> backward() -> clip_grad_norm_(0.05) -> Adam step with
the warmup/cosine LR orchestration (reference 02_train_savi.py:66-73,
04_train_predictor.py:100-108, lib/setup_model.py:286-361,
lib/schedulers.py:68-157) — and our jitted optax train step produce the same
loss trajectory, the same gradients, and the same parameter updates.

The torch side drives the REAL reference modules imported from
/root/reference/src (the model forward, torch.optim.Adam,
torch.optim.lr_scheduler.CosineAnnealingLR, and the reference's own
LRWarmUp + WarmupVSScehdule orchestrator), stepped exactly as
base/baseTrainer.py:224-237 steps them. Our side drives the REAL
DecompTrainer / PredictorTrainer jitted steps with weights converted through
the proven checkpoint importer.

Determinism notes:
* `Learned` slot initializer (deterministic); `LearnedRandom` samples a fresh
  gaussian per call and cannot be matched across frameworks.
* torch modules run forward in eval() mode WITH gradients: the only
  train/eval difference in these models is dropout (p=0.1 inside the Vanilla
  predictor's TransformerEncoderLayer), and dropout masks cannot be matched
  across RNG implementations — the deterministic dynamics are the contract.
* Adam's first-step direction is ~sign(g): elements whose |gradient| sits at
  the cross-framework noise floor can flip sign and contribute O(lr) update
  differences. The comparisons therefore check the loss trajectory (an
  integrated, well-conditioned probe of the whole chain), the pre-clip global
  gradient norm, and the relative L2 error of the total parameter delta —
  with the one PREDICTED deviation (torch's redundant GRU gate biases)
  asserted in its exact expected form rather than masked.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

import test_reference_parity as refpar  # noqa: E402  (shared ref-import scaffolding)
from textocvp_tpu.core.experiment import Experiment  # noqa: E402
from textocvp_tpu.train.schedulers import ETA_MIN, build_lr_schedule  # noqa: E402
from textocvp_tpu.train.torch_import import convert_predictor, convert_savi  # noqa: E402

REF_SRC = "/root/reference/src"

LR = 1e-4
CLIP = 0.05
WARMUP = 2
T_MAX = 10
STEPS = 5  # covers warmup (0, lr/2, lr), the post-warmup hold, and cosine(1)


def _ref_scheduler_classes():
    refpar._install_import_stubs()
    if REF_SRC not in sys.path:
        sys.path.insert(0, REF_SRC)
    from lib.schedulers import LRWarmUp, WarmupVSScehdule

    return LRWarmUp, WarmupVSScehdule


def _ref_lr_stack(optimizer, lr=LR, warmup_steps=WARMUP, t_max=T_MAX):
    """The reference's exact optimizer-side LR machinery
    (lib/setup_model.py:305-361): CosineAnnealingLR(T_max, eta_min=1e-7)
    orchestrated per-iteration by LRWarmUp + WarmupVSScehdule."""
    LRWarmUp, WarmupVSScehdule = _ref_scheduler_classes()
    scheduler = torch.optim.lr_scheduler.CosineAnnealingLR(
        optimizer, T_max=t_max, eta_min=ETA_MIN)
    lr_warmup = LRWarmUp(init_lr=lr, warmup_steps=warmup_steps)
    orchestrator = WarmupVSScehdule(optimizer, lr_warmup, scheduler)
    exp_params = {"training": {"scheduler": "cosine_annealing"}}

    def step_lr(i):
        # exactly base/baseTrainer.py:226-231 (called BEFORE the fwd/bwd/step)
        orchestrator(iter=i, epoch=0, exp_params=exp_params, end_epoch=False)
        return optimizer.param_groups[0]["lr"]

    return step_lr


# --------------------------------------------------------------------- LR sequence
@pytest.mark.parametrize("use_warmup", [True, False])
def test_lr_sequence_matches_torch_reference(use_warmup):
    """Elementwise A/B of the first ~2.6k iterations of the EXECUTED torch LR
    sequence (LRWarmUp + WarmupVSScehdule + CosineAnnealingLR, per-iteration
    stepping) against our optax schedule — including the reference's
    off-by-one quirks (lr=0 at iteration 0; the hold iteration after warmup
    ends; no hold when warmup is disabled, because LRWarmUp(warmup_steps=-1)
    deactivates at iteration 0). Past T_max the two DIVERGE by design: torch's
    cosine is periodic and climbs back toward base lr, ours anneals to the
    eta_min floor and stays (train/schedulers.py module docstring)."""
    ws, t_max, n = (50 if use_warmup else 0), 2000, 2600
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=LR)
    step_lr = _ref_lr_stack(opt, lr=LR, warmup_steps=ws if use_warmup else -1,
                            t_max=t_max)
    torch_lrs = np.array([step_lr(i) for i in range(n)])

    schedule = build_lr_schedule({
        "lr": LR, "lr_warmup": use_warmup, "warmup_steps": ws,
        "scheduler": "cosine_annealing", "scheduler_steps": t_max,
    })
    our_lrs = np.array([float(schedule(i)) for i in range(n)])

    cut = ws + (1 if use_warmup else 0) + t_max  # last index of the annealing ramp
    np.testing.assert_allclose(our_lrs[: cut + 1], torch_lrs[: cut + 1],
                               rtol=1e-5, atol=1e-11)
    # documented deviation past T_max: we hold the floor, torch climbs back
    np.testing.assert_allclose(our_lrs[cut:], ETA_MIN, rtol=1e-5)
    assert torch_lrs[-1] > 10 * ETA_MIN  # torch's periodic climb-back is real


# ----------------------------------------------------------------------- helpers
def _flat_delta(tree_a, tree_b):
    """Concatenated (a - b) over matching pytrees, as one float64 vector."""
    la = jax.tree_util.tree_leaves(tree_a)
    lb = jax.tree_util.tree_leaves(tree_b)
    assert len(la) == len(lb)
    return np.concatenate([
        (np.asarray(x, np.float64) - np.asarray(y, np.float64)).ravel()
        for x, y in zip(la, lb)
    ])


def _assert_update_parity(our_final, our_init, torch_final, torch_init,
                          rel_l2=1e-2, halved=()):
    """Parameter-update A/B that is robust to Adam's sign-of-tiny-gradient
    sensitivity: the relative L2 error of the TOTAL delta vector catches any
    systematic error (wrong lr / clip / schedule / adam variant scales every
    element), while isolated tiny-gradient sign flips perturb only a few
    coordinates of a many-thousand-element vector.

    ``halved``: path substrings of leaves where torch's update is EXACTLY
    double ours by construction — torch's GRUCell keeps REDUNDANT bias pairs
    (bias_ih + bias_hh) on the r/z gates whose pre-activations sum them;
    their gradients are identical, so Adam moves each by the same step and
    the effective (summed) bias advances 2x per iteration. Our GRU folds the
    pair into one bias (forward-identical; the importer sums them,
    train/torch_import.py::_gru), so those biases advance 1x. Rather than
    masking the deviation, we PREDICT its exact form and assert
    d_torch == 2 * d_ours on those leaves."""
    def _split(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        main, half = [], []
        for path, leaf in flat:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            (half if any(h in name for h in halved) else main).append(
                np.asarray(leaf, np.float64).ravel())
        return (np.concatenate(main),
                np.concatenate(half) if half else np.zeros(0))

    o_f, o_f_h = _split(our_final)
    o_i, o_i_h = _split(our_init)
    t_f, t_f_h = _split(torch_final)
    t_i, t_i_h = _split(torch_init)
    d_ours, d_torch = o_f - o_i, t_f - t_i
    denom = np.linalg.norm(d_torch)
    assert denom > 0, "torch made no update — the test is vacuous"
    rel = np.linalg.norm(d_ours - d_torch) / denom
    assert rel < rel_l2, f"param-update relative L2 error {rel:.3e} >= {rel_l2}"
    if halved:
        d_o_h, d_t_h = o_f_h - o_i_h, t_f_h - t_i_h
        assert d_o_h.size > 0, f"halved paths {halved} matched no leaves"
        rel_h = np.linalg.norm(2 * d_o_h - d_t_h) / np.linalg.norm(d_t_h)
        assert rel_h < rel_l2, \
            f"redundant-bias halving prediction off: {rel_h:.3e} >= {rel_l2}"


def _np_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _sd_copy(module):
    """Snapshot a state_dict by VALUE. refpar._sd returns detach().numpy()
    VIEWS of the live torch parameter memory — fine for forward-only parity,
    but here the torch optimizer then mutates those parameters IN PLACE,
    which would silently turn the 'initial' conversion into the stepped
    weights for every leaf the converter passes through untransposed."""
    return {k: v.copy() for k, v in refpar._sd(module).items()}


def _savi_parity_exp(tmp_path):
    """Tiny SAVi experiment matching refpar._tiny_savi_exp geometry, with
    short warmup/cosine so 5 steps traverse the whole LR contract (parity is
    single-stream; DP equivalence has its own tests)."""
    exp = Experiment.create(tmp_path / "savi_parity", "SAVi", "CATER_Easy")
    params = exp.params
    mp = params["model"]["model_params"]
    mp.update(num_slots=4, slot_dim=32, mlp_hidden=24, mlp_encoder_dim=32,
              num_iterations=1, num_iterations_first=2, initializer="Learned")
    mp["encoder"]["encoder_params"].update(num_channels=[16, 16],
                                           resolution=[32, 32], kernel_size=5)
    mp["decoder"]["decoder_params"].update(num_channels=[16, 16],
                                           resolution=[32, 32], kernel_size=5,
                                           upsample=1)
    mp["transition_module"] = {"model_name": "TransformerBlock",
                               "num_heads": 2, "mlp_size": 24}
    params["training"].update(batch_size=2, lr=LR, lr_warmup=True,
                              warmup_steps=WARMUP, scheduler="cosine_annealing",
                              scheduler_steps=T_MAX, gradient_clipping=True,
                              clipping_max_value=CLIP)
    # reassociation-free decode for strict gradient parity (the fused fast
    # paths are gradient-exactness-tested separately, tests/test_fast_decode)
    params.setdefault("tpu", {}).update(fast_decode=False)
    exp.save_params(params)
    return exp


@pytest.fixture(scope="module")
def ref():
    return refpar.ref.__wrapped__()  # reuse the module's fixture body


# ----------------------------------------------------------------- SAVi trainer
def test_savi_train_step_matches_torch_reference(ref, rng, tmp_path):
    """One-to-one A/B of STEPS iterations of stage-1 training: the real
    reference SAVi stepped exactly as 02_train_savi.py:29-75 +
    baseTrainer.py:224-237 (MSE on clamped recons -> backward ->
    clip_grad_norm_(0.05) -> Adam step, warmup/cosine LR applied before each
    iteration) vs our DecompTrainer's jitted train_step from
    importer-converted identical weights on the identical batch."""
    exp = _savi_parity_exp(tmp_path)
    torch_model = refpar._torch_savi(ref, exp.params)  # seeded, eval(), no dropout
    sd0 = _sd_copy(torch_model)
    mp = exp.params["model"]["model_params"]
    init_params = convert_savi(sd0, mp)["params"]
    init_np = _np_tree(init_params)

    b, t, hw = 2, 4, 32
    videos = rng.uniform(0.0, 1.0, size=(b, t, 3, hw, hw)).astype(np.float32)
    vt = torch.from_numpy(videos)
    videos_nhwc = videos.transpose(0, 1, 3, 4, 2)

    # ---- torch: the reference training step, STEPS times on the same batch
    opt = torch.optim.Adam(torch_model.parameters(), lr=LR)
    step_lr = _ref_lr_stack(opt)
    mse = torch.nn.MSELoss()  # lib/loss.py:150-169 MSELoss == nn.MSELoss
    torch_losses, torch_gnorms = [], []
    for i in range(STEPS):
        step_lr(i)
        out = torch_model(mode="decomp", x=vt, num_imgs=t)
        loss = mse(out["recons_imgs"].clamp(0, 1), vt.clamp(0, 1))
        opt.zero_grad()
        loss.backward()
        gnorm = torch.nn.utils.clip_grad_norm_(torch_model.parameters(), CLIP)
        opt.step()
        torch_losses.append(float(loss))
        torch_gnorms.append(float(gnorm))
    torch_final = convert_savi(_sd_copy(torch_model), mp)["params"]

    # ---- ours: the real DecompTrainer jitted step from the converted weights
    from textocvp_tpu.train.trainer import DecompTrainer

    trainer = DecompTrainer(exp.exp_path)
    trainer.setup_model(videos_nhwc)
    params = jax.tree_util.tree_map(jnp.asarray, init_params)
    opt_state = trainer.tx.init(params)
    bs = trainer.batch_stats
    v = jnp.asarray(videos_nhwc)

    # diagnostic: the pre-clip global gradient norm at step 0 must match
    # torch's clip_grad_norm_ return value (and actually EXERCISE the clip)
    def loss_of(p):
        out = trainer.model.apply({"params": p}, v, train=True,
                                  rngs={"slots": jax.random.PRNGKey(0)})
        return trainer.loss_fn(**trainer._loss_tensors(out, v))[0]

    gnorm0 = float(optax.global_norm(jax.grad(loss_of)(params)))
    assert gnorm0 > CLIP, "gradient clipping inactive — weak test setup"
    np.testing.assert_allclose(gnorm0, torch_gnorms[0], rtol=1e-4)

    our_losses = []
    for i in range(STEPS):
        params, bs, opt_state, values = trainer.train_step(
            params, bs, opt_state, v, jax.random.PRNGKey(i))
        our_losses.append(float(values["_total"]))

    # the loss trajectory integrates every piece of the chain: forward,
    # gradient, clip, Adam update, and the per-iteration LR sequence.
    # Steps 0-1 match at ~2e-7 (and are EQUAL to each other — the first
    # update runs at warmup lr=0); later steps drift to ~4e-5 relative as
    # fp32 rounding feeds through Adam's sign-like first-step directions.
    # A semantic error (wrong lr/clip/schedule) shows at >=1e-3.
    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-4, atol=1e-7)
    _assert_update_parity(_np_tree(params), init_np, torch_final, init_np,
                          halved=("gru/ir/bias", "gru/iz/bias"))


# ------------------------------------------------------------ predictor trainer
def test_predictor_train_step_matches_torch_reference(ref, rng, tmp_path):
    """Stage-2 A/B (reference 04_train_predictor.py:31-108): frozen decomp
    encode under no_grad -> autoregressive rollout -> decode -> dual
    pred_slot_mse + pred_img_mse -> backward -> clip(PREDICTOR params only)
    -> Adam, warmup/cosine LR — vs our PredictorTrainer's one-program jitted
    step (frozen decomp under stop_gradient) from converted weights."""
    exp = _savi_parity_exp(tmp_path)
    torch_savi = refpar._torch_savi(ref, exp.params)
    mp = exp.params["model"]["model_params"]
    converted_savi = convert_savi(_sd_copy(torch_savi), mp)

    from textocvp_tpu.train.checkpoints import save_checkpoint

    save_checkpoint(exp.models_dir, "checkpoint_epoch_final",
                    {"params": converted_savi["params"], "batch_stats": {},
                     "opt_state": {}, "epoch": 1, "step": 1})

    pred_exp = Experiment.create_predictor(exp.exp_path, "pred_parity",
                                           "VanillaTransformer")
    params_cfg = pred_exp.params
    pp = params_cfg["predictor"]["predictor_params"]
    pp.update(token_dim=16, hidden_dim=32, num_layers=2, n_heads=2,
              residual=True)
    c, p, buffer = 2, 2, 3
    params_cfg["prediction_params"].update(num_context=c, num_preds=p,
                                           teacher_force=False,
                                           input_buffer_size=buffer)
    pred_exp.save_params(params_cfg)

    torch.manual_seed(14)
    predictor = ref.Vanilla(
        num_slots=4, slot_dim=32, input_buffer_size=buffer,
        **{k: v for k, v in pp.items() if k != "predictor_name"})
    torch_wrapper = ref.Wrapper(exp_params=params_cfg, predictor=predictor)
    torch_wrapper.eval()  # dropout off; teacher forcing follows config anyway
    sd0 = _sd_copy(torch_wrapper)
    init_params = convert_predictor(sd0, params_cfg)["params"]
    init_np = _np_tree(init_params)

    b, t, hw, S, D = 2, c + p, 32, 4, 32
    videos = rng.uniform(0.0, 1.0, size=(b, t, 3, hw, hw)).astype(np.float32)
    vt = torch.from_numpy(videos)
    videos_nhwc = videos.transpose(0, 1, 3, 4, 2)

    # ---- torch: the reference predictor training step, STEPS times
    opt = torch.optim.Adam(torch_wrapper.parameters(), lr=LR)
    step_lr = _ref_lr_stack(opt)
    mse = torch.nn.MSELoss()
    cap = torch.ones(b, 5, dtype=torch.long)  # wrapper demands caption_tokens
    torch_losses = []
    for i in range(STEPS):
        step_lr(i)
        with torch.no_grad():
            slot_history = torch_savi(mode="decomp", x=vt,
                                      num_imgs=t)["slot_history"]
        pred_slots = torch_wrapper(slot_history, caption_tokens=cap)
        dec = torch_savi(mode="decode",
                         slots=pred_slots.clone().reshape(b * p, S, D))
        pred_imgs = dec["recons_imgs"].view(b, p, 3, hw, hw)
        loss = (mse(pred_imgs, vt[:, c:c + p])
                + mse(pred_slots, slot_history[:, c:c + p]))
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(torch_wrapper.parameters(), CLIP)
        opt.step()
        torch_losses.append(float(loss))
    torch_final = convert_predictor(_sd_copy(torch_wrapper),
                                    params_cfg)["params"]

    # ---- ours: the real PredictorTrainer one-program jitted step
    from textocvp_tpu.train.predictor_trainer import PredictorTrainer

    trainer = PredictorTrainer(pred_exp.exp_path,
                               decomp_ckpt="checkpoint_epoch_final")
    trainer.setup_model(videos_nhwc)
    params = jax.tree_util.tree_map(jnp.asarray, init_params)
    opt_state = trainer.tx.init(params)
    v = jnp.asarray(videos_nhwc)

    our_losses = []
    for i in range(STEPS):
        params, opt_state, values = trainer.train_step(
            params, opt_state, v, jax.random.PRNGKey(i))
        our_losses.append(float(values["_total"]))

    np.testing.assert_allclose(our_losses, torch_losses, rtol=1e-4, atol=1e-7)
    _assert_update_parity(_np_tree(params), init_np, torch_final, init_np)
