"""
LR schedules and optimizer construction as optax transforms
(reference src/lib/schedulers.py and lib/setup_model.py:286-361).

Reference semantics: Adam at base lr, linear warmup over ``warmup_steps``
iterations, then (optionally) cosine annealing to eta_min=1e-7 over
``scheduler_steps`` iterations, stepped per-iteration; global-norm-free
gradient clipping by VALUE range is not used — the reference clips by norm via
``clip_grad_norm_(max_value)`` — so we apply optax.clip_by_global_norm.

The warmup+cosine schedule reproduces the reference's EXECUTED per-iteration
LR sequence elementwise (pinned by tests/test_train_parity.py against the
actual torch LRWarmUp + WarmupVSScehdule + CosineAnnealingLR stack,
reference lib/schedulers.py:68-157 + baseTrainer.py:226-231), including its
off-by-one quirks:

* warmup writes ``lr * iter/warmup_steps`` directly into the optimizer for
  iterations 0..warmup_steps (the FIRST update runs at lr=0);
* the iteration after warmup ends only DEACTIVATES the warmup object
  (schedulers.py:96-101) — the LR holds at base lr and the cosine
  scheduler's first ``step()`` happens one iteration later, so the cosine
  phase at iteration i uses index ``i - warmup_steps - 1``;
* with warmup disabled the reference builds ``LRWarmUp(warmup_steps=-1)``,
  which deactivates at iteration 0 WITHOUT the hold (setup_model.py:358-361),
  so the cosine index is simply ``i``.

One deliberate deviation: past ``scheduler_steps``, torch's CosineAnnealingLR
is periodic (the LR climbs back toward base lr); we clamp at ``eta_min`` —
annealing to a floor is the config's intent (CONFIG.py:62 "cosine annealing
to 1e-7 over 1e6 steps"), the climb-back is a torch artifact. The parity test
asserts this divergence explicitly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax

ETA_MIN = 1e-7


def build_lr_schedule(training_params: dict) -> optax.Schedule:
    lr = training_params["lr"]
    warmup_steps = int(training_params.get("warmup_steps", 0)) \
        if training_params.get("lr_warmup", False) else 0
    scheduler = training_params.get("scheduler", "")
    scheduler_steps = int(training_params.get("scheduler_steps", 1e6))

    if scheduler in ("cosine_annealing", "cosine"):
        ws, t_max = warmup_steps, scheduler_steps

        def _cos(t):
            frac = jnp.clip(t, 0.0, t_max) / t_max
            return ETA_MIN + (lr - ETA_MIN) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

        def schedule(count):
            c = jnp.asarray(count, jnp.float32)
            if ws > 0:
                return jnp.where(c <= ws, lr * c / ws, _cos(c - ws - 1.0))
            return _cos(c)

        return schedule
    elif scheduler in ("", "none", None, "constant"):
        main = optax.constant_schedule(lr)
    elif scheduler == "exponential":
        main = optax.exponential_decay(
            init_value=lr,
            transition_steps=int(training_params.get("scheduler_steps", 10000)),
            decay_rate=training_params.get("lr_factor", 0.5),
        )
    else:
        raise NameError(f"Unknown scheduler {scheduler!r}")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, lr, transition_steps=warmup_steps)
        return optax.join_schedules([warmup, main], [warmup_steps])
    return main


def build_optimizer(training_params: dict,
                    freeze_mask=None) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Adam + clipping + schedule; optionally zeroes updates for frozen
    subtrees (e.g. the DINOv2 backbone) via a boolean pytree mask."""
    schedule = build_lr_schedule(training_params)
    chain = []
    if training_params.get("gradient_clipping", False):
        chain.append(optax.clip_by_global_norm(training_params["clipping_max_value"]))
    chain.append(optax.scale_by_adam())
    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if freeze_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            freeze_mask,
        )
    return tx, schedule
