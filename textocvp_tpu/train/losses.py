"""
Loss registry and weighted multi-loss combination
(reference src/lib/loss.py: LossTracker + LOSS_DICT).

Each loss spec is ``{"type": name, "weight": w}``; the combined loss is the
weighted sum. All current losses are MSEs routed by keyword, as in the
reference: ``mse`` (image recon), ``pred_img_mse``, ``pred_slot_mse``,
``pred_feature_mse``.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def _mse(a, b):
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse(pred_imgs=None, target_imgs=None, **_):
    return _mse(pred_imgs, target_imgs)


def pred_img_mse(pred_imgs=None, target_imgs=None, **_):
    return _mse(pred_imgs, target_imgs)


def pred_slot_mse(pred_slots=None, target_slots=None, **_):
    return _mse(pred_slots, target_slots)


def pred_feature_mse(preds_feats=None, targets_feats=None, **_):
    return _mse(preds_feats, targets_feats)


LOSS_DICT: dict[str, Callable] = {
    "mse": mse,
    "pred_img_mse": pred_img_mse,
    "pred_slot_mse": pred_slot_mse,
    "pred_feature_mse": pred_feature_mse,
}


def build_loss_fn(loss_specs: list[dict]) -> Callable[..., tuple[jnp.ndarray, dict]]:
    """
    Build ``loss_fn(**tensors) -> (total, {name: value})`` from config specs
    (reference loss.py:12-104). Unknown loss names fail fast, matching the
    reference's defensive factories.
    """
    for spec in loss_specs:
        if spec["type"] not in LOSS_DICT:
            raise NameError(f"Unknown loss {spec['type']!r}. Use one of {list(LOSS_DICT)}")

    def loss_fn(**tensors):
        values = {}
        total = jnp.asarray(0.0, jnp.float32)
        for spec in loss_specs:
            val = LOSS_DICT[spec["type"]](**tensors)
            values[spec["type"]] = val
            total = total + spec.get("weight", 1.0) * val
        values["_total"] = total
        return total, values

    return loss_fn
