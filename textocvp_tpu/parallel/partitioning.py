"""
Tensor-parallel partitioning for the transformer predictors.

The TextOCVP predictor carries the large matmuls (token_dim 512, MLP hidden
2048, 8 layers). For multi-chip serving beyond data parallelism, its weight
matrices shard over the mesh's ``model`` axis in the standard Megatron
pattern:

* attention q/k/v kernels: shard the OUTPUT (head) dim   -> P(None, "model")
* attention out kernel:    shard the INPUT dim           -> P("model", None)
* MLP first dense:         shard the OUTPUT (hidden) dim -> P(None, "model")
* MLP second dense:        shard the INPUT (hidden) dim  -> P("model", None)

With inputs/activations replicated per data shard, XLA inserts the single
all-reduce per block that the column->row split requires. Everything else
(LayerNorms, embeddings, small decomposition model params) stays replicated.

These specs are applied post-hoc to a parameter pytree (no model-code changes),
so the same checkpoint works for any mesh shape.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_COL_KERNELS = ("q", "k", "v")           # shard output dim
_ROW_KERNELS = ("out", "o")              # shard input dim ("o" = T5 out proj)
_COL_DENSE = ("Dense_0", "linear1", "wi")  # MLP up-projection (wi = T5 FF)
_ROW_DENSE = ("Dense_1", "linear2", "wo")  # MLP down-projection

# ViT encoder blocks (nn/vit.py ViTBlock): the DINOSAUR-path encode compute.
# qkv keeps timm's fused [q;k;v] output layout, so column-sharding it costs a
# reshard at the head reshape; fc1/fc2 form the classic one-all-reduce
# Megatron pair over the 3072-wide MLP (2/3 of the block FLOPs), proj
# row-shards against its replicated attention output.
_VIT_COL = ("qkv", "fc1")
_VIT_ROW = ("proj", "fc2")


def _spec_for_path(path: tuple[str, ...], ndim: int, model_axis: str) -> P:
    """PartitionSpec for one parameter given its tree path."""
    if ndim != 2:
        return P()  # biases, norms, embeddings: replicated
    name = path[-2] if len(path) >= 2 and path[-1] in ("kernel",) else None
    if path[-1] != "kernel" or name is None:
        return P()
    parent = path[-3] if len(path) >= 3 else ""
    if name in _COL_KERNELS and parent in ("attn", "cross_attn", "self_attn"):
        return P(None, model_axis)
    if name in _ROW_KERNELS and parent in ("attn", "cross_attn", "self_attn"):
        return P(model_axis, None)
    if name in _COL_DENSE and parent in ("mlp",):
        return P(None, model_axis)
    if name in _ROW_DENSE and parent in ("mlp",):
        return P(model_axis, None)
    if name in ("linear1", "wi"):
        return P(None, model_axis)
    if name in ("linear2", "wo"):
        return P(model_axis, None)
    if parent.startswith("block_"):
        if name in _VIT_COL:
            return P(None, model_axis)
        if name in _VIT_ROW:
            return P(model_axis, None)
    # MLPPatchDecoder (nn/decoders.py): mlp_0..mlp_{n-1} with a nonlinearity
    # between every pair, so alternate column/row — even layers shard the
    # output (hidden stays sharded through the elementwise ReLU), odd layers
    # contract the sharded dim and all-reduce
    if parent == "patch_decoder" and name.startswith("mlp_"):
        try:
            idx = int(name.split("_", 1)[1])
        except ValueError:
            return P()
        return P(None, model_axis) if idx % 2 == 0 else P(model_axis, None)
    return P()


def predictor_param_specs(params: Any, model_axis: str = "model") -> Any:
    """PartitionSpec pytree for a predictor parameter tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for path, leaf in flat:
        keys = tuple(k.key for k in path)
        put(specs, keys, _spec_for_path(keys, leaf.ndim, model_axis))
    return specs


def _divisible(spec: P, shape: tuple[int, ...], axis_size: int) -> bool:
    for dim, name in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if name is not None and dim % axis_size != 0:
            return False
    return True


def decomp_tp_enabled(exp_params: dict) -> bool:
    """Whether the decomposition model is worth tensor-parallelizing.

    Only the ViT-encoder (ExtendedDINOSAUR) path carries TP-scale matmuls
    (ViT-B blocks at 577 patches, patch-decoder MLP at hidden 1024). SAVi's
    128-wide kernels would pay an all-reduce per recurrence step for no
    meaningful FLOP spread, so SAVi stays replicated under TP meshes."""
    enc = (exp_params.get("model", {}).get("model_params", {})
           .get("encoder", {})) or {}
    return "vit" in str(enc.get("encoder_name", "")).lower()


def shard_decomp_variables(variables: dict, mesh: Mesh,
                           model_axis: str = "model") -> dict:
    """TP placement for a decomposition model's variables: the params subtree
    gets the Megatron specs (ViT blocks + patch-decoder MLP), batch_stats and
    any other collections replicate. Call-gated by :func:`decomp_tp_enabled`."""
    out = {}
    for k, v in variables.items():
        if k == "params":
            out[k] = shard_predictor_params(v, mesh, model_axis)
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
    return out


def shard_predictor_params(params: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """Device-put predictor params with TP sharding over the model axis.
    Parameters whose dims don't divide the axis stay replicated."""
    specs = predictor_param_specs(params, model_axis)
    axis_size = mesh.shape[model_axis]

    def place(leaf, spec):
        if axis_size > 1 and _divisible(spec, leaf.shape, axis_size):
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, params, specs)
