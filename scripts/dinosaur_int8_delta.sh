#!/bin/bash
# Trained-model int8 decode quality delta on the ExtendedDINOSAUR path
# (VERDICT r3 weak #3): train a synthetic ExtendedDINOSAUR (frozen random
# tiny DINOv2-style ViT — the int8 knob touches only the DECODER, so a
# trained patch-MLP + CNN head is what the delta needs), evaluate with and
# without `tpu.decode_quant: int8`, and report the PSNR/SSIM/LPIPS deltas
# PLUS the feature-reconstruction MSE delta — the DINOSAUR-specific stake,
# since int8 also quantizes the patch-MLP whose feature output is the
# model's training target (reference ExtendedDINOSAUR.py:105-111).
#
#   scripts/dinosaur_int8_delta.sh [WORKDIR]
#
# Env overrides: DELTA_EPOCHS (default 40), DELTA_SEQS (default 64).
# ~20 min on the tunneled v5e (mostly compiles), CPU-runnable but slow.
set -euo pipefail

WORK="${1:-$(mktemp -d)}"
EPOCHS="${DELTA_EPOCHS:-40}"
SEQS="${DELTA_SEQS:-64}"
export TEXTOCVP_EXPERIMENTS="$WORK"
say() { echo "[int8-delta] $*"; }

say "experiments root: $WORK"

python src/01_create_experiment.py -d d1 --model_name ExtendedDINOSAUR \
    --dataset_name Synthetic
python - "$WORK/d1/experiment_params.json" "$EPOCHS" "$SEQS" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
mp = p["model"]["model_params"]
# 56px / patch 14 -> 4x4 = 16 patches; ViT-small feature dim 384 stays real
# so the patch-MLP's output distribution (the int8-sensitive part) is
# representative; 2 frozen random ViT blocks keep the encode cheap.
mp.update(img_size=56, num_slots=5, slot_dim=64, mlp_hidden=64,
          mlp_encoder_dim=384)
mp["encoder"] = {"encoder_name": "vit_small_patch14_dinov2",
                 "encoder_params": {"encoder_num_blocks": 2}}
mp["decoder"]["decoder_params"].update(
    num_patches=16, in_dim=64, hidden_dim=256, out_dim=385, num_layers=3,
    patch_size=14, num_layers_cnn=4, reconstruct_images=True)
mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                           "mlp_size": 64}
p["dataset"].update(img_size=[56, 56], num_train_seqs=int(sys.argv[3]),
                    tokenizer="CustomTokenizer")
p["training"].update(num_epochs=int(sys.argv[2]), batch_size=16,
                     save_frequency=1000, log_frequency=50)
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY

say "training ExtendedDINOSAUR ($EPOCHS epochs)"
python src/02_train_decomp.py -d d1

say "evaluating: bf16 decode"
python src/03_evaluate_decomp_model.py -d d1 \
    --decomp_ckpt checkpoint_epoch_final --batch_size 16 --results_name bf16

say "evaluating: int8 decode"
python - "$WORK/d1/experiment_params.json" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
p.setdefault("tpu", {})["decode_quant"] = "int8"
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY
python src/03_evaluate_decomp_model.py -d d1 \
    --decomp_ckpt checkpoint_epoch_final --batch_size 16 --results_name int8

say "feature-reconstruction MSE: bf16 vs int8 patch-MLP"
python - "$WORK/d1" <<'PY'
import json, pathlib, sys

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.data import load_data
from textocvp_tpu.models import setup_model
from textocvp_tpu.models.quant import calibrate_decode_scales
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint

exp = Experiment(pathlib.Path(sys.argv[1]))
params = exp.params
params.get("tpu", {}).pop("decode_quant", None)  # build the plain model
model = setup_model(params)
restored = load_checkpoint(
    checkpoint_path(exp.models_dir, "checkpoint_epoch_final"))
variables = {"params": restored["params"]}
if restored.get("batch_stats"):
    variables["batch_stats"] = restored["batch_stats"]

test_ds = load_data(params, split="test")
videos = np.stack([np.asarray(test_ds[i][0]) for i in range(16)])

out = jax.jit(lambda mv, x: model.apply(
    mv, x, decode=False, train=False, rngs={"slots": jax.random.PRNGKey(0)})
)(variables, jnp.asarray(videos))
target_feats = out["encoded_img_feats"]
b, t, s, d = out["slot_history"].shape
slots = out["slot_history"].reshape(b * t, s, d)

scales = jnp.asarray(calibrate_decode_scales(model, variables, slots))
dec_bf16 = jax.jit(lambda mv, sl: model.apply(mv, sl, method="decode")
                   )(variables, slots)
dec_int8 = jax.jit(lambda mv, sl: model.apply(
    mv, sl, method="decode", quant_scales=scales))(variables, slots)

tf = np.asarray(target_feats, np.float32).reshape(b * t, -1)
mses = {}
for name, dec in (("bf16", dec_bf16), ("int8", dec_int8)):
    rf = np.asarray(dec["recons_feats"], np.float32).reshape(b * t, -1)
    mses[name] = float(np.mean((rf - tf) ** 2))
rel = 100.0 * (mses["int8"] - mses["bf16"]) / mses["bf16"]
print(f"[int8-delta] feature-recon MSE: bf16 {mses['bf16']:.6f}  "
      f"int8 {mses['int8']:.6f}  delta {rel:+.3f}%")

root = exp.exp_path / "results"
def mean(name):
    f = next((root / name).glob("results.json"))
    return {k: v["mean"] for k, v in json.load(open(f)).items()
            if isinstance(v, dict)}
u, q = mean("bf16"), mean("int8")
print("[int8-delta] metric     bf16        int8        delta")
for m in ("psnr", "ssim", "lpips"):
    d = 100.0 * (q[m] - u[m]) / u[m] if u[m] else 0.0
    print(f"[int8-delta] {m:<9} {u[m]:<11.5f} {q[m]:<11.5f} {d:+.3f}%")
print(f"[int8-delta] feat_mse  {mses['bf16']:<11.6f} {mses['int8']:<11.6f} "
      f"{rel:+.3f}%")
PY
say "done"
