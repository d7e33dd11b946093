#!/bin/bash
# Trained-model int8 ENCODE quality delta on the ExtendedDINOSAUR path
# (tpu.encode_quant): train a synthetic ExtendedDINOSAUR on a frozen random
# ViT, evaluate with and without the int8 frozen-ViT encode, and report the
# PSNR/SSIM/LPIPS deltas PLUS the slot drift and the feature-recon MSE
# against the bf16 encoder's features — the encode-specific stake, since
# int8 here perturbs the slots that condition EVERYTHING downstream.
#
# Uses the NO-layerscale DINO config (vit_small_patch16_224_dino): with
# DINOv2's layerscale the frozen-random gammas stay at their 1e-5 init and
# suppress the block outputs entirely, which would trivially (and
# misleadingly) hide the quantization error.
#
#   scripts/dinosaur_int8_encode_delta.sh [WORKDIR]
#
# Env overrides: DELTA_EPOCHS (default 40), DELTA_SEQS (default 64).
set -euo pipefail

WORK="${1:-$(mktemp -d)}"
EPOCHS="${DELTA_EPOCHS:-40}"
SEQS="${DELTA_SEQS:-64}"
export TEXTOCVP_EXPERIMENTS="$WORK"
say() { echo "[int8-enc-delta] $*"; }

say "experiments root: $WORK"

python src/01_create_experiment.py -d d1 --model_name ExtendedDINOSAUR \
    --dataset_name Synthetic
python - "$WORK/d1/experiment_params.json" "$EPOCHS" "$SEQS" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
mp = p["model"]["model_params"]
# 64px / patch 16 -> 4x4 = 16 patches; ViT-small 384-dim, NO layerscale
mp.update(img_size=64, num_slots=5, slot_dim=64, mlp_hidden=64,
          mlp_encoder_dim=384)
mp["encoder"] = {"encoder_name": "vit_small_patch16_224_dino",
                 "encoder_params": {"encoder_num_blocks": 2}}
mp["decoder"]["decoder_params"].update(
    num_patches=16, in_dim=64, hidden_dim=256, out_dim=385, num_layers=3,
    patch_size=16, num_layers_cnn=4, reconstruct_images=True)
mp["transition_module"] = {"model_name": "TransformerBlock", "num_heads": 2,
                           "mlp_size": 64}
p["dataset"].update(img_size=[64, 64], num_train_seqs=int(sys.argv[3]),
                    tokenizer="CustomTokenizer")
p["training"].update(num_epochs=int(sys.argv[2]), batch_size=16,
                     save_frequency=1000, log_frequency=50)
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY

say "training ExtendedDINOSAUR ($EPOCHS epochs)"
python src/02_train_decomp.py -d d1

say "evaluating: bf16 encode"
python src/03_evaluate_decomp_model.py -d d1 \
    --decomp_ckpt checkpoint_epoch_final --batch_size 16 --results_name bf16

say "evaluating: int8 encode"
python - "$WORK/d1/experiment_params.json" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
p.setdefault("tpu", {})["encode_quant"] = "int8"
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY
python src/03_evaluate_decomp_model.py -d d1 \
    --decomp_ckpt checkpoint_epoch_final --batch_size 16 --results_name int8

say "slot drift + feature-recon MSE vs the bf16 encoder's features"
python - "$WORK/d1" <<'PY'
import json, pathlib, sys

import jax
import jax.numpy as jnp
import numpy as np

from textocvp_tpu.core.experiment import Experiment
from textocvp_tpu.data import load_data
from textocvp_tpu.models import setup_model
from textocvp_tpu.models.quant import calibrate_encode_scales
from textocvp_tpu.train.checkpoints import checkpoint_path, load_checkpoint

exp = Experiment(pathlib.Path(sys.argv[1]))
params = exp.params
params.get("tpu", {}).pop("encode_quant", None)  # build the plain model
model = setup_model(params)
restored = load_checkpoint(
    checkpoint_path(exp.models_dir, "checkpoint_epoch_final"))
variables = {"params": restored["params"]}
if restored.get("batch_stats"):
    variables["batch_stats"] = restored["batch_stats"]

test_ds = load_data(params, split="test")
videos = jnp.asarray(np.stack([np.asarray(test_ds[i][0]) for i in range(16)]))

scales = jnp.asarray(calibrate_encode_scales(model, variables, videos[:1, :2]))

def run(es):
    ekw = {} if es is None else {"encode_quant_scales": es}
    return jax.jit(lambda mv, x: model.apply(
        mv, x, decode=True, train=False,
        rngs={"slots": jax.random.PRNGKey(0)}, **ekw))(variables, videos)

ref = run(None)
q = run(scales)

sl_a = np.asarray(ref["slot_history"], np.float32)
sl_b = np.asarray(q["slot_history"], np.float32)
drift = np.abs(sl_a - sl_b)
print(f"[int8-enc-delta] slot drift: max {drift.max():.5f} "
      f"mean {drift.mean():.6f} (slot scale {np.abs(sl_a).max():.3f})")

# feature-recon MSE, both arms against the BF16 encoder's features (the
# ground-truth reference target)
tf = np.asarray(ref["encoded_img_feats"], np.float32).reshape(-1)
mses = {}
for name, out in (("bf16", ref), ("int8", q)):
    rf = np.asarray(out["recons_feats"], np.float32).reshape(-1)
    mses[name] = float(np.mean((rf - tf) ** 2))
rel = 100.0 * (mses["int8"] - mses["bf16"]) / mses["bf16"]
print(f"[int8-enc-delta] feature-recon MSE vs bf16 targets: "
      f"bf16 {mses['bf16']:.6f}  int8 {mses['int8']:.6f}  delta {rel:+.3f}%")

root = exp.exp_path / "results"
def mean(name):
    f = next((root / name).glob("results.json"))
    return {k: v["mean"] for k, v in json.load(open(f)).items()
            if isinstance(v, dict)}
u, qq = mean("bf16"), mean("int8")
print("[int8-enc-delta] metric     bf16        int8        delta")
for m in ("psnr", "ssim", "lpips"):
    d = 100.0 * (qq[m] - u[m]) / u[m] if u[m] else 0.0
    print(f"[int8-enc-delta] {m:<9} {u[m]:<11.5f} {qq[m]:<11.5f} {d:+.3f}%")
PY
say "done"
