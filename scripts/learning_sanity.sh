#!/bin/bash
# End-to-end LEARNING sanity on the synthetic bouncing-balls dataset, driven
# through the real CLI surface: stage-1 SAVi training, stage-2 TextOCVP
# predictor training on the frozen decomp model, and a prediction eval whose
# PSNR must beat an untrained-predictor baseline. This is the "does the full
# two-stage pipeline actually optimize" check (the reference's equivalent is
# watching TB curves; SURVEY.md §4) — run it on TPU or CPU.
#
#   scripts/learning_sanity.sh [WORKDIR]
#
# Env overrides: SANITY_EPOCHS1 (default 40), SANITY_EPOCHS2 (default 60),
# SANITY_SEQS (train sequences, default 64 from Synthetic.json — raise for
# longer runs so extra epochs see fresh data instead of memorizing),
# SANITY_ACCUM (training.accum_steps for both stages, default 1).
# Takes ~15 min on the tunneled v5e (mostly compiles; the persistent compile
# cache makes reruns much faster), ~40 min on a 1-core CPU host.
set -euo pipefail

WORK="${1:-$(mktemp -d)}"
EPOCHS1="${SANITY_EPOCHS1:-40}"
EPOCHS2="${SANITY_EPOCHS2:-60}"
SEQS="${SANITY_SEQS:-64}"
ACCUM="${SANITY_ACCUM:-1}"
export TEXTOCVP_EXPERIMENTS="$WORK"
say() { echo "[sanity] $*"; }

say "experiments root: $WORK"

# ---------------------------------------------------------------- stage 1
python src/01_create_experiment.py -d s1 --model_name SAVi --dataset_name Synthetic
python - "$WORK/s1/experiment_params.json" "$EPOCHS1" "$SEQS" "$ACCUM" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
mp = p["model"]["model_params"]
mp.update(num_slots=5, slot_dim=64, mlp_hidden=64, mlp_encoder_dim=64)
mp["encoder"]["encoder_params"]["num_channels"] = [32, 32, 32]
mp["decoder"]["decoder_params"]["num_channels"] = [32, 32, 32]
p["dataset"]["num_train_seqs"] = int(sys.argv[3])
p["training"].update(num_epochs=int(sys.argv[2]), batch_size=16,
                     accum_steps=int(sys.argv[4]),
                     save_frequency=1000, log_frequency=50)
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY
say "training SAVi ($EPOCHS1 epochs)"
python src/02_train_decomp.py -d s1

say "evaluating decomposition"
python src/03_evaluate_decomp_model.py -d s1 --decomp_ckpt checkpoint_epoch_final --batch_size 16

# ---------------------------------------------------------------- stage 2
python src/01_create_predictor_experiment.py -d s1 --name_pred_exp p1 \
    --predictor_name TextOCVP_CustomTF
python - "$WORK/s1/predictors/p1/experiment_params.json" "$EPOCHS2" "$SEQS" "$ACCUM" <<'PY'
import json, sys
p = json.load(open(sys.argv[1]))
pp = p["predictor"]["predictor_params"]
pp["predictor_params"].update(token_dim=64, n_heads=4, hidden_dim=128, num_layers=2)
pp["fusion_params"].update(num_heads=4, head_dim=16, mlp_size=128)
pp["text_encoder_params"].update(input_dim=32, num_layers=1, num_heads=2)
p["prediction_params"].update(num_context=2, num_preds=6, input_buffer_size=4)
p["dataset"]["num_train_seqs"] = int(sys.argv[3])
p["training"].update(num_epochs=int(sys.argv[2]), batch_size=16,
                     accum_steps=int(sys.argv[4]),
                     save_frequency=1000, log_frequency=50)
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY

# untrained-predictor baseline: evaluate the epoch-0 random-init ckpt.
# 04_train_predictor saves checkpoint_last_saved each epoch; to get a true
# "before training" number, train 0 epochs first to materialize the init.
say "materializing untrained predictor ckpt"
python - "$WORK/s1/predictors/p1/experiment_params.json" <<'PY'
import json, sys
p = json.load(open(sys.argv[1])); p["training"]["num_epochs"] = 0
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY
python src/04_train_predictor.py -d s1 --name_pred_exp p1 --decomp_ckpt checkpoint_epoch_final
mv "$WORK/s1/predictors/p1/models/checkpoint_epoch_final.msgpack" \
   "$WORK/s1/predictors/p1/models/untrained.msgpack"

say "training predictor ($EPOCHS2 epochs)"
python - "$WORK/s1/predictors/p1/experiment_params.json" "$EPOCHS2" <<'PY'
import json, sys
p = json.load(open(sys.argv[1])); p["training"]["num_epochs"] = int(sys.argv[2])
json.dump(p, open(sys.argv[1], "w"), indent=2)
PY
python src/04_train_predictor.py -d s1 --name_pred_exp p1 --decomp_ckpt checkpoint_epoch_final

say "evaluating predictions: untrained vs trained"
python src/05_evaluate_predictor.py -d s1 --name_pred_exp p1 \
    --decomp_ckpt checkpoint_epoch_final --pred_ckpt untrained \
    --num_seed 2 --num_preds 6 --batch_size 16 --results_name untrained
python src/05_evaluate_predictor.py -d s1 --name_pred_exp p1 \
    --decomp_ckpt checkpoint_epoch_final --pred_ckpt checkpoint_epoch_final \
    --num_seed 2 --num_preds 6 --batch_size 16 --results_name trained

python - "$WORK/s1/predictors/p1" <<'PY'
import json, pathlib, sys
root = pathlib.Path(sys.argv[1]) / "results"
def mean(name):
    f = next((root / name).glob("results.json"))
    return {k: v["mean"] for k, v in json.load(open(f)).items() if isinstance(v, dict)}
u, t = mean("untrained"), mean("trained")
print(f"[sanity] untrained: {u}")
print(f"[sanity] trained:   {t}")
assert t["psnr"] > u["psnr"] + 1.0, \
    f"stage-2 training did not improve prediction PSNR ({u['psnr']} -> {t['psnr']})"
print(f"[sanity] PASS: prediction PSNR {u['psnr']:.2f} -> {t['psnr']:.2f}")
PY
say "done"
