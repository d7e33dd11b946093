#!/bin/bash
# One-shot artifact bootstrap: fresh machine -> converted checkpoints ->
# parity evaluation (reference download_pretrained.sh:3-6 equivalent, plus the
# torch->JAX conversion and aux-weight export the reference does not need).
#
# Networked default:
#   scripts/bootstrap_artifacts.sh
# downloads the released experiment trees (experiments/TextOCVP_CATER,
# experiments/TextOCVP_CLIPort with SAVi_CATER.pth / TextOCVP_CATER.pth /
# ExtendedDINOSAUR_CLIPort.pth / TextOCVP_CLIPort.pth inside their models/
# dirs), converts every .pth through the production importer
# (src/import_torch_checkpoint.py), exports LPIPS weights + warms the T5
# tokenizer cache, and runs the 05_* parity evals.
#
# Offline / CI:
#   scripts/bootstrap_artifacts.sh --from-local DIR --experiments-root DST \
#       --skip-aux --eval-args "--num_seed 1 --num_preds 2 --batch_size 8"
# consumes a local directory with the same layout (experiment dirs containing
# experiment_params.json + models/*.pth [+ predictors/<name>/...]) instead of
# downloading. tests/test_bootstrap_artifacts.py drives this end-to-end with
# synthetic reference .pth files down to a results.json.
#
# Acceptance: compare the produced results.json against a reference-produced
# one with scripts/compare_results.py (the BASELINE.md 1% criterion).
#
# Flags:
#   --from-local DIR        copy experiment trees from DIR instead of wget
#   --experiments-root DIR  destination root (default: experiments)
#   --skip-aux              skip LPIPS export + tokenizer warmup
#   --skip-eval             stop after conversion
#   --eval-args "..."       extra args for 05_evaluate_predictor (default:
#                           reference script values "--num_seed 1 --num_preds 9")
#   --decomp-eval-args "..."  extra args for 03_evaluate_decomp_model on
#                           decomp-only experiment trees (e.g. "--batch_size 8")
set -euo pipefail

# the reference's release URL (download_pretrained.sh)
DOWNLOAD_URL="https://uni-bonn.sciebo.de/s/UXXOoBY01sceJNF/download"

FROM_LOCAL=""
EXP_ROOT="experiments"
SKIP_AUX=0
SKIP_EVAL=0
EVAL_ARGS="--num_seed 1 --num_preds 9"
DECOMP_EVAL_ARGS=""

while [[ $# -gt 0 ]]; do
    case "$1" in
        --from-local) FROM_LOCAL="$2"; shift 2 ;;
        --experiments-root) EXP_ROOT="$2"; shift 2 ;;
        --skip-aux) SKIP_AUX=1; shift ;;
        --skip-eval) SKIP_EVAL=1; shift ;;
        --eval-args) EVAL_ARGS="$2"; shift 2 ;;
        --decomp-eval-args) DECOMP_EVAL_ARGS="$2"; shift 2 ;;
        *) echo "unknown flag: $1" >&2; exit 2 ;;
    esac
done

say() { echo "[bootstrap] $*"; }

# ---------------------------------------------------------------- 1. acquire
mkdir -p "$EXP_ROOT"
if [[ -n "$FROM_LOCAL" ]]; then
    say "copying experiment trees from $FROM_LOCAL -> $EXP_ROOT"
    cp -r "$FROM_LOCAL"/. "$EXP_ROOT"/
else
    say "downloading released checkpoints (reference download_pretrained.sh)"
    wget -q "$DOWNLOAD_URL" -O /tmp/textocvp_pretrained.zip
    # extract into a temp dir, then move the experiment trees into EXP_ROOT
    # (the release zip has a top-level experiments/ dir; extracting into "."
    # would ignore a non-default --experiments-root)
    unzip_dir=$(mktemp -d)
    unzip -o -q /tmp/textocvp_pretrained.zip -d "$unzip_dir"
    rm -f /tmp/textocvp_pretrained.zip
    if [[ -d "$unzip_dir/experiments" ]]; then
        cp -r "$unzip_dir/experiments"/. "$EXP_ROOT"/
    else
        cp -r "$unzip_dir"/. "$EXP_ROOT"/
    fi
    rm -rf "$unzip_dir"
fi

# ---------------------------------------------------------------- 2. convert
# Decomp ckpts live in <exp>/models/*.pth; predictor ckpts in
# <exp>/predictors/<name>/models/*.pth. The importer CLI resolves the model
# architecture from each experiment's experiment_params.json.
converted=0
while IFS= read -r pth; do
    exp_dir=$(dirname "$(dirname "$pth")")
    case "$pth" in
        */predictors/*) kind="predictor" ;;
        *) kind="decomp" ;;
    esac
    say "import ($kind): $pth"
    python src/import_torch_checkpoint.py -d "$exp_dir" \
        --torch_ckpt "$pth" --kind "$kind"
    converted=$((converted + 1))
done < <(find "$EXP_ROOT" -name "*.pth" | sort)
if [[ $converted -eq 0 ]]; then
    say "ERROR: no .pth checkpoints found under $EXP_ROOT" >&2
    exit 1
fi
say "$converted checkpoint(s) converted"

# ---------------------------------------------------------------- 3. aux
if [[ $SKIP_AUX -eq 0 ]]; then
    say "exporting LPIPS weights -> $EXP_ROOT/lpips_alex.npz"
    if python scripts/export_lpips_weights.py --out "$EXP_ROOT/lpips_alex.npz"; then
        export TEXTOCVP_LPIPS_WEIGHTS="$EXP_ROOT/lpips_alex.npz"
    else
        say "WARNING: LPIPS export failed (no torchvision/lpips weights?);"
        say "         eval will use the deterministic fallback and mark"
        say "         results.json with lpips.comparable=false"
    fi
    say "warming T5 tokenizer cache"
    python - <<'PY' || echo "[bootstrap] WARNING: T5 tokenizer unavailable; CustomTokenizer experiments unaffected, T5 ones will use the hash fallback"
from transformers import T5Tokenizer
T5Tokenizer.from_pretrained("t5-small")
PY
fi

# ---------------------------------------------------------------- 4. evaluate
if [[ $SKIP_EVAL -eq 1 ]]; then
    say "done (eval skipped)"
    exit 0
fi

shopt -s nullglob
for exp_dir in "$EXP_ROOT"/*/; do
    [[ -f "$exp_dir/experiment_params.json" ]] || continue
    decomp_ckpt=""
    for m in "$exp_dir"models/*.msgpack; do
        decomp_ckpt=$(basename "$m" .msgpack)
    done
    [[ -n "$decomp_ckpt" ]] || continue
    found_pred=0
    for pred_dir in "$exp_dir"predictors/*/; do
        [[ -f "$pred_dir/experiment_params.json" ]] || continue
        pred_ckpt=""
        for m in "$pred_dir"models/*.msgpack; do
            pred_ckpt=$(basename "$m" .msgpack)
        done
        [[ -n "$pred_ckpt" ]] || continue
        found_pred=1
        pred_name=$(basename "$pred_dir")
        say "eval predictor: $exp_dir ($pred_name: $decomp_ckpt + $pred_ckpt)"
        # shellcheck disable=SC2086
        python src/05_evaluate_predictor.py -d "$exp_dir" \
            --name_pred_exp "$pred_name" \
            --decomp_ckpt "$decomp_ckpt" --pred_ckpt "$pred_ckpt" \
            $EVAL_ARGS
    done
    if [[ $found_pred -eq 0 ]]; then
        say "eval decomp: $exp_dir ($decomp_ckpt)"
        # shellcheck disable=SC2086
        python src/03_evaluate_decomp_model.py -d "$exp_dir" \
            --decomp_ckpt "$decomp_ckpt" $DECOMP_EVAL_ARGS
    fi
done
say "done"
