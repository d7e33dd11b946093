#!/bin/bash
# Qualitative figures for the CATER SAVi decomposition model
# (reference scripts/06_generate_figs_decomp_CATER.sh; ckpt imported via
# cli/import_torch_checkpoint.py drops the .pth suffix)
python src/06_generate_figs_decomp_model.py \
    -d experiments/TextOCVP_CATER/ \
    --decomp_ckpt SAVi_CATER \
    --num_seqs 10
