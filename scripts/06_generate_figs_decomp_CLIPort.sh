#!/bin/bash
# Qualitative figures for the CLIPort ExtendedDINOSAUR decomposition model
# (reference scripts/06_generate_figs_decomp_CLIPort.sh)
python src/06_generate_figs_decomp_model.py \
    -d experiments/TextOCVP_CLIPort/ \
    --decomp_ckpt ExtendedDINOSAUR_CLIPort \
    --num_seqs 10
