#!/bin/bash
# Qualitative prediction figures/GIFs for TextOCVP on CLIPort
# (reference scripts/06_generate_figs_pred_CLIPort.sh: num_preds=19, 10 seqs)
python src/06_generate_figs_predictor.py \
    -d experiments/TextOCVP_CLIPort/ \
    --decomp_ckpt ExtendedDINOSAUR_CLIPort \
    --name_pred_exp TextOCVP \
    --pred_ckpt TextOCVP_CLIPort \
    --num_preds 19 \
    --num_seqs 10
