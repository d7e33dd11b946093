#!/bin/bash
python src/06_generate_figs_predictor.py \
    -d experiments/TextOCVP_CATER/ \
    --decomp_ckpt SAVi_CATER \
    --name_pred_exp TextOCVP \
    --pred_ckpt TextOCVP_CATER \
    --num_preds 19 \
    --num_seqs 10
