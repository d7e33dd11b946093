#!/bin/bash
python src/04_train_predictor.py \
    -d experiments/TextOCVP_CATER/ \
    --name_pred_exp TextOCVP \
    --decomp_ckpt SAVi_CATER
