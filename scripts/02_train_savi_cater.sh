#!/bin/bash
# Train SAVi decomposition on CATER (create the experiment first with
# src/01_create_experiment.py -d experiments/TextOCVP_CATER --model_name SAVi --dataset_name CATER_Easy)
python src/02_train_decomp.py -d experiments/TextOCVP_CATER/
