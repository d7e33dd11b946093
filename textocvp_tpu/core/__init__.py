from textocvp_tpu.core.config import (
    DEFAULTS,
    get_available_configs,
    get_dataset_config,
    get_model_config,
    get_predictor_config,
)
from textocvp_tpu.core.experiment import Experiment
