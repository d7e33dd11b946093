from textocvp_tpu.models.factory import setup_model, setup_predictor
from textocvp_tpu.models.savi import SAVi
from textocvp_tpu.models.extended_dinosaur import ExtendedDINOSAUR
