"""Thin entry point preserving the reference CLI surface; see
textocvp_tpu/cli/create_predictor_experiment.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textocvp_tpu.cli.create_predictor_experiment import main

if __name__ == "__main__":
    main()
