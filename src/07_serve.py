"""Thin entry point: HTTP serving of a trained predictor (TPU-native
deployment path; no reference equivalent). See textocvp_tpu/cli/serve.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textocvp_tpu.cli.serve import main

if __name__ == "__main__":
    main()
