"""Thin entry point preserving the reference CLI surface; see
textocvp_tpu/cli/generate_figs_predictor.py."""
from textocvp_tpu.cli.generate_figs_predictor import main

if __name__ == "__main__":
    main()
