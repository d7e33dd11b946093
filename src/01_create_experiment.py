"""Thin entry point preserving the reference CLI surface; see
textocvp_tpu/cli/create_experiment.py."""
from textocvp_tpu.cli.create_experiment import main

if __name__ == "__main__":
    main()
