"""Thin entry point preserving the reference CLI surface; see
textocvp_tpu/cli/evaluate_decomp.py."""
from textocvp_tpu.cli.evaluate_decomp import main

if __name__ == "__main__":
    main()
