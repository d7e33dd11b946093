"""Thin entry point: convert a reference PyTorch .pth checkpoint into this
framework's msgpack format (no reference equivalent — the reference ships
torch checkpoints directly). See textocvp_tpu/cli/import_torch_checkpoint.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from textocvp_tpu.cli.import_torch_checkpoint import main

if __name__ == "__main__":
    main()
