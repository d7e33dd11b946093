"""
REAL multi-process distributed run (not simulated): two OS processes join a
``jax.distributed`` cluster over a localhost coordinator, each owning 2
virtual CPU devices, and run the actual DecompTrainer loop on the hybrid
(dcn, data, model) mesh — per-process input sharding, cross-process gradient
all-reduce over Gloo, process-0-gated side outputs (checkpoints, TensorBoard,
logs.txt, model_architecture.txt).

This upgrades the multi-host story from "single-process mesh that LOOKS like
multi-host" (tests/test_parallel.py, dryrun) to the genuine article: separate
address spaces, real collectives between them, and a shared filesystem that
only one process may write.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid: int, port: int, exp_root: Path) -> subprocess.Popen:
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        TEXTOCVP_COORDINATOR=f"127.0.0.1:{port}",
        TEXTOCVP_NUM_PROCESSES="2",
        TEXTOCVP_PROCESS_ID=str(pid),
    )
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/textocvp_jax_cache"))
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "mp_worker.py"), str(exp_root)],
        env=env, cwd=str(REPO),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)


def test_two_process_training_run(tmp_path):
    port = _free_port()
    procs = [_spawn(pid, port, tmp_path) for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MPRESULT "):
                r = json.loads(line[len("MPRESULT "):])
                results[r["pid"]] = r
    assert sorted(results) == [0, 1], f"missing MPRESULT lines:\n{outs}"

    # the replicated params must be bit-identical across processes: gradients
    # are global all-reduces, so any divergence means a process computed on
    # its own shard without synchronizing
    assert results[0]["checksum"] == results[1]["checksum"]

    # side outputs: process 0 owns TensorBoard, process 1 must have gated it
    assert results[0]["writer_none"] is False
    assert results[1]["writer_none"] is True

    # both processes resumed the ckpt that (only) process 0 wrote
    assert results[0]["ckpt_epoch"] == 2
    assert results[1]["ckpt_epoch"] == 2

    # evaluator leg: identical aggregate metrics on every process (the (B, F)
    # metric values are replicated, so a divergence means a process evaluated
    # only its local input shard without the global batch assembly)
    assert results[0]["psnr_mean"] == results[1]["psnr_mean"]
    assert results[0]["psnr_mean"] > 0.0

    # cross-process-sharded checkpoint: the gather collective completed on
    # both processes and the file process 0 wrote holds the FULL array
    assert results[0]["gather_ok"] is True
    assert results[1]["gather_ok"] is True

    exp = tmp_path / "mp_exp"
    names = {m.stem for m in (exp / "models").glob("*.msgpack")}
    assert {"checkpoint_last_saved", "checkpoint_epoch_final",
            "checkpoint_epoch_1"} <= names
    assert (exp / "model_architecture.txt").exists()
    # results.json written exactly once (process 0), visible to the shared FS
    res = exp / "results" / "eval_decomp_checkpoint_epoch_final" / "results.json"
    assert res.exists(), sorted((exp / "results").rglob("*"))
    # no stale tmp files left by the atomic-replace writer
    assert not list((exp / "models").glob("*.tmp*"))
