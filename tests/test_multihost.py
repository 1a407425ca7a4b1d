"""2-process multi-host simulation: jax.distributed over localhost, hybrid
ICI/DCN mesh, per-process batch feeding, sharded train step.

The reference's analogue is the whole torchrun+NCCL stack
(run_grpo_video.sh:11-15); SURVEY §5.8 names jax.distributed.initialize +
one global mesh as the TPU-native equivalent."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("XLA_")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out, out
    assert "primary=True" in outs[0]
    assert "primary=False" in outs[1]
