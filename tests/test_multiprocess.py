"""Real multi-process distributed test: 2 processes x 4 virtual CPU devices.

Covers the code paths no single-process test can: ``init_distributed``'s
coordinator rendezvous, global-array assembly from process-local batches,
the cross-process gradient all-reduce inside the jitted step, and the
ragged host-side ``process_allgather`` (reference equivalence:
slowfast/utils/multiprocessing.py:46-61 + distributed.py:220-336).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port



def test_two_process_distributed_train_step():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")

    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # drop any inherited distributed state and the axon TPU-tunnel plugin
    # (its import hook eagerly initializes the XLA backend, which must not
    # happen before jax.distributed.initialize in the workers)
    for k in list(env):
        if k.startswith(("JAX_COORDINATOR", "CLOUD_TPU")):
            env.pop(k)
    if "PYTHONPATH" in env:
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env["PYTHONPATH"].split(os.pathsep)
            if "axon" not in p)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    assert all(r["devices"] == 8 for r in results)
    # both processes computed the SAME global loss (one sharded step)
    assert np.isclose(results[0]["loss"], results[1]["loss"], rtol=1e-6), \
        results
