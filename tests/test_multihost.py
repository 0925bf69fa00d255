"""2-process multi-host CPU test (VERDICT round-1 'multi-host path is
paper-ware'): spawns two worker processes that federate via
jax.distributed (gloo), build a 4-device global mesh (2 virtual CPU
devices per process), and validate initialize_multihost, host_shard_seed,
a cross-process reduction, and one real data-parallel training step with
per-host batch shards (reference equivalent: torch-elastic DDP launch,
main.py:186-204)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_step():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    results = {}
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        m = re.search(r"RESULT pid=(\d+) total=([\d.]+) seed=(\d+) "
                      r"loss=([\d.eE+-]+)", out)
        assert m, f"worker {i} printed no RESULT:\n{out[-3000:]}"
        results[int(m.group(1))] = (float(m.group(2)), int(m.group(3)),
                                    float(m.group(4)))

    assert set(results) == {0, 1}
    # cross-process reduction saw both hosts' contributions
    assert results[0][0] == results[1][0] == 24.0
    # per-host data seeds differ
    assert results[0][1] != results[1][1]
    # replicated params + global batch => identical loss on every host
    assert results[0][2] == pytest.approx(results[1][2], rel=1e-6)
