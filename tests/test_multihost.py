"""parallel/multihost.py exercised with REAL multiple jax processes.

Spawns two CPU-backend python subprocesses that join one
jax.distributed coordinator, shard a 7-element index range, and gather
unequal-size pickled result lists with all_gather_objects — the
collect_results_cpu-equivalent path (multihost.py:29-47) that was
previously only covered by its single-process passthrough.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax

coord, pid = sys.argv[1], int(sys.argv[2])
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()

from visionllm_tpu.parallel.multihost import (all_gather_objects,
                                              shard_indices)

idx = shard_indices(7)
# contiguous, disjoint split: process 0 gets 4, process 1 gets 3
assert idx == (list(range(0, 4)) if pid == 0 else list(range(4, 7))), idx

# unequal payloads (dicts) — exercises the padded pickle gather
local = [{"host": pid, "i": i, "blob": "x" * (10 + 90 * pid)} for i in idx]
merged = all_gather_objects(local)
assert [r["i"] for r in merged] == list(range(7)), merged
assert [r["host"] for r in merged] == [0, 0, 0, 0, 1, 1, 1]
print(f"WORKER{pid}_OK")
"""


@pytest.mark.slow
def test_two_process_shard_and_gather(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    coord = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "WORKER0_OK" in outs[0]
    assert "WORKER1_OK" in outs[1]
