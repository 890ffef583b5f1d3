"""Multi-PROCESS mesh execution (the one §2.2 surface the virtual
8-device single-process mesh cannot cover): two coordinated processes,
each owning 2 CPU devices, form a 4-video fleet through
parallel/mesh.py::initialize_distributed (the analog of the reference's
init_process_group TCP rendezvous, /root/reference/train.py:131-139) and
run one lockstep shard_map step with Gloo-backed cross-process
collectives. The per-video losses must match a single-process fleet run
of the same seeds exactly (the fleet step is communication-free across
videos, so process boundaries must be invisible)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "mp_fleet_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_fleet_matches_single_process(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = (HERE.rsplit("/tests", 1)[0] + os.pathsep
                         + env.get("PYTHONPATH", ""))
    # the distributed service and workers must agree on the coordinator
    port = _free_port()

    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    # merge the two processes' per-video results
    merged = {}
    for path in outs:
        d = np.load(path)
        merged.update(dict(zip(d["keys"].tolist(), d["vals"].tolist())))
    # 4 videos x 2 metrics, split 2+2 across processes
    assert sorted(k for k in merged if k < 1000) == [0, 1, 2, 3]

    # single-process oracle on this process's virtual devices (conftest
    # pins 8; the worker helper uses the first 4)
    sys.path.insert(0, HERE)
    from mp_fleet_worker import fleet_losses

    want = fleet_losses()
    for k, v in want.items():
        np.testing.assert_allclose(merged[k], v, rtol=1e-5, err_msg=str(k))
