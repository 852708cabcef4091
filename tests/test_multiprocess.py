"""TRUE multi-PROCESS distributed tests (VERDICT r3 next #6).

The virtual 8-device CPU mesh used everywhere else gives 8 devices in ONE
process, so `jax.process_count() == 1` early-returns guard every cross-host
path. Here we spawn real `jax.distributed`-initialized CPU processes
(coordinator on localhost, gloo collectives) and assert the multi-host
machinery actually behaves: metric sync, eval pair gather, loader sharding,
rank-0-only writes, in-jit cross-process collectives, and checkpoint
gathering of non-fully-addressable leaves. See tests/mp_worker.py for the
itemized assertions and the reference code being raced
(util/misc.py:374-468, launch_distributed.py:54-98).
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    # the axon TPU plugin dials its tunnel at interpreter start; CPU-only
    # children must not inherit it (see tests/test_cli_integration.py)
    clean = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + clean)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)

    nproc = 2
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(i), str(nproc),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"WORKER_{i}_OK" in out, f"worker {i} output:\n{out}"

    # rank-0-only write gating: exactly one marker, from process 0
    markers = sorted(f.name for f in tmp_path.glob("main_*.marker"))
    assert markers == ["main_0.marker"], markers
