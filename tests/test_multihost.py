"""2-process jax.distributed mesh test — the DCN/multi-host analog.

Fills the gap SURVEY §4 calls out (the reference exercises multi-node only in
staging): two OS processes × 4 virtual CPU devices form one 8-device global
mesh; the trainer's psum'd grads, the all-to-all multiget, and the sharded
SANN fan-out all cross the process boundary. Both workers must print the
same collective results.
"""

import os
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


@pytest.mark.slow
def test_two_process_mesh():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        result = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert result, f"no RESULT line:\n{out}\n{err}"
        outs.append(result[0])
    # the two hosts computed identical collective results
    assert outs[0] == outs[1], outs
