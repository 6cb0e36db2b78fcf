"""Multi-process (DCN) smoke test: the pod-entry code path.

Launches 2 OS processes x 4 virtual CPU devices each, initializes
``jax.distributed`` through ``parallel.mesh.init_distributed`` (the only
code between this repo and a real pod slice), and runs a psum all-reduce +
a ppermute halo exchange across the process boundary (Gloo collectives --
the CPU stand-in for DCN).  SURVEY §5 "distributed communication backend".
"""

import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum_and_halo():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "dcn_worker.py"), coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"DCN_OK proc={i} devices=8" in out, out[-2000:]
