"""Two-process jax.distributed test: the multi-host (DCN) axis for real.

BASELINE.md's north star includes scaling "1 chip -> 1 host -> >=2 hosts";
the reference has no distribution at all (SURVEY.md §2.7). This launches
two OS processes that form one 8-device mesh through
jax.distributed.initialize (the coordination path multi-host TPU pods
use), runs the full distributed hash+sketch step across both, and checks
the psum-merged sketch bit-exactly against the host oracle — exercising
parallel.mesh.initialize_distributed (VERDICT r1 missing #2).
"""

import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(port: int, nproc: int):
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
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
    return procs, outs


def test_two_process_dcn_merge():
    # _free_port closes the probe socket before the coordinator binds, so
    # another process can steal the port in the window; retry the whole
    # launch on bind-looking failures (ADVICE r2).
    nproc = 2
    for attempt in range(3):
        procs, outs = _launch(_free_port(), nproc)
        failed = [o for p, o in zip(procs, outs) if p.returncode != 0]
        bindish = any(
            "bind" in o.lower() or "address already in use" in o.lower()
            for o in failed
        )
        if not failed or not bindish or attempt == 2:
            break
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK p{i}" in out, f"worker {i} output:\n{out}"
