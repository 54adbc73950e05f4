"""Cross-process `jax.distributed` coverage (promoted from the r4 one-off).

Runs the 2-process launcher (scripts/distributed_cpu_2proc.py) as a
subprocess suite member and asserts the DISTRIBUTED_CPU.md invariants:
both workers finish, the coordinator handshake + process-spanning mesh
work, and the pmean'd loss agrees bit-for-bit across processes.  This is
the repo's only num_processes > 1 execution path — keeping it in the suite
stops it rotting as a script (r4 verdict item 8).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "distributed_cpu_2proc.py")


@pytest.mark.skipif(bool(os.environ.get("GVRT_TEST_TPU")),
                    reason="CPU multi-process harness; the axon TPU tunnel "
                           "serializes clients and extra jax processes can "
                           "wedge it")
def test_two_process_distributed_pmean_agreement():
    env = dict(os.environ, GVRT_DIST_PORT="17663",
               GVRT_DIST_LOCAL_DEVICES="2")
    # the launcher re-execs itself as the 2 workers with its own
    # JAX_PLATFORMS=cpu env; nothing touches this process's jax state
    res = subprocess.run([sys.executable, SCRIPT], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, res.stdout + res.stderr
    # launcher asserts: both FINAL losses present and identical
    assert "OK: 2-process jax.distributed run" in res.stdout, res.stdout
    # process-spanning mesh actually formed: 2 procs x 2 local devices
    assert "local 2 global 4 devices" in res.stdout, res.stdout
