"""TWO-PROCESS jax.distributed test (SURVEY.md §2.3 P7 / §5.8): spawns two
local worker processes (4 virtual CPU devices each) that form one 8-device
global mesh through a TCP coordinator and run the landmark-sharded BA — the
camera-system psum crosses the process boundary. The result must match the
single-process solve bit-for-bit up to reduction order."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessDistributedBA:
    def test_matches_single_process(self, tmp_path):
        out = str(tmp_path / "dist_result.npz")
        coordinator = f"127.0.0.1:{_free_port()}"
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # worker sets cpu itself
        env["JAX_NUM_PROCESSES"] = ""
        procs = []
        logs = []
        for pid in range(2):
            log = open(str(tmp_path / f"worker{pid}.log"), "w")
            logs.append(log)
            procs.append(subprocess.Popen(
                [sys.executable, os.path.join(HERE, "dist_ba_worker.py"),
                 "--pid", str(pid), "--nprocs", "2",
                 "--coordinator", coordinator, "--out", out],
                env=env, cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
            ))
        try:
            for p in procs:
                rc = p.wait(timeout=560)
                assert rc == 0, _tail(tmp_path, procs.index(p))
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
            for log in logs:
                log.close()

        # single-process reference on this process's virtual devices
        import jax
        from test_parallel import make_problem, CAM
        from orb_slam3_comments_ghr_tpu.optim import ba

        prob, *_ = make_problem(jax.random.PRNGKey(0))
        R1, t1, p1, inl1, c1 = ba.bundle_adjust(CAM, prob, iters=12)

        got = np.load(out)
        np.testing.assert_allclose(got["R"], np.asarray(R1), atol=5e-4)
        np.testing.assert_allclose(got["t"], np.asarray(t1), atol=5e-3)
        assert abs(float(got["cost"]) - float(c1)) / max(float(c1), 1.0) < 0.05


def _tail(tmp_path, pid):
    try:
        with open(str(tmp_path / f"worker{pid}.log")) as f:
            return f.read()[-2000:]
    except OSError:
        return "<no log>"
