"""Multi-host (multi-controller) execution of the sharded train step.

VERDICT r2 item 4: the jax.distributed entry (parallel/mesh.py
maybe_init_distributed + global_mesh) had never executed. Here two REAL
processes (2 virtual CPU devices each -> 4 global devices) rendezvous
through a coordinator, run ONE full 3-branch train step with the exposure
axis sharded across the 2x2 global mesh, and must agree with each other
and with a single-process run of the identical step.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(port, pid, nprocs, local_devices):
    env = dict(
        os.environ,
        DEBLUR4DGS_DIST="1",
        DEBLUR4DGS_NUM_PROCESSES=str(nprocs),
        DEBLUR4DGS_PROCESS_ID=str(pid),
        JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        MULTIHOST_CPU="1",
        MULTIHOST_LOCAL_DEVICES=str(local_devices),
    )
    # the workers configure their own device counts; drop any inherited
    # test-runner XLA flags so they don't conflict
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, WORKER], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO,
    )


def _parse_loss(out):
    for line in out.splitlines():
        if line.startswith("MULTIHOST_LOSS"):
            _, pid, loss = line.split()
            return int(pid), float(loss)
    return None


class TestMultiHost:
    def test_two_process_step_matches_single_process(self):
        port = _free_port()
        procs = [_launch(port, i, 2, 2) for i in range(2)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=900)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("multi-host workers timed out")
            outs.append(out)
        for i, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
        losses = dict(_parse_loss(o) for o in outs)
        assert set(losses) == {0, 1}, outs[0][-2000:]
        # both controllers computed the same global loss
        assert losses[0] == pytest.approx(losses[1], abs=1e-5), losses

        # single-process reference: same step, same inputs, local 4-device
        # mesh, no jax.distributed
        single = _launch_single()
        out, _ = single.communicate(timeout=900)
        assert single.returncode == 0, out[-4000:]
        _, ref = _parse_loss(out)
        assert np.isfinite(ref)
        assert losses[0] == pytest.approx(ref, rel=2e-5), (losses, ref)


class TestBenchScalingMultihost:
    def test_multihost_bench_mode(self):
        """bench_scaling --multihost drives the jax.distributed entry and
        reports a finite timed step (VERDICT r3 item 7)."""
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "bench_scaling.py"),
             "--multihost", "2", "--steps", "2"],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
        )
        assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        import json

        rec = json.loads(line)
        assert rec["processes"] == 2 and rec["devices"] == 4
        assert np.isfinite(rec["rays_per_s"]) and rec["rays_per_s"] > 0
        assert np.isfinite(rec["loss"])


def _launch_single():
    env = dict(
        os.environ,
        DEBLUR4DGS_DIST="0",
        MULTIHOST_CPU="1",
        MULTIHOST_LOCAL_DEVICES="4",
    )
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, WORKER], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO,
    )
