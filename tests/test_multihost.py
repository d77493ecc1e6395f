"""Multi-host execution: one trajectory spanning two jax processes.

The analog of the reference CI's oversubscribed multi-rank ctest
(``mpirun -np 4`` on one machine, CMakeLists.txt:143,158): two OS
processes, each with 2 forced host-platform CPU devices, join via
``jax.distributed`` into one 4-device SPMD program.  Layout-invariant
trajectories mean the result must match a single-process 4-device run
exactly — that is asserted per iteration.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

from bpmf_tpu.io import write_matrix
from tests.conftest import make_ratings

RMSE_RE = re.compile(r"iteration (\d+):\s+RMSE: ([\d.]+)\s+avg RMSE: ([\d.]+)")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _trajectory(text: str) -> list[tuple[int, float, float]]:
    return [
        (int(m.group(1)), float(m.group(2)), float(m.group(3)))
        for m in RMSE_RE.finditer(text)
    ]


def _run_proc(args, env, timeout=300):
    return subprocess.Popen(
        [sys.executable, "-m", "bpmf_tpu", *args],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def test_two_process_trajectory_matches_single_process(tmp_path):
    train, test = make_ratings(n_users=60, n_movies=40, density=0.25)
    tr, te = str(tmp_path / "train.sdm"), str(tmp_path / "test.sdm")
    write_matrix(tr, train)
    write_matrix(te, test)

    common = ["-n", tr, "-p", te, "-i", "6", "-b", "2", "-d", "8",
              "--seed", "7", "--platform", "cpu"]
    port = _free_port()

    def env_for(pid: int, n_local: int, nproc: int) -> dict:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        if nproc > 1:
            env["BPMF_DIST"] = f"127.0.0.1:{port},{nproc},{pid}"
        else:
            env.pop("BPMF_DIST", None)
        return env

    # two processes x 2 local devices -> one 4-device mesh; one retry with
    # a fresh port in case another process grabbed it between probe and use
    for attempt in range(2):
        nonlocal_port = _free_port() if attempt else port

        def env2(pid):
            e = env_for(pid, 2, 2)
            e["BPMF_DIST"] = f"127.0.0.1:{nonlocal_port},2,{pid}"
            return e

        procs = [_run_proc(common, env2(pid)) for pid in range(2)]
        outs = []
        for p in procs:
            try:
                out, err = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append((p.returncode, out, err))
        if all(rc == 0 for rc, _, _ in outs):
            break
        if attempt == 0 and any(
            "Failed to connect" in err or "address" in err.lower()
            for _, _, err in outs
        ):
            continue
        for rc, out, err in outs:
            assert rc == 0, f"multihost process failed:\n{err[-3000:]}"

    traj_mh = _trajectory(outs[0][1])  # rank 0 speaks
    assert len(traj_mh) == 6  # iterations 0..5
    assert _trajectory(outs[1][1]) == []  # rank 1 is silent

    # single-process 4-device run: must be the SAME trajectory
    p = _run_proc(common, env_for(0, 4, 1))
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, f"single-process run failed:\n{err[-3000:]}"
    traj_sp = _trajectory(out)

    assert [t[0] for t in traj_mh] == [t[0] for t in traj_sp]
    for (it, r_mh, ra_mh), (_, r_sp, ra_sp) in zip(traj_mh, traj_sp):
        assert r_mh == pytest.approx(r_sp, abs=2e-4), f"iter {it}"
        assert ra_mh == pytest.approx(ra_sp, abs=2e-4), f"iter {it}"


def test_two_process_halo_matches_all_gather(tmp_path):
    """The connectivity-aware halo exchange (spmd.halo_gather) across a
    2-process mesh reproduces the all_gather trajectory — certifies the
    ppermute ring + sharded send/recv tables over process boundaries."""
    train, test = make_ratings(n_users=60, n_movies=40, density=0.25)
    tr, te = str(tmp_path / "train.sdm"), str(tmp_path / "test.sdm")
    write_matrix(tr, train)
    write_matrix(te, test)

    common = ["-n", tr, "-p", te, "-i", "5", "-b", "2", "-d", "8",
              "--seed", "7", "--platform", "cpu", "--gram-impl", "bucketed"]

    def run_pair(halo: str):
        for attempt in range(2):
            port = _free_port()
            procs = []
            for pid in range(2):
                env = dict(os.environ)
                env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
                env["JAX_PLATFORMS"] = "cpu"
                env["BPMF_DIST"] = f"127.0.0.1:{port},2,{pid}"
                procs.append(
                    _run_proc(common + ["--halo", halo], env)
                )
            outs = []
            for p in procs:
                try:
                    out, err = p.communicate(timeout=300)
                except subprocess.TimeoutExpired:
                    for q in procs:
                        q.kill()
                    raise
                outs.append((p.returncode, out, err))
            if all(rc == 0 for rc, _, _ in outs):
                return _trajectory(outs[0][1])
            if attempt == 0:
                continue
            for rc, out, err in outs:
                assert rc == 0, f"halo={halo} process failed:\n{err[-3000:]}"

    traj_off = run_pair("off")
    traj_on = run_pair("on")
    assert len(traj_off) == 5 and len(traj_on) == 5
    for (it, r0, ra0), (_, r1, ra1) in zip(traj_off, traj_on):
        assert r1 == pytest.approx(r0, abs=1e-5), f"iter {it}"
        assert ra1 == pytest.approx(ra0, abs=1e-5), f"iter {it}"
