"""CLI tests: the reference's command-line surface end-to-end
(c++/bpmf.cpp:41-109 + data/tiny/run_test.sh flow)."""

import os

import numpy as np
import pytest

from bpmf_tpu import cli
from bpmf_tpu.io import read_matrix, write_matrix
from tests.conftest import tiny_matrices


@pytest.fixture
def tiny_files(tmp_path):
    train, test = tiny_matrices()
    tr = str(tmp_path / "train.mtx")
    te = str(tmp_path / "test.mtx")
    write_matrix(tr, train)
    write_matrix(te, test)
    return tr, te


def test_tiny_run_test_flow(tmp_path, tiny_files, monkeypatch):
    """The reference smoke flow: -r -k -i 9 -b 0 -v with outputs, RMSE
    parsed from bpmf_0.out (data/tiny/run_test.sh:12-25)."""
    monkeypatch.chdir(tmp_path)
    tr, te = tiny_files
    out = tmp_path / "output"
    out.mkdir()
    rc = cli.main(["-r", "-k", "-i", "9", "-b", "0", "-v",
                   "-n", tr, "-p", te, "-o", str(out) + "/"])
    assert rc == 0
    lines = open(tmp_path / "bpmf_0.out").read()
    rmse = float([l for l in lines.splitlines() if "Final Avg RMSE" in l][0]
                 .split(":")[1])
    assert rmse < 4.5  # statistical gate; reference golden is 4.1
    for f in ("Pavg.sdm", "Pm2.sdm", "U-mu.ddm", "U-Lambda.ddm",
              "V-mu.ddm", "V-Lambda.ddm", "U-0.ddm", "V-8.ddm"):
        assert (out / f).exists(), f


def test_cli_no_args_prints_help(capsys):
    assert cli.main([]) == 1
    assert "usage" in capsys.readouterr().out.lower()


def test_cli_missing_file():
    assert cli.main(["-n", "nope.mtx", "-p", "also.mtx"]) == 1


def test_cli_bad_prop_value(tiny_files):
    tr, te = tiny_files
    assert cli.main(["-n", tr, "-p", te, "-l", "onlyone.ddm", "-i", "1"]) == 1


def test_cli_checkpoint_resume(tmp_path, tiny_files):
    tr, te = tiny_files
    ck = str(tmp_path / "st.npz")
    assert cli.main(["-n", tr, "-p", te, "-i", "3", "-b", "1",
                     "--checkpoint", ck]) == 0
    assert os.path.exists(ck)
    assert cli.main(["-n", tr, "-p", te, "-i", "6", "-b", "1",
                     "--resume", ck]) == 0


def test_cli_modes_and_devices(tiny_files):
    tr, te = tiny_files
    for extra in (["--mode", "reduce"], ["--devices", "4"],
                  ["--chunk", "3"], ["--diagonal-only"], ["--profile"]):
        assert cli.main(["-n", tr, "-p", te, "-i", "2", "-b", "0"] + extra) == 0


def test_cli_wedged_tunnel_fails_loudly(tiny_files, monkeypatch, capsys):
    """A wedged accelerator tunnel must produce a bounded, actionable
    failure, not an infinite hang (reference posture: errors are fatal,
    c++/mpi_common.h:16).  The probe is monkeypatched to simulate the
    wedge; JAX_PLATFORMS must not say cpu or the probe is skipped."""
    tr, te = tiny_files
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("BPMF_PROBE_TIMEOUT_S", "5")
    monkeypatch.setattr(cli, "_device_probe", lambda timeout_s: False)
    rc = cli.main(["-n", tr, "-p", te, "-i", "1"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unreachable" in err and "--platform cpu" in err


def test_cli_probe_skipped_on_explicit_cpu(tiny_files, monkeypatch):
    """--platform cpu must never pay (or fail) the acquisition probe."""
    tr, te = tiny_files
    monkeypatch.setattr(
        cli, "_device_probe",
        lambda timeout_s: (_ for _ in ()).throw(AssertionError("probed")))
    rc = cli.main(["-n", tr, "-p", te, "-i", "1", "-b", "0",
                   "--platform", "cpu"])
    assert rc == 0
