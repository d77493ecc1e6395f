"""Checkpoint/resume: a resumed run must continue the EXACT trajectory of
an uninterrupted run (the reference has no mid-run checkpointing; posterior
propagation -m/-l restarts the chain instead — SURVEY.md §5)."""

import os

import numpy as np
import pytest

from bpmf_tpu import checkpoint
from bpmf_tpu.config import Config
from bpmf_tpu.sampler import BPMF
from tests.conftest import make_ratings


def test_resume_continues_trajectory(tmp_path):
    train, test = make_ratings(seed=9)
    ck = str(tmp_path / "state.npz")

    # uninterrupted 10-iteration run
    cfg = Config(num_latent=4, nsims=10, burnin=3)
    full = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    rmse_full = full.run()

    # 5 iterations, checkpoint, then resume for the remaining 5
    cfg_a = Config(num_latent=4, nsims=5, burnin=3, checkpoint_path=ck)
    a = BPMF(cfg_a, train=train, test=test, out=open(os.devnull, "w"))
    a.run()
    assert os.path.exists(ck)

    cfg_b = Config(num_latent=4, nsims=10, burnin=3, resume=ck)
    b = BPMF(cfg_b, train=train, test=test, out=open(os.devnull, "w"))
    rmse_resumed = b.run()

    assert abs(rmse_full - rmse_resumed) < 1e-5, (rmse_full, rmse_resumed)
    np.testing.assert_allclose(
        full.items_host(full.users, full.state_u),
        b.items_host(b.users, b.state_u),
        rtol=1e-4, atol=1e-5,
    )


def test_resume_across_device_counts(tmp_path):
    """A checkpoint written on 1 device resumes on 8 (original-order state)."""
    train, test = make_ratings(seed=10)
    ck = str(tmp_path / "state.npz")

    cfg_a = Config(num_latent=4, nsims=4, burnin=1, n_devices=1, checkpoint_path=ck)
    BPMF(cfg_a, train=train, test=test, out=open(os.devnull, "w")).run()

    cfg_b = Config(num_latent=4, nsims=8, burnin=1, n_devices=8, resume=ck)
    b = BPMF(cfg_b, train=train, test=test, out=open(os.devnull, "w"))
    rmse_8 = b.run()

    cfg_c = Config(num_latent=4, nsims=8, burnin=1, n_devices=1, resume=ck)
    c = BPMF(cfg_c, train=train, test=test, out=open(os.devnull, "w"))
    rmse_1 = c.run()
    assert abs(rmse_8 - rmse_1) < 1e-4


def test_checkpoint_k_mismatch(tmp_path):
    train, test = make_ratings(seed=11)
    ck = str(tmp_path / "state.npz")
    cfg = Config(num_latent=4, nsims=2, burnin=1, checkpoint_path=ck)
    BPMF(cfg, train=train, test=test, out=open(os.devnull, "w")).run()

    cfg2 = Config(num_latent=8, nsims=4, burnin=1, resume=ck)
    s = BPMF(cfg2, train=train, test=test, out=open(os.devnull, "w"))
    with pytest.raises(ValueError, match="checkpoint K"):
        s.run()


def test_checkpoint_freq(tmp_path):
    train, test = make_ratings(seed=12)
    ck = str(tmp_path / "state.npz")
    cfg = Config(
        num_latent=4, nsims=9, burnin=2, chunk=3,
        checkpoint_path=ck, checkpoint_freq=3,
    )
    s = BPMF(cfg, train=train, test=test, out=open(os.devnull, "w"))
    s.run()
    assert os.path.exists(ck)
    data = np.load(ck)
    assert int(data["iter"]) == 8  # final save wins


def test_resume_refuses_wrong_dataset(tmp_path):
    """A checkpoint binds to its dataset content (hash stored in the npz);
    resuming against different train/test must fail loudly."""
    train, test = make_ratings(seed=11)
    other_train, other_test = make_ratings(seed=12)
    ck = str(tmp_path / "state.npz")

    cfg_a = Config(num_latent=4, nsims=2, burnin=0, checkpoint_path=ck)
    BPMF(cfg_a, train=train, test=test, out=open(os.devnull, "w")).run()

    cfg_b = Config(num_latent=4, nsims=4, burnin=0, resume=ck)
    b = BPMF(cfg_b, train=other_train, test=other_test,
             out=open(os.devnull, "w"))
    with pytest.raises(ValueError, match="different dataset"):
        checkpoint.load(ck, b)
