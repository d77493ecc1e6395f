"""parallel.mesh utilities: env-driven multi-host init and host fetches."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bpmf_tpu.parallel import mesh


def test_initialize_from_env_noop(monkeypatch):
    monkeypatch.delenv("BPMF_DIST", raising=False)
    monkeypatch.delenv("BPMF_PLATFORM", raising=False)
    assert mesh.initialize_from_env() is False


def test_initialize_from_env_bad_spec(monkeypatch):
    monkeypatch.setenv("BPMF_DIST", "not-a-spec")
    with pytest.raises(ValueError, match="BPMF_DIST"):
        mesh.initialize_from_env()


def test_to_host_numpy_passthrough():
    x = np.arange(6.0).reshape(2, 3)
    out = mesh.to_host(x, np.float64)
    np.testing.assert_array_equal(out, x)
    assert out.dtype == np.float64


def test_to_host_sharded_single_process():
    m = mesh.make_mesh(4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(
        jnp.arange(8.0), NamedSharding(m, P(mesh.AXIS))
    )
    np.testing.assert_array_equal(mesh.to_host(x), np.arange(8.0))


def test_make_mesh_too_many_devices():
    with pytest.raises(ValueError, match="devices"):
        mesh.make_mesh(10_000)
