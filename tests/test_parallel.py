"""Mesh construction, batch sharding, and multihost helpers (8 CPU devs)."""

import numpy as np
import jax
import jax.numpy as jnp

from pstl_tpu.parallel import (make_mesh, shard_batch, replicate,
                               data_sharding, init_multihost,
                               global_batch_from_local, local_rows)


def test_make_mesh_infers_size():
    mesh = make_mesh((-1,), ("data",))
    assert mesh.shape["data"] == 8


def test_shard_batch_splits_leading_axis():
    mesh = make_mesh((8,), ("data",))
    batch = {"a": np.ones((16, 4), np.float32),
             "b": np.ones((3,), np.float32)}   # 3 not divisible -> replicated
    out = shard_batch(batch, mesh)
    assert len(out["a"].sharding.device_set) == 8
    assert out["a"].sharding.is_fully_replicated is False
    assert out["b"].sharding.is_fully_replicated


def test_replicated_params_math():
    mesh = make_mesh((8,), ("data",))
    x = jax.device_put(jnp.ones((16, 8)), data_sharding(mesh))
    w = jax.device_put(jnp.ones((8, 4)), replicate(mesh))
    y = jax.jit(lambda x, w: jnp.mean(x @ w))(x, w)
    np.testing.assert_allclose(float(y), 8.0)


def test_init_multihost_noop_without_env(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert init_multihost() == 0


def test_local_rows_single_process():
    sl = local_rows(64)
    assert sl == slice(0, 64)


def test_global_batch_from_local_single_process():
    mesh = make_mesh((8,), ("data",))
    batch = {"x": np.arange(32, dtype=np.float32).reshape(16, 2)}
    out = global_batch_from_local(batch, mesh)
    np.testing.assert_allclose(np.asarray(out["x"]), batch["x"])
    assert len(out["x"].sharding.device_set) == 8
