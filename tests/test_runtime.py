"""Native shard store: build, gather correctness, prefetch iterator."""

import numpy as np
import pytest

from pstl_tpu.runtime import ShardStore, write_store


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store"))
    rng = np.random.RandomState(0)
    data = {
        "ego_traj": rng.randn(64, 20, 6).astype(np.float32),
        "neighbors": rng.randn(64, 8, 7).astype(np.float32),
        "labels": rng.randint(0, 4, (64, 1)).astype(np.int64),
    }
    write_store(path, data)
    return ShardStore(path, n_threads=4), data


def test_gather_matches_numpy(store):
    ss, data = store
    idx = np.asarray([5, 0, 63, 17, 17, 2])
    out = ss.gather(idx)
    for k in data:
        np.testing.assert_array_equal(out[k], data[k][idx])


def test_gather_dtype_and_shape(store):
    ss, data = store
    out = ss.gather(np.asarray([1, 2]), columns=["labels"])
    assert out["labels"].dtype == np.int64
    assert out["labels"].shape == (2, 1)


def test_gather_bounds_check(store):
    ss, _ = store
    with pytest.raises(RuntimeError):
        ss.gather(np.asarray([999]))


def test_prefetch_iterator(store):
    ss, data = store
    idx = np.random.RandomState(1).permutation(64)
    batches = list(ss.iter_batches(idx, batch_size=16))
    assert len(batches) == 4
    for bi, b in enumerate(batches):
        sel = idx[bi * 16:(bi + 1) * 16]
        for k in data:
            np.testing.assert_array_equal(b[k], data[k][sel])


def test_scene_dataset_backend(tmp_path):
    """SceneDataset -> shard store -> iterator round trip."""
    from pstl_tpu.config import Config
    from pstl_tpu.data.dataset import (SceneDataset, to_shard_store,
                                       shard_store_iterator)
    cfg = Config(n_randoms=2, n_neighbors=2, n_synth_scenes=16)
    ds = SceneDataset.from_synthetic(cfg, n_scenes=16)
    path = str(tmp_path / "store")
    to_shard_store(ds, path)
    store = ShardStore(path)
    batches = list(shard_store_iterator(store, ds, "train", 4,
                                        shuffle=True, seed=1))
    assert len(batches) == len(ds.splits["train"]) // 4
    # contents match the numpy path for the same permutation
    idx = ds.splits["train"].copy()
    rng = np.random.RandomState(1 * 100003)
    rng.shuffle(idx)
    np.testing.assert_allclose(batches[0]["ego_traj"],
                               ds.data["ego_traj"][idx[:4]])
    store.close()


def test_prefetch_reuse(store):
    """Iterator can be restarted (worker thread survives)."""
    ss, data = store
    idx = np.arange(64)
    for _ in range(2):
        bs = list(ss.iter_batches(idx, batch_size=32))
        assert len(bs) == 2
        np.testing.assert_array_equal(bs[0]["ego_traj"],
                                      data["ego_traj"][:32])


def test_split_file_roundtrip(tmp_path):
    from pstl_tpu.config import Config
    from pstl_tpu.data.dataset import SceneDataset
    cfg = Config(n_randoms=2, n_neighbors=2)
    ds = SceneDataset.from_synthetic(cfg, n_scenes=10)
    p = str(tmp_path / "split.txt")
    ds.save_split(p)
    old = {k: v.copy() for k, v in ds.splits.items()}
    ds.splits = {}
    ds.load_split(p)
    for k in old:
        np.testing.assert_array_equal(ds.splits[k], old[k])


@pytest.mark.slow
def test_train_epoch_via_shard_store(tmp_path, monkeypatch):
    """cfg.use_shard_store: one training epoch served entirely by the C++
    gather/prefetch path produces finite losses."""
    import jax
    from pstl_tpu import train
    from pstl_tpu.config import Config
    from pstl_tpu.data.dataset import SceneDataset

    monkeypatch.chdir(tmp_path)
    cfg = Config(diffusion=True, diffusion_steps=4, n_randoms=2,
                 n_neighbors=2, batch_size=4, compute_dtype="float32",
                 use_shard_store=True, epochs=1,
                 train_ratio=0.5).finalize()
    ds = SceneDataset.from_synthetic(cfg, n_scenes=16)
    ds.ensure_random_params(0)
    logs = []
    state = train.train(cfg, ds, log=logs.append, epochs=1)
    assert state.step > 0
    assert any("train" in l for l in logs)
