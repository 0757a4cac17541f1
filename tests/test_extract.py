"""Extraction helpers (pure numpy — devkit not required)."""

import numpy as np
import pytest

from pstl_tpu.data import extract


def test_heading_quirk():
    # identity quaternion -> roll 0 -> heading pi (the reference's
    # pi - roll convention, nusc_api.py:167-168)
    th = extract.heading_from_quaternion([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(th, np.pi)


def test_resample_polyline_uniform():
    pts = np.stack([np.linspace(0, 10, 7), np.zeros(7)], -1)
    out = extract.resample_polyline(pts, 15)
    assert out.shape == (15, 3)
    seg = np.linalg.norm(np.diff(out[:, :2], axis=0), axis=-1)
    np.testing.assert_allclose(seg, seg[0], rtol=1e-5)   # uniform spacing
    np.testing.assert_allclose(out[:, 2], 0.0, atol=1e-6)  # heading east


def test_knn_pad():
    ego = np.zeros(2)
    rows = [np.array([1, 5.0, 0, 0, 1, 4, 2], np.float32),
            np.array([1, 1.0, 0, 0, 1, 4, 2], np.float32),
            np.array([1, 3.0, 0, 0, 1, 4, 2], np.float32)]
    out = extract.knn_pad_neighbors(ego, rows, k=2)
    assert out.shape == (2, 7)
    np.testing.assert_allclose(out[:, 1], [1.0, 3.0])   # nearest two
    out4 = extract.knn_pad_neighbors(ego, rows, k=4)
    np.testing.assert_allclose(out4[3], 0.0)            # padded slot


def test_interp_track_extrapolates():
    times = np.array([0.0, 1.0])
    states = np.array([[0, 0, 0, 2.0], [2, 0, 0, 2.0]])
    out = extract.interp_track(times, states, np.array([0.5, 1.0, 2.0]))
    np.testing.assert_allclose(out[0, 0], 1.0)   # interp
    np.testing.assert_allclose(out[2, 0], 4.0)   # const-vel extrapolation
    np.testing.assert_allclose(out[2, 3], 2.0)


def test_label_high_level():
    lane = np.stack([np.linspace(0, 30, 15), np.zeros(15), np.zeros(15)], -1)
    straight = np.stack([np.linspace(0, 20, 20), np.zeros(20),
                         np.zeros(20), np.full(20, 4.0)], -1)
    assert extract.label_high_level(straight, lane) == 0
    left = straight.copy()
    left[:, 1] = np.linspace(0, 3.5, 20)
    assert extract.label_high_level(left, lane) == 1
    right = straight.copy()
    right[:, 1] = -np.linspace(0, 3.5, 20)
    assert extract.label_high_level(right, lane) == 2


def test_uturn_status():
    curr = np.asarray([[0.0, 0, 0.0]])
    oppo = np.asarray([[0.0, 3.5, np.pi]])
    same = np.asarray([[0.0, 3.5, 0.1]])
    assert extract.uturn_status(curr, oppo)
    assert not extract.uturn_status(curr, same)


def test_extract_dataset_requires_devkit():
    if not extract.HAVE_NUSCENES:
        from pstl_tpu.config import Config
        with pytest.raises(RuntimeError, match="devkit"):
            extract.extract_dataset(Config())
