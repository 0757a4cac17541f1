"""Golden-capsule regression test for the real-data extraction stack.

Re-runs ``extract_dataset`` over the deterministic fake-devkit DB
(the exact devkit API surface — see tests/test_devkit_shim.py) and
compares EVERY output array against the committed
``tests/golden/extract_golden_v1.0-mini.npz``.  Any behavior change in
ego/neighbor track reconstruction, lane selection/expansion, side-lane
search, labels, u-turn status, or the per-scene sim tensors fails here
against pinned tensors — the validation a future machine with the real
NuScenes dataset can replay in minutes (docs/REAL_DATA.md).

Regenerate after an INTENTIONAL change:
``python tests/golden/make_extract_golden.py``.
"""

import os

import numpy as np

from golden.make_extract_golden import GOLDEN, build


def test_extraction_matches_committed_golden(tmp_path):
    got = build(str(tmp_path / "cache.npz"))
    want = dict(np.load(GOLDEN, allow_pickle=False))
    assert sorted(got) == sorted(want)
    for k in sorted(want):
        assert got[k].shape == want[k].shape, k
        assert got[k].dtype == want[k].dtype, k
        # pure-numpy deterministic pipeline: same-platform reruns are
        # bit-exact; the tolerance only covers libm drift across images
        np.testing.assert_allclose(
            np.asarray(got[k], np.float64), np.asarray(want[k], np.float64),
            rtol=0, atol=1e-6, err_msg=k)


def test_golden_capsule_is_committed():
    # the capsule must ship with the repo (not a generated artifact)
    assert os.path.exists(GOLDEN)
    assert os.path.getsize(GOLDEN) < 5e6
