"""Regenerate the committed real-data extraction golden capsule.

VERDICT r3 item 7: a machine that DOES have the NuScenes dataset +
devkit should be able to validate this framework's extraction in
minutes, without reading code.  The capsule is:

- ``extract_golden_v1.0-mini.npz`` (committed): the COMPLETE output
  array store of ``pstl_tpu.data.extract.extract_dataset`` run over the
  deterministic fake-devkit DB (tests/test_devkit_shim.py — token/next
  chained tables, LIDAR_TOP quaternion ego poses, two-layer lane radius
  queries, arcline discretization, map-mask rasters: the exact API
  surface of a real installation, reference query patterns
  nusc_api.py:126-144, 191-267, 613-683);
- ``tests/test_extract_golden.py``: re-runs the extraction and compares
  every array bit-tight — any behavior drift in the extraction stack
  fails loudly against the committed tensors;
- ``docs/REAL_DATA.md``: the one-command real-dataset path.

Regenerate (only after an INTENTIONAL extraction-behavior change):

    python tests/golden/make_extract_golden.py
"""

import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))
sys.path.insert(0, os.path.dirname(_HERE))

GOLDEN = os.path.join(_HERE, "extract_golden_v1.0-mini.npz")
# mirrors tests/test_devkit_shim.py::test_extract_dataset_runs_real_devkit_path
CFG_KW = dict(n_neighbors=2, n_randoms=2)
SAMPLE_STRIDE = 6


def build(out_path: str) -> dict:
    from test_devkit_shim import fake_devkit_ctx
    from pstl_tpu.config import Config
    from pstl_tpu.data import extract

    cfg = Config(**CFG_KW).finalize()
    with fake_devkit_ctx():
        extract.extract_dataset(cfg, version="v1.0-mini", dataroot=None,
                                out_path=out_path,
                                sample_stride=SAMPLE_STRIDE,
                                table_cache_path=None)
    return dict(np.load(out_path, allow_pickle=False))


if __name__ == "__main__":
    data = build(GOLDEN)
    total = sum(v.nbytes for v in data.values())
    print(f"wrote {GOLDEN}: {len(data)} arrays, "
          f"{total / 1e6:.2f} MB uncompressed")
    for k in sorted(data):
        print(f"  {k}: {data[k].shape} {data[k].dtype}")
