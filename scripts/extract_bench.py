"""Extraction throughput harness (VERDICT r2 #7).

Measures (a) scenes/min through the full ``extract_scene`` pipeline on a
mock map (the devkit-free bound on extraction speed — real extraction adds
devkit map queries behind the same MapAdapter calls), and (b) the
TableCache pickle save/load round trip on a synthetic DB of reference
scale (~40 samples/scene, ~30 annotations/sample), the analogue of the
reference's NuscenesPkl self-benchmark (nusc_api.py:938-966).

Usage: python scripts/extract_bench.py [n_scenes]
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pstl_tpu.config import Config
from pstl_tpu.data import extract

LANE_OFF = 3.5


def _lane_pts(y, x0, x1, heading=0.0, step=0.5):
    xs = np.arange(x0, x1 + 1e-6, step)
    return np.stack([xs, np.full_like(xs, y), np.full_like(xs, heading)], -1)


class MockMap(extract.MapAdapter):
    def __init__(self):
        self.lanes = {}
        for name, y in (("c", 0.0), ("l", LANE_OFF), ("r", -LANE_OFF)):
            self.lanes[f"{name}0"] = _lane_pts(y, 0.0, 60.0)
            self.lanes[f"{name}1"] = _lane_pts(y, 60.5, 240.0)

    def lanes_near(self, x, y, radius):
        out = {}
        for lid, pts in self.lanes.items():
            d = np.linalg.norm(pts[:, :2] - [x, y], axis=1)
            if d.min() <= radius:
                out[lid] = pts
        return out

    def outgoing(self, lane_id):
        return [lane_id[:-1] + "1"] if lane_id.endswith("0") else []

    def lane_pts(self, lane_id):
        return self.lanes.get(lane_id)

    def drivable_at(self, x, y):
        return -20.0 <= x <= 260.0 and abs(y) <= 5.5

    def is_intersection_at(self, x, y):
        return False

    def drivable_mask(self, center_xy, half_size, resolution):
        # vectorized band raster (the devkit uses get_map_mask, similarly
        # vectorized)
        n = int(round(2 * half_size / resolution))
        gx = center_xy[0] - half_size + (np.arange(n) + 0.5) * resolution
        gy = center_xy[1] - half_size + (np.arange(n) + 0.5) * resolution
        return ((gx[None, :] >= -20) & (gx[None, :] <= 260)
                & (np.abs(gy[:, None]) <= 5.5))


def bench_extract(n_scenes: int):
    cfg = Config(n_neighbors=8)
    m = MockMap()
    rng = np.random.RandomState(0)
    t0 = time.time()
    n_samples = 0
    for si in range(n_scenes):
        L = 40
        v = rng.uniform(3, 8)
        xs = np.arange(L) * v * cfg.dt
        ego = np.stack([xs, rng.randn(L) * 0.1, np.zeros(L),
                        np.full(L, v)], -1).astype(np.float32)
        nei = np.zeros((cfg.n_neighbors, L, 7), np.float32)
        for j in range(4):
            nei[j, :, 0] = 1.0
            nei[j, :, 1] = 20 + 10 * j + np.arange(L) * 2.0 * cfg.dt
            nei[j, :, 2] = LANE_OFF * (j % 3 - 1)
            nei[j, :, 4:7] = [2.0, 4.0, 2.0]
        samples, rec = extract.extract_scene(m, ego, nei, cfg,
                                             sample_stride=1)
        n_samples += len(samples)
        assert rec is not None
    dt = time.time() - t0
    return {"scenes": n_scenes, "samples": n_samples,
            "wall_s": round(dt, 2),
            "scenes_per_min": round(n_scenes / dt * 60, 1)}


def bench_table_cache(n_scenes: int = 100, samples_per_scene: int = 40,
                      anns_per_sample: int = 30):
    """Synthetic DB of reference scale; times pickle save + reload."""
    tables = {t: {} for t in extract.TableCache.TABLES}
    scenes = []
    for si in range(n_scenes):
        toks = [f"s{si}_{ti}" for ti in range(samples_per_scene)]
        scenes.append({"token": f"scene{si}", "first_sample_token": toks[0],
                       "log_token": f"log{si}"})
        tables["log"][f"log{si}"] = {"token": f"log{si}",
                                     "location": "mock-town"}
        for ti, tok in enumerate(toks):
            anns = [f"a{si}_{ti}_{ai}" for ai in range(anns_per_sample)]
            tables["sample"][tok] = {
                "token": tok, "data": {"LIDAR_TOP": f"sd{si}_{ti}"},
                "anns": anns,
                "next": toks[ti + 1] if ti + 1 < len(toks) else ""}
            tables["sample_data"][f"sd{si}_{ti}"] = {
                "token": f"sd{si}_{ti}", "ego_pose_token": f"ep{si}_{ti}"}
            tables["ego_pose"][f"ep{si}_{ti}"] = {
                "token": f"ep{si}_{ti}",
                "translation": [float(ti), 0.0, 0.0],
                "rotation": [1.0, 0.0, 0.0, 0.0]}
            for a in anns:
                tables["sample_annotation"][a] = {
                    "token": a, "category_name": "vehicle.car",
                    "instance_token": a[:-2],
                    "translation": [1.0, 2.0, 0.0],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "size": [2.0, 4.5, 1.5]}
    tc = extract.TableCache(tables, scenes)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tables.pkl")
        t0 = time.time()
        tc.save(path)
        t_save = time.time() - t0
        t0 = time.time()
        tc2 = extract.TableCache.load(path)
        t_load = time.time() - t0
        assert tc2.get("sample", "s0_0")["data"]["LIDAR_TOP"] == "sd0_0"
        size_mb = os.path.getsize(path) / 1e6
    return {"db_scenes": n_scenes, "pickle_mb": round(size_mb, 1),
            "save_s": round(t_save, 2), "load_s": round(t_load, 2)}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    import json
    r1 = bench_extract(n)
    r2 = bench_table_cache()
    print(json.dumps({"extract": r1, "table_cache": r2}))
