"""Matplotlib scene rendering.

Parity target: ``nusc_viz.py`` (agent boxes :13-21, control histograms /
trajectory fans :44-96, debug scene plots :391-478) and the closed-loop frame
renderer (``nusc_sim.py:229-354``).  The NuScenes map-patch backdrop is
replaced by the scene's lane polylines (synthetic scenes carry no raster
map); GIF assembly uses PIL instead of imageio.

All functions take plain numpy arrays (call ``np.asarray`` on device output
first) — rendering never blocks the device pipeline.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

COLOR_AGENT = "#004E9E"
COLOR_NEI = "#C04F15"
COLOR_MODES = ["blue", "green", "red"]


def plot_agent(ax, xy, th, L, W, color=COLOR_AGENT, alpha=1.0,
               edgecolor="black"):
    """Oriented box (nusc_viz.py:13-21)."""
    c, s = np.cos(th), np.sin(th)
    corners = np.array([[L / 2, W / 2], [L / 2, -W / 2],
                        [-L / 2, -W / 2], [-L / 2, W / 2]])
    rot = corners @ np.array([[c, s], [-s, c]])
    poly = plt.Polygon(rot + xy, closed=True, facecolor=color, alpha=alpha,
                       edgecolor=edgecolor)
    ax.add_patch(poly)


def plot_scene(batch: Dict[str, np.ndarray], i: int,
               cand_trajs: Optional[np.ndarray] = None,
               cand_scores: Optional[np.ndarray] = None,
               gt: bool = True, ax=None, title: str = ""):
    """Debug scene plot (``plot_debug_scene``, nusc_viz.py:391-478):
    lanes, neighbors, GT trajectory, and candidate trajectory fans colored
    by maneuver with STL-violating candidates dashed.

    cand_trajs: (M, 3, T, >=2); cand_scores: (M, 3).
    """
    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots(figsize=(8, 8))
    for key, color in (("currlane_wpts", "gray"), ("leftlane_wpts", "green"),
                       ("rightlane_wpts", "red")):
        idk = {"currlane_wpts": "curr_id", "leftlane_wpts": "left_id",
               "rightlane_wpts": "right_id"}[key]
        if batch[idk][i, 0] > 0.5:
            lane = batch[key][i]
            ax.plot(lane[:, 0], lane[:, 1], color=color, lw=5, alpha=0.3)
    neis = batch["neighbors"][i] if "neighbors" in batch \
        else batch["neighbors_traj"][i][:, 0]
    for nei in neis:
        if nei[0] > 0.5:
            plot_agent(ax, nei[1:3], nei[3], nei[5], nei[6],
                       color=COLOR_NEI, alpha=0.4)
    ego = batch["ego_traj"][i]
    plot_agent(ax, ego[0, :2], ego[0, 2], ego[0, 4], ego[0, 5])
    if gt:
        ax.plot(ego[:, 0], ego[:, 1], "c-", lw=2, zorder=900, label="GT")
    if cand_trajs is not None:
        for m in range(cand_trajs.shape[0]):
            for k in range(3):
                ls = "-" if (cand_scores is None
                             or cand_scores[m, k] > 0) else ":"
                ax.plot(cand_trajs[m, k, :, 0], cand_trajs[m, k, :, 1],
                        ls, color=COLOR_MODES[k], lw=0.8, alpha=0.7)
    ax.set_aspect("equal")
    ax.set_title(title)
    return ax


def save_scene(path: str, *args, **kw):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plot_scene(*args, **kw)
    plt.savefig(path, bbox_inches="tight", pad_inches=0.1)
    plt.close()


def plot_control_histograms(controls: np.ndarray, path: str):
    """Steer/accel histograms (nusc_viz.py:44-96)."""
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].hist(controls[..., 0].ravel(), bins=50, color=COLOR_AGENT)
    axes[0].set_title("steer rate")
    axes[1].hist(controls[..., 1].ravel(), bins=50, color=COLOR_NEI)
    axes[1].set_title("acceleration")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, bbox_inches="tight")
    plt.close()


def render_closed_loop_frame(path: str, scene_center: np.ndarray,
                             lane_valids: np.ndarray, ego_hist: np.ndarray,
                             neighbors: np.ndarray, plan_traj: np.ndarray,
                             ego_LW=(4.084, 1.73), r: float = 40.0):
    """One closed-loop frame (NuScenesSim.render, nusc_sim.py:229-347)."""
    fig, ax = plt.subplots(figsize=(8, 8))
    offs = [0.0, 3.5, -3.5]
    for li in range(3):
        if lane_valids[li] > 0.5:
            nx = -np.sin(scene_center[:, 2]) * offs[li]
            ny = np.cos(scene_center[:, 2]) * offs[li]
            ax.plot(scene_center[:, 0] + nx, scene_center[:, 1] + ny,
                    color="gray", lw=4, alpha=0.25)
    for nei in neighbors:
        if nei[0] > 0.5:
            plot_agent(ax, nei[1:3], nei[3], nei[5], nei[6],
                       color=COLOR_NEI, alpha=0.35)
    pos = ego_hist[-1]
    plot_agent(ax, pos[:2], pos[2], ego_LW[0], ego_LW[1])
    ax.plot(ego_hist[:, 0], ego_hist[:, 1], color="#fb9a99", lw=3,
            zorder=1000, label="sim")
    if plan_traj is not None:
        ax.plot(plan_traj[:, 0], plan_traj[:, 1], color="purple", lw=3.5,
                zorder=1500, label="plan")
    ax.set_xlim(pos[0] - r, pos[0] + r)
    ax.set_ylim(pos[1] - r, pos[1] + r)
    ax.set_aspect("equal")
    ax.legend(loc="upper right")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    plt.savefig(path, bbox_inches="tight", pad_inches=0.1)
    plt.close()


def generate_gif(gif_path: str, frame_paths: Sequence[str],
                 duration_ms: int = 100):
    """Assemble frames into a GIF (utils.py:106-110, via PIL)."""
    from PIL import Image
    frames = [Image.open(p) for p in frame_paths]
    if not frames:
        return
    frames[0].save(gif_path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
