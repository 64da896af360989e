"""Headless scene viewer — the DX12 renderer/editor scene-view stand-in
(SURVEY.md §7.9: "a viewer (matplotlib/web dump of culled scenes) standing in
for the DX12 renderer").

Renders a prepared View (the same draw-ready data a GPU backend would consume:
culled + sorted instances, lights, particles, GUI draw list) to a
self-contained SVG: perspective-projected billboards sized by model bounding
radius, depth-sorted, colored per material, with the GUI overlay on top.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from lumixengine_tpu.core import host_math as hm

_PALETTE = ["#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#b07aa1",
            "#76b7b2", "#edc948", "#ff9da7", "#9c755f", "#bab0ac"]


def _project(points, cam_pos, cam_rot, fov_y, aspect, width, height):
    """World [N,3] → screen [N,2] + depth [N] (camera looks -Z)."""
    inv_rot = hm.quat_conjugate(cam_rot)
    local = hm.quat_rotate(np.broadcast_to(inv_rot, (len(points), 4)), points - cam_pos)
    depth = -local[:, 2]
    f = 1.0 / np.tan(fov_y * 0.5)
    safe = np.maximum(depth, 1e-3)
    x = (local[:, 0] * f / aspect) / safe
    y = (local[:, 1] * f) / safe
    sx = (x * 0.5 + 0.5) * width
    sy = (1.0 - (y * 0.5 + 0.5)) * height
    return np.stack([sx, sy], -1), depth


def render_svg(
    runner,
    path: str,
    cam_slot: int = 0,
    width: int = 960,
    height: int = 540,
) -> str:
    """Render the runner's current state to an SVG file. Returns the path."""
    world = runner.world
    state = runner.state
    rmod = world.modules["renderer"]
    renderer = rmod.system
    st = rmod.statics()
    from lumixengine_tpu.renderer.pipeline import resolve_cam_slot
    cam_slot = resolve_cam_slot(st, cam_slot)
    view = runner.prepare_view(cam_slot)

    cam_e = max(int(st.cam_slots[cam_slot]), 0)
    cam_pos = np.asarray(state.world.pos[:, cam_e])
    cam_rot = np.asarray(state.world.rot[:, cam_e])
    fov = float(np.asarray(state.modules["renderer"].cam_fov[cam_slot]))
    aspect = width / height

    n_vis = int(view.visible_count)
    pos = np.asarray(view.instance_pos).T[:n_vis]
    models = np.asarray(view.instance_model)[:n_vis]
    scales = np.asarray(view.instance_scale).T[:n_vis]

    parts: List[str] = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}">',
        f'<rect width="{width}" height="{height}" fill="#101418"/>',
    ]

    if n_vis:
        xy, depth = _project(pos, cam_pos, cam_rot, fov, aspect, width, height)
        radii = np.asarray(renderer.bank.bounding_radius)[np.maximum(models, 0)]
        radii = radii * np.max(np.abs(scales), axis=-1)
        f = 1.0 / np.tan(fov * 0.5)
        px_r = np.clip(radii * f / np.maximum(depth, 1e-3) * height * 0.5, 0.7, 200)
        order = np.argsort(-depth)  # far → near painter's order
        for i in order:
            if depth[i] <= 0:
                continue
            c = _PALETTE[int(models[i]) % len(_PALETTE)]
            parts.append(
                f'<circle cx="{xy[i,0]:.1f}" cy="{xy[i,1]:.1f}" r="{px_r[i]:.1f}" '
                f'fill="{c}" fill-opacity="0.8"/>'
            )

    # particles (flattened across systems)
    rs = state.modules["renderer"]
    for key, sub in getattr(rs, "particles", {}).items():
        for em_name, est in sub.items():
            alive = np.asarray(est.alive)
            if est.outs.shape[0] < 3 or not alive.any():
                continue
            ppos = np.asarray(est.outs[0:3]).T[alive]
            xy, depth = _project(ppos, cam_pos, cam_rot, fov, aspect, width, height)
            for (x, y), d in zip(xy[:2000], depth[:2000]):
                if d > 0:
                    parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="1" fill="#ffd080"/>')

    # GUI overlay
    gm = world.modules.get("gui")
    if gm is not None and "gui" in state.modules:
        for item in gm.draw_list(state):
            x0, y0, x1, y1 = item["rect"]
            sx = width / gm.canvas_size[0]
            sy = height / gm.canvas_size[1]
            col = item.get("color", [1, 1, 1, 0.3])
            rgb = f"rgb({int(col[0]*255)},{int(col[1]*255)},{int(col[2]*255)})"
            parts.append(
                f'<rect x="{x0*sx:.1f}" y="{y0*sy:.1f}" width="{(x1-x0)*sx:.1f}" '
                f'height="{(y1-y0)*sy:.1f}" fill="{rgb}" fill-opacity="{col[3]*0.5:.2f}" '
                f'stroke="{rgb}"/>'
            )
            if "text" in item:
                parts.append(
                    f'<text x="{(x0+4)*sx:.1f}" y="{(y0+16)*sy:.1f}" fill="white" '
                    f'font-size="{item.get("font_size", 14)}">{item["text"]}</text>'
                )

    m = runner.metrics()
    hud = f'frame {m.get("frame")}  visible {int(m.get("renderer.visible_count", 0))}'
    parts.append(f'<text x="8" y="18" fill="#8f8" font-family="monospace" font-size="13">{hud}</text>')
    parts.append("</svg>")
    svg = "\n".join(parts)
    with open(path, "w") as f_out:
        f_out.write(svg)
    return path
