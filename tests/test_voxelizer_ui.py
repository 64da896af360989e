"""Voxelizer editor (editor/voxelizer_ui.py ≙ reference
renderer/editor/voxelizer_ui.cpp:1-204): voxelize → AO → blur → slice
visualization, over the real voxels.py bake path."""
import os

import numpy as np
import pytest


def _box_mesh(size=1.0):
    """8-vert unit box, 12 triangles."""
    s = size * 0.5
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                  for z in (-s, s)], np.float32)
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def test_voxelize_ao_blur_and_slices():
    from lumixengine_tpu.editor.voxelizer_ui import VoxelizerUI

    v, f = _box_mesh()
    ui = VoxelizerUI(vertices=v, indices=f)
    assert ui.grid is not None and ui.grid.sum() > 50   # hollow shell
    # interior is hollow (surface voxelization, like the reference's)
    r = ui.resolution
    assert not ui.grid[r // 2, r // 2, r // 2]

    # AO view computes the field lazily; values in [0, 1]
    ui.handle_key(0, "a")
    assert ui.show_ao and ui.ao is not None
    assert 0.0 <= ui.ao.min() and ui.ao.max() <= 1.0
    a0 = ui.ao.copy()
    ui.handle_key(0, "b")                   # blur smooths (extrema shrink)
    assert ui.ao.max() <= a0.max() + 1e-6
    assert ui.ao.std() < a0.std() + 1e-6

    # slice navigation clamps; the slice image shows occupied pixels
    ui.slice_idx = 0
    ui.handle_key(0, "[")
    assert ui.slice_idx == 0
    mid = next(y for y in range(r) if ui.grid[:, y, :].any())
    ui.slice_idx = mid
    img = ui.slice_image()
    assert img.shape == (r, r, 3) and (img > 0).any()

    # resolution cycle re-voxelizes at the new grid size
    ui.handle_key(0, "r")
    assert ui.resolution == 64 and ui.grid.shape == (64, 64, 64)
    assert ui.ao is None                    # stale AO dropped

    txt = ui.render_text(60, 16)
    assert "voxelizer" in txt and "\x1b[38;2;" in txt


@pytest.mark.skipif(not os.path.isdir("/root/reference/demo"),
                    reason="reference demo assets not present")
def test_voxelizer_loads_fbx_and_editor_app_wiring():
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=32)
    app = EditorApp(engine, world)
    app.handle_key(0, "0")
    assert app.view == "voxelizer"
    ui = app.voxelizer()
    assert ui.model_path.endswith(".fbx") and ui.grid.sum() > 0
    assert "voxelizer" in app.render_text(60, 16)
    app.handle_key(27)
    assert app.view == "main"
