"""Editor views: asset browser, profiler viewer, scene view
(≙ editor/asset_browser.cpp:1-1509, editor/profiler_ui.cpp:1-1766,
renderer/editor/scene_view.cpp:1-1856) and their EditorApp integration —
VERDICT-r3 missing #2 / next-round #5."""
import os

import numpy as np
import pytest

REF_DEMO = "/root/reference/demo"
_UP, _DOWN, _LEFT, _RIGHT = 0x26, 0x28, 0x25, 0x27


# ---------------------------------------------------------------------------
# asset browser
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(REF_DEMO),
                    reason="reference demo assets not present")
def test_asset_browser_scans_and_inspects_reference_content():
    from lumixengine_tpu.editor.asset_browser import AssetBrowser

    ab = AssetBrowser((REF_DEMO,))
    assert len(ab.entries) > 50
    types = {e.type for e in ab.entries}
    assert {"model", "world", "particle_script", "navzone"} <= types

    # filter narrows, selection stays in range
    ab.filter = "demo.unv"
    vis = ab.visible()
    assert vis and all("demo.unv" in e.path for e in vis)
    sel = ab.selected()
    det = ab.details(sel)
    assert det["entities"] > 50           # the real demo map parses

    # model details via the real FBX importer
    ab.filter = "ybot.fbx"
    det = ab.details(ab.selected())
    assert det.get("geometries", 0) >= 1

    # particle script details via the real compiler
    ab.filter = ".pat"
    pats = ab.visible()
    assert pats
    det = ab.details(pats[0])
    assert det.get("emitters") or "error" in det


def test_asset_browser_keys_and_recompile(tmp_path):
    from lumixengine_tpu.editor.asset_browser import AssetBrowser
    from lumixengine_tpu.editor.asset_compiler import AssetCompiler

    (tmp_path / "a.pat").write_text("emitter e { }")
    (tmp_path / "b.wav").write_bytes(b"RIFF")
    compiler = AssetCompiler()
    compiled = []
    compiler.add_plugin("pat", lambda p, src: compiled.append(p) or src)
    ab = AssetBrowser((str(tmp_path),), compiler=compiler)
    assert len(ab.entries) == 2

    # typing filters, backspace unfilters
    for ch in "pat":
        ab.handle_key(0, ch)
    assert [e.path for e in ab.visible()] == ["a.pat"]
    ab.handle_key(8)
    assert ab.filter == "pa"

    # enter toggles details, up/down clamp
    ab.handle_key(13)
    assert ab.show_details
    ab.handle_key(_DOWN)
    ab.handle_key(_UP)
    assert ab.sel == 0

    # recompile through the AssetCompiler plugin
    ab.filter = "a.pat"
    ab.handle_key(0, "!")
    assert compiled and compiled[0].endswith("a.pat")
    assert "compiled" in ab.status

    # no plugin for wavs → reported, not raised
    ab.filter = "b.wav"
    ab.sel = 0
    assert "no compile plugin" in ab.recompile(ab.selected())

    text = ab.render_text(90, 20)
    assert "asset browser" in text and "b.wav" in text


# ---------------------------------------------------------------------------
# profiler viewer
# ---------------------------------------------------------------------------

def test_profiler_ui_flamegraph_and_counters():
    from lumixengine_tpu.core import profiler
    from lumixengine_tpu.editor.profiler_ui import ProfilerUI

    profiler.clear()
    profiler.enable(True)
    profiler.pause(False)
    for _ in range(3):
        with profiler.block("frame_work"):
            with profiler.block("physics"):
                pass
            with profiler.block("render"):
                with profiler.block("cull"):
                    pass
        profiler.frame()
    profiler.push_counter("visible_count", 42.0)
    profiler.push_counter("visible_count", 64.0)

    ui = ProfilerUI()
    ui.snapshot()
    assert len(ui.frame_spans()) >= 1
    t0, t1 = ui.window()
    rows = ui.flame_rows(t0 - 1.0, t1 + 1.0)
    assert len(rows) >= 3                       # nesting depth respected
    names0 = {n for n, _, _ in rows[0]}
    assert "frame_work" in names0
    assert any("cull" in {n for n, _, _ in r} for r in rows[1:])

    text = ui.render_text(100, 24)
    assert "profiler" in text and "frame_work" in text

    ui.handle_key(0, "c")                       # counters tab
    text = ui.render_text(100, 24)
    assert "visible_count" in text and "64" in text

    # frame navigation clamps
    ui.handle_key(0, "c")
    ui.handle_key(_LEFT)
    ui.handle_key(_LEFT)
    ui.handle_key(_RIGHT)
    assert 0 <= ui.frame_sel < max(len(ui.frame_spans()), 1)
    profiler.pause(False)


# ---------------------------------------------------------------------------
# scene view
# ---------------------------------------------------------------------------

def test_scene_view_flies_and_presents():
    from lumixengine_tpu.editor.scene_view import SceneView
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=128)
    sv = SceneView(engine, world, width=64, height=36)
    img = sv.frame()
    assert img.shape == (36, 64, 3) and img.dtype == np.uint8

    # fly forward: camera entity transform moves in the world
    p0 = np.asarray(world.get_local_transform(sv.cam)[0]).copy()
    sv.handle_key(0, "w")
    p1 = np.asarray(world.get_local_transform(sv.cam)[0])
    assert np.linalg.norm(p1 - p0) > 1.0
    assert sv._dirty                      # next frame re-uploads host state
    img2 = sv.frame()
    assert not sv._dirty
    assert img2.shape == img.shape

    # play mode ticks the sim (frame counter advances)
    sv.handle_key(0, "g")
    assert sv.playing
    f0 = int(sv.runner().state.frame)
    sv.frame()
    assert int(sv.runner().state.frame) == f0 + 1

    text = sv.render_text(60, 12)
    assert "scene view" in text and "\x1b[38;2;" in text


def test_scene_view_terrain_brush_sculpts():
    """Terrain brush (≙ renderer/editor terrain_editor.cpp raise/lower):
    't' raises a gaussian bump at the point ahead of the editor camera,
    'T' lowers it back; the registry heights are edited in place so the
    software raster shows the sculpt on the next frame."""
    from lumixengine_tpu.editor.scene_view import SceneView
    from lumixengine_tpu.models.demo_scenes import build_engine

    engine, renderer = build_engine(model_instances=8)
    tid = renderer.terrains.add(np.zeros((64, 64), np.float32), xz_scale=1.0)
    world = engine.create_world(capacity=16)
    t = world.create_entity(position=(0.0, 0.0, 0.0), name="terrain")
    world.create_component(t, "terrain", terrain=tid)
    sv = SceneView(engine, world, width=32, height=18)
    hm0 = renderer.terrains.get(tid)["heights"].copy()
    sv.handle_key(0, "t")
    hm1 = renderer.terrains.get(tid)["heights"]
    assert hm1.max() > hm0.max() + 0.5            # raised ~brush_strength
    assert (hm1 >= hm0 - 1e-6).all()              # raise-only brush
    peak = np.unravel_index(np.argmax(hm1), hm1.shape)
    assert hm1[peak] > hm1[0, 0] + 0.5            # localized, not uniform
    sv.handle_key(0, "T")                         # lower undoes the bump
    hm2 = renderer.terrains.get(tid)["heights"]
    assert np.abs(hm2 - hm0).max() < 1e-4
    sv.handle_key(0, "]")
    assert sv.brush_radius == 16.0
    assert "brush radius" in sv.status


# ---------------------------------------------------------------------------
# EditorApp integration
# ---------------------------------------------------------------------------

def test_editor_app_view_switching(tmp_path):
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=64)
    app = EditorApp(engine, world)

    # main → profiler → main
    app.handle_key(0, "3")
    assert app.view == "profiler"
    assert "profiler" in app.render_text(80, 20)
    app.handle_key(27)
    assert app.view == "main"

    # main → assets (typing filters there instead of triggering main keys)
    app.handle_key(0, "2")
    assert app.view == "assets"
    n_ent = len([e for e in range(world.capacity) if world.is_alive(e)])
    app.handle_key(0, "n")        # would create an entity in main view
    assert len([e for e in range(world.capacity)
                if world.is_alive(e)]) == n_ent
    assert app.asset_browser().filter == "n"
    app.handle_key(27)
    assert app.view == "main"

    # main → scene view renders ANSI pixels; esc returns; q still quits
    app.handle_key(0, "4")
    assert app.view == "scene"
    assert "\x1b[38;2;" in app.render_text(50, 10)
    app.handle_key(27)
    app.handle_key(0, "q")
    assert app.quit_requested
