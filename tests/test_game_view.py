"""Game view — play-in-editor (editor/game_view.py ≙ reference
renderer/editor/game_view.cpp:1-354 + world_editor.cpp:2252-2302
toggleGameMode): play snapshots the world, stop restores it bit-exact;
time multiplier / pause / single-step / forced viewport / debug-show map
the reference's controls GUI."""
import numpy as np


def _app(n=64):
    from lumixengine_tpu.editor.app import EditorApp
    from lumixengine_tpu.models import demo_scenes

    engine, world, _ = demo_scenes.headless_demo_world(num_entities=n)
    return EditorApp(engine, world), engine, world


def test_game_view_play_restores_world():
    app, engine, world = _app()
    app.handle_key(0, "8")
    assert app.view == "game"
    gv = app.game_view()

    # pre-play facts to restore
    n0 = world.entity_count
    probe = next(e for e in range(world.capacity)
                 if world.is_alive(e) and world.parent[e] < 0)
    p0 = np.asarray(world.get_local_transform(probe)[0]).copy()

    app.handle_key(0, "g")                 # enter game mode
    assert gv.playing and engine.game_running
    gv.tick_frame()                        # the sim actually runs
    assert gv.frames == 1

    # gameplay mutates the HOST world (what scripts do): kill, spawn, move
    parents = {int(p) for p in world.parent if p >= 0}
    victim = next(e for e in range(world.capacity)
                  if world.is_alive(e) and world.parent[e] < 0
                  and e != probe and e not in parents)
    victim_name = world.get_entity_name(victim)
    world.destroy_entity(victim)
    spawned = world.create_entity(name="runtime_spawn")
    world.set_local_transform(probe, position=(9.0, 9.0, 9.0))
    assert world.entity_count == n0

    app.handle_key(0, "g")                 # leave game mode → restore
    assert not gv.playing and not engine.game_running
    restored = app.world
    assert restored is not world           # fresh world, reference semantics
    assert gv.world is restored
    assert restored.entity_count == n0
    assert restored.is_alive(victim)       # the kill is undone
    assert restored.get_entity_name(victim) == victim_name
    assert restored.get_entity_name(spawned) != "runtime_spawn"
    p1 = np.asarray(restored.get_local_transform(probe)[0])
    np.testing.assert_array_equal(p1, p0)  # the move is undone
    # the editor rebinds its model to the restored world
    assert app.stack.world is restored


def test_game_view_controls():
    app, engine, world = _app()
    app.handle_key(0, "8")
    gv = app.game_view()

    # time multiplier: ratio steps, clamped to the reference's 0.01-30 range
    m0 = engine.time_multiplier
    app.handle_key(0, "+")
    assert engine.time_multiplier > m0
    for _ in range(40):
        app.handle_key(0, "-")
    assert engine.time_multiplier >= 0.01
    for _ in range(60):
        app.handle_key(0, "+")
    assert engine.time_multiplier <= 30.0

    app.handle_key(0, "g")                 # play
    app.handle_key(0, " ")                 # pause
    assert engine.paused
    f0 = gv.frames
    gv.tick_frame()                        # paused tick: dt=0 inside engine
    app.handle_key(0, "n")                 # single step
    assert gv.frames == f0 + 2             # both ticked; 'n' unpauses one dt
    app.handle_key(0, " ")
    assert not engine.paused

    # forced viewport cycles and shapes the presented frame
    app.handle_key(0, "v")
    assert gv.forced_viewport == (320, 180)
    img = gv.frame(64, 64)                 # request ignored while forced
    assert img.shape[:2] == (180, 320)
    app.handle_key(0, "v")
    app.handle_key(0, "v")
    assert gv.forced_viewport is None

    # debug show: depth renders grayscale (all three channels equal)
    app.handle_key(0, "b")
    assert gv.debug_show == "depth"
    img = gv.frame(48, 32)
    assert (img[..., 0] == img[..., 1]).all()
    app.handle_key(0, "b")
    assert gv.debug_show == "none"

    app.handle_key(0, "g")                 # stop: engine unpaused for editing
    assert not engine.paused and not engine.game_running

    txt = app.render_text(60, 12)
    assert "game view" in txt and "STOPPED" in txt
