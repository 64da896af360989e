import numpy as np
import jax.numpy as jnp

from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.gui.module import GuiSystem
from lumixengine_tpu.audio.module import AudioClip, AudioSystem


def build_gui():
    engine = Engine()
    engine.add_system(GuiSystem(engine))
    world = engine.create_world(capacity=16)
    gm = world.modules["gui"]
    gm.canvas_size = (1000, 500)
    return engine, world, gm


def test_anchor_layout_nested():
    engine, world, gm = build_gui()
    # panel: center half of the canvas
    panel = world.create_entity()
    world.create_component(panel, "gui_rect", anchor=(0.25, 0.25, 0.75, 0.75))
    # child: fills panel's right half with 10px inset
    child = world.create_entity()
    world.set_parent(child, panel)
    world.create_component(child, "gui_rect", anchor=(0.5, 0.0, 1.0, 1.0),
                           offset=(10, 10, -10, -10))
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    gs = state.modules["gui"]
    r = np.asarray(gs.resolved)
    ps = gm.rects.slot_of(panel)
    cs = gm.rects.slot_of(child)
    np.testing.assert_allclose(r[:, ps], [250, 125, 750, 375], atol=1e-4)
    np.testing.assert_allclose(r[:, cs], [510, 135, 740, 365], atol=1e-4)


def test_button_hover_and_click():
    engine, world, gm = build_gui()
    b = world.create_entity()
    world.create_component(b, "gui_rect", anchor=(0, 0, 0, 0), offset=(100, 100, 200, 150))
    world.create_component(b, "gui_button")
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    # miss
    state = gm.inject_pointer(state, 50, 50, False)
    state = step(state, jnp.float32(1 / 60))
    assert not bool(state.modules["gui"].hovered[gm.rects.slot_of(b)])
    # hover, then click edge
    state = gm.inject_pointer(state, 150, 120, False)
    state = step(state, jnp.float32(1 / 60))
    assert bool(state.modules["gui"].hovered[gm.rects.slot_of(b)])
    state = gm.inject_pointer(state, 150, 120, True)
    state = step(state, jnp.float32(1 / 60))
    assert gm.clicked_entities(state) == [b]
    # held: no second click event
    state = step(state, jnp.float32(1 / 60))
    assert gm.clicked_entities(state) == []


def test_draw_list_contains_text_and_colors():
    engine, world, gm = build_gui()
    e = world.create_entity()
    world.create_component(e, "gui_rect")
    world.create_component(e, "gui_image", color=(1, 0, 0, 1))
    world.create_component(e, "gui_text", text="Hello", font_size=24)
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    dl = gm.draw_list(state)
    assert len(dl) == 1
    assert dl[0]["text"] == "Hello"
    assert dl[0]["color"] == [1, 0, 0, 1]


def build_audio():
    engine = Engine()
    audio = AudioSystem(engine)
    audio.add_clip(AudioClip.sine("hum", freq=220.0, seconds=0.1))
    engine.add_system(audio)
    world = engine.create_world(capacity=16)
    return engine, world, audio


def test_3d_attenuation_and_pan():
    engine, world, audio = build_audio()
    am = world.modules["audio"]
    lis = world.create_entity(position=(0, 0, 0), name="listener")
    world.create_component(lis, "listener")
    near = world.create_entity(position=(1.0, 0, 0))
    far = world.create_entity(position=(15.0, 0, 0))
    out = world.create_entity(position=(100.0, 0, 0))
    for e in (near, far, out):
        world.create_component(e, "ambient_sound", clip="hum", range=20.0)
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    ms = state.modules["audio"]
    g = np.asarray(ms.gain)
    sn, sf, so = (am.sounds.slot_of(e) for e in (near, far, out))
    assert g[sn] > g[sf] > 0.0
    assert g[so] == 0.0
    # sound to the listener's right pans right
    assert float(ms.pan[sn]) > 0.9
    assert int(ms.counters["audible"]) == 2
    # cursors advance while playing
    assert float(ms.cursor[sn]) > 0


def test_play_stop_and_mix():
    engine, world, audio = build_audio()
    am = world.modules["audio"]
    lis = world.create_entity(position=(0, 0, 0))
    world.create_component(lis, "listener")
    s = world.create_entity(position=(0.5, 0, 0))
    world.create_component(s, "ambient_sound", clip="hum", autoplay=False, range=10.0)
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    assert float(state.modules["audio"].gain[am.sounds.slot_of(s)]) == 0.0
    state = am.play(state, s)
    state = step(state, jnp.float32(1 / 60))
    ms = state.modules["audio"]
    assert float(ms.gain[am.sounds.slot_of(s)]) > 0.5
    block = np.asarray(am.mix_block(ms, frames=256))
    assert block.shape == (2, 256)
    assert np.abs(block).max() > 0.01


def test_echo_zone_wetness():
    engine, world, audio = build_audio()
    lis = world.create_entity(position=(0, 0, 0))
    world.create_component(lis, "listener")
    z = world.create_entity(position=(0, 0, 0))
    world.create_component(z, "echo_zone", radius=5.0, wetness=0.7)
    s = world.create_entity(position=(1, 0, 0))
    world.create_component(s, "ambient_sound", clip="hum")
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    assert abs(float(state.modules["audio"].echo_mix) - 0.7) < 1e-5


# ---------------------------------------------------------------------------
# fonts + text metrics (≙ renderer/font.cpp FontAtlas) and InputField editing
# (≙ gui_module.h InputField + gui_system.cpp text events)

def test_font_atlas_and_metrics():
    from lumixengine_tpu.renderer.font import Font

    f = Font(size=20)
    w, h = f.text_extents("Hello")
    assert 30 < w < 90 and 18 <= h <= 32
    # wider text measures wider; multiline stacks lines
    w2, _ = f.text_extents("Hello, longer text")
    assert w2 > w
    _, h2 = f.text_extents("a\nb\nc")
    assert abs(h2 - 3 * f.line_height) < 1e-6
    img = f.rasterize_text("Hi")
    assert (img > 64).sum() > 20
    q = f.layout("Hi", 100.0, 50.0)
    assert len(q) == 2 and q[0][0] >= 100.0 and q[0][1] >= 50.0


def test_gui_text_alignment_quads():
    engine, world, gm = build_gui()
    t = world.create_entity()
    world.create_component(t, "gui_rect", anchor=(0, 0, 0, 0),
                           offset=(100, 100, 500, 200))
    world.create_component(t, "gui_text", text="Hi", font_size=20,
                           align_h=1, align_v=1)
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    items = gm.draw_list(state)
    it = next(i for i in items if i["entity"] == t)
    assert "glyphs" in it and len(it["glyphs"]) == 2
    w, h = it["text_extents"]
    gx0 = it["glyphs"][0][0]
    # centered: first glyph starts near (rect center - w/2)
    assert abs(gx0 - (300 - w / 2)) < 4.0, (gx0, w)


def test_input_field_editing_flow():
    from lumixengine_tpu.engine import input as inp
    from lumixengine_tpu.engine.input import InputSystem

    engine, world, gm = build_gui()
    f = world.create_entity()
    world.create_component(f, "gui_rect", anchor=(0, 0, 0, 0),
                           offset=(100, 100, 400, 140))
    world.create_component(f, "gui_input_field", text="abc", font_size=20)
    step = engine.build_step(world, donate=False)
    isys = InputSystem()

    # click inside the field (at its left edge → caret 0) to focus
    s = gm.inject_pointer(world.device_state(), 101.0, 120.0, True)
    s = step(s, jnp.float32(1 / 60))
    isys.update()
    gm.process_input(s, isys)
    assert gm.focused == f
    assert gm.input_fields[f]["caret"] == 0
    # release + step: the click edge clears (next frames are key-only)
    s = gm.inject_pointer(s, 101.0, 120.0, False)
    s = step(s, jnp.float32(1 / 60))

    # type at caret, then END + text append + BACKSPACE
    isys.inject_text("X")
    isys.update()
    gm.process_input(s, isys)
    assert gm.input_fields[f]["text"] == "Xabc"
    isys.inject_button(inp.DEVICE_KEYBOARD, inp.KEY_END, True)
    isys.inject_text("!")
    isys.inject_button(inp.DEVICE_KEYBOARD, inp.KEY_BACKSPACE, True)
    isys.update()
    gm.process_input(s, isys)
    assert gm.input_fields[f]["text"] == "Xabc"
    isys.inject_text("?")
    isys.update()
    gm.process_input(s, isys)
    assert gm.input_fields[f]["text"] == "Xabc?"
    # caret rect present in the draw list while focused
    items = gm.draw_list(s)
    it = next(i for i in items if i["entity"] == f)
    assert "caret" in it and it["caret"][0] > 100.0


def test_gui_render_target():
    engine, world, gm = build_gui()
    rt = world.create_entity()
    world.create_component(rt, "gui_rect", anchor=(0, 0, 0.5, 0.5))
    world.create_component(rt, "gui_render_target", texture=7)
    gm.system.set_render_target(7, np.zeros((4, 4, 3), np.uint8))
    step = engine.build_step(world, donate=False)
    state = step(world.device_state(), jnp.float32(1 / 60))
    items = gm.draw_list(state)
    it = next(i for i in items if i["entity"] == rt)
    assert it["render_target"] == 7
    assert 7 in gm.system.render_target_textures


# ---------------------------------------------------------------------------
# ChorusZone + echo DSP taps + AudioDevice consumer (≙ audio_module.h
# ChorusZone, audio_device.cpp backend loop)

def _audio_world():
    from lumixengine_tpu.audio.module import AudioClip, AudioSystem
    engine = Engine()
    asys = AudioSystem(engine)
    engine.add_system(asys)
    asys.add_clip(AudioClip.sine("tone", freq=220.0, seconds=0.5, rate=22050))
    world = engine.create_world(capacity=16)
    return engine, world, world.modules["audio"], asys


def test_chorus_zone_activates_inside():
    engine, world, am, asys = _audio_world()
    li = world.create_entity(position=(0, 0, 0))
    world.create_component(li, "listener")
    src = world.create_entity(position=(1, 0, 0))
    world.create_component(src, "ambient_sound", clip="tone")
    cz = world.create_entity(position=(0, 0, 0))
    world.create_component(cz, "chorus_zone", radius=5.0, wetness=0.4,
                           delay_ms=15.0)
    step = engine.build_step(world, donate=False)
    s = step(world.device_state(), jnp.float32(1 / 60))
    ms = s.modules["audio"]
    assert abs(float(ms.chorus_mix) - 0.4) < 1e-6
    assert float(ms.chorus_delay) > 100.0  # 15ms at 44.1k ≈ 661 samples
    # outside the zone: no chorus
    world2_pos = (100.0, 0.0, 0.0)
    world.set_position(li, world2_pos)
    step2 = engine.build_step(world, donate=False)
    s2 = step2(world.device_state(), jnp.float32(1 / 60))
    assert float(s2.modules["audio"].chorus_mix) == 0.0


def test_mix_block_echo_tap_changes_signal():
    engine, world, am, asys = _audio_world()
    li = world.create_entity(position=(0, 0, 0))
    world.create_component(li, "listener")
    src = world.create_entity(position=(1, 0, 0))
    world.create_component(src, "ambient_sound", clip="tone")
    step = engine.build_step(world, donate=False)
    s = step(world.device_state(), jnp.float32(1 / 60))
    ms = s.modules["audio"]
    dry = np.asarray(am.mix_block(ms, frames=256))
    wet = np.asarray(am.mix_block(
        ms.replace(echo_mix=jnp.float32(0.8),
                   echo_delay=jnp.float32(500.0)), frames=256))
    assert dry.shape == (2, 256)
    assert np.abs(wet - dry).max() > 1e-4  # the tap audibly changes the mix


def test_audio_device_consumer_and_wav():
    from lumixengine_tpu.audio.module import AudioDevice
    engine, world, am, asys = _audio_world()
    li = world.create_entity(position=(0, 0, 0))
    world.create_component(li, "listener")
    src = world.create_entity(position=(1, 0, 0))
    world.create_component(src, "ambient_sound", clip="tone")
    step = engine.build_step(world, donate=False)
    s = step(world.device_state(), jnp.float32(1 / 60))
    ms = s.modules["audio"]

    dev = AudioDevice(frames_per_block=128)
    dev.pump(lambda n: am.mix_block(ms, frames=n), blocks=4)
    assert len(dev.blocks) == 4
    blob = dev.wav()
    assert blob[:4] == b"RIFF" and len(blob) > 4 * 128 * 4
    # threaded consumer fills blocks on its own
    import time
    dev2 = AudioDevice(frames_per_block=64)
    dev2.start(lambda n: am.mix_block(ms, frames=n))
    time.sleep(0.5)
    dev2.stop()
    assert len(dev2.blocks) >= 1


def test_button_click_pumps_core_signal():
    """gui buttonClicked is a module-scoped reflected event
    (≙ gui_module.h:153-159): clicking a button with a Signal component fires
    the connected reflected function through CoreModule (core.cpp:120-138)."""
    from lumixengine_tpu.engine import reflection
    from lumixengine_tpu.engine.core_module import CoreSystem

    reflection.register_builtin_components()
    fired = []
    reflection.registry.module("test_sink").func(
        "record", lambda module, entity: fired.append(entity))

    engine = Engine()
    engine.add_system(GuiSystem(engine))
    engine.add_system(CoreSystem(engine))
    world = engine.create_world(capacity=16)
    gm = world.modules["gui"]
    gm.canvas_size = (1000, 500)
    b = world.create_entity()
    world.create_component(b, "gui_rect", anchor=(0, 0, 0, 0),
                           offset=(100, 100, 200, 150))
    world.create_component(b, "gui_button")
    world.create_component(b, "signal", event_component="gui",
                           event="buttonClicked",
                           function_component="test_sink",
                           function="record", target_entity=b)
    step = engine.build_step(world, donate=False)
    state = world.device_state()
    state = gm.inject_pointer(state, 150, 120, True)
    state = step(state, jnp.float32(1 / 60))
    assert gm.pump_signals(state) == 1
    assert fired == [b]
    # held button: no edge, no signal
    state = step(state, jnp.float32(1 / 60))
    assert gm.pump_signals(state) == 0
