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
