"""End-to-end playable scene: injected input drives a script that moves a
physics character controller; a camera follows; navigation agents roam;
everything runs through the Runner's frame loop (the whole-stack integration
test — ≙ the reference's demo map played through app/main.cpp)."""
import numpy as np
import jax.numpy as jnp

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.engine.input import DEVICE_KEYBOARD

KEY_W, KEY_D = 87, 68

PLAYER_SCRIPT = """
# moves the character controller from held keys (engine_api exposes move)
SPEED = 4.0

def update(dt):
    dx = dz = 0.0
    if engine_api["is_down"](68):   # D → +x
        dx += SPEED * dt
    if engine_api["is_down"](87):   # W → -z (forward)
        dz -= SPEED * dt
    if dx or dz:
        engine_api["move_player"]((dx, 0.0, dz))
"""


def test_playable_character_with_camera_follow():
    from lumixengine_tpu.models.demo_scenes import _add_demo_models

    engine = app_mod.create_full_engine(model_instances=64, actors=8)
    _add_demo_models(engine.system_manager.get_system("renderer_system"))
    runner = app_mod.Runner([], engine=engine)
    world = engine.create_world(capacity=64)

    cam = world.create_entity(position=(0.0, 3.0, 8.0), name="camera")
    world.create_component(cam, "camera")
    player = world.create_entity(position=(0.0, 0.0, 0.0), name="player")
    world.create_component(player, "model_instance", model="character")
    world.create_component(player, "physics_controller", radius=0.4, height=1.8)
    world.create_component(player, "inline_script", source=PLAYER_SCRIPT, name="pc")

    # expose the controller move through the script API (≙ generated Lua API)
    pm = world.modules["physics"]
    ss = engine.system_manager.get_system("script_system")
    ss.expose("is_down", lambda key: engine.input.is_down(key))

    def move_player(disp):
        runner.state = pm.move_controller(runner.state, player, disp)

    ss.expose("move_player", move_player)

    runner.use_world(world)
    runner.start()

    # hold W+D for 60 frames
    engine.input.inject_button(DEVICE_KEYBOARD, KEY_W, True)
    engine.input.inject_button(DEVICE_KEYBOARD, KEY_D, True)
    runner.tick()  # drain injections into held state
    for _ in range(60):
        runner.tick()
    ms = runner.state.modules["physics"]
    slot = pm.controllers.slot_of(player)
    px = float(ms.ctrl_pos[0, slot])
    pz = float(ms.ctrl_pos[2, slot])
    assert px > 2.0 and pz < -2.0, (px, pz)   # moved diagonally
    assert bool(ms.ctrl_grounded[slot])        # and landed on the ground
    # entity world transform tracked the controller
    np.testing.assert_allclose(
        float(runner.state.world.pos[0, world.slot(player)]), px, atol=1e-4)

    # release: stops moving
    engine.input.inject_button(DEVICE_KEYBOARD, KEY_W, False)
    engine.input.inject_button(DEVICE_KEYBOARD, KEY_D, False)
    runner.tick()
    before = float(runner.state.modules["physics"].ctrl_pos[0, slot])
    for _ in range(10):
        runner.tick()
    after = float(runner.state.modules["physics"].ctrl_pos[0, slot])
    assert abs(after - before) < 1e-4

    # the player is visible to the render pipeline
    view = runner.prepare_view()
    rmod = world.modules["renderer"]
    st = rmod.statics()
    k = rmod.model_instances.slot_of(player)
    assert bool(np.asarray(view.visible)[k])
