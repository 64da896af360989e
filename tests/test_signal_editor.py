"""Signal editing in the property grid (≙ reference
editor/signal_editor.cpp:1-73 — Event and Function combos over the
reflection registry) plus the registry enumeration that feeds them."""
from lumixengine_tpu import app as app_mod
from lumixengine_tpu.editor.app import EditorApp
from lumixengine_tpu.engine import reflection


def _world_with_signal():
    engine = app_mod.create_full_engine()
    world = engine.create_world(capacity=8)
    btn = world.create_entity(name="button")
    world.create_component(
        btn, "signal", event_component="gui", event="buttonClicked",
        function_component="script", function="call", target_entity=btn)
    return engine, world, btn


def test_registry_enumerates_events_and_functions():
    reflection.register_builtin_components()
    import lumixengine_tpu.script.module  # noqa: F401  (registers script::call)

    evs = reflection.registry.all_events()
    assert ("gui", "buttonClicked") in evs and len(evs) >= 5
    fns = reflection.registry.all_functions()
    assert ("script", "call") in fns


def test_signal_props_surface_in_property_grid():
    engine, world, btn = _world_with_signal()
    app = EditorApp(engine, world)
    app.sel = app.entities().index((btn, 0))
    rows = app.prop_rows(btn)
    by = {(c, p): v for c, p, v in rows}
    assert by[("signal", "event")] == "buttonClicked"
    assert by[("signal", "function_component")] == "script"
    assert by[("signal", "target_entity")] == btn


def test_cycle_event_and_function_with_undo():
    engine, world, btn = _world_with_signal()
    core = world.modules["core"]
    app = EditorApp(engine, world)
    app.sel = app.entities().index((btn, 0))
    app.panel = "props"
    rows = app.prop_rows(btn)
    app.prop_sel = [i for i, r in enumerate(rows)
                    if r[0] == "signal" and r[1] == "event"][0]

    evs = reflection.registry.all_events()
    i0 = evs.index(("gui", "buttonClicked"))
    app.handle_key(0, "c")
    nxt = evs[(i0 + 1) % len(evs)]
    sig = core.signals[btn]
    assert (sig["event_component"], sig["event"]) == nxt
    assert "signal event" in app.status

    # cycling wraps the whole list back to the start
    for _ in range(len(evs) - 1):
        app.handle_key(0, "c")
    sig = core.signals[btn]
    assert (sig["event_component"], sig["event"]) == ("gui", "buttonClicked")

    # undo restores the previous pair (two commands = two undos); the
    # registry may hold events registered by other tests, so compute the
    # expected neighbor from the live list instead of assuming position 0
    app.stack.undo()
    app.stack.undo()
    sig = core.signals[btn]
    assert (sig["event_component"], sig["event"]) == \
        evs[(i0 - 1) % len(evs)]

    # function cycling hits the script::call entry
    rows = app.prop_rows(btn)
    app.prop_sel = [i for i, r in enumerate(rows)
                    if r[0] == "signal" and r[1] == "function"][0]
    app.handle_key(0, "c")
    assert core.signals[btn]["function"]      # still a valid registry entry
    fns = reflection.registry.all_functions()
    assert (core.signals[btn]["function_component"],
            core.signals[btn]["function"]) in fns
