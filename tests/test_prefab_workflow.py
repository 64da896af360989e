"""Prefab workflow in the editor (≙ reference editor/prefab_system.cpp:
1-629 — save selection as .fab, instantiate at a pose, undoable): 'p'
captures the selected subtree, 'P' spawns the last prefab through an
undoable command, and .fab files list in the asset browser."""
import numpy as np

from lumixengine_tpu import app as app_mod
from lumixengine_tpu.editor.app import EditorApp


def _app(tmp_path):
    engine = app_mod.create_full_engine(base_path=str(tmp_path))
    world = engine.create_world(capacity=64)
    cam = world.create_entity(position=(0.0, 2.0, 10.0), name="camera")
    world.create_component(cam, "camera")
    root = world.create_entity(position=(1.0, 2.0, 3.0), name="turret")
    child = world.create_entity(position=(0.0, 1.0, 0.0), parent=root,
                                name="barrel")
    world.create_component(root, "point_light", intensity=4.0)
    return EditorApp(engine, world,
                     settings_path=str(tmp_path / "e.ini")), world, root


def test_prefab_save_instantiate_undo(tmp_path):
    app, world, root = _app(tmp_path)
    app.sel = app.entities().index((root, 0))

    app.handle_key(0, "p")
    assert "prefab saved" in app.status
    fab = tmp_path / "turret.fab"
    assert fab.exists() and fab.stat().st_size > 0

    n0 = world.entity_count
    app.handle_key(0, "P")
    assert "2 entities instantiated" in app.status
    assert world.entity_count == n0 + 2
    # the new root spawned offset from the selection, child under it
    names = {e: world.get_entity_name(e)
             for e in range(world.capacity) if world.is_alive(e)}
    turrets = [e for e, n in names.items() if n == "turret"]
    assert len(turrets) == 2
    new_root = next(e for e in turrets if e != root)
    np.testing.assert_allclose(
        np.asarray(world.get_local_transform(new_root)[0]), [3.0, 2.0, 3.0])
    kids = [e for e in range(world.capacity)
            if world.is_alive(e) and world.parent[e] == new_root]
    assert len(kids) == 1 and names[kids[0]] == "barrel"
    # components came along
    assert world.has_component(new_root, "point_light")

    # undo removes exactly the spawned subtree
    app.stack.undo()
    assert world.entity_count == n0
    assert world.is_alive(root)

    # redo spawns again (fresh ids are fine)
    app.stack.redo()
    assert world.entity_count == n0 + 2


def test_prefab_listed_by_asset_browser(tmp_path):
    from lumixengine_tpu.editor.asset_browser import AssetBrowser

    app, world, root = _app(tmp_path)
    app.sel = app.entities().index((root, 0))
    app.handle_key(0, "p")
    ab = AssetBrowser((str(tmp_path),))
    assert any(e.type == "prefab" for e in ab.entries)
