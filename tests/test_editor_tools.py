"""Gizmo manipulation math + EntityFolders (≙ reference
src/editor/gizmo.cpp, src/editor/entity_folders.cpp)."""
import numpy as np
import pytest

from lumixengine_tpu.editor import gizmo as G
from lumixengine_tpu.editor.entity_folders import EntityFolders, INVALID_FOLDER

IDENT = np.asarray([0.0, 0.0, 0.0, 1.0], np.float32)


def test_pick_translate_axes():
    cfg = G.Config(mode=G.Mode.TRANSLATE)
    pos = np.zeros(3)
    # ray passing near the +X handle tip, from the front
    h = G.pick(cfg, pos, IDENT, [0.8, 0.02, -5.0], [0.0, 0.0, 1.0])
    assert h == G.Handle.X
    h = G.pick(cfg, pos, IDENT, [0.02, 0.8, -5.0], [0.0, 0.0, 1.0])
    assert h == G.Handle.Y
    h = G.pick(cfg, pos, IDENT, [-5.0, 0.02, 0.8], [1.0, 0.0, 0.0])
    assert h == G.Handle.Z
    # between X and Y at mid-range: the XY plane handle
    h = G.pick(cfg, pos, IDENT, [0.4, 0.4, -5.0], [0.0, 0.0, 1.0])
    assert h == G.Handle.XY
    # far away: nothing
    h = G.pick(cfg, pos, IDENT, [5.0, 5.0, -5.0], [0.0, 0.0, 1.0])
    assert h == G.Handle.NONE


def test_translate_drag_along_axis():
    cfg = G.Config(mode=G.Mode.TRANSLATE)
    pos = np.zeros(3)
    ds = G.start_drag(cfg, G.Handle.X, pos, IDENT, np.ones(3),
                      [0.5, 0.0, -5.0], [0.0, 0.0, 1.0])
    # move the ray 1.25 units right
    p, r, s = G.drag(cfg, ds, [1.75, 0.0, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(p, [1.25, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(r, IDENT)
    # snapping rounds to the step
    cfg.is_step = True
    cfg.steps = (1.0, np.pi / 8, 1.0)
    p, _, _ = G.drag(cfg, ds, [1.75, 0.0, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(p, [1.0, 0.0, 0.0], atol=1e-5)


def test_translate_drag_plane():
    cfg = G.Config(mode=G.Mode.TRANSLATE)
    ds = G.start_drag(cfg, G.Handle.XY, np.zeros(3), IDENT, np.ones(3),
                      [0.3, 0.3, -5.0], [0.0, 0.0, 1.0])
    p, _, _ = G.drag(cfg, ds, [1.3, 0.8, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(p, [1.0, 0.5, 0.0], atol=1e-5)


def test_rotate_drag_quarter_turn():
    from lumixengine_tpu.core import host_math as hm

    cfg = G.Config(mode=G.Mode.ROTATE)
    pos = np.zeros(3)
    # rotate about Y: start at +X on the ring, drag to +Z
    ds = G.start_drag(cfg, G.Handle.Y, pos, IDENT, np.ones(3),
                      [1.0, 5.0, 0.0], [0.0, -1.0, 0.0])
    _, r, _ = G.drag(cfg, ds, [0.0, 5.0, 1.0], [0.0, -1.0, 0.0])
    # the resulting quat should rotate +X onto the dragged direction (+Z here,
    # sign per right-hand rule about +Y: x→z is -90°... the drag math follows
    # the actual motion, so check the rotated basis lands where dragged)
    v = hm.quat_rotate(np.asarray(r, np.float32), np.asarray([1.0, 0, 0], np.float32))
    np.testing.assert_allclose(v, [0.0, 0.0, 1.0], atol=1e-5)


def test_scale_drag_uniform_and_aniso():
    cfg = G.Config(mode=G.Mode.SCALE)
    pos = np.zeros(3)
    ds = G.start_drag(cfg, G.Handle.X, pos, IDENT, np.ones(3),
                      [0.5, 0.0, -5.0], [0.0, 0.0, 1.0])
    _, _, s = G.drag(cfg, ds, [1.0, 0.0, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(s, [2.0, 2.0, 2.0], atol=1e-4)
    cfg.anisotropic_scale = True
    _, _, s = G.drag(cfg, ds, [1.0, 0.0, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(s, [2.0, 1.0, 1.0], atol=1e-4)


def test_local_coord_system_axes():
    from lumixengine_tpu.core import host_math as hm

    cfg = G.Config(mode=G.Mode.TRANSLATE, coord_system=G.CoordSystem.LOCAL)
    # object rotated 90° about Z: local +X = world +Y
    rot = hm.quat_from_axis_angle(np.asarray([0.0, 0, 1.0], np.float32),
                                  np.float32(np.pi / 2))
    ds = G.start_drag(cfg, G.Handle.X, np.zeros(3), rot, np.ones(3),
                      [0.0, 0.5, -5.0], [0.0, 0.0, 1.0])
    p, _, _ = G.drag(cfg, ds, [0.0, 1.5, -5.0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-4)


# ---------------------------------------------------------------------------


class _FakeWorld:
    pass


def test_entity_folders_tree_and_membership():
    ef = EntityFolders(_FakeWorld())
    root = ef.get_root(0)
    assert ef.selected_folder == root
    ef.on_entity_created(10)
    assert ef.get_folder(10) == root

    props = ef.emplace_folder("props")
    ef.select_folder(props)
    ef.on_entity_created(11)
    ef.on_entity_created(12)
    assert ef.get_folder(11) == props
    assert ef.folder_entities(props) == [11, 12]

    # nested folder + move entity
    deco = ef.emplace_folder("decoration", parent=props)
    ef.move_to_folder(12, deco)
    assert ef.folder_entities(props) == [11]
    assert ef.get_folder(12) == deco

    # rename + move folder
    ef.rename_folder(deco, "deco2")
    assert ef.folders[deco].name == "deco2"
    ef.move_folder(deco, root)
    assert ef.folders[deco].parent == root
    with pytest.raises(ValueError):
        ef.move_folder(root, deco)

    # destroying keeps entities (reparented)
    ef.destroy_folder(props)
    assert ef.get_folder(11) == root
    assert deco in ef.folders

    ef.on_entity_destroyed(11)
    assert ef.get_folder(11) == INVALID_FOLDER


def test_entity_folders_serialize_roundtrip_with_remap():
    ef = EntityFolders(_FakeWorld())
    a = ef.emplace_folder("a")
    ef.select_folder(a)
    ef.on_entity_created(5)
    blob = ef.serialize()

    ef2 = EntityFolders(_FakeWorld())
    ef2.deserialize(blob, entity_map={5: 50})
    assert ef2.get_folder(50) == a
    assert ef2.folders[a].name == "a"
    assert ef2.selected_folder == a
