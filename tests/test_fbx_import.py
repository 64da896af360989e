"""FBX + .act importer tests against the reference's shipped demo assets
(≙ the capability of renderer/editor/fbx_importer.cpp via openfbx and the
animation controller resource, controller.cpp:88-140)."""
import os

import numpy as np
import pytest

YBOT = "/root/reference/demo/models/ybot/ybot.fbx"
RUN = "/root/reference/demo/models/ybot/run forward.fbx"
ACT = "/root/reference/demo/models/ybot/ybot.act"

pytestmark = pytest.mark.skipif(not os.path.exists(YBOT),
                                reason="reference demo assets not present")


@pytest.fixture(scope="module")
def ybot_doc():
    from lumixengine_tpu.importers import fbx

    return fbx.load_fbx(YBOT)


@pytest.fixture(scope="module")
def ybot_model(ybot_doc):
    from lumixengine_tpu.importers import fbx

    return fbx.to_model(ybot_doc, name="ybot")


def test_ybot_skeleton(ybot_model):
    sk = ybot_model.skeleton
    assert sk.bone_count == 52
    assert sk.bone_names[0] == "mixamorig:Hips"
    assert (sk.bone_parent < np.arange(sk.bone_count)).all()
    # bind pose stands ~1.6 m tall (mixamo ybot, meters after unit scale)
    from lumixengine_tpu.core import host_math as hm

    gp = np.zeros((sk.bone_count, 3))
    gr = np.zeros((sk.bone_count, 4))
    for i in range(sk.bone_count):
        p = sk.bone_parent[i]
        if p < 0:
            gp[i], gr[i] = sk.bind_pos[i], sk.bind_rot[i]
        else:
            gp[i] = gp[p] + hm.quat_rotate(gr[p], sk.bind_pos[i])
            gr[i] = hm.quat_mul(gr[p], sk.bind_rot[i])
    assert 1.3 < gp[:, 1].max() < 2.0


def test_ybot_mesh(ybot_model):
    m = ybot_model
    assert m.vertex_positions.shape[0] > 20_000
    assert 1.5 < m.bounding_radius < 2.5
    # weights normalized, bones in range
    assert np.abs(m.vertex_weights.sum(1) - 1).max() < 1e-5
    assert m.vertex_bones4.max() < m.skeleton.bone_count


def test_run_clip(ybot_model):
    from lumixengine_tpu.importers import fbx

    doc = fbx.load_fbx(RUN)
    clip = fbx.to_clip(doc, ybot_model.skeleton, name="run")
    assert clip.bone_count == 52
    assert clip.frame_count >= 10
    hips = clip.pos[:, 0]  # root bone
    # a run cycle moves the hips forward in the track
    assert np.linalg.norm(hips[-1] - hips[0]) > 0.5
    # quats normalized + sign coherent
    assert np.abs(np.linalg.norm(clip.rot, axis=-1) - 1).max() < 1e-4
    dots = np.sum(clip.rot[1:] * clip.rot[:-1], axis=-1)
    assert (dots >= -1e-5).all()


def test_act_parse():
    from lumixengine_tpu.importers import act

    with open(ACT, "rb") as f:
        parsed = act.parse_act(f.read())
    assert parsed["skeleton"] == "models/ybot/ybot.fbx"
    assert [n for _, n in parsed["inputs"]] == [
        "speed_x", "speed_y", "left_hand_ik_target", "left_hand_ik_alpha",
        "stance"]
    assert parsed["inputs"][2][0] == "vec3"
    assert len(parsed["slots"]) == 31
    assert len(parsed["entries"]) == 31
    assert parsed["entries"][0]["animation"].endswith("idle aiming.fbx")


def test_anim_stress_map_uses_real_assets():
    from lumixengine_tpu.importers.instantiate import load_world

    inst = load_world(
        "/root/reference/demo/maps/anim_stress_test/anim_stress_test.unv")
    assert inst.report["clip_fbx"] == 9
    assert inst.report["model_fbx"] == 2
    assert inst.report["clip_placeholder"] == 0
    assert inst.report["model_placeholder"] == 0
    # the real ybot skeleton drives the clip bank
    anim = inst.world.modules["animation"]
    assert anim.system.max_bones >= 52
