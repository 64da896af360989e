import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.animation.animation import Clip, ClipRegistry, make_walk_clip
from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.ops import sampling, pose as pose_ops, skinning, ik
from lumixengine_tpu.renderer.model import make_humanoid_skeleton


def make_bank(num_bones=8, clips=2):
    sk = make_humanoid_skeleton(num_bones, seed=1)
    reg = ClipRegistry()
    for i in range(clips):
        reg.add(make_walk_clip(sk, name=f"clip{i}", frames=17 + 4 * i, fps=24.0, seed=i))
    bank, statics = reg.bake(max_bones=num_bones)
    return sk, reg, bank, statics


def test_sample_matches_host_oracle():
    sk, reg, bank, statics = make_bank()
    times = jnp.array([0.0, 0.1, 0.33, 0.61, 2.5], jnp.float32)
    clips = jnp.array([0, 0, 1, 1, 0], jnp.int32)
    pos, rot = sampling.sample_clips(bank.table, times, clips, statics)
    for i in range(5):
        c = reg.get(int(clips[i]))
        hp, hr = c.sample_host(float(times[i]))
        np.testing.assert_allclose(np.asarray(pos[:, : c.bone_count, i]).T, hp, atol=1e-4)
        dots = np.abs(np.sum(np.asarray(rot[:, : c.bone_count, i]).T * hr, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_sample_looping_wraps():
    sk, reg, bank, statics = make_bank()
    c = reg.get(0)
    L = c.length_seconds
    p0, r0 = sampling.sample_clips(bank.table, jnp.array([0.05]), jnp.array([0]), statics)
    p1, r1 = sampling.sample_clips(bank.table, jnp.array([L + 0.05]), jnp.array([0]), statics)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-4)


def test_sample_weight_and_mask():
    sk, reg, bank, statics = make_bank()
    times = jnp.array([0.2, 0.2], jnp.float32)
    clips = jnp.array([0, -1], jnp.int32)  # second animator masked out
    w = jnp.array([0.5, 1.0], jnp.float32)
    pos, rot = sampling.sample_clips(bank.table, times, clips, statics, weight=w,
                                     normalize_rot=False)
    full, _ = sampling.sample_clips(bank.table, times, jnp.array([0, 0]), statics,
                                    normalize_rot=False)
    np.testing.assert_allclose(np.asarray(pos[:, :, 0]), 0.5 * np.asarray(full[:, :, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pos[:, :, 1]), 0.0, atol=1e-6)


def test_compute_absolute_matches_host():
    sk, reg, bank, statics = make_bank()
    plan = pose_ops.BonePlan(sk.bone_parent)
    # bind pose: absolute should equal skeleton.absolute_bind
    b = sk.bone_count
    pos = jnp.asarray(sk.bind_pos.T)[:, :, None]  # [3,B,1]
    rot = jnp.asarray(sk.bind_rot.T)[:, :, None]
    apos, arot = pose_ops.compute_absolute(pos, rot, plan)
    hp, hr = sk.absolute_bind()
    np.testing.assert_allclose(np.asarray(apos[:, :, 0]).T, hp, atol=1e-4)
    dots = np.abs(np.sum(np.asarray(arot[:, :, 0]).T * hr, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_blend_endpoints_and_mask():
    rng = np.random.default_rng(3)
    shape = (3, 4, 2)
    pa = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    pb = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    ra = jnp.asarray(hm.quat_normalize(rng.normal(size=(4, 4, 2)).astype(np.float32).transpose(1,0,2)).transpose(1,0,2)) if False else None
    qa = rng.normal(size=(2, 4, 4)).astype(np.float32)
    qa /= np.linalg.norm(qa, axis=-1, keepdims=True)
    qb = rng.normal(size=(2, 4, 4)).astype(np.float32)
    qb /= np.linalg.norm(qb, axis=-1, keepdims=True)
    ra = jnp.asarray(qa.transpose(2, 1, 0))  # [4,B=4,A=2]
    rb = jnp.asarray(qb.transpose(2, 1, 0))
    p0, r0 = pose_ops.blend(pa, ra, pb, rb, 0.0)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(pa), atol=1e-6)
    p1, r1 = pose_ops.blend(pa, ra, pb, rb, 1.0)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(pb), atol=1e-6)
    # bone mask keeps pose A on masked-out bones
    mask = np.array([True, False, True, False])
    pm, rm = pose_ops.masked_blend(pa, ra, pb, rb, 1.0, mask)
    np.testing.assert_allclose(np.asarray(pm[:, 1, :]), np.asarray(pa[:, 1, :]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pm[:, 0, :]), np.asarray(pb[:, 0, :]), atol=1e-6)


def test_palette_identity_at_bind():
    sk, reg, bank, statics = make_bank()
    plan = pose_ops.BonePlan(sk.bone_parent)
    pos = jnp.asarray(sk.bind_pos.T)[:, :, None]
    rot = jnp.asarray(sk.bind_rot.T)[:, :, None]
    apos, arot = pose_ops.compute_absolute(pos, rot, plan)
    ibp, ibr = sk.inverse_bind()
    pal = skinning.build_palette_dq(apos, arot, jnp.asarray(ibp.T), jnp.asarray(ibr.T))
    # at bind pose, palette must be the identity dual quat
    np.testing.assert_allclose(np.asarray(pal[:3]), 0.0, atol=1e-4)   # x,y,z
    np.testing.assert_allclose(np.abs(np.asarray(pal[3])), 1.0, atol=1e-4)  # w
    np.testing.assert_allclose(np.asarray(pal[4:]), 0.0, atol=1e-4)   # dual part


def test_vertex_skinning_rigid_equivalence():
    # one bone, vertices fully bound to it → skinning == rigid transform
    rng = np.random.default_rng(4)
    q = rng.normal(size=4).astype(np.float32)
    q /= np.linalg.norm(q)
    t = rng.normal(size=3).astype(np.float32)
    from lumixengine_tpu.core import math as lm
    pal = lm.dual_quat_from_rigid(jnp.asarray(q)[:, None, None], jnp.asarray(t)[:, None, None], axis=-3)
    pts = rng.normal(size=(5, 3)).astype(np.float32)
    w = skinning.weights_matrix(np.zeros((5, 1), np.int32), np.ones((5, 1), np.float32), 1)
    blended = skinning.blend_palette(pal, jnp.asarray(w))
    out = skinning.skin_points(blended, jnp.asarray(pts.T))
    expected = hm.quat_rotate(q, pts) + t
    np.testing.assert_allclose(np.asarray(out[:, :, 0]).T, expected, atol=1e-4)


def test_fabrik_reaches_target():
    # 4-joint straight chain along +X, lengths 1; target within reach
    L, A = 4, 3
    joints = jnp.zeros((3, L, A)).at[0].set(jnp.arange(L, dtype=jnp.float32)[:, None])
    target = jnp.asarray(np.array([[1.5, 1.2, 2.0], [1.0, 0.8, 1.5], [0.5, 0.3, -0.5]], np.float32))
    solved = ik.fabrik(joints, target, iterations=10)
    end = np.asarray(solved[:, -1, :])
    np.testing.assert_allclose(end, np.asarray(target), atol=2e-2)
    # segment lengths preserved
    seg = np.diff(np.asarray(solved), axis=1)
    lens = np.linalg.norm(seg, axis=0)
    np.testing.assert_allclose(lens, 1.0, atol=1e-3)
    # root pinned
    np.testing.assert_allclose(np.asarray(solved[:, 0, :]), 0.0, atol=1e-6)


def test_fabrik_unreachable_stretches_toward():
    L, A = 3, 1
    joints = jnp.zeros((3, L, A)).at[0].set(jnp.arange(L, dtype=jnp.float32)[:, None])
    target = jnp.asarray(np.array([[10.0], [0.0], [0.0]], np.float32))
    solved = ik.fabrik(joints, target, iterations=8)
    end = np.asarray(solved[:, -1, 0])
    np.testing.assert_allclose(end, [2.0, 0.0, 0.0], atol=1e-3)  # fully extended


def test_apply_ik_alpha():
    L, A = 3, 1
    joints = jnp.zeros((3, L, A)).at[0].set(jnp.arange(L, dtype=jnp.float32)[:, None])
    target = jnp.asarray(np.array([[0.0], [2.0], [0.0]], np.float32))
    half = ik.apply_ik(joints, target, alpha=0.0)
    np.testing.assert_allclose(np.asarray(half), np.asarray(joints), atol=1e-6)
