import jax.numpy as jnp
import numpy as np
import pytest

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.core import transform as xf
from lumixengine_tpu.core.transform import Transform


def rand_quat(rng, shape=()):
    q = rng.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul_identity():
    q = rand_quat(np.random.default_rng(0), (16,))
    out = lm.quat_mul(jnp.asarray(q), lm.quat_identity((16,)))
    np.testing.assert_allclose(out, q, atol=1e-6)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rand_quat(rng, (32,)))
    v = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    m = lm.quat_to_mat3(q)
    expected = jnp.einsum("...ij,...j->...i", m, v)
    np.testing.assert_allclose(lm.quat_rotate(q, v), expected, atol=1e-5)


def test_quat_mul_composes_rotation():
    a = lm.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.float32(np.pi / 2))
    b = lm.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.float32(np.pi / 2))
    v = jnp.array([0.0, 0.0, 1.0])
    # apply b then a
    out = lm.quat_rotate(lm.quat_mul(a, b), v)
    expected = lm.quat_rotate(a, lm.quat_rotate(b, v))
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_mat3_quat_roundtrip():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rand_quat(rng, (64,)))
    q2 = lm.mat3_to_quat(lm.quat_to_mat3(q))
    # q and -q are the same rotation
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)


def test_nlerp_endpoints_and_hemisphere():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rand_quat(rng, (8,)))
    b = jnp.asarray(rand_quat(rng, (8,)))
    np.testing.assert_allclose(lm.quat_nlerp(a, b, 0.0), a, atol=1e-5)
    d1 = jnp.abs(jnp.sum(lm.quat_nlerp(a, b, 1.0) * b, axis=-1))
    np.testing.assert_allclose(d1, 1.0, atol=1e-5)
    # hemisphere: nlerp(a, -b, t) == nlerp(a, b, t) as rotations
    n1 = lm.quat_nlerp(a, b, 0.3)
    n2 = lm.quat_nlerp(a, -b, 0.3)
    np.testing.assert_allclose(jnp.abs(jnp.sum(n1 * n2, axis=-1)), 1.0, atol=1e-5)


def test_slerp_matches_nlerp_small_angle():
    a = lm.quat_identity((1,))
    b = lm.quat_from_axis_angle(jnp.array([[0.0, 1.0, 0.0]]), jnp.array([0.01], jnp.float32))
    s = lm.quat_slerp(a, b, 0.5)
    n = lm.quat_nlerp(a, b, 0.5)
    np.testing.assert_allclose(s, n, atol=1e-5)


def test_slerp_constant_angular_velocity():
    a = lm.quat_identity()
    b = lm.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi * 0.75))
    q_half = lm.quat_slerp(a, b, 0.5)
    ang = 2.0 * np.arccos(np.clip(float(q_half[3]), -1, 1))
    np.testing.assert_allclose(ang, np.pi * 0.375, atol=1e-4)


def test_transform_compose_inverse_roundtrip():
    rng = np.random.default_rng(4)
    t = Transform(
        pos=jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32)),
        rot=jnp.asarray(rand_quat(rng, (8,)).T.copy()),
        scale=jnp.asarray(rng.uniform(0.5, 2.0, size=(3, 8)).astype(np.float32)),
    )
    ident = xf.compose(t, xf.inverse(t))
    np.testing.assert_allclose(ident.pos, 0.0, atol=1e-4)
    np.testing.assert_allclose(np.abs(ident.rot[3, :]), 1.0, atol=1e-5)
    np.testing.assert_allclose(ident.scale, 1.0, atol=1e-5)


def test_compute_local_inverts_compose():
    rng = np.random.default_rng(5)
    parent = Transform(
        pos=jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32)),
        rot=jnp.asarray(rand_quat(rng, (8,)).T.copy()),
        scale=jnp.asarray(rng.uniform(0.5, 2.0, size=(3, 8)).astype(np.float32)),
    )
    local = Transform(
        pos=jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32)),
        rot=jnp.asarray(rand_quat(rng, (8,)).T.copy()),
        scale=jnp.asarray(rng.uniform(0.5, 2.0, size=(3, 8)).astype(np.float32)),
    )
    global_t = xf.compose(parent, local)
    recovered = xf.compute_local(parent, global_t)
    np.testing.assert_allclose(recovered.pos, local.pos, atol=1e-4)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(recovered.rot) * np.asarray(local.rot), axis=-2)), 1.0, atol=1e-5
    )
    np.testing.assert_allclose(recovered.scale, local.scale, atol=1e-4)


def test_host_math_matches_device_math():
    rng = np.random.default_rng(6)
    a = rand_quat(rng, (5,))
    b = rand_quat(rng, (5,))
    v = rng.normal(size=(5, 3)).astype(np.float32)
    np.testing.assert_allclose(hm.quat_mul(a, b), lm.quat_mul(jnp.asarray(a), jnp.asarray(b)), atol=1e-6)
    np.testing.assert_allclose(hm.quat_rotate(a, v), lm.quat_rotate(jnp.asarray(a), jnp.asarray(v)), atol=1e-5)


def test_dual_quat_transform_matches_rigid():
    rng = np.random.default_rng(7)
    q = jnp.asarray(rand_quat(rng, (8,)))
    p = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    dq = lm.dual_quat_from_rigid(q, p)
    out = lm.dual_quat_transform(dq, v)
    expected = lm.quat_rotate(q, v) + p
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_normalize_safe_on_zero():
    v = jnp.zeros((4, 3))
    out = lm.normalize(v)
    assert np.all(np.isfinite(np.asarray(out)))
