import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import geometry as geom
from lumixengine_tpu.ops import culling as cullops


def make_frustum():
    # camera at origin looking down -Z, 90deg fov, square aspect
    return geom.perspective_frustum(
        jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]), jnp.float32(np.pi / 2), 1.0, 0.1, 100.0
    )


def brute_force_inside(p, fr):
    planes = np.asarray(fr.planes)
    return all(np.dot(planes[i, :3], p) + planes[i, 3] >= 0 for i in range(6))


def test_points_inside_outside():
    fr = make_frustum()
    # straight ahead
    assert brute_force_inside(np.array([0, 0, -10.0]), fr)
    # behind camera
    assert not brute_force_inside(np.array([0, 0, 10.0]), fr)
    # past far plane
    assert not brute_force_inside(np.array([0, 0, -200.0]), fr)
    # inside the 45-degree half-angle cone
    assert brute_force_inside(np.array([9.0, 0, -10.0]), fr)
    assert not brute_force_inside(np.array([11.0, 0, -10.0]), fr)
    assert brute_force_inside(np.array([0, 9.0, -10.0]), fr)
    assert not brute_force_inside(np.array([0, 11.0, -10.0]), fr)


def test_sphere_radius_tolerance():
    fr = make_frustum()
    centers = jnp.array([[12.0], [0.0], [-10.0]])
    # center outside, but big radius intersects
    vis_small = geom.frustum_sphere_visible(fr, centers, jnp.array([0.5]))
    vis_big = geom.frustum_sphere_visible(fr, centers, jnp.array([5.0]))
    assert not bool(vis_small[0])
    assert bool(vis_big[0])


def test_cull_jnp_matches_bruteforce():
    rng = np.random.default_rng(0)
    fr = make_frustum()
    centers = rng.uniform(-50, 50, size=(256, 3)).astype(np.float32)
    radii = np.zeros(256, np.float32)
    vis = np.asarray(cullops.frustum_cull_jnp(jnp.asarray(centers.T.copy()), jnp.asarray(radii), fr))
    for i in range(256):
        assert vis[i] == brute_force_inside(centers[i], fr), i


def test_cull_pallas_interpret_matches_jnp():
    rng = np.random.default_rng(1)
    fr = make_frustum()
    n = 2500  # non-multiple of tile to exercise padding
    centers = jnp.asarray(rng.uniform(-80, 80, size=(3, n)).astype(np.float32))
    radii = jnp.asarray(rng.uniform(0, 3, size=(n,)).astype(np.float32))
    ref = cullops.frustum_cull_jnp(centers, radii, fr)
    out = cullops.frustum_cull_pallas(centers, radii, fr, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_rotated_camera_frustum():
    # camera rotated 90deg around Y now looks down -X... check
    from lumixengine_tpu.core import math as lm
    rot = lm.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.float32(np.pi / 2))
    fr = geom.perspective_frustum(jnp.zeros(3), rot, jnp.float32(np.pi / 2), 1.0, 0.1, 100.0)
    # forward = rot * (0,0,-1) = (-1, 0, 0)
    assert brute_force_inside(np.array([-10.0, 0, 0]), fr)
    assert not brute_force_inside(np.array([10.0, 0, 0]), fr)


def test_ortho_frustum():
    fr = geom.ortho_frustum(jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]), 10.0, 10.0, 0.1, 50.0)
    assert brute_force_inside(np.array([4.0, 4.0, -25.0]), fr)
    assert not brute_force_inside(np.array([6.0, 0.0, -25.0]), fr)
    assert not brute_force_inside(np.array([0.0, 0.0, -60.0]), fr)


def test_aabb_and_ray_helpers():
    fr = make_frustum()
    mins = jnp.array([[-1.0, -1.0, -11.0], [80.0, 80.0, -60.0]]).T
    maxs = jnp.array([[1.0, 1.0, -9.0], [82.0, 82.0, -58.0]]).T
    inside = geom.frustum_contains_aabb(fr, mins, maxs)
    assert bool(inside[0]) and not bool(inside[1])

    hit, t = geom.ray_sphere(jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), jnp.array([0.0, 0.0, -10.0]), 1.0)
    assert bool(hit) and abs(float(t) - 9.0) < 1e-5
    hit, t = geom.ray_aabb(jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), jnp.array([-1.0, -1.0, -12.0]), jnp.array([1.0, 1.0, -8.0]))
    assert bool(hit) and abs(float(t) - 8.0) < 1e-5
