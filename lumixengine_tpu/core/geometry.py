"""Geometry primitives (≙ reference core/geometry.{h,cpp}).

The reference's Frustum stores planes as SoA arrays xs/ys/zs/ds padded to 8 so
SSE can test a sphere against 4 planes per op (geometry.h, culling_system.cpp
doCulling). We keep the identical SoA layout — on TPU the padded plane axis
broadcasts against the entity axis across VPU lanes.

The reference's ShiftedFrustum keeps a DVec3 origin with f32 plane math for
planetary coordinates; here worlds are f32 with an optional host-side f64
origin, so Frustum is plain f32.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.core import math as lm

NUM_PLANES = 8  # 6 used + 2 padding, like reference Frustum


@struct.dataclass
class Frustum:
    """SoA plane array: plane i is (xs[i], ys[i], zs[i], ds[i]), normals point
    INWARD; point p is inside iff dot(n_i, p) + d_i >= 0 for all i. Padding
    planes are (0,0,0,+big) so they always pass."""

    xs: jnp.ndarray  # [..., 8]
    ys: jnp.ndarray
    zs: jnp.ndarray
    ds: jnp.ndarray

    @property
    def planes(self) -> jnp.ndarray:
        """[..., 8, 4] dense view."""
        return jnp.stack([self.xs, self.ys, self.zs, self.ds], axis=-1)


def _plane_from_points(a, b, c):
    """Plane through points a,b,c with normal = normalize(cross(b-a, c-a))."""
    n = lm.normalize(jnp.cross(b - a, c - a))
    d = -lm.dot(n, a)
    return n, d


def _pack_frustum(normals, ds):
    """normals: list of 6 [...,3], ds: list of 6 [...]; pads to 8."""
    n = jnp.stack(normals, axis=-2)  # [..., 6, 3]
    d = jnp.stack(ds, axis=-1)  # [..., 6]
    pad_n = jnp.zeros(n.shape[:-2] + (2, 3), n.dtype)
    pad_d = jnp.full(d.shape[:-1] + (2,), 1e30, d.dtype)
    n = jnp.concatenate([n, pad_n], axis=-2)
    d = jnp.concatenate([d, pad_d], axis=-1)
    return Frustum(xs=n[..., 0], ys=n[..., 1], zs=n[..., 2], ds=d)


def perspective_frustum(position, rotation, fov_y, aspect, near, far):
    """Build a view frustum from camera pose. Camera looks along -Z of its local
    frame (right-handed, +Y up), vertical field of view in radians.

    Built corner-first, planes oriented inward via the frustum centroid — robust
    regardless of handedness conventions.
    """
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    fwd = lm.quat_rotate(rotation, jnp.array([0.0, 0.0, -1.0], jnp.float32))
    up = lm.quat_rotate(rotation, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    right = lm.quat_rotate(rotation, jnp.array([1.0, 0.0, 0.0], jnp.float32))

    tan_half = jnp.tan(jnp.asarray(fov_y, jnp.float32) * 0.5)
    nh = tan_half * near
    nw = nh * aspect
    fh = tan_half * far
    fw = fh * aspect

    nc = position + fwd * near
    fc = position + fwd * far

    # corners: [near|far][top|bottom][left|right]
    ntl = nc + up * nh - right * nw
    ntr = nc + up * nh + right * nw
    nbl = nc - up * nh - right * nw
    nbr = nc - up * nh + right * nw
    ftl = fc + up * fh - right * fw
    ftr = fc + up * fh + right * fw
    fbl = fc - up * fh - right * fw
    fbr = fc - up * fh + right * fw

    centroid = (ntl + ntr + nbl + nbr + ftl + ftr + fbl + fbr) / 8.0

    def inward(a, b, c):
        n, d = _plane_from_points(a, b, c)
        side = lm.dot(n, centroid) + d
        flip = jnp.where(side < 0.0, -1.0, 1.0)
        return n * flip[..., None], d * flip

    planes = [
        inward(ntl, ntr, nbr),  # near
        inward(ftl, fbr, ftr),  # far
        inward(ntl, nbl, fbl),  # left
        inward(ntr, fbr, nbr),  # right
        inward(ntl, ftl, ftr),  # top
        inward(nbl, nbr, fbr),  # bottom
    ]
    return _pack_frustum([p[0] for p in planes], [p[1] for p in planes])


def ortho_frustum(position, rotation, width, height, near, far):
    """Orthographic frustum (shadow cascades etc.)."""
    position = jnp.asarray(position, jnp.float32)
    rotation = jnp.asarray(rotation, jnp.float32)
    fwd = lm.quat_rotate(rotation, jnp.array([0.0, 0.0, -1.0], jnp.float32))
    up = lm.quat_rotate(rotation, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    right = lm.quat_rotate(rotation, jnp.array([1.0, 0.0, 0.0], jnp.float32))
    hw, hh = width * 0.5, height * 0.5
    normals = [fwd, -fwd, right, -right, -up, up]
    points = [
        position + fwd * near,
        position + fwd * far,
        position - right * hw,
        position + right * hw,
        position + up * hh,
        position - up * hh,
    ]
    ds = [-lm.dot(n, p) for n, p in zip(normals, points)]
    return _pack_frustum(normals, ds)


# ---------------------------------------------------------------------------
# intersection tests (≙ geometry.cpp)
# ---------------------------------------------------------------------------


def frustum_sphere_visible(frustum: Frustum, centers, radii):
    """Vectorized sphere-vs-frustum: visible iff for every plane,
    dot(n, c) + d >= -r (sphere not fully outside any plane).
    SoA layout: centers [..., 3, N], radii [..., N] → bool [..., N]."""
    cx, cy, cz = lm.unstack(centers, -2)
    # [..., 8, N]
    dist = (
        frustum.xs[..., :, None] * cx[..., None, :]
        + frustum.ys[..., :, None] * cy[..., None, :]
        + frustum.zs[..., :, None] * cz[..., None, :]
        + frustum.ds[..., :, None]
    )
    return jnp.all(dist >= -radii[..., None, :], axis=-2)


def frustum_contains_aabb(frustum: Frustum, mins, maxs):
    """Conservative AABB test via the p-vertex: for each plane pick the corner
    most along the normal; fully-outside if even that corner is outside.
    SoA layout: mins/maxs [..., 3, N]."""
    nx = frustum.xs[..., :, None]
    ny = frustum.ys[..., :, None]
    nz = frustum.zs[..., :, None]
    mnx, mny, mnz = (m[..., None, :] for m in lm.unstack(mins, -2))
    mxx, mxy, mxz = (m[..., None, :] for m in lm.unstack(maxs, -2))
    px = jnp.where(nx >= 0, mxx, mnx)
    py = jnp.where(ny >= 0, mxy, mny)
    pz = jnp.where(nz >= 0, mxz, mnz)
    dist = px * nx + py * ny + pz * nz + frustum.ds[..., :, None]
    return jnp.all(dist >= 0.0, axis=-2)


def sphere_sphere_overlap(ca, ra, cb, rb):
    return lm.squared_length(cb - ca) <= (ra + rb) ** 2


def aabb_overlap(min_a, max_a, min_b, max_b):
    return jnp.all((min_a <= max_b) & (min_b <= max_a), axis=-1)


def ray_sphere(origin, direction, center, radius):
    """Returns (hit bool, t). direction must be normalized."""
    oc = origin - center
    b = lm.dot(oc, direction)
    c = lm.squared_length(oc) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc >= 0.0) & (t >= 0.0)
    return hit, jnp.where(hit, t, jnp.inf)


def ray_aabb(origin, direction, mins, maxs, eps: float = 1e-12):
    """Slab test. Returns (hit bool, t_enter)."""
    inv = 1.0 / jnp.where(jnp.abs(direction) < eps, jnp.where(direction >= 0, eps, -eps), direction)
    t0 = (mins - origin) * inv
    t1 = (maxs - origin) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return hit, jnp.where(hit, jnp.maximum(tmin, 0.0), jnp.inf)


def ray_plane(origin, direction, normal, d):
    denom = lm.dot(direction, normal)
    t = -(lm.dot(origin, normal) + d) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    hit = (jnp.abs(denom) >= 1e-12) & (t >= 0.0)
    return hit, jnp.where(hit, t, jnp.inf)
