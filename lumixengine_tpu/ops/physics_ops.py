"""Rigid-body kernels — the XLA-native replacement for PhysX
(≙ reference src/physics/* which binds PhysX: broadphase SAP/MBP, narrowphase
PCM/GJK-EPA, PGS solver, islands, sleeping — all black-box prebuilt libs).

TPU pipeline (SURVEY.md §7.6):
  1. integrate velocities   — semi-implicit Euler + damping
  2. broadphase             — dense masked all-pairs over the static pair list
                              (layer-filtered, built host-side; the candidate
                              *structure* is static, only the overlap mask is
                              data). A fixed-grid path for 10k+ bodies lands
                              with the stress config.
  3. narrowphase            — analytic contacts: sphere-sphere, sphere-box,
                              box-box (corner-vs-box manifolds, top-k deepest),
                              anything-vs-ground-plane
  4. solver                 — projected Jacobi PGS: per-contact normal +
                              Coulomb friction impulses with Baumgarte bias,
                              accumulated-impulse clamping, under-relaxation;
                              impulse scatter-add to bodies is a MATMUL with
                              the static contact-incidence matrix (MXU), not a
                              scatter
  5. integrate positions    — x += v·dt, q += ½ω⊗q·dt, renormalize
  6. sleeping               — velocity-threshold frame counters

Conventions: SoA layout (body axis minor): pos [3,NB], rot quat [4,NB],
vel [3,NB], angvel [3,NB] (world space, rad/s). Contact normals point from
body i toward body j; impulses push the bodies apart.
"""
from __future__ import annotations

from typing import Dict, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as lm

AX = -2  # component axis for [C, N] SoA arrays

SHAPE_SPHERE = 0
SHAPE_BOX = 1
SHAPE_CAPSULE = 2
SHAPE_CONVEX = 3  # cooked hull (see physics/cooking.py, ops/convex_ops.py)

# unit-cube corner signs [3, 8]
_CORNER_SIGNS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float32
).T


def integrate_velocities(vel, angvel, dt, gravity, lin_damping, ang_damping, dyn_mask):
    """Semi-implicit Euler velocity update (gravity + exponential damping)."""
    g = jnp.asarray(gravity, jnp.float32)
    m = dyn_mask[..., None, :] if dyn_mask.ndim == vel.ndim - 1 else dyn_mask
    v = vel + g[..., :, None] * dt
    v = v * jnp.exp(-lin_damping * dt)
    w = angvel * jnp.exp(-ang_damping * dt)
    return jnp.where(m, v, vel), jnp.where(m, w, angvel)


def integrate_positions(pos, rot, vel, angvel, dt, dyn_mask):
    """x += v·dt; q += ½·(ω⊗q)·dt, renormalized."""
    m = dyn_mask[..., None, :]
    new_pos = pos + vel * dt
    wx, wy, wz = lm.unstack(angvel, AX)
    zero = jnp.zeros_like(wx)
    wq = jnp.stack([wx, wy, wz, zero], axis=AX)
    dq = lm.quat_mul(wq, rot, axis=AX) * (0.5 * dt)
    new_rot = lm.quat_normalize(rot + dq, axis=AX)
    return jnp.where(m, new_pos, pos), jnp.where(m, new_rot, rot)


def select_points_onehot(oh, pts):
    """Top-k point selection as a broadcast-multiply-reduce over the small
    corner/vertex axis J: oh [.., k, J, P] one-hot × pts [.., c, J, P] →
    [.., c, k, P].

    NOT an einsum: XLA lowers the einsum form ("...kjp,...cjp->...ckp") to a
    base-dilated convolution whose operands put the J axis minor — J=8 pads
    to a 128-lane tile (16-21x HBM expansion, OOM at 4096 worlds, and the
    single most expensive kernel of the frame). The elementwise form keeps P
    minor and fuses into a clean reduce."""
    prod = oh[..., None, :, :, :] * pts[..., :, None, :, :]
    return jnp.sum(prod, axis=-2)


def box_corners(pos, rot, half_extents):
    """World-space box corners: [.., 3, 8, NB]."""
    he = half_extents[..., :, None, :]  # [..,3,1,NB]
    local = he * jnp.asarray(_CORNER_SIGNS)[:, :, None]  # [..,3,8,NB]
    return pos[..., :, None, :] + lm.quat_rotate(rot[..., :, None, :], local, axis=-3)


def world_aabb(pos, rot, shape, radius, half_extents):
    """Conservative world AABB per body → (mins [3,NB], maxs [3,NB])."""
    # box: |R|·he via quat→3 column magnitudes; sphere: radius
    ex = jnp.abs(lm.quat_rotate(rot, jnp.stack([half_extents[..., 0, :], jnp.zeros_like(radius), jnp.zeros_like(radius)], axis=AX), axis=AX))
    ey = jnp.abs(lm.quat_rotate(rot, jnp.stack([jnp.zeros_like(radius), half_extents[..., 1, :], jnp.zeros_like(radius)], axis=AX), axis=AX))
    ez = jnp.abs(lm.quat_rotate(rot, jnp.stack([jnp.zeros_like(radius), jnp.zeros_like(radius), half_extents[..., 2, :]], axis=AX), axis=AX))
    box_ext = ex + ey + ez
    r = radius[..., None, :]
    ext = jnp.where((shape == SHAPE_BOX)[..., None, :], box_ext, jnp.broadcast_to(r, box_ext.shape))
    return pos - ext, pos + ext


class Contacts(NamedTuple):
    """Dense contact slots; everything is [.., C] or [.., 3, C]. body_a/b are
    STATIC arrays (host-built slot structure); masks/geometry are data.
    body_b == -1 means contact vs the static environment."""

    body_a: np.ndarray     # int32 [C] (static)
    body_b: np.ndarray     # int32 [C] (static; -1 = world)
    point: jnp.ndarray     # f32 [.., 3, C]
    normal: jnp.ndarray    # f32 [.., 3, C] (a → b)
    depth: jnp.ndarray     # f32 [.., C] penetration (>0 = penetrating)
    active: jnp.ndarray    # bool [.., C]


def ground_contacts(pos, rot, shape, radius, half_extents, dyn_mask,
                    ground_y: float = 0.0, slots_per_body: int = 4):
    """Contacts of every dynamic body vs the ground plane y=ground_y
    (normal +Y). Boxes contribute their `slots_per_body` deepest corners,
    spheres their lowest point."""
    nb = pos.shape[-1]
    k = slots_per_body
    corners = box_corners(pos, rot, half_extents)         # [..,3,8,NB]
    c_depth = ground_y - corners[..., 1, :, :]            # [..,8,NB] penetration per corner
    top_d, top_i = jax.lax.top_k(jnp.moveaxis(c_depth, -2, -1), k)  # [..,NB,k]
    # top-k corner positions via one-hot contraction over the 8-corner axis
    # (take_along_axis = minor-axis gather = TPU pathology; see pair_contacts)
    ci = jnp.moveaxis(top_i, -1, -2)                      # [..,k,NB]
    oh = (ci[..., :, None, :] == jnp.arange(8)[:, None]).astype(jnp.float32)
    box_pts = select_points_onehot(oh, corners)           # [..,3,k,NB]
    box_dep = jnp.moveaxis(top_d, -1, -2)                 # [..,k,NB]

    sph_low = pos - jnp.stack(
        [jnp.zeros_like(radius), radius, jnp.zeros_like(radius)], axis=AX
    )
    sph_dep = ground_y - sph_low[..., 1, :]
    # capsule: both axis endpoints, dropped by radius
    hh = half_extents[..., 1, :]
    c0, c1 = capsule_segment(pos, rot, hh)
    rdrop = jnp.stack([jnp.zeros_like(radius), radius, jnp.zeros_like(radius)], axis=AX)
    cap0 = c0 - rdrop
    cap1 = c1 - rdrop
    cap_pts = jnp.stack([cap0, cap1], axis=-2)  # [..,3,2,NB]
    cap_dep = jnp.stack([ground_y - cap0[..., 1, :], ground_y - cap1[..., 1, :]], axis=-2)
    is_box = (shape == SHAPE_BOX)
    is_cap = (shape == SHAPE_CAPSULE)
    # slot expansion via masked broadcast, not concatenate (layout pathology —
    # see pair_contacts single_to_slots)
    slot0 = (jnp.arange(k) == 0).astype(jnp.float32)
    slot01 = (jnp.arange(k) < 2).astype(jnp.float32)
    sph_pts = sph_low[..., :, None, :] * slot0[:, None]
    sph_deps = sph_dep[..., None, :] * slot0[:, None] - (1.0 - slot0[:, None])
    cap0e = cap_pts[..., 0:1, :] * (jnp.arange(k) == 0).astype(jnp.float32)[:, None]
    cap1e = cap_pts[..., 1:2, :] * (jnp.arange(k) == 1).astype(jnp.float32)[:, None]
    capk_pts = cap0e + cap1e
    capd0 = cap_dep[..., 0:1, :] * (jnp.arange(k) == 0).astype(jnp.float32)[:, None]
    capd1 = cap_dep[..., 1:2, :] * (jnp.arange(k) == 1).astype(jnp.float32)[:, None]
    capk_dep = capd0 + capd1 - (1.0 - slot01[:, None])
    pts = jnp.where(is_box[..., None, None, :], box_pts,
                    jnp.where(is_cap[..., None, None, :], capk_pts, sph_pts))
    dep = jnp.where(is_box[..., None, :], box_dep,
                    jnp.where(is_cap[..., None, :], capk_dep, sph_deps))
    c = k * nb
    point = pts.reshape(pts.shape[:-2] + (c,))
    depth = dep.reshape(dep.shape[:-2] + (c,))
    # normal a → b(world): ground pushes a up (+Y), so a→b points down (-Y)
    normal = jnp.zeros(point.shape).at[..., 1, :].set(-1.0)
    # slot layout is [k, NB] flattened → body index varies fastest along NB
    body_a = np.tile(np.arange(nb, dtype=np.int32), k)
    active = (depth > 0.0) & dyn_mask[..., body_a]
    return Contacts(
        body_a=body_a,
        body_b=np.full(k * nb, -1, np.int32),
        point=point,
        normal=normal,
        depth=depth,
        active=active,
    )


def capsule_segment(pos, rot, half_height):
    """Capsule axis endpoints (local +Y axis): (pa, pb) each [.., 3, N]."""
    up = lm.quat_rotate(rot, jnp.stack(
        [jnp.zeros_like(half_height), half_height, jnp.zeros_like(half_height)], axis=AX
    ), axis=AX)
    return pos + up, pos - up


def closest_point_on_segment(p, a, b):
    """Closest point to p on segment ab, all [.., 3, N]."""
    ab = b - a
    t = jnp.sum((p - a) * ab, axis=AX) / jnp.maximum(jnp.sum(ab * ab, axis=AX), 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    return a + ab * t[..., None, :]


def _sphere_sphere(pa, ra, pb, rb):
    d = pb - pa
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=AX), 1e-12))
    n = d / dist[..., None, :]
    depth = (ra + rb) - dist
    point = pa + n * ra[..., None, :]  # on a's surface
    return point, n, depth


def _point_in_box_depth(points, box_pos, box_rot, he):
    """Deepest-axis penetration of points into a box.
    points [..,3,K], box arrays [..,3/4,K] → (depth [..,K], normal [..,3,K] in
    world space pointing OUT of the box, clamped surface point [..,3,K])."""
    inv_rot = lm.quat_conjugate(box_rot, axis=AX)
    local = lm.quat_rotate(inv_rot, points - box_pos, axis=AX)  # [..,3,K]
    d = he - jnp.abs(local)  # distance to each face pair (positive inside)
    depth = jnp.min(d, axis=AX)
    axis = jnp.argmin(d, axis=AX)  # 0/1/2
    sign = jnp.sign(jnp.take_along_axis(local, axis[..., None, :], axis=AX))[..., 0, :]
    # one-hot face normal in box space
    ax0 = (axis == 0).astype(jnp.float32) * sign
    ax1 = (axis == 1).astype(jnp.float32) * sign
    ax2 = (axis == 2).astype(jnp.float32) * sign
    n_local = jnp.stack([ax0, ax1, ax2], axis=AX)
    n_world = lm.quat_rotate(box_rot, n_local, axis=AX)
    return depth, n_world


def gather_cols_onehot(x, idx, nb: int):
    """Column gather x[..., idx] (last axis NB, traced indices) as a P-minor
    one-hot broadcast-multiply-reduce. At the engine's shapes XLA lowers the
    direct traced-index gather badly twice over: f32 vector gathers
    materialize [.., P, c]-major tiles whose c-minor 128-lane padding wastes
    ~40x HBM, and s32/pred gathers get placed on the sequential SCALAR core
    (~2-4 ms for 400k elements — measured, tools/roofline.py trace). The
    elementwise one-hot form keeps P minor on the vector units and fuses
    into the surrounding narrowphase math. Only worth it for small NB
    (one-hot is [NB, P] per batch element); callers gate on nb."""
    oh = (idx[..., None, :] == jnp.arange(nb, dtype=idx.dtype)[:, None])
    fdt = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    ohf = oh.astype(fdt)
    xf = x.astype(fdt)
    if x.ndim == idx.ndim:                       # x [.., NB] → [.., P]
        out = jnp.sum(xf[..., :, None] * ohf, axis=-2)
    else:                                        # x [.., c, NB] → [.., c, P]
        out = jnp.sum(xf[..., :, :, None] * ohf[..., None, :, :], axis=-2)
    return out if fdt == x.dtype else out.astype(x.dtype)


def pair_contacts(pos, rot, shape, radius, half_extents, pair_a, pair_b,
                  points_per_pair: int = 4):
    """Narrowphase over the static pair list.

    sphere-sphere: single point; sphere-box: closest-feature; box-box: the
    `points_per_pair` deepest of both boxes' corners inside the other box.
    Returns Contacts with C = P * points_per_pair slots.
    """
    pa_i = jnp.asarray(pair_a)
    pb_i = jnp.asarray(pair_b)
    k = points_per_pair
    nb = pos.shape[-1]
    # traced pair indices + small NB: gather via the P-minor one-hot form
    # (see gather_cols_onehot — avoids scalar-core gathers and c-minor
    # padded tiles, the top frame cost at the flagship config)
    traced = not isinstance(pair_a, np.ndarray)
    use_onehot = traced and nb <= 128

    def take(x, idx):
        if use_onehot:
            return gather_cols_onehot(x, idx, nb)
        return jnp.take(x, idx, axis=-1)

    pos_a, pos_b = take(pos, pa_i), take(pos, pb_i)
    rot_a, rot_b = take(rot, pa_i), take(rot, pb_i)
    rad_a, rad_b = take(radius, pa_i), take(radius, pb_i)
    he_a, he_b = take(half_extents, pa_i), take(half_extents, pb_i)
    shape_a = shape[pair_a] if isinstance(shape, np.ndarray) else take(shape, pa_i)
    shape_b = shape[pair_b] if isinstance(shape, np.ndarray) else take(shape, pb_i)

    # static membership check when the pair list is static; with traced pair
    # indices (physics_big.py) capsule handling is compiled unconditionally
    if isinstance(shape, np.ndarray) and isinstance(pair_a, np.ndarray):
        any_caps = bool(np.any(shape[pair_a] == SHAPE_CAPSULE)
                        or np.any(shape[pair_b] == SHAPE_CAPSULE))
    else:
        any_caps = True
    point, normal, depth, active = pair_contacts_from_data(
        pos_a, rot_a, rad_a, he_a, shape_a,
        pos_b, rot_b, rad_b, he_b, shape_b,
        points_per_pair=k, any_caps=any_caps)
    if isinstance(pair_a, np.ndarray):
        body_a = np.tile(np.asarray(pair_a, np.int32), k)
        body_b = np.tile(np.asarray(pair_b, np.int32), k)
    else:  # traced pair lists (dynamic broadphase)
        body_a = jnp.tile(pair_a, k)
        body_b = jnp.tile(pair_b, k)
    return Contacts(body_a=body_a, body_b=body_b, point=point, normal=normal,
                    depth=depth, active=active)


def pair_contacts_from_data(pos_a, rot_a, rad_a, he_a, shape_a,
                            pos_b, rot_b, rad_b, he_b, shape_b,
                            points_per_pair: int = 4, any_caps: bool = True):
    """Narrowphase CORE on pre-gathered per-pair arrays (all [.., P] /
    [.., 3/4, P]) → (point, normal, depth, active), each with C = k·P slots
    in slot-major [k, P] flattened layout. Callers that can build the pair
    data without gathers (the banded sweep-order path, physics_banded.py)
    come here directly."""
    P = pos_a.shape[-1]
    k = points_per_pair

    # capsules participate as a moving sphere at the closest point of their
    # axis segment to the other body (exact for capsule-sphere; tight
    # approximation for capsule-box/capsule-capsule manifolds)
    cap_a = shape_a == SHAPE_CAPSULE
    cap_b = shape_b == SHAPE_CAPSULE
    if any_caps:
        hh_a = he_a[..., 1, :]  # half_extents.y doubles as capsule half-height
        hh_b = he_b[..., 1, :]
        a0, a1 = capsule_segment(pos_a, rot_a, hh_a)
        b0, b1 = capsule_segment(pos_b, rot_b, hh_b)
        # iterate closest-point refinement once each way (good segment-segment approx)
        pb_ref = closest_point_on_segment(pos_a, b0, b1)
        pa_eff = closest_point_on_segment(pb_ref, a0, a1)
        pa_ref = closest_point_on_segment(pos_b, a0, a1)
        pb_eff = closest_point_on_segment(pa_ref, b0, b1)
        pos_a = jnp.where(cap_a[..., None, :], pa_eff, pos_a)
        pos_b = jnp.where(cap_b[..., None, :], pb_eff, pos_b)
        # a capsule behaves as a sphere from here on
        shape_a = jnp.where(cap_a, SHAPE_SPHERE, shape_a) if not isinstance(shape_a, np.ndarray) else np.where(cap_a, SHAPE_SPHERE, shape_a)
        shape_b = jnp.where(cap_b, SHAPE_SPHERE, shape_b) if not isinstance(shape_b, np.ndarray) else np.where(cap_b, SHAPE_SPHERE, shape_b)

    # --- sphere-sphere single contact
    ss_pt, ss_n, ss_d = _sphere_sphere(pos_a, rad_a, pos_b, rad_b)

    # --- sphere(a) vs box(b): clamp sphere center into b
    invb = lm.quat_conjugate(rot_b, axis=AX)
    ca_in_b = lm.quat_rotate(invb, pos_a - pos_b, axis=AX)
    clamped = jnp.clip(ca_in_b, -he_b, he_b)
    closest_w = pos_b + lm.quat_rotate(rot_b, clamped, axis=AX)
    delta = closest_w - pos_a
    dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=AX), 1e-12))
    sb_n = delta / dist[..., None, :]   # a → b
    sb_d = rad_a - dist
    sb_pt = closest_w

    # --- box(a) vs sphere(b): mirrored
    inva = lm.quat_conjugate(rot_a, axis=AX)
    cb_in_a = lm.quat_rotate(inva, pos_b - pos_a, axis=AX)
    clamped2 = jnp.clip(cb_in_a, -he_a, he_a)
    closest2 = pos_a + lm.quat_rotate(rot_a, clamped2, axis=AX)
    delta2 = pos_b - closest2
    dist2 = jnp.sqrt(jnp.maximum(jnp.sum(delta2 * delta2, axis=AX), 1e-12))
    bs_n = delta2 / dist2[..., None, :]
    bs_d = rad_b - dist2
    bs_pt = closest2

    # --- box-box: SAT over the 6 face axes (edge-edge axes omitted — face
    # contacts dominate stacking/drop scenarios; ≙ PhysX PCM face contacts).
    # Axis with minimum positive overlap = contact normal; manifold = the
    # incident box's deepest corners against the reference face.
    def box_axes(rot):
        ex = lm.quat_rotate(rot, jnp.asarray([1.0, 0.0, 0.0])[:, None], axis=AX)
        ey = lm.quat_rotate(rot, jnp.asarray([0.0, 1.0, 0.0])[:, None], axis=AX)
        ez = lm.quat_rotate(rot, jnp.asarray([0.0, 0.0, 1.0])[:, None], axis=AX)
        return [ex, ey, ez]  # each [..,3,P]

    axes_a = box_axes(rot_a)
    axes_b = box_axes(rot_b)
    d_ab = pos_b - pos_a

    def proj(axes, he, u):
        """Support extent of a box along world axis u: Σ he_i·|a_i·u|."""
        return sum(
            he[..., i, :] * jnp.abs(jnp.sum(axes[i] * u, axis=AX)) for i in range(3)
        )

    ca = box_corners(pos_a, rot_a, he_a)  # [..,3,8,P]
    cb = box_corners(pos_b, rot_b, he_b)

    best_overlap = None
    best_n = None
    best_from_a = None
    for src, u_list in ((0, axes_a), (1, axes_b)):
        for u in u_list:
            du = jnp.sum(d_ab * u, axis=AX)
            overlap = proj(axes_a, he_a, u) + proj(axes_b, he_b, u) - jnp.abs(du)
            n_u = u * jnp.expand_dims(jnp.sign(jnp.where(du == 0, 1.0, du)), AX)  # a → b
            if best_overlap is None:
                best_overlap, best_n = overlap, n_u
                best_from_a = jnp.full(overlap.shape, src == 0)
            else:
                better = overlap < best_overlap
                best_n = jnp.where(jnp.expand_dims(better, AX), n_u, best_n)
                best_from_a = jnp.where(better, src == 0, best_from_a)
                best_overlap = jnp.minimum(overlap, best_overlap)

    # reference-face support planes along the chosen normal
    n_bb = best_n
    sup_a = jnp.sum(pos_a * n_bb, axis=AX) + proj(axes_a, he_a, n_bb)   # A's far face along n
    sup_b = jnp.sum(pos_b * n_bb, axis=AX) - proj(axes_b, he_b, n_bb)  # B's near face along n
    # corner depths: B's corners behind A's face (ref A) / A's corners beyond B's face (ref B)
    dep_b_corners = sup_a[..., None, :] - jnp.sum(cb * n_bb[..., :, None, :], axis=-3)  # [..,8,P]
    dep_a_corners = jnp.sum(ca * n_bb[..., :, None, :], axis=-3) - sup_b[..., None, :]
    from_a = best_from_a[..., None, :]
    all_dep = jnp.where(from_a, dep_b_corners, dep_a_corners)
    all_pts = jnp.where(jnp.expand_dims(from_a, -3), cb, ca)
    # clamp corner depth by the SAT overlap (a corner can't be deeper than the boxes)
    all_dep = jnp.minimum(all_dep, best_overlap[..., None, :])
    all_dep = jnp.where(best_overlap[..., None, :] > 0.0, all_dep, -1.0)

    top_d, top_i = jax.lax.top_k(jnp.moveaxis(all_dep, -2, -1), k)  # [..,P,k]
    ti = jnp.moveaxis(top_i, -1, -2)  # [..,k,P]

    # one-hot selection over the 8-corner axis instead of take_along_axis:
    # a vmapped minor-axis gather compiles to a catastrophic kCustom gather on
    # TPU (~93 ms/call at the bench config — 70% of the whole frame); see
    # select_points_onehot for why it is not an einsum either
    oh = (ti[..., :, None, :] == jnp.arange(8)[:, None]).astype(jnp.float32)
    bb_pts = select_points_onehot(oh, all_pts)
    bb_n = jnp.broadcast_to(n_bb[..., :, None, :], bb_pts.shape)
    bb_d = jnp.moveaxis(top_d, -1, -2)

    # --- select per pair type, expand to k slots
    a_box = shape_a == SHAPE_BOX
    b_box = shape_b == SHAPE_BOX
    both_box = a_box & b_box
    a_sph_b_box = (~a_box) & b_box
    a_box_b_sph = a_box & (~b_box)

    # slot expansion via masked broadcast, NOT concatenate: concat would
    # materialize the [..,3,1,P] operand, and XLA picks a layout that pads
    # the size-1 axis to a full 128 lane tile (170x HBM expansion — OOM)
    slot0 = (jnp.arange(k) == 0).astype(jnp.float32)

    def single_to_slots(pt, n, d):
        pts = pt[..., :, None, :] * slot0[:, None]
        nn = n[..., :, None, :] * slot0[:, None]
        dd = d[..., None, :] * slot0[:, None] - (1.0 - slot0[:, None])
        return pts, nn, dd

    ss_pts, ss_ns, ss_ds = single_to_slots(ss_pt, ss_n, ss_d)
    sb_pts, sb_ns, sb_ds = single_to_slots(sb_pt, sb_n, sb_d)
    bs_pts, bs_ns, bs_ds = single_to_slots(bs_pt, bs_n, bs_d)

    # select per pair type in FLATTENED [.., C] space: selecting on the 4-dim
    # [.., 3, k, P] arrays makes XLA pick a tiled layout that pads the k axis
    # (measured 31 ms/step of pure copy traffic at the bench config)
    c = P * k

    def flat(x):  # [.., k, P] / [.., 3, k, P] → [.., C] k-major (= body tile order)
        return x.reshape(x.shape[:-2] + (c,))

    m_bb_c = jnp.tile(both_box, k)
    m_sb_c = jnp.tile(a_sph_b_box, k)
    m_bs_c = jnp.tile(a_box_b_sph, k)
    point = jnp.where(m_bb_c, flat(bb_pts),
                      jnp.where(m_sb_c, flat(sb_pts),
                                jnp.where(m_bs_c, flat(bs_pts), flat(ss_pts))))
    normal = jnp.where(m_bb_c, flat(bb_n),
                       jnp.where(m_sb_c, flat(sb_ns),
                                 jnp.where(m_bs_c, flat(bs_ns), flat(ss_ns))))
    depth = jnp.where(m_bb_c, flat(bb_d),
                      jnp.where(m_sb_c, flat(sb_ds),
                                jnp.where(m_bs_c, flat(bs_ds), flat(ss_ds))))
    # slot layout: [k, P] flattened row-major → tile matches reshape order
    active = depth > 0.0
    nlen = jnp.sum(normal * normal, axis=AX)
    active = active & (nlen > 1e-6)
    return point, normal, depth, active


def concat_contacts(a: Contacts, b: Contacts) -> Contacts:
    return Contacts(
        body_a=np.concatenate([a.body_a, b.body_a]),
        body_b=np.concatenate([a.body_b, b.body_b]),
        point=jnp.concatenate([a.point, b.point], axis=-1),
        normal=jnp.concatenate([a.normal, b.normal], axis=-1),
        depth=jnp.concatenate([a.depth, b.depth], axis=-1),
        active=jnp.concatenate([a.active, b.active], axis=-1),
    )


def _orthonormal_tangents(n):
    """Two tangent dirs per contact from normal [..,3,C]."""
    nx, ny, nz = lm.unstack(n, AX)
    # pick the axis least aligned with n
    use_x = jnp.abs(nx) < 0.9
    hx = jnp.where(use_x, 1.0, 0.0)
    hy = jnp.where(use_x, 0.0, 1.0)
    h = jnp.stack([hx, hy, jnp.zeros_like(hx)], axis=AX)
    t1 = lm.cross(n, h, axis=AX)
    t1 = t1 * jax.lax.rsqrt(jnp.maximum(jnp.sum(t1 * t1, axis=AX, keepdims=True), 1e-12))
    t2 = lm.cross(n, t1, axis=AX)
    return t1, t2


def solve_contacts(
    pos, rot, vel, angvel,
    contacts: Contacts,
    inv_mass,            # f32 [NB] static
    inv_inertia_world,   # f32 [.., 3, 3, NB] world-space inverse inertia (diag approx ok)
    incidence_a,         # f32 [NB, C] static +1 matrix (body_a rows)
    incidence_b,         # f32 [NB, C] static +1 matrix (body_b rows, -1 slots zeroed)
    dt,
    friction,            # f32 [C] per-contact combined friction (static)
    restitution,         # f32 [C] (static)
    iterations: int = 8,
    baumgarte: float = 0.2,
    slop: float = 0.005,
    relaxation: float = 0.75,
    warm_lambdas=None,       # optional ([..,C],)*3 accumulated impulses from the previous frame
    return_lambdas: bool = False,
):
    """Projected Jacobi PGS. Returns (vel', angvel'[, lambdas]).

    WARM STARTING (≙ PhysX): Jacobi convergence on constraint CHAINS (stacks)
    is O(relaxation/n²) per iteration — far too slow to find the full support
    impulse within one frame's iterations. PhysX solves this by carrying each
    contact's accumulated impulse across frames and applying it up front;
    the per-frame iterations then only compute the small correction. Pass
    last frame's lambdas via `warm_lambdas` and persist the returned ones.

    The reference's PhysX PGS is sequential Gauss-Seidel; Jacobi with
    under-relaxation + accumulated-impulse projection is the parallel
    equivalent (contact impulses all computed against the same iterate, then
    scatter-added via one incidence matmul).

    PERF NOTE (TPU): every per-contact gather here is expressed as an
    incidence MATMUL ([..,K,NB] @ [NB,C]) rather than jnp.take — minor-axis
    gathers with thousands of indices lower catastrophically on TPU (measured
    ~12x on the full-frame bench), while the equivalent one-hot contraction
    rides the MXU. inc_b's zeroed columns double as the has_b mask."""
    inc_a = jnp.asarray(incidence_a)
    inc_b = jnp.asarray(incidence_b)

    def gath(x, inc):  # [..,K,NB] → [..,K,C] one-hot gather on the MXU
        # HIGH precision (bf16x3): default bf16 would round velocities/
        # positions to 8 mantissa bits inside every solver iteration
        return jnp.einsum("...kn,nc->...kc", x, inc,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

    im_a = jnp.asarray(inv_mass) @ inc_a
    im_b = jnp.asarray(inv_mass) @ inc_b

    n = contacts.normal
    t1, t2 = _orthonormal_tangents(n)
    pt = contacts.point
    active = contacts.active

    r_a = pt - gath(pos, inc_a)
    r_b = pt - gath(pos, inc_b)

    def ang_term(r, d, II_diag):
        """n · ((I⁻¹ (r × d)) × r) with diagonal world inertia approx [..,3,C]."""
        rxd = lm.cross(r, d, axis=AX)
        tmp = II_diag * rxd
        return jnp.sum(lm.cross(tmp, r, axis=AX) * d, axis=AX)

    II_a = gath(inv_inertia_world, inc_a)  # [..,3,C] diag
    II_b = gath(inv_inertia_world, inc_b)  # zero cols where no body_b

    k_n = im_a + im_b + ang_term(r_a, n, II_a) + ang_term(r_b, n, II_b)
    k_t1 = im_a + im_b + ang_term(r_a, t1, II_a) + ang_term(r_b, t1, II_b)
    k_t2 = im_a + im_b + ang_term(r_a, t2, II_a) + ang_term(r_b, t2, II_b)
    k_n = jnp.maximum(k_n, 1e-9)
    k_t1 = jnp.maximum(k_t1, 1e-9)
    k_t2 = jnp.maximum(k_t2, 1e-9)

    bias = (baumgarte / dt) * jnp.maximum(contacts.depth - slop, 0.0)

    fr = jnp.asarray(friction)
    rest = jnp.asarray(restitution)

    # Jacobi stability: scale relaxation per contact by the larger touching
    # body's active-contact degree (mass-splitting; constant relaxation
    # diverges in dense piles when relax > 2/degree)
    act_f = active.astype(jnp.float32)
    deg = (jnp.einsum("...c,nc->...n", act_f, inc_a,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("...c,nc->...n", act_f, inc_b,
                        preferred_element_type=jnp.float32))
    deg_c = jnp.maximum(jnp.maximum(
        jnp.einsum("...n,nc->...c", deg, inc_a,
                   preferred_element_type=jnp.float32),
        jnp.einsum("...n,nc->...c", deg, inc_b,
                   preferred_element_type=jnp.float32)), 1.0)
    relaxation = jnp.minimum(relaxation, 1.6 / deg_c)

    def rel_vel(v, w):
        # one fused incidence matmul per side: [v|w] stacked to [6, NB]
        vw = jnp.concatenate([v, w], axis=AX)
        a6 = gath(vw, inc_a)
        b6 = gath(vw, inc_b)  # zero cols where no body_b (ground)
        comp = a6.ndim + AX
        va = jax.lax.slice_in_dim(a6, 0, 3, axis=comp) + lm.cross(
            jax.lax.slice_in_dim(a6, 3, 6, axis=comp), r_a, axis=AX)
        # b6 is already zero in no-body columns, so vb needs no has_b mask
        vb = jax.lax.slice_in_dim(b6, 0, 3, axis=comp) + lm.cross(
            jax.lax.slice_in_dim(b6, 3, 6, axis=comp), r_b, axis=AX)
        return vb - va

    # restitution target from pre-solve velocities
    vn0 = jnp.sum(rel_vel(vel, angvel) * n, axis=AX)
    # restitution and Baumgarte bias do not stack (PhysX: max, not sum)
    v_target = jnp.maximum(bias, jnp.where(vn0 < -0.5, -rest * vn0, 0.0))

    def apply_impulse(v, w, imp):
        """imp [..,3,C] applied +imp to b, -imp to a. One [impulse|torque]
        6-row incidence matmul per side instead of four 3-row ones."""
        six_a = jnp.concatenate([imp, lm.cross(r_a, imp, axis=AX)], axis=AX)
        six_b = jnp.concatenate([imp, lm.cross(r_b, imp, axis=AX)], axis=AX)
        acc = (
            jnp.einsum("nc,...kc->...kn", inc_b, six_b,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGH)
            - jnp.einsum("nc,...kc->...kn", inc_a, six_a,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGH)
        )
        comp = acc.ndim - 2
        v = v + jax.lax.slice_in_dim(acc, 0, 3, axis=comp) * jnp.asarray(inv_mass)[None, :]
        w = w + jax.lax.slice_in_dim(acc, 3, 6, axis=comp) * inv_inertia_world
        return v, w

    def body_fn(_, carry):
        v, w, lam_n, lam_t1, lam_t2 = carry
        vr = rel_vel(v, w)
        vn = jnp.sum(vr * n, axis=AX)
        dln = (v_target - vn) / k_n * relaxation
        new_ln = jnp.maximum(lam_n + dln, 0.0)
        dln = jnp.where(active, new_ln - lam_n, 0.0)
        # friction clamped by μ·λ_n
        vt1 = jnp.sum(vr * t1, axis=AX)
        vt2 = jnp.sum(vr * t2, axis=AX)
        max_f = fr * (lam_n + dln)
        new_lt1 = jnp.clip(lam_t1 + (-vt1 / k_t1) * relaxation, -max_f, max_f)
        new_lt2 = jnp.clip(lam_t2 + (-vt2 / k_t2) * relaxation, -max_f, max_f)
        dlt1 = jnp.where(active, new_lt1 - lam_t1, 0.0)
        dlt2 = jnp.where(active, new_lt2 - lam_t2, 0.0)
        imp = (
            n * dln[..., None, :]
            + t1 * dlt1[..., None, :]
            + t2 * dlt2[..., None, :]
        )
        v, w = apply_impulse(v, w, imp)
        return v, w, lam_n + dln, lam_t1 + dlt1, lam_t2 + dlt2

    zeros = jnp.zeros(contacts.depth.shape)
    if warm_lambdas is None:
        carry0 = (vel, angvel, zeros, zeros, zeros)
    else:
        ln0, lt10, lt20 = warm_lambdas
        act_f2 = active.astype(jnp.float32)
        ln0 = jnp.maximum(ln0, 0.0) * act_f2
        lt10 = lt10 * act_f2
        lt20 = lt20 * act_f2
        warm_imp = (n * ln0[..., None, :] + t1 * lt10[..., None, :]
                    + t2 * lt20[..., None, :])
        # inactive slots can carry NaN geometry (0·NaN = NaN): hard-mask
        warm_imp = jnp.where(active[..., None, :], warm_imp, 0.0)
        v0, w0 = apply_impulse(vel, angvel, warm_imp)
        carry0 = (v0, w0, ln0, lt10, lt20)
    v, w, ln, lt1, lt2 = jax.lax.fori_loop(0, iterations, body_fn, carry0)
    if return_lambdas:
        return v, w, (ln, lt1, lt2)
    return v, w


def project_positions(
    pos, contacts: "Contacts",
    inv_mass,
    incidence_a, incidence_b,
    iterations: int = 3,
    slop: float = 0.005,
    relaxation: float = 0.8,
    max_correction: float = 0.05,
):
    """Split-impulse position projection (≙ Box2D NGS / PhysX TGS position
    iterations): pushes penetrating contacts out at the POSITION level with a
    frozen-Jacobian linear-only correction, so resting depth converges to the
    slop regardless of velocity-solve convergence and no energy is injected
    into velocities. Returns corrected pos.

    max_correction (≙ Box2D maxLinearCorrection): the per-frame push is
    capped because the correction is LINEAR-ONLY — an end contact of a
    tipped long body would otherwise raise the whole COM by the end's full
    depth each frame, pumping potential energy into a rock-launch-fall
    limit cycle (measured on a capsule bridging two static capsules: the
    cycle never decayed; with the cap it settles in ~1 s)."""
    inc_a = jnp.asarray(incidence_a)
    inc_b = jnp.asarray(incidence_b)

    def gath(x, inc):
        return jnp.einsum("...kn,nc->...kc", x, inc,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

    def scat(x, inc):
        return jnp.einsum("nc,...kc->...kn", inc, x,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

    im = jnp.asarray(inv_mass)
    im_a = im @ inc_a
    im_b = im @ inc_b
    k_lin = jnp.maximum(im_a + im_b, 1e-9)
    n = contacts.normal
    e0 = jnp.where(contacts.active,
                   jnp.clip(contacts.depth - slop, 0.0, max_correction), 0.0)

    # degree-scaled relaxation (same Jacobi-stability rule as the solvers)
    act_f = contacts.active.astype(jnp.float32)
    deg = (jnp.einsum("...c,nc->...n", act_f, inc_a,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("...c,nc->...n", act_f, inc_b,
                        preferred_element_type=jnp.float32))
    deg_c = jnp.maximum(jnp.maximum(gath(deg[..., None, :], inc_a),
                                    gath(deg[..., None, :], inc_b))[..., 0, :], 1.0)
    relax_c = jnp.minimum(relaxation, 1.6 / deg_c)

    def body(_, carry):
        dpos, lam = carry
        # separation achieved so far along each contact normal (b − a)
        sep = jnp.sum((gath(dpos, inc_b) - gath(dpos, inc_a)) * n, axis=AX)
        dlam = (e0 - sep) / k_lin * relax_c
        new_lam = jnp.maximum(lam + dlam, 0.0)   # never pull together
        # mask AFTER the max: inactive slots can carry NaN contact geometry
        dlam = jnp.where(contacts.active, new_lam - lam, 0.0)
        step_vec = n * dlam[..., None, :]
        dpos = dpos + (scat(step_vec, inc_b) - scat(step_vec, inc_a)) * im[None, :]
        return dpos, new_lam

    dpos0 = jnp.zeros_like(pos)
    lam0 = jnp.zeros_like(e0)
    dpos, _ = jax.lax.fori_loop(0, iterations, body, (dpos0, lam0))
    return pos + dpos


def inv_inertia_world_diag(rot, inv_inertia_body):
    """Approximate world-space inverse inertia as a diagonal [..,3,NB]:
    diag(R · I⁻¹_body · Rᵀ). Exact for spheres; good for near-axis-aligned
    boxes (full tensor form lands with the joint solver)."""
    m = lm.quat_to_mat3(jnp.moveaxis(rot, -2, -1))  # [..,NB,3,3]
    ib = jnp.moveaxis(inv_inertia_body, -2, -1)     # [..,NB,3]
    diag = jnp.einsum("...nij,...nj,...nij->...ni", m, ib, m)
    return jnp.moveaxis(diag, -1, -2)               # [..,3,NB]


def update_sleep(vel, angvel, sleep_counter, dyn_mask,
                 lin_thresh: float = 0.03, ang_thresh: float = 0.05,
                 frames_to_sleep: int = 30):
    """Velocity-threshold sleeping (≙ PhysX sleep thresholds): counts calm
    frames; asleep bodies get zeroed velocities until something wakes them
    (an applied impulse resets the counter via wake())."""
    calm = (jnp.sum(vel * vel, axis=AX) < lin_thresh**2) & (
        jnp.sum(angvel * angvel, axis=AX) < ang_thresh**2
    )
    counter = jnp.where(calm & dyn_mask, sleep_counter + 1, 0)
    asleep = counter >= frames_to_sleep
    v = jnp.where(asleep[..., None, :], 0.0, vel)
    w = jnp.where(asleep[..., None, :], 0.0, angvel)
    return v, w, counter, asleep


# ---------------------------------------------------------------------------
# queries (≙ reference physics_module.h raycast/sweep API)
# ---------------------------------------------------------------------------


def raycast_spheres(origin, direction, pos, radius, mask):
    """Batched ray vs all spheres → (hit any, t_min, body index).
    origin/direction [..,3] (normalized), pos [..,3,NB], radius [..,NB]."""
    oc = origin[..., :, None] - pos
    b = jnp.sum(oc * direction[..., :, None], axis=AX)
    c = jnp.sum(oc * oc, axis=AX) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    valid = (disc >= 0.0) & (t >= 0.0) & mask
    t = jnp.where(valid, t, jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    tmin = jnp.min(t, axis=-1)
    return jnp.isfinite(tmin), tmin, idx.astype(jnp.int32)


def raycast_boxes(origin, direction, pos, rot, half_extents, mask):
    """Batched ray vs all OBBs (slab test in box-local space) →
    (hit any, t_min, body index). origin/direction [..,3], pos [..,3,NB],
    rot [..,4,NB], half_extents [..,3,NB]."""
    # transform ray into each box's local frame
    qinv = lm.quat_conjugate(rot, axis=AX)
    o_l = lm.quat_rotate(qinv, origin[..., :, None] - pos, axis=AX)   # [..,3,NB]
    d_l = lm.quat_rotate(qinv, jnp.broadcast_to(direction[..., :, None], o_l.shape), axis=AX)
    safe_d = jnp.where(jnp.abs(d_l) < 1e-9,
                       jnp.where(d_l >= 0, 1e-9, -1e-9), d_l)
    t1 = (-half_extents - o_l) / safe_d
    t2 = (half_extents - o_l) / safe_d
    tmin = jnp.max(jnp.minimum(t1, t2), axis=AX)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=AX)
    valid = (tmax >= jnp.maximum(tmin, 0.0)) & mask
    t = jnp.where(valid, jnp.maximum(tmin, 0.0), jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    tm = jnp.min(t, axis=-1)
    return jnp.isfinite(tm), tm, idx.astype(jnp.int32)


def raycast_all(origin, direction, pos, rot, shape, radius, half_extents, mask):
    """Ray vs every actor (sphere/box/capsule-as-sphere) → (hit, t, body)."""
    is_box = shape == SHAPE_BOX
    hs, ts, is_ = raycast_spheres(origin, direction, pos, radius, mask & ~is_box)
    hb, tb, ib = raycast_boxes(origin, direction, pos, rot, half_extents,
                               mask & is_box)
    pick_b = tb < ts
    return hs | hb, jnp.minimum(ts, tb), jnp.where(pick_b, ib, is_)


def sweep(origin, direction, sweep_radius, pos, rot, shape, radius,
          half_extents, mask):
    """Sphere sweep (≙ PhysicsModule::sweepSphere): a moving sphere of
    `sweep_radius` vs every actor. Spheres are exact (Minkowski inflation);
    boxes use the standard inflated-extent approximation."""
    infl_r = radius + sweep_radius
    infl_he = half_extents + sweep_radius
    return raycast_all(origin, direction, pos, rot, shape, infl_r, infl_he, mask)


def candidate_slot_mask(shape_np: np.ndarray, slots_per_body: int) -> np.ndarray:
    """Structural mask of which ground-contact slots are real candidate points
    per body: boxes use all slots (corners), capsules 2 (endpoints), spheres 1.
    Static — shape membership is host data."""
    nb = shape_np.shape[0]
    n_cand = np.where(shape_np == SHAPE_BOX, slots_per_body,
                      np.where(shape_np == SHAPE_CAPSULE, 2, 1))
    slot_idx = np.repeat(np.arange(slots_per_body), nb)
    return slot_idx < np.tile(n_cand, slots_per_body)


def heightfield_contacts(pos, rot, shape, radius, half_extents, dyn_mask,
                         terrain_bank, terrain_id: int, terrain_origin,
                         slots_per_body: int = 4, shape_np: np.ndarray = None):
    """Contacts of dynamic bodies vs a heightfield terrain (≙ PhysX
    PxHeightField): per candidate point (box corners / sphere low / capsule
    endpoints) sample the terrain height and use the terrain normal."""
    from lumixengine_tpu.renderer import terrain as terr

    gc = ground_contacts(pos, rot, shape, radius, half_extents, dyn_mask,
                         ground_y=0.0, slots_per_body=slots_per_body)
    ox, oz = float(terrain_origin[0]), float(terrain_origin[2])
    px = gc.point[..., 0, :] - ox
    pz = gc.point[..., 2, :] - oz
    hy = terr.sample_height(terrain_bank, terrain_id, px, pz) + float(terrain_origin[1])
    n = terr.sample_normal(terrain_bank, terrain_id, px, pz)
    depth = hy - gc.point[..., 1, :]
    if shape_np is None:
        shape_np = np.asarray(shape)
    valid = jnp.asarray(candidate_slot_mask(shape_np, slots_per_body))
    active = (depth > 0.0) & dyn_mask[..., gc.body_a] & valid
    return Contacts(body_a=gc.body_a, body_b=gc.body_b, point=gc.point,
                    normal=-n, depth=depth, active=active)
