"""Convex-hull narrowphase + SDF mesh-collider contacts (≙ reference
src/physics/physics_system.cpp cookConvex/cookTriMesh usage and PhysX convex /
triangle-mesh collision; see physics/cooking.py for the host-side cooking).

TPU design: every participating shape is a PADDED POLYTOPE — a fixed-size
vertex set [3, V] plus a support radius (sphere = 1 vertex + r, capsule =
2 vertices + r, box = 8 corners, hull = K cooked vertices) — and a fixed-size
set of unit face axes [3, F]. Contacts come from SAT over the combined face
axes plus the center-line axis (covers sphere/vertex-region cases), with the
manifold as the top-k deepest vertices of the incident polytope against the
reference support plane. This is exactly the box-box pattern in
ops/physics_ops.pair_contacts generalized to V vertices / F axes, inheriting
its TPU perf rules: one-hot einsum instead of minor-axis gathers, masked
broadcasts instead of concatenate, flat [.., C] selects.

Mesh colliders are STATIC bodies carrying a baked signed-distance grid;
dynamic bodies collide against them by sampling the SDF (trilinear) at their
candidate points — same per-body stream shape as heightfield_contacts, so it
works under both the all-pairs and SAP broadphases.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.ops.physics_ops import AX, Contacts

F32 = jnp.float32


def polytope_world_verts(pos, rot, verts_local):
    """verts_local [.., 3, V, N] (or np const) → world [.., 3, V, N]."""
    vl = jnp.asarray(verts_local)
    return pos[..., :, None, :] + lm.quat_rotate(rot[..., :, None, :], vl, axis=-3)


def support_extent(verts_rel, u):
    """Max extent of vertex offsets [.., 3, V, N] along unit axis u [.., 3, N]
    → [.., N] (support function without the radius term)."""
    return jnp.max(jnp.sum(verts_rel * u[..., :, None, :], axis=-3), axis=-2)


def polytope_pair_contacts(pos, rot, verts, axes, rad, pair_a, pair_b,
                           points_per_pair: int = 4):
    """Narrowphase over a STATIC pair list of padded polytopes.

    pos/rot: [.., 3/4, NB]; verts: np [3, V, NB] local; axes: np [3, F, NB]
    local unit face normals (padded by repetition); rad: np [NB] support radii.
    Returns Contacts with C = P * points_per_pair slots (same layout contract
    as physics_ops.pair_contacts: slot-major [k, P] flattened).
    """
    k = points_per_pair

    def take(x, idx_np):
        if isinstance(x, np.ndarray):
            return jnp.asarray(x[..., idx_np])
        return jnp.take(x, jnp.asarray(idx_np), axis=-1)

    pos_a, pos_b = take(pos, pair_a), take(pos, pair_b)
    rot_a, rot_b = take(rot, pair_a), take(rot, pair_b)
    va_l = jnp.asarray(verts[:, :, pair_a])   # [3,V,P]
    vb_l = jnp.asarray(verts[:, :, pair_b])
    fa_l = jnp.asarray(axes[:, :, pair_a])    # [3,F,P]
    fb_l = jnp.asarray(axes[:, :, pair_b])
    ra = jnp.asarray(rad[pair_a])             # [P]
    rb = jnp.asarray(rad[pair_b])
    point, normal, depth, active = polytope_pair_contacts_from_data(
        pos_a, rot_a, va_l, fa_l, ra, pos_b, rot_b, vb_l, fb_l, rb,
        points_per_pair=k)
    body_a = np.tile(np.asarray(pair_a, np.int32), k)
    body_b = np.tile(np.asarray(pair_b, np.int32), k)
    return Contacts(body_a=body_a, body_b=body_b, point=point, normal=normal,
                    depth=depth, active=active)


def polytope_pair_contacts_from_data(pos_a, rot_a, va_l, fa_l, ra,
                                     pos_b, rot_b, vb_l, fb_l, rb,
                                     points_per_pair: int = 4):
    """SAT narrowphase CORE on pre-gathered padded-polytope pair data —
    va_l/vb_l [.., 3, V, P] local verts, fa_l/fb_l [.., 3, F, P] local unit
    face axes (padded by repetition), ra/rb [.., P] support radii →
    (point, normal, depth, active), each with C = k·P slots in slot-major
    [k, P] flattened layout (the physics_ops.pair_contacts_from_data
    contract). The banded rank-space path builds its pair data with shifts
    (physics_banded.banded_polytope_grids) and comes here directly."""
    k = points_per_pair

    # world-space vertex offsets from each center and world face axes
    va = lm.quat_rotate(rot_a[..., :, None, :], va_l, axis=-3)  # [..,3,V,P]
    vb = lm.quat_rotate(rot_b[..., :, None, :], vb_l, axis=-3)
    axa = lm.quat_rotate(rot_a[..., :, None, :], fa_l, axis=-3)  # [..,3,F,P]
    axb = lm.quat_rotate(rot_b[..., :, None, :], fb_l, axis=-3)
    d_ab = pos_b - pos_a                                          # [..,3,P]

    # candidate axes: A faces + B faces + normalized center line
    d_len = jnp.sqrt(jnp.maximum(jnp.sum(d_ab * d_ab, axis=-2), 1e-12))
    d_axis = (d_ab / d_len[..., None, :])[..., :, None, :]        # [..,3,1,P]
    cand = jnp.concatenate([axa, axb, d_axis], axis=-2)           # [..,3,2F+1,P]

    # SAT: overlap(u) = E_A(u) + E_B(u) - |d·u| where E_X(u) = max_v(v·u) + r.
    # Padded axes repeat real ones → duplicates never win spuriously.
    du = jnp.sum(d_ab[..., :, None, :] * cand, axis=-3)           # [..,NA,P]
    sgn = jnp.where(du >= 0, 1.0, -1.0)
    u = cand * sgn[..., None, :, :]                               # a→b oriented
    ea = jnp.max(jnp.einsum("...cvp,...cap->...vap", va, u), axis=-3) + ra
    eb = jnp.max(jnp.einsum("...cvp,...cap->...vap", vb, -u), axis=-3) + rb
    overlap = ea + eb - jnp.abs(du)                               # [..,NA,P]

    best = jnp.argmin(overlap, axis=-2)                           # [..,P]
    na = cand.shape[-2]
    oh_ax = (best[..., None, :] == jnp.arange(na)[:, None]).astype(F32)
    # one-hot select kept elementwise (P minor) — see select_points_onehot
    n = jnp.sum(u * oh_ax[..., None, :, :], axis=-2)              # [..,3,P]
    min_overlap = jnp.min(overlap, axis=-2)                       # [..,P]

    # reference planes along n: A's far face, B's near face
    sup_a = jnp.sum(pos_a * n, axis=-2) + support_extent(va, n) + ra
    sup_b = jnp.sum(pos_b * n, axis=-2) - (support_extent(vb, -n) + rb)

    # manifold: deepest k verts of B behind A's face and of A beyond B's face,
    # whichever polytope is "incident" — pick per-vertex depths from both and
    # top-k over the combined 2V set (handles face-face AND vert-face cases)
    pb_w = pos_b[..., :, None, :] + vb                            # [..,3,V,P]
    pa_w = pos_a[..., :, None, :] + va
    dep_b = sup_a[..., None, :] - jnp.sum(pb_w * n[..., :, None, :], axis=-3) + rb[..., None, :]
    dep_a = jnp.sum(pa_w * n[..., :, None, :], axis=-3) - sup_b[..., None, :] + ra[..., None, :]
    # contact points: incident verts pushed onto the body surface along n
    pts_b = pb_w - n[..., :, None, :] * rb[..., None, None, :]
    pts_a = pa_w + n[..., :, None, :] * ra[..., None, None, :]
    all_dep = jnp.concatenate([dep_b, dep_a], axis=-2)            # [..,2V,P]
    all_pts = jnp.concatenate([pts_b, pts_a], axis=-2)            # [..,3,2V,P]
    all_dep = jnp.minimum(all_dep, min_overlap[..., None, :])
    all_dep = jnp.where(min_overlap[..., None, :] > 0.0, all_dep, -1.0)

    v2 = all_dep.shape[-2]
    top_d, top_i = jax.lax.top_k(jnp.moveaxis(all_dep, -2, -1), k)  # [..,P,k]
    ti = jnp.moveaxis(top_i, -1, -2)                               # [..,k,P]
    oh = (ti[..., :, None, :] == jnp.arange(v2)[:, None]).astype(F32)
    from lumixengine_tpu.ops.physics_ops import select_points_onehot
    pts = select_points_onehot(oh, all_pts)                        # [..,3,k,P]
    dep = jnp.moveaxis(top_d, -1, -2)                              # [..,k,P]

    c = pts.shape[-1] * k
    point = pts.reshape(pts.shape[:-2] + (c,))
    depth = dep.reshape(dep.shape[:-2] + (c,))
    normal = jnp.broadcast_to(n[..., :, None, :], pts.shape).reshape(point.shape)
    return point, normal, depth, depth > 0.0


def polytope_ground_contacts(pos, rot, verts, rad, body_idx, ground_y: float,
                             points_per_body: int = 4):
    """Ground-plane contacts for a static SUBSET of bodies given as padded
    polytopes. body_idx: np [M] actor slots; verts np [3, V, M] local;
    rad np [M]. Returns Contacts with C = M * points_per_body."""
    k = points_per_body
    m = int(body_idx.shape[0])
    p = jnp.take(pos, jnp.asarray(body_idx), axis=-1)
    q = jnp.take(rot, jnp.asarray(body_idx), axis=-1)
    vw = polytope_world_verts(p, q, verts)                 # [..,3,V,M]
    rj = jnp.asarray(rad)
    low = vw[..., 1, :, :] - rj[..., None, :]              # [..,V,M] lowest y per vert
    c_depth = ground_y - low
    top_d, top_i = jax.lax.top_k(jnp.moveaxis(c_depth, -2, -1), k)  # [..,M,k]
    ci = jnp.moveaxis(top_i, -1, -2)                        # [..,k,M]
    nv = vw.shape[-2]
    oh = (ci[..., :, None, :] == jnp.arange(nv)[:, None]).astype(F32)
    from lumixengine_tpu.ops.physics_ops import select_points_onehot
    pts = select_points_onehot(oh, vw)                      # [..,3,k,M]
    pts = pts - (jnp.zeros_like(pts).at[..., 1, :, :].set(1.0)) * rj[..., None, None, :]
    dep = jnp.moveaxis(top_d, -1, -2)                       # [..,k,M]
    c = k * m
    point = pts.reshape(pts.shape[:-2] + (c,))
    depth = dep.reshape(dep.shape[:-2] + (c,))
    normal = jnp.zeros(point.shape).at[..., 1, :].set(-1.0)
    body_a = np.tile(np.asarray(body_idx, np.int32), k)
    return Contacts(body_a=body_a, body_b=np.full(c, -1, np.int32),
                    point=point, normal=normal, depth=depth,
                    active=depth > 0.0)


def polytope_ground_grids(pos, rot, pverts, prad, sel_mask, ground_y: float):
    """Ground-plane contacts for ALL actor slots as padded polytopes, in the
    body-minor per-body stream layout ([V blocks of NB] flattened — the same
    contract as physics_ops.ground_contacts, so the banded rank-space path
    re-ranks it wholesale and concat_contacts appends it to other streams).
    Every polytope vertex is a candidate slot (no top-k: V ≈ 16 stays cheap
    and the solver ignores inactive slots); sel_mask [NB] gates which bodies
    use this stream (convex dynamics — simple shapes keep the analytic one).
    """
    vw = polytope_world_verts(pos, rot, jnp.asarray(pverts))    # [..,3,V,NB]
    rj = jnp.asarray(prad)
    nb = vw.shape[-1]
    v = vw.shape[-2]
    depth = ground_y - (vw[..., 1, :, :] - rj[..., None, :])    # [..,V,NB]
    pts = vw - (jnp.zeros_like(vw).at[..., 1, :, :].set(1.0)
                * rj[..., None, None, :])
    c = v * nb
    point = pts.reshape(pts.shape[:-2] + (c,))
    depth = depth.reshape(depth.shape[:-2] + (c,))
    normal = jnp.zeros(point.shape).at[..., 1, :].set(-1.0)
    active = (depth > 0.0) & jnp.tile(jnp.asarray(sel_mask), v)
    body_a = np.tile(np.arange(nb, dtype=np.int32), v)
    return Contacts(body_a=body_a, body_b=np.full(c, -1, np.int32),
                    point=point, normal=normal, depth=depth, active=active)


def raycast_convex(origin, direction, pos, rot, axes, lo, hi, mask):
    """Exact ray vs convex hulls by slab clipping over the hulls' face axes
    (the convex intersection of F slabs IS the hull when the axes cover all
    face normals; support intervals [lo, hi] handle both sides of deduped
    axes). origin/direction [..,3]; pos [..,3,NB]; rot [..,4,NB]; axes np/jnp
    [3,F,NB] local unit; lo/hi np [F,NB] support intervals; → (hit, t, idx)."""
    qinv = lm.quat_conjugate(rot, axis=-2)
    o_l = lm.quat_rotate(qinv, origin[..., :, None] - pos, axis=-2)  # [..,3,NB]
    d_l = lm.quat_rotate(qinv, jnp.broadcast_to(direction[..., :, None],
                                                o_l.shape), axis=-2)
    a = jnp.asarray(axes)                              # [3,F,NB]
    od = jnp.sum(o_l[..., :, None, :] * a, axis=-3)    # [..,F,NB]
    dd = jnp.sum(d_l[..., :, None, :] * a, axis=-3)
    safe = jnp.where(jnp.abs(dd) < 1e-9,
                     jnp.where(dd >= 0, 1e-9, -1e-9), dd)
    t1 = (jnp.asarray(lo) - od) / safe
    t2 = (jnp.asarray(hi) - od) / safe
    tmin = jnp.max(jnp.minimum(t1, t2), axis=-2)
    tmax = jnp.min(jnp.maximum(t1, t2), axis=-2)
    valid = (tmax >= jnp.maximum(tmin, 0.0)) & mask
    t = jnp.where(valid, jnp.maximum(tmin, 0.0), jnp.inf)
    idx = jnp.argmin(t, axis=-1)
    tm = jnp.min(t, axis=-1)
    return jnp.isfinite(tm), tm, idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# SDF mesh colliders


def sdf_sample(grid, origin, cell, p):
    """Trilinear SDF sample at world points p [.., 3, N] → [.., N].
    Out-of-grid points clamp to the border and add the Euclidean distance from
    the point to the grid box — otherwise everything beyond the grid would
    read as 'border distance' and spawn phantom contacts."""
    g = jnp.asarray(grid)
    nx, ny, nz = g.shape
    q_raw = (p - jnp.asarray(origin)[..., :, None]) / cell  # grid coords
    q = jnp.clip(q_raw, 0.0,
                 jnp.asarray([nx - 1.001, ny - 1.001, nz - 1.001])[:, None])
    outside = (q_raw - q) * cell
    extra = jnp.sqrt(jnp.maximum(jnp.sum(outside * outside, axis=-2), 0.0))
    i0 = jnp.floor(q).astype(jnp.int32)
    f = q - i0
    fx, fy, fz = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    ix, iy, iz = i0[..., 0, :], i0[..., 1, :], i0[..., 2, :]
    flat = g.reshape(-1)

    def at(dx, dy, dz):
        idx = ((ix + dx) * ny + (iy + dy)) * nz + (iz + dz)
        return jnp.take(flat, idx, axis=-1)

    c000, c100 = at(0, 0, 0), at(1, 0, 0)
    c010, c110 = at(0, 1, 0), at(1, 1, 0)
    c001, c101 = at(0, 0, 1), at(1, 0, 1)
    c011, c111 = at(0, 1, 1), at(1, 1, 1)
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz + extra


def sdf_gradient(grid, origin, cell, p, eps_cells: float = 0.5):
    """Central-difference SDF gradient (normalized) at world points
    p [.., 3, N] → [.., 3, N]."""
    e = eps_cells * cell
    grads = []
    for a in range(3):
        d = jnp.zeros((3, 1), F32).at[a, 0].set(e)
        gp = sdf_sample(grid, origin, cell, p + d)
        gm = sdf_sample(grid, origin, cell, p - d)
        grads.append((gp - gm) / (2.0 * e))
    gvec = jnp.stack(grads, axis=-2)
    glen = jnp.sqrt(jnp.maximum(jnp.sum(gvec * gvec, axis=-2), 1e-12))
    return gvec / glen[..., None, :]


def sdf_contacts(points, eff_radius, body_idx, grid, origin, cell,
                 collider_pos, collider_rot):
    """Contacts of candidate points vs one SDF mesh collider.

    points: [.., 3, C] world candidate points; eff_radius: [C] support radius
    at each point (sphere r at centers, 0 at box corners/hull verts);
    body_idx: np [C] owning actor slots; collider pose transforms world →
    mesh-local before sampling. Returns Contacts (body_b = -1: static world).
    """
    inv = lm.quat_conjugate(collider_rot, axis=-1)[..., :, None]
    local = lm.quat_rotate(inv, points - collider_pos[..., :, None], axis=-2)
    d = sdf_sample(grid, origin, cell, local)
    n_l = sdf_gradient(grid, origin, cell, local)
    n_w = lm.quat_rotate(collider_rot[..., :, None], n_l, axis=-2)
    depth = jnp.asarray(eff_radius) - d
    return Contacts(body_a=np.asarray(body_idx, np.int32),
                    body_b=np.full(int(body_idx.shape[0]), -1, np.int32),
                    point=points, normal=-n_w, depth=depth,
                    active=depth > 0.0)
