"""Banded sweep-order rigid-body pipeline — the gather-free large-world path
(10k+ bodies in ONE world; the 10k-box BASELINE config).

THE IDEA: after sorting bodies by AABB min-x (the SAP sweep), every candidate
pair connects rank i to rank i+d with d ≤ K — the contact graph is a BANDED
matrix in rank space. Working entirely in rank space turns every per-contact
gather into a STATIC SHIFT (slice + pad) and every scatter-add into a shifted
sum: the solver iterations contain no dynamic gathers/scatters at all, which
on TPU is the difference between ~70 ms and <1 ms per iteration at 10k bodies
(minor-axis gathers with traced indices are the one pathological op — see
physics_ops.solve_contacts PERF NOTE; segment_sum is its scatter twin).

Per step: ONE gather brings body state into rank space, the narrowphase +
solver run on [k, K, NB] slot grids with shift-built pair data, and ONE
permutation scatter writes the results back.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.ops import physics_ops as P

AX = -2


def _fwd(x, d):
    """Partner view: out[..., i] = x[..., i+d] (zero-padded tail)."""
    d = min(d, x.shape[-1])
    if d == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (d,), x.dtype)
    return jnp.concatenate([x[..., d:], pad], axis=-1)


def _back(y, d):
    """Scatter view: out[..., i+d] += y[..., i] → right shift by d."""
    d = min(d, y.shape[-1])
    if d == 0:
        return y
    pad = jnp.zeros(y.shape[:-1] + (d,), y.dtype)
    return jnp.concatenate([pad, y[..., :-d]], axis=-1)


def banded_pair_data(x, K: int):
    """Stack the K partner views: [.., NB] → [.., K, NB] where
    out[.., d-1, i] = x[.., i+d]."""
    return jnp.stack([_fwd(x, d) for d in range(1, K + 1)], axis=-2)


def _tangents0(n):
    """Orthonormal tangents for normals with the COMPONENT AXIS LEADING
    (all banded grids are [3, ..., NB]); physics_ops._orthonormal_tangents
    assumes [.., 3, C]."""
    nx = n[0]
    use_x = jnp.abs(nx) < 0.9
    h = jnp.stack([jnp.where(use_x, 1.0, 0.0),
                   jnp.where(use_x, 0.0, 1.0),
                   jnp.zeros_like(nx)], axis=0)
    t1 = lm.cross(n, h, axis=0)
    t1 = t1 * jax.lax.rsqrt(jnp.maximum(jnp.sum(t1 * t1, axis=0,
                                                keepdims=True), 1e-12))
    t2 = lm.cross(n, t1, axis=0)
    return t1, t2


def _ang0(r, d, II):
    """d · ((I⁻¹ (r × d)) × r), leading component axis."""
    rxd = lm.cross(r, d, axis=0)
    return jnp.sum(lm.cross(II * rxd, r, axis=0) * d, axis=0)


def window_miss(s_mn, s_mx, K: int, occ=None):
    """Bodies whose x-extent overlaps past the K-th successor — candidates the
    bounded window may prune (0 ⇒ the window was wide enough this step)."""
    nb = s_mn.shape[-1]
    beyond = jnp.arange(nb) + K + 1
    in_range = beyond < nb
    mn_beyond = jnp.take(s_mn[..., 0, :], jnp.minimum(beyond, nb - 1))
    m = (s_mx[..., 0, :] >= mn_beyond) & in_range
    if occ is not None:
        m = m & occ
    return jnp.sum(m).astype(jnp.int32)


def banded_pair_grids(sp, sr, s_rad, s_he, s_shape, s_mn, s_mx,
                      K: int, k: int, any_caps: bool):
    """Shared banded narrowphase plumbing (used by make_banded_world_step and
    the engine's PhysicsModule._banded_solve): shift-built pair data through
    pair_contacts_from_data → ([.., k, K, NB] point/normal/depth/raw-active
    grids, ok = rank-validity & AABB-overlap [K, NB]). Callers AND their own
    masks (layers, occupancy, dynamics) into the active grid."""
    nb = sp.shape[-1]
    iota = jnp.arange(nb)
    valid_rank = jnp.stack([iota + d < nb for d in range(1, K + 1)])
    bmn = banded_pair_data(s_mn, K)
    bmx = banded_pair_data(s_mx, K)
    overlap = jnp.all((s_mn[:, None, :] <= bmx) & (bmn <= s_mx[:, None, :]),
                      axis=-3)
    ok = overlap & valid_rank

    def bcast(x):
        return jnp.broadcast_to(x[..., :, None, :],
                                x.shape[:-1] + (K, nb)).reshape(
            x.shape[:-1] + (K * nb,))

    def bcast1(x):
        return jnp.broadcast_to(x[..., None, :], (K, nb)).reshape(K * nb)

    point, normal, depth, active = P.pair_contacts_from_data(
        bcast(sp), bcast(sr), bcast1(s_rad), bcast(s_he), bcast1(s_shape),
        banded_pair_data(sp, K).reshape(sp.shape[:-1] + (K * nb,)),
        banded_pair_data(sr, K).reshape(sr.shape[:-1] + (K * nb,)),
        banded_pair_data(s_rad, K).reshape(K * nb),
        banded_pair_data(s_he, K).reshape(s_he.shape[:-1] + (K * nb,)),
        banded_pair_data(s_shape, K).reshape(K * nb),
        points_per_pair=k, any_caps=any_caps)

    def grid(x):
        return x.reshape(x.shape[:-1] + (k, K, nb))

    return grid(point), grid(normal), grid(depth), grid(active), ok


def solve_contacts_banded(
    vel, angvel, inv_mass, iiw,
    # ground slots [G, NB]: no partner
    g_point, g_normal, g_depth, g_active, g_fric, g_rest,
    # banded pair slots [S, K, NB]: partner of (s, d-1, i) is rank i+d
    p_point, p_normal, p_depth, p_active, p_fric, p_rest,
    pos_rank, dt,
    iterations: int = 8, baumgarte: float = 0.0, slop: float = 0.005,
    relaxation: float = 0.75,
):
    """Projected-Jacobi PGS in rank space with shift-based accumulation.
    All geometry is [*, NB]-grid shaped; vel/angvel/pos_rank [3, NB]."""
    K = p_point.shape[-2]
    nb = vel.shape[-1]

    # --- precompute per-slot constants -----------------------------------
    # ground slots: body = rank i (broadcast), world anchor = slot point
    g_r = g_point - pos_rank[:, None, :]              # [3, G, NB]
    g_t1, g_t2 = _tangents0(g_normal)
    im = inv_mass[None, :]
    g_kn = jnp.maximum(im + _ang0(g_r, g_normal, iiw[:, None, :]), 1e-9)
    g_kt1 = jnp.maximum(im + _ang0(g_r, g_t1, iiw[:, None, :]), 1e-9)
    g_kt2 = jnp.maximum(im + _ang0(g_r, g_t2, iiw[:, None, :]), 1e-9)

    # banded slots: a = rank i, b = rank i+d
    pos_b = banded_pair_data(pos_rank, K)             # [3, K, NB]
    iiw_b = banded_pair_data(iiw, K)
    im_b = banded_pair_data(inv_mass, K)              # [K, NB]
    p_ra = p_point - pos_rank[:, None, None, :]       # [3, S, K, NB]
    p_rb = p_point - pos_b[:, None, :, :]
    p_t1, p_t2 = _tangents0(p_normal)
    imab = inv_mass[None, None, :] + im_b[None, :, :]  # [K,NB] broadcast S

    II_a4 = iiw[:, None, None, :]
    II_b4 = iiw_b[:, None, :, :]
    p_kn = jnp.maximum(imab + _ang0(p_ra, p_normal, II_a4)
                       + _ang0(p_rb, p_normal, II_b4), 1e-9)
    p_kt1 = jnp.maximum(imab + _ang0(p_ra, p_t1, II_a4)
                        + _ang0(p_rb, p_t1, II_b4), 1e-9)
    p_kt2 = jnp.maximum(imab + _ang0(p_ra, p_t2, II_a4)
                        + _ang0(p_rb, p_t2, II_b4), 1e-9)

    # degree-scaled relaxation (Jacobi stability; matches solve_contacts)
    ga = g_active.astype(jnp.float32)
    pa = p_active.astype(jnp.float32)
    deg = jnp.sum(ga, axis=-2) + jnp.sum(pa, axis=(-3, -2))
    for d in range(1, K + 1):
        deg = deg + _back(jnp.sum(pa[..., d - 1, :], axis=-2), d)
    deg_b = banded_pair_data(deg, K)
    g_relax = jnp.minimum(relaxation, 1.6 / jnp.maximum(deg[None, :], 1.0))
    p_relax = jnp.minimum(
        relaxation, 1.6 / jnp.maximum(jnp.maximum(deg[None, None, :], deg_b[None, :, :]), 1.0))

    g_bias = (baumgarte / dt) * jnp.maximum(g_depth - slop, 0.0)
    p_bias = (baumgarte / dt) * jnp.maximum(p_depth - slop, 0.0)

    def rel_vels(v, w):
        vw = jnp.concatenate([v, w], axis=0)          # [6, NB]
        vw_b = banded_pair_data(vw, K)                # [6, K, NB]
        va_g = vw[0:3][:, None, :] + lm.cross(
            jnp.broadcast_to(vw[3:6][:, None, :], g_r.shape), g_r, axis=0)
        g_vr = -va_g                                   # ground is static
        va_p = vw[0:3][:, None, None, :] + lm.cross(
            jnp.broadcast_to(vw[3:6][:, None, None, :], p_ra.shape), p_ra, axis=0)
        vb_p = vw_b[0:3][:, None, :, :] + lm.cross(
            jnp.broadcast_to(vw_b[3:6][:, None, :, :], p_rb.shape), p_rb, axis=0)
        return g_vr, vb_p - va_p

    g_vr0, p_vr0 = rel_vels(vel, angvel)
    g_vn0 = jnp.sum(g_vr0 * g_normal, axis=0)
    p_vn0 = jnp.sum(p_vr0 * p_normal, axis=0)
    g_target = jnp.maximum(g_bias, jnp.where(g_vn0 < -0.5, -g_rest * g_vn0, 0.0))
    p_target = jnp.maximum(p_bias, jnp.where(p_vn0 < -0.5, -p_rest * p_vn0, 0.0))

    def body_fn(_, carry):
        v, w, gl, gl1, gl2, pl, pl1, pl2 = carry
        g_vr, p_vr = rel_vels(v, w)
        # ground slots
        g_vn = jnp.sum(g_vr * g_normal, axis=0)
        g_dln = (g_target - g_vn) / g_kn * g_relax
        g_new = jnp.maximum(gl + g_dln, 0.0)
        g_dln = jnp.where(g_active, g_new - gl, 0.0)
        g_vt1 = jnp.sum(g_vr * g_t1, axis=0)
        g_vt2 = jnp.sum(g_vr * g_t2, axis=0)
        g_max = g_fric * (gl + g_dln)
        g_n1 = jnp.clip(gl1 + (-g_vt1 / g_kt1) * g_relax, -g_max, g_max)
        g_n2 = jnp.clip(gl2 + (-g_vt2 / g_kt2) * g_relax, -g_max, g_max)
        g_d1 = jnp.where(g_active, g_n1 - gl1, 0.0)
        g_d2 = jnp.where(g_active, g_n2 - gl2, 0.0)
        g_imp = (g_normal * g_dln[None] + g_t1 * g_d1[None] + g_t2 * g_d2[None])
        g_imp = jnp.where(g_active[None], g_imp, 0.0)
        # banded slots
        p_vn = jnp.sum(p_vr * p_normal, axis=0)
        p_dln = (p_target - p_vn) / p_kn * p_relax
        p_new = jnp.maximum(pl + p_dln, 0.0)
        p_dln = jnp.where(p_active, p_new - pl, 0.0)
        p_vt1 = jnp.sum(p_vr * p_t1, axis=0)
        p_vt2 = jnp.sum(p_vr * p_t2, axis=0)
        p_max = p_fric * (pl + p_dln)
        p_n1 = jnp.clip(pl1 + (-p_vt1 / p_kt1) * p_relax, -p_max, p_max)
        p_n2 = jnp.clip(pl2 + (-p_vt2 / p_kt2) * p_relax, -p_max, p_max)
        p_d1 = jnp.where(p_active, p_n1 - pl1, 0.0)
        p_d2 = jnp.where(p_active, p_n2 - pl2, 0.0)
        p_imp = (p_normal * p_dln[None] + p_t1 * p_d1[None] + p_t2 * p_d2[None])
        p_imp = jnp.where(p_active[None], p_imp, 0.0)

        # accumulate: a-side at rank i (plain sums), b-side shifted back
        six_ga = jnp.concatenate([g_imp, lm.cross(g_r, g_imp, axis=0)], axis=0)
        acc = -jnp.sum(six_ga, axis=-2)                       # [6, NB]
        six_pa = jnp.concatenate([p_imp, lm.cross(p_ra, p_imp, axis=0)], axis=0)
        acc = acc - jnp.sum(six_pa, axis=(-3, -2))
        six_pb = jnp.concatenate([p_imp, lm.cross(p_rb, p_imp, axis=0)], axis=0)
        pb_sum = jnp.sum(six_pb, axis=-3)                     # [6, K, NB]
        for d in range(1, K + 1):
            acc = acc + _back(pb_sum[..., d - 1, :], d)
        v = v + acc[0:3] * inv_mass[None, :]
        w = w + acc[3:6] * iiw
        return (v, w, gl + g_dln, gl1 + g_d1, gl2 + g_d2,
                pl + p_dln, pl1 + p_d1, pl2 + p_d2)

    zg = jnp.zeros_like(g_depth)
    zp = jnp.zeros_like(p_depth)
    out = jax.lax.fori_loop(0, iterations, body_fn,
                            (vel, angvel, zg, zg, zg, zp, zp, zp))
    return out[0], out[1]


def project_positions_banded(pos_rank, g_normal, g_depth, g_active,
                             p_normal, p_depth, p_active, inv_mass,
                             iterations: int = 3, slop: float = 0.005,
                             relaxation: float = 0.8):
    """Split-impulse position projection in rank space (shift-based)."""
    K = p_normal.shape[-2]
    im = inv_mass
    im_b = banded_pair_data(im, K)
    g_k = jnp.maximum(im[None, :], 1e-9)
    p_k = jnp.maximum(im[None, None, :] + im_b[None, :, :], 1e-9)
    g_e0 = jnp.where(g_active, jnp.maximum(g_depth - slop, 0.0), 0.0)
    p_e0 = jnp.where(p_active, jnp.maximum(p_depth - slop, 0.0), 0.0)

    ga = g_active.astype(jnp.float32)
    pa = p_active.astype(jnp.float32)
    deg = jnp.sum(ga, axis=-2) + jnp.sum(pa, axis=(-3, -2))
    for d in range(1, K + 1):
        deg = deg + _back(jnp.sum(pa[..., d - 1, :], axis=-2), d)
    deg_b = banded_pair_data(deg, K)
    g_rx = jnp.minimum(relaxation, 1.6 / jnp.maximum(deg[None, :], 1.0))
    p_rx = jnp.minimum(
        relaxation, 1.6 / jnp.maximum(jnp.maximum(deg[None, None, :], deg_b[None, :, :]), 1.0))

    def body(_, carry):
        dpos, gl, pl = carry
        dpos_b = banded_pair_data(dpos, K)
        g_sep = jnp.sum((-dpos[:, None, :]) * g_normal, axis=0)
        g_dl = (g_e0 - g_sep) / g_k * g_rx
        g_new = jnp.maximum(gl + g_dl, 0.0)
        g_dl = jnp.where(g_active, g_new - gl, 0.0)
        p_sep = jnp.sum((dpos_b[:, None, :, :] - dpos[:, None, None, :])
                        * p_normal, axis=0)
        p_dl = (p_e0 - p_sep) / p_k * p_rx
        p_new = jnp.maximum(pl + p_dl, 0.0)
        p_dl = jnp.where(p_active, p_new - pl, 0.0)
        step_g = jnp.where(g_active[None], g_normal * g_dl[None], 0.0)
        step_p = jnp.where(p_active[None], p_normal * p_dl[None], 0.0)
        d_acc = -jnp.sum(step_g, axis=-2) - jnp.sum(step_p, axis=(-3, -2))
        pb = jnp.sum(step_p, axis=-3)
        for d in range(1, K + 1):
            d_acc = d_acc + _back(pb[..., d - 1, :], d)
        dpos = dpos + d_acc * im[None, :]
        return dpos, g_new, p_new

    dpos, _, _ = jax.lax.fori_loop(
        0, iterations, body,
        (jnp.zeros_like(pos_rank), jnp.zeros_like(g_e0), jnp.zeros_like(p_e0)))
    return pos_rank + dpos


def make_banded_world_step(
    shape_np: np.ndarray, radius_np, half_extents_np, dyn_mask_np,
    inv_mass_np, inv_inertia_body_np, friction_np, restitution_np,
    gravity=(0.0, -9.81, 0.0), neighbors: int = 24, points_per_pair: int = 4,
    iterations: int = 8, position_iterations: int = 3, ground_y: float = 0.0,
    lin_damping: float = 0.05, ang_damping: float = 0.05,
    ground_friction: float = 0.6,
):
    """Drop-in alternative to physics_big.make_big_world_step: same physics,
    gather-free banded solve. step(pos, rot, vel, angvel, dt) → same outputs
    (plus counters)."""
    nb = shape_np.shape[0]
    shape_j = jnp.asarray(shape_np)
    radius_j = jnp.asarray(radius_np)
    he_j = jnp.asarray(half_extents_np)
    dyn_j = jnp.asarray(dyn_mask_np)
    im_j = jnp.asarray(inv_mass_np)
    iib_j = jnp.asarray(inv_inertia_body_np)
    fric_j = jnp.asarray(friction_np)
    rest_j = jnp.asarray(restitution_np)
    K = neighbors
    k = points_per_pair
    gslots = 4

    def step(pos, rot, vel, angvel, dt):
        vel, angvel = P.integrate_velocities(vel, angvel, dt, gravity,
                                             lin_damping, ang_damping, dyn_j)
        mn, mx = P.world_aabb(pos, rot, shape_j, radius_j, he_j)
        order = jnp.argsort(mn[..., 0, :], axis=-1).astype(jnp.int32)

        def to_rank(x):
            return jnp.take(x, order, axis=-1)

        sp = to_rank(pos)
        sr = to_rank(rot)
        sv = to_rank(vel)
        sw = to_rank(angvel)
        s_shape = to_rank(shape_j)
        s_rad = to_rank(radius_j)
        s_he = to_rank(he_j)
        s_dyn = to_rank(dyn_j)
        s_im = to_rank(im_j)
        s_iib = to_rank(iib_j)
        s_fric = to_rank(fric_j)
        s_rest = to_rank(rest_j)
        s_mn = to_rank(mn)
        s_mx = to_rank(mx)

        miss = window_miss(s_mn, s_mx, K)
        p_point, p_normal, p_depth, p_raw_active, ok = banded_pair_grids(
            sp, sr, s_rad, s_he, s_shape, s_mn, s_mx, K, k,
            any_caps=bool(np.any(shape_np == P.SHAPE_CAPSULE)))
        either_dyn = (s_dyn[None, None, :] | banded_pair_data(s_dyn, K)[None, :, :])
        p_active = p_raw_active & ok[None, :, :] & either_dyn
        fric_b = banded_pair_data(s_fric, K)
        rest_b = banded_pair_data(s_rest, K)
        p_fric = jnp.broadcast_to(
            jnp.sqrt(jnp.maximum(s_fric[None, :] * fric_b, 0.0))[None], p_depth.shape)
        p_rest = jnp.broadcast_to(
            jnp.maximum(s_rest[None, :], rest_b)[None], p_depth.shape)

        # ground contacts in rank space → [G, NB] grids
        g = P.ground_contacts(sp, sr, s_shape, s_rad, s_he, s_dyn,
                              ground_y=ground_y, slots_per_body=gslots)
        g_point = g.point.reshape(g.point.shape[:-1] + (gslots, nb))
        g_normal = g.normal.reshape(g_point.shape)
        g_depth = g.depth.reshape(g.depth.shape[:-1] + (gslots, nb))
        g_active = g.active.reshape(g_depth.shape)
        g_fric = jnp.broadcast_to(
            jnp.sqrt(jnp.maximum(s_fric * ground_friction, 0.0))[None, :],
            g_depth.shape)
        g_rest = jnp.broadcast_to(s_rest[None, :], g_depth.shape)

        iiw = P.inv_inertia_world_diag(sr, s_iib)
        sv, sw = solve_contacts_banded(
            sv, sw, s_im, iiw,
            g_point, g_normal, g_depth, g_active, g_fric, g_rest,
            p_point, p_normal, p_depth, p_active, p_fric, p_rest,
            sp, dt, iterations=iterations, baumgarte=0.0)
        sp, sr = P.integrate_positions(sp, sr, sv, sw, dt, s_dyn)
        sp = project_positions_banded(sp, g_normal, g_depth, g_active,
                                      p_normal, p_depth, p_active, s_im,
                                      iterations=position_iterations)

        # back to body order: one permutation scatter per array
        def unrank(x):
            return jnp.zeros_like(x).at[..., order].set(x)

        counters = {"active_contacts":
                    (jnp.sum(p_active) + jnp.sum(g_active)).astype(jnp.int32),
                    "sap_window_miss": miss}
        return unrank(sp), unrank(sr), unrank(sv), unrank(sw), counters

    return step
