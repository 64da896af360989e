"""Large-single-world rigid-body pipeline — the 10k-box drop config
(BASELINE.md config 3; ≙ the reference's demo/maps/physics_stress_test).

The default pipeline's static all-pairs list is O(NB²) and tops out around a
thousand bodies. This variant scales to 10k+ bodies in ONE world:

  broadphase  — sweep-and-prune: sort bodies along x (jnp.sort — the same
                axis-sort the reference's SAP broadphase uses), pair each body
                with its next K neighbors in sorted order, prune by AABB
                overlap. Candidate pair indices are DATA (they change as
                bodies move), so this path trades the static-index fast path
                for bounded candidate counts.
  narrowphase — the same analytic contacts as ops/physics_ops.py, evaluated on
                dynamically gathered pair data.
  solver      — the same projected-Jacobi PGS, with impulse accumulation via
                segment_sum over body indices instead of static incidence
                matmuls.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.ops import physics_ops as P

AX = -2


def sap_pairs(pos, aabb_min, aabb_max, neighbors: int = 24,
              return_miss_count: bool = False):
    """Sweep-and-prune candidate pairs: sort by AABB min-x, window of K
    successors → (pair_a [N*K], pair_b [N*K], overlap mask[, window_miss]).

    window_miss counts bodies whose x-extent still overlaps the (K+1)-th
    successor's min-x — i.e. bodies that MAY have candidate pairs pruned by
    the bounded window. Zero misses proves the window was wide enough this
    step (x-overlap is necessary for AABB overlap)."""
    n = pos.shape[-1]
    order = jnp.argsort(aabb_min[..., 0, :], axis=-1).astype(jnp.int32)
    offs = jnp.tile(jnp.arange(1, neighbors + 1), n)
    rank_a = jnp.repeat(jnp.arange(n, dtype=jnp.int32), neighbors)
    rank_b = rank_a + offs
    valid = rank_b < n
    rank_b = jnp.minimum(rank_b, n - 1)
    pa = jnp.take(order, rank_a)
    pb = jnp.take(order, rank_b)
    # AABB overlap prune
    mn_a = jnp.take(aabb_min, pa, axis=-1)
    mx_a = jnp.take(aabb_max, pa, axis=-1)
    mn_b = jnp.take(aabb_min, pb, axis=-1)
    mx_b = jnp.take(aabb_max, pb, axis=-1)
    overlap = jnp.all((mn_a <= mx_b) & (mn_b <= mx_a), axis=-2)
    ok = overlap & valid
    if not return_miss_count:
        return pa, pb, ok
    mx_sorted = jnp.take(aabb_max[..., 0, :], order)
    mn_sorted = jnp.take(aabb_min[..., 0, :], order)
    beyond = jnp.arange(n) + neighbors + 1
    in_range = beyond < n
    mn_beyond = jnp.take(mn_sorted, jnp.minimum(beyond, n - 1))
    miss = jnp.sum((mx_sorted >= mn_beyond) & in_range).astype(jnp.int32)
    return pa, pb, ok, miss


def solve_contacts_dynamic(
    pos, vel, angvel, inv_mass_arr, iiw,
    point, normal, depth, active, body_a, body_b, has_b,
    friction, restitution, dt,
    iterations: int = 8, baumgarte: float = 0.2, slop: float = 0.005,
    relaxation: float = 0.75,
):
    """PGS with DATA body indices: per-contact gathers via jnp.take, impulse
    accumulation via segment_sum (num_segments = NB).

    Jacobi stability: with constant relaxation, bodies with many concurrent
    contacts over-apply impulses and dense piles explode (Jacobi diverges
    when relaxation > 2/degree). Relaxation is therefore scaled per contact
    by the larger of the two bodies' active-contact degrees — the standard
    mass-splitting/averaged-projection scheme."""
    nb = pos.shape[-1]
    ba = body_a
    bb = body_b
    im_a = jnp.take(inv_mass_arr, ba)
    im_b = jnp.take(inv_mass_arr, bb) * has_b

    act_f = active.astype(jnp.float32)
    deg = jax.ops.segment_sum(act_f, ba, num_segments=nb) + \
        jax.ops.segment_sum(act_f * has_b, bb, num_segments=nb)
    deg_c = jnp.maximum(jnp.maximum(jnp.take(deg, ba), jnp.take(deg, bb) * has_b), 1.0)
    relaxation = jnp.minimum(relaxation, 1.6 / deg_c)

    n = normal
    t1, t2 = P._orthonormal_tangents(n)
    r_a = point - jnp.take(pos, ba, axis=-1)
    r_b = point - jnp.take(pos, bb, axis=-1)
    II_a = jnp.take(iiw, ba, axis=-1)
    II_b = jnp.take(iiw, bb, axis=-1) * has_b[None, :]

    def ang_term(r, d, II):
        rxd = lm.cross(r, d, axis=AX)
        return jnp.sum(lm.cross(II * rxd, r, axis=AX) * d, axis=AX)

    k_n = jnp.maximum(im_a + im_b + ang_term(r_a, n, II_a) + ang_term(r_b, n, II_b), 1e-9)
    k_t1 = jnp.maximum(im_a + im_b + ang_term(r_a, t1, II_a) + ang_term(r_b, t1, II_b), 1e-9)
    k_t2 = jnp.maximum(im_a + im_b + ang_term(r_a, t2, II_a) + ang_term(r_b, t2, II_b), 1e-9)
    bias = (baumgarte / dt) * jnp.maximum(depth - slop, 0.0)

    def rel_vel(v, w):
        vw = jnp.concatenate([v, w], axis=AX)
        a6 = jnp.take(vw, ba, axis=-1)
        b6 = jnp.take(vw, bb, axis=-1)
        va = a6[0:3] + lm.cross(a6[3:6], r_a, axis=AX)
        vb = (b6[0:3] + lm.cross(b6[3:6], r_b, axis=AX)) * has_b[None, :]
        return vb - va

    vn0 = jnp.sum(rel_vel(vel, angvel) * n, axis=AX)
    # restitution and Baumgarte bias do not stack (PhysX: max, not sum)
    v_target = jnp.maximum(bias, jnp.where(vn0 < -0.5, -restitution * vn0, 0.0))

    def seg(x, idx):  # [6,C] accumulated per body → [6,NB]
        return jax.ops.segment_sum(x.T, idx, num_segments=nb).T

    def body_fn(_, carry):
        v, w, ln, lt1, lt2 = carry
        vr = rel_vel(v, w)
        vn = jnp.sum(vr * n, axis=AX)
        dln = (v_target - vn) / k_n * relaxation
        new_ln = jnp.maximum(ln + dln, 0.0)
        dln = jnp.where(active, new_ln - ln, 0.0)
        vt1 = jnp.sum(vr * t1, axis=AX)
        vt2 = jnp.sum(vr * t2, axis=AX)
        max_f = friction * (ln + dln)
        new_lt1 = jnp.clip(lt1 + (-vt1 / k_t1) * relaxation, -max_f, max_f)
        new_lt2 = jnp.clip(lt2 + (-vt2 / k_t2) * relaxation, -max_f, max_f)
        dlt1 = jnp.where(active, new_lt1 - lt1, 0.0)
        dlt2 = jnp.where(active, new_lt2 - lt2, 0.0)
        imp = n * dln[None, :] + t1 * dlt1[None, :] + t2 * dlt2[None, :]
        six_a = jnp.concatenate([imp, lm.cross(r_a, imp, axis=AX)], axis=AX)
        six_b = jnp.concatenate([imp * has_b[None, :], lm.cross(r_b, imp, axis=AX) * has_b[None, :]], axis=AX)
        acc = seg(six_b, bb) - seg(six_a, ba)
        v = v + acc[0:3] * inv_mass_arr[None, :]
        w = w + acc[3:6] * iiw
        return v, w, ln + dln, lt1 + dlt1, lt2 + dlt2

    zero = jnp.zeros_like(depth)
    v, w, *_ = jax.lax.fori_loop(0, iterations, body_fn, (vel, angvel, zero, zero, zero))
    return v, w


def project_positions_dynamic(
    pos, normal, depth, active, body_a, body_b, has_b, inv_mass_arr,
    iterations: int = 3, slop: float = 0.005, relaxation: float = 0.8,
):
    """Split-impulse position projection with DATA body indices
    (segment_sum scatter) — the dynamic-pair counterpart of
    physics_ops.project_positions."""
    nb = pos.shape[-1]
    im_a = jnp.take(inv_mass_arr, body_a)
    im_b = jnp.take(inv_mass_arr, body_b) * has_b
    k_lin = jnp.maximum(im_a + im_b, 1e-9)
    # max_correction caps the per-frame push (see physics_ops
    # project_positions — linear-only corrections pump energy on tipped
    # end contacts); same 0.05 m cap as the other body-order projection
    # paths (0.02 was too tight: boxes tunneled under pile pressure)
    e0 = jnp.where(active, jnp.clip(depth - slop, 0.0, 0.05), 0.0)

    act_f = active.astype(jnp.float32)
    deg = jax.ops.segment_sum(act_f, body_a, num_segments=nb) + \
        jax.ops.segment_sum(act_f * has_b, body_b, num_segments=nb)
    deg_c = jnp.maximum(jnp.maximum(jnp.take(deg, body_a),
                                    jnp.take(deg, body_b) * has_b), 1.0)
    relax_c = jnp.minimum(relaxation, 1.6 / deg_c)

    def seg(x, idx):
        return jax.ops.segment_sum(x.T, idx, num_segments=nb).T

    def body(_, carry):
        dpos, lam = carry
        da = jnp.take(dpos, body_a, axis=-1)
        db = jnp.take(dpos, body_b, axis=-1) * has_b[None, :]
        sep = jnp.sum((db - da) * normal, axis=AX)
        dlam = (e0 - sep) / k_lin * relax_c
        new_lam = jnp.maximum(lam + dlam, 0.0)
        # mask AFTER the max: inactive slots can carry NaN normals
        # (degenerate narrowphase on pruned self-pairs) — never let them in
        dlam = jnp.where(active, new_lam - lam, 0.0)
        step_vec = normal * dlam[None, :]
        dpos = dpos + (seg(step_vec * has_b[None, :], body_b)
                       - seg(step_vec, body_a)) * inv_mass_arr[None, :]
        return dpos, new_lam

    dpos, _ = jax.lax.fori_loop(
        0, iterations, body, (jnp.zeros_like(pos), jnp.zeros_like(e0)))
    return pos + dpos


def compact_pairs(pa, pb, ok, budget: int, body_count=None):
    """Compact the overlapping candidate pairs into a fixed budget (stable
    order). The SAP window emits NB·K candidates but only the AABB-overlapping
    few percent do narrowphase/solver work — every per-slot op downstream is
    a traced-index gather whose cost scales with SLOT COUNT, so shrinking C
    is the single biggest lever at 10k bodies (same insight as the engine's
    pruned broadphase). Returns (pa_c, pb_c, valid [budget], overflow)."""
    pn = pa.shape[-1]
    iota = jnp.arange(pn, dtype=jnp.int32)
    overflow = jnp.maximum(jnp.sum(ok.astype(jnp.int32)) - budget, 0)
    # Zero-gather compaction when the payload fits an int32 top_k key:
    # gathers of pa/pb/ok by top_k indices get placed on the sequential TPU
    # SCALAR core at these shapes (~2-4 ms for 400k lanes, measured — it was
    # the single largest flagship frame cost), so instead the PAYLOAD rides
    # inside the sort key: key = rank·nb² + (pa·nb + pb), rank = ok-major
    # recency order (unique per candidate). top_k orders by rank (high
    # bits); pa/pb/ok decode from the VALUES with pure vector arithmetic.
    if isinstance(pa, np.ndarray):
        max_id = int(max(pa.max(initial=0), pb.max(initial=0))) + 1
    else:
        max_id = body_count  # traced pair lists: caller-provided bound
    if max_id is not None and 2 * (pn + 1) * max_id * max_id < 2**31:
        m = max_id * max_id
        rank = jnp.where(ok, 2 * pn - iota, pn - iota)      # unique, ok-major
        payload = jnp.asarray(pa * max_id + pb, jnp.int32)
        packed, _ = jax.lax.top_k(rank * m + payload, budget)
        rank_c = packed // m
        pid = packed - rank_c * m
        pa_c = (pid // max_id).astype(jnp.int32)
        pb_c = (pid - (pid // max_id) * max_id).astype(jnp.int32)
        return pa_c, pb_c, rank_c > pn, overflow

    prio = jnp.where(ok, pn - iota, -iota)
    _, idx = jax.lax.top_k(prio, budget)
    return (jnp.take(pa, idx), jnp.take(pb, idx), jnp.take(ok, idx),
            overflow)


def make_big_world_step(
    shape_np: np.ndarray, radius_np, half_extents_np, dyn_mask_np,
    inv_mass_np, inv_inertia_body_np, friction_np, restitution_np,
    gravity=(0.0, -9.81, 0.0), neighbors: int = 24, points_per_pair: int = 4,
    iterations: int = 8, position_iterations: int = 3, ground_y: float = 0.0,
    lin_damping: float = 0.05, ang_damping: float = 0.05,
    ground_friction: float = 0.6, pair_budget: int | None = None,
):
    """Build a jittable single-world step(pos, rot, vel, angvel, dt) for NB
    up to tens of thousands of bodies."""
    nb = shape_np.shape[0]
    shape = jnp.asarray(shape_np)
    radius = jnp.asarray(radius_np)
    he = jnp.asarray(half_extents_np)
    dyn = jnp.asarray(dyn_mask_np)
    inv_mass = jnp.asarray(inv_mass_np)
    iib = jnp.asarray(inv_inertia_body_np)
    fric = jnp.asarray(friction_np)
    rest = jnp.asarray(restitution_np)
    k = points_per_pair
    gslots = 4

    def step(pos, rot, vel, angvel, dt):
        vel, angvel = P.integrate_velocities(vel, angvel, dt, gravity,
                                             lin_damping, ang_damping, dyn)
        # broadphase (window_miss>0 ⇒ raise `neighbors`; see sap_pairs)
        mn, mx = P.world_aabb(pos, rot, shape, radius, he)
        pa, pb, ok, miss = sap_pairs(pos, mn, mx, neighbors,
                                     return_miss_count=True)
        # compact to the overlapping few percent (7x fewer slots at 10k —
        # traced-gather cost downstream scales with slot count)
        budget = pair_budget or min(8 * nb, pa.shape[-1])
        pa, pb, ok, overflow = compact_pairs(pa, pb, ok, budget,
                                             body_count=nb)
        miss = miss + overflow
        # narrowphase on dynamic pairs (reuses the static-path math with
        # dynamically gathered per-pair data)
        c = P.pair_contacts(pos, rot, shape, radius, he, pa, pb,
                            points_per_pair=k)
        pair_active = c.active & jnp.tile(ok, k)
        pair_fric = jnp.sqrt(jnp.take(fric, jnp.asarray(c.body_a))
                             * jnp.take(fric, jnp.asarray(c.body_b)))
        pair_rest = jnp.maximum(jnp.take(rest, jnp.asarray(c.body_a)),
                                jnp.take(rest, jnp.asarray(c.body_b)))
        g = P.ground_contacts(pos, rot, shape, radius, he, dyn,
                              ground_y=ground_y, slots_per_body=gslots)
        gnd_fric = jnp.sqrt(jnp.take(fric, jnp.asarray(g.body_a)) * ground_friction)
        gnd_rest = jnp.take(rest, jnp.asarray(g.body_a))
        point = jnp.concatenate([g.point, c.point], axis=-1)
        normal = jnp.concatenate([g.normal, c.normal], axis=-1)
        depth = jnp.concatenate([g.depth, c.depth], axis=-1)
        active = jnp.concatenate([g.active, pair_active], axis=-1)
        body_a = jnp.concatenate([jnp.asarray(g.body_a), jnp.tile(pa, k)])
        body_b = jnp.concatenate([jnp.full(gslots * nb, 0, jnp.int32), jnp.tile(pb, k)])
        has_b = jnp.concatenate([jnp.zeros(gslots * nb), jnp.ones(len(pa) * k)])
        cfric = jnp.concatenate([gnd_fric, pair_fric])
        crest = jnp.concatenate([gnd_rest, pair_rest])

        iiw = P.inv_inertia_world_diag(rot, iib)
        vel, angvel = solve_contacts_dynamic(
            pos, vel, angvel, inv_mass, iiw, point, normal, depth, active,
            body_a, body_b, has_b, cfric, crest, dt, iterations=iterations,
            baumgarte=0.0,  # position projection below owns depth correction
        )
        pos, rot = P.integrate_positions(pos, rot, vel, angvel, dt, dyn)
        pos = project_positions_dynamic(pos, normal, depth, active,
                                        body_a, body_b, has_b, inv_mass,
                                        iterations=position_iterations)
        counters = {"active_contacts": jnp.sum(active).astype(jnp.int32),
                    "sap_window_miss": miss}
        return pos, rot, vel, angvel, counters

    return step


def pair_contacts_dynamic_note():
    """P.pair_contacts accepts jnp index arrays: all `take`s are traced; the
    Contacts.body_a/b fields it returns are then jnp arrays, which this
    module's dynamic solver consumes directly."""
