"""Fused Pallas contact-solver loop — the projected-Jacobi PGS iterations of
ops/physics_ops.py::solve_contacts as ONE kernel launch per world-tile.

Why: the jnp solver compiles to ~25 device kernels per iteration; at 8-12
iterations that is hundreds of launches per step, and on the dev chip launch
overhead intermittently reaches ~0.5 ms/kernel — the solve becomes
launch-bound. Here the iteration loop runs INSIDE the kernel with everything
resident in VMEM, and each program processes a TILE of worlds so the
incidence contractions stay real matmuls ([tile·3, C] @ [C, NB] on the MXU)
instead of degenerating into per-world GEMVs.

Split: the one-time prologue (contact frames, tangent basis, effective
masses, restitution targets) stays in jnp — it runs once per step and XLA
fuses it well. The kernel receives precomputed per-contact constants plus the
static incidence matrices.

VMEM at the full-frame config (NB=64, C=8320, tile=8): ≈ 10 MB.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.ops import physics_ops as P

AX = -2


def _cross3(a, b, axis=1):
    ax_ = [jax.lax.index_in_dim(a, i, axis, keepdims=True) for i in range(3)]
    bx_ = [jax.lax.index_in_dim(b, i, axis, keepdims=True) for i in range(3)]
    return jnp.concatenate([
        ax_[1] * bx_[2] - ax_[2] * bx_[1],
        ax_[2] * bx_[0] - ax_[0] * bx_[2],
        ax_[0] * bx_[1] - ax_[1] * bx_[0],
    ], axis=axis)


def _make_kernel(iterations: int, wt: int, nb: int, c: int,
                 position_iterations: int):
    def kernel(inc_a, inc_b, inv_mass, II,
               vel, angvel, r_a, r_b, n, t1, t2,
               k_n, k_t1, k_t2, v_target, mu, act, relax,
               ln0, lt10, lt20, e0_p, relax_p, k_lin,
               vel_out, ang_out, ln_out, lt1_out, lt2_out, dpos_out):
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        # incidence may arrive bf16 (exact 0/1; halves HBM traffic) — cast
        # once into VMEM for the MXU contractions
        ia = inc_a[:].astype(jnp.float32)   # [NB, C]
        ib = inc_b[:].astype(jnp.float32)
        im = inv_mass[:]         # [1, NB]
        Iw = II[:]               # [WT, 3, NB]
        ra = r_a[:]              # [WT, 3, C]
        rb = r_b[:]
        nn = n[:]
        tt1 = t1[:]
        tt2 = t2[:]
        kn = k_n[:]              # [WT, 1, C]
        kt1 = k_t1[:]
        kt2 = k_t2[:]
        vt = v_target[:]
        a = act[:]
        muc = mu[:]              # [1, C]
        rlx = relax[:]           # [WT, 1, C] degree-scaled relaxation

        def gather(x, inc):  # [WT,K,NB] → [WT,K,C]
            k = x.shape[1]
            return dot(x.reshape(wt * k, nb), inc).reshape(wt, k, c)

        def scatter(x, inc_t):  # [WT,K,C] → [WT,K,NB]
            k = x.shape[1]
            return dot(x.reshape(wt * k, c), inc_t).reshape(wt, k, nb)

        def dot_rows(p, q):  # sum over axis 1 → [WT,1,C]
            return jnp.sum(p * q, axis=1, keepdims=True)

        def rel_vel(v, w):
            vw = jnp.concatenate([v, w], axis=1)          # [WT,6,NB]
            a6 = gather(vw, ia)
            b6 = gather(vw, ib)
            va = a6[:, 0:3] + _cross3(a6[:, 3:6], ra)
            vb = b6[:, 0:3] + _cross3(b6[:, 3:6], rb)
            return vb - va

        def body(_, carry):
            v, w, ln, lt1, lt2 = carry
            vr = rel_vel(v, w)
            vn = dot_rows(vr, nn)
            dln = (vt - vn) / kn * rlx
            new_ln = jnp.maximum(ln + dln, 0.0)
            dln = (new_ln - ln) * a
            vt1 = dot_rows(vr, tt1)
            vt2 = dot_rows(vr, tt2)
            max_f = muc[None] * (ln + dln)  # [1,1,C] ⊙ [WT,1,C]
            new_lt1 = jnp.clip(lt1 + (-vt1 / kt1) * rlx, -max_f, max_f)
            new_lt2 = jnp.clip(lt2 + (-vt2 / kt2) * rlx, -max_f, max_f)
            dlt1 = (new_lt1 - lt1) * a
            dlt2 = (new_lt2 - lt2) * a
            imp = nn * dln + tt1 * dlt1 + tt2 * dlt2       # [WT,3,C]
            six_a = jnp.concatenate([imp, _cross3(ra, imp)], axis=1)
            six_b = jnp.concatenate([imp, _cross3(rb, imp)], axis=1)
            acc = scatter(six_b, ib.T) - scatter(six_a, ia.T)  # [WT,6,NB]
            v = v + acc[:, 0:3] * im[None]
            w = w + acc[:, 3:6] * Iw
            return v, w, ln + dln, lt1 + dlt1, lt2 + dlt2

        # warm starting (≙ physics_ops.solve_contacts warm_lambdas): apply
        # last frame's accumulated impulses up front; iterations then only
        # compute the correction. Inactive slots hard-masked (NaN geometry).
        wl_n = jnp.maximum(ln0[:], 0.0) * a
        wl_t1 = lt10[:] * a
        wl_t2 = lt20[:] * a
        warm_imp = nn * wl_n + tt1 * wl_t1 + tt2 * wl_t2
        warm_imp = jnp.where(a > 0.0, warm_imp, 0.0)
        six_a0 = jnp.concatenate([warm_imp, _cross3(ra, warm_imp)], axis=1)
        six_b0 = jnp.concatenate([warm_imp, _cross3(rb, warm_imp)], axis=1)
        acc0 = scatter(six_b0, ib.T) - scatter(six_a0, ia.T)
        v0 = vel[:] + acc0[:, 0:3] * im[None]
        w0 = angvel[:] + acc0[:, 3:6] * Iw
        v, w, ln, lt1, lt2 = jax.lax.fori_loop(
            0, iterations, body, (v0, w0, wl_n, wl_t1, wl_t2)
        )
        vel_out[:] = v
        ang_out[:] = w
        ln_out[:] = ln
        lt1_out[:] = lt1
        lt2_out[:] = lt2

        # split-impulse position projection fused into the same launch
        # (≙ physics_ops.project_positions): dpos depends only on the
        # contact set, never on the integrated positions, so the engine can
        # add it AFTER integrate_positions — identical semantics, and the
        # 3-iteration jnp fori_loop (~25 kernels/iteration) disappears.
        e0p = e0_p[:]
        rlxp = relax_p[:]
        klin = k_lin[:]

        def pbody(_, carry):
            dpos, lam = carry
            sep = dot_rows(gather(dpos, ib) - gather(dpos, ia), nn)
            dlam = (e0p - sep) / klin * rlxp
            new_lam = jnp.maximum(lam + dlam, 0.0)
            dlam = (new_lam - lam) * a
            step_vec = nn * dlam
            dpos = dpos + (scatter(step_vec, ib.T)
                           - scatter(step_vec, ia.T)) * im[None]
            return dpos, new_lam

        dpos = jnp.zeros((wt, 3, nb), jnp.float32)
        if position_iterations > 0:
            dpos, _ = jax.lax.fori_loop(
                0, position_iterations, pbody,
                (dpos, jnp.zeros((wt, 1, c), jnp.float32)))
        dpos_out[:] = dpos

    return kernel


def solve_contacts_fused(
    pos, rot, vel, angvel,
    contacts: "P.Contacts",
    inv_mass, inv_inertia_world,
    incidence_a, incidence_b,
    dt,
    friction, restitution,
    iterations: int = 8,
    baumgarte: float = 0.2,
    slop: float = 0.005,
    relaxation: float = 0.75,
    world_tile: int = 0,
    interpret: bool = False,
    warm_lambdas=None,
    return_lambdas: bool = False,
    position_iterations: int = 0,
    proj_relaxation: float = 0.8,
    return_dpos: bool = False,
):
    """Drop-in replacement for physics_ops.solve_contacts (parity-tested).
    Works unbatched [3,NB] or world-batched [W,3,NB].

    world_tile=0 picks the largest VMEM-fitting divisor of W (bigger tiles →
    fatter [wt·6, C] MXU contractions; the wt=8 default left the systolic
    array at ~10% row occupancy at the flagship shapes).

    position_iterations>0 additionally runs the split-impulse position
    projection INSIDE the kernel and (with return_dpos) returns dpos [.,3,NB]
    for the caller to add after integrate_positions — dpos depends only on
    the contact set, so fusing it here is exact (≙ project_positions)."""
    batched = pos.ndim == 3
    inc_a_j = jnp.asarray(incidence_a)
    inc_b_j = jnp.asarray(incidence_b)
    im_arr = jnp.asarray(inv_mass)

    def gath(x, inc):  # [..,K,NB] → [..,K,C] one-hot gather on the MXU
        # (not jnp.take: minor-axis gathers with traced indices are TPU
        # pathology — see physics_ops.solve_contacts PERF NOTE; this also
        # admits per-world device incidence from the pruned broadphase)
        return jnp.einsum("...kn,nc->...kc", x, inc,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGH)

    im_a = im_arr @ inc_a_j
    im_b = im_arr @ inc_b_j   # zero cols where no body_b (ground/world)

    n = contacts.normal
    t1, t2 = P._orthonormal_tangents(n)
    pt = contacts.point
    r_a = pt - gath(pos, inc_a_j)
    r_b = pt - gath(pos, inc_b_j)
    II_a = gath(inv_inertia_world, inc_a_j)
    II_b = gath(inv_inertia_world, inc_b_j)

    def ang_term(r, d, IId):
        rxd = lm.cross(r, d, axis=AX)
        return jnp.sum(lm.cross(IId * rxd, r, axis=AX) * d, axis=AX)

    k_n = jnp.maximum(im_a + im_b + ang_term(r_a, n, II_a) + ang_term(r_b, n, II_b), 1e-9)
    k_t1 = jnp.maximum(im_a + im_b + ang_term(r_a, t1, II_a) + ang_term(r_b, t1, II_b), 1e-9)
    k_t2 = jnp.maximum(im_a + im_b + ang_term(r_a, t2, II_a) + ang_term(r_b, t2, II_b), 1e-9)
    bias = (baumgarte / dt) * jnp.maximum(contacts.depth - slop, 0.0)
    vw6 = jnp.concatenate([vel, angvel], axis=AX)
    a6 = gath(vw6, inc_a_j)
    b6 = gath(vw6, inc_b_j)
    comp = a6.ndim + AX
    va = jax.lax.slice_in_dim(a6, 0, 3, axis=comp) + lm.cross(
        jax.lax.slice_in_dim(a6, 3, 6, axis=comp), r_a, axis=AX)
    vb = jax.lax.slice_in_dim(b6, 0, 3, axis=comp) + lm.cross(
        jax.lax.slice_in_dim(b6, 3, 6, axis=comp), r_b, axis=AX)
    vn0 = jnp.sum((vb - va) * n, axis=AX)
    # restitution and Baumgarte bias do not stack (PhysX: max, not sum)
    v_target = jnp.maximum(bias, jnp.where(vn0 < -0.5, -jnp.asarray(restitution) * vn0, 0.0))
    act = contacts.active.astype(jnp.float32)
    deg = (jnp.einsum("...c,nc->...n", act, inc_a_j,
                      preferred_element_type=jnp.float32)
           + jnp.einsum("...c,nc->...n", act, inc_b_j,
                        preferred_element_type=jnp.float32))
    deg_c = jnp.maximum(jnp.maximum(
        jnp.einsum("...n,nc->...c", deg, inc_a_j,
                   preferred_element_type=jnp.float32),
        jnp.einsum("...n,nc->...c", deg, inc_b_j,
                   preferred_element_type=jnp.float32)), 1.0)
    relax_c = jnp.minimum(relaxation, 1.6 / deg_c)
    relax_p = jnp.minimum(proj_relaxation, 1.6 / deg_c)
    e0_p = jnp.where(contacts.active,
                     jnp.maximum(contacts.depth - slop, 0.0), 0.0)
    k_lin = jnp.maximum(im_a + im_b, 1e-9)

    up = (lambda x: x) if batched else (lambda x: x[None])

    def row(x):  # [..,C] → [W,1,C]
        x = up(x)
        return x[:, None, :] if x.ndim == 2 else x

    vel_b, ang_b = up(vel), up(angvel)
    w = vel_b.shape[0]
    nb = vel_b.shape[-1]
    c = pt.shape[-1]
    if world_tile <= 0:
        # largest divisor of w whose VMEM working set fits (~12 MB budget;
        # ≈ 230 B per (world, contact-slot) of tile-resident rows and
        # intermediates, plus the shared incidence pair). Capped at 16:
        # wt=16 already fills 96 of the MXU's 128 rows on the [wt·6, C]
        # contractions, and 32 doubles every VMEM temp for the last 25%
        fixed = 8 * nb * c
        world_tile = 1
        for cand in (16, 8, 4, 2):
            if w % cand == 0 and cand * c * 230 + fixed < 12e6:
                world_tile = cand
                break
    wt = world_tile if (w % world_tile == 0) else 1
    grid = (w // wt,)

    arrs3 = [jnp.broadcast_to(up(x), (w, 3, c)) for x in (r_a, r_b, n, t1, t2)]
    rows1 = [jnp.broadcast_to(row(x), (w, 1, c))
             for x in (k_n, k_t1, k_t2, v_target, act, relax_c)]
    proj_rows = [jnp.broadcast_to(row(x), (w, 1, c))
                 for x in (e0_p, relax_p, k_lin)]
    if warm_lambdas is None:
        zrow = jnp.zeros((w, 1, c), jnp.float32)
        warm_rows = [zrow, zrow, zrow]
    else:
        warm_rows = [jnp.broadcast_to(row(x), (w, 1, c)) for x in warm_lambdas]
    II_w = jnp.broadcast_to(up(inv_inertia_world), (w, 3, nb))
    im2 = im_arr[None, :]
    mu2 = jnp.asarray(friction, jnp.float32)[None, :]

    def pw(shape):
        return pl.BlockSpec((wt,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def bc(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kernel = _make_kernel(iterations, wt, nb, c, position_iterations)
    vel_o, ang_o, ln_o, lt1_o, lt2_o, dpos_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            bc((nb, c)), bc((nb, c)), bc((1, nb)),
            pw((3, nb)), pw((3, nb)), pw((3, nb)),
            pw((3, c)), pw((3, c)), pw((3, c)), pw((3, c)), pw((3, c)),
            pw((1, c)), pw((1, c)), pw((1, c)), pw((1, c)),
            bc((1, c)), pw((1, c)), pw((1, c)),
            pw((1, c)), pw((1, c)), pw((1, c)),
            pw((1, c)), pw((1, c)), pw((1, c)),
        ],
        out_specs=(pw((3, nb)), pw((3, nb)),
                   pw((1, c)), pw((1, c)), pw((1, c)), pw((3, nb))),
        out_shape=(
            jax.ShapeDtypeStruct((w, 3, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 3, nb), jnp.float32),
            jax.ShapeDtypeStruct((w, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((w, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((w, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((w, 3, nb), jnp.float32),
        ),
        interpret=interpret,
    )(jnp.asarray(incidence_a), jnp.asarray(incidence_b), im2,
      II_w, vel_b, ang_b, *arrs3, *rows1[:4], mu2, rows1[4], rows1[5],
      *warm_rows, *proj_rows)
    if not batched:
        vel_o, ang_o, dpos_o = vel_o[0], ang_o[0], dpos_o[0]
        lams = (ln_o[0, 0], lt1_o[0, 0], lt2_o[0, 0])
    else:
        lams = (ln_o[:, 0], lt1_o[:, 0], lt2_o[:, 0])
    out = (vel_o, ang_o)
    if return_lambdas:
        out = out + (lams,)
    if return_dpos:
        out = out + (dpos_o,)
    return out
