"""Slot-compacted symmetric-pair rigid-body pipeline — the large-pile path
(the 10k-box BASELINE config; successor to physics_banded for dense piles).

WHY (VERDICT-r3 weak #2): the banded multi-sweep pipeline carries
[k, K, NB] narrowphase + solver grids for EVERY one of its 4 column sweeps —
~960k candidate slots at 10k bodies for ~35k real contacts (≈1% occupancy),
59 ms/step measured, and its conservative column certificate fires ~200k
times over a compacting 22³ pile even though the EXACT dropped-overlap count
is two orders of magnitude smaller.

THE IDEA here: keep the banded machinery only where it is cheap — candidate
DISCOVERY on AABB grids — and run the narrowphase + solver on a COMPACTED
per-body slot table instead:

  1. 4-offset column sweeps (sweep_orders — the guaranteed-coverage
     broadphase) produce directed AABB-overlap candidates as [W, NB] grids.
     Only AABB min/max arrays are materialized at window width W — a few MB —
     never contact geometry.  W can therefore be ~2x the banded K for free.
  2. Candidates compact to P slots per body, DEEPEST AABB overlap first
     (one lax.sort of a [2·sweeps·W, NB] key/payload pair).  Each undirected
     pair appears in BOTH endpoints' slot lists (symmetric duplication).
  3. Narrowphase runs ONCE on P·NB directed pairs (≈6x fewer than banded):
     partner poses arrive via a single row gather from a [NB, 16] table.
  4. The Jacobi velocity/position solver runs on [k, P, NB] slot grids.
     Per iteration the ONLY dynamic op is one row gather of partner
     velocities ([NB, 8] table, measured ~0.7 ms at P=16 on TPU v5e);
     scatter never happens: each body accumulates impulses from its OWN
     slots (a static sum over P), and its partner applies the equal-opposite
     impulse from the mirrored slot.

SYMMETRY = CORRECTNESS: every per-pair quantity (contact frame, effective
masses, relative velocity, λ accumulators) is computed in CANONICAL operand
order (body with the smaller index first), from the same values, by the same
ops, on both directed copies — so both sides compute bitwise-identical Δλ
and Newton's third law holds exactly without any cross-slot communication.

CERTIFICATES (all surfaced in counters; bench zeroes vs_baseline if any
fire — the number measures COMPLETE physics or says it didn't):
  * slot_drop:   EXACT count of compaction-dropped candidates whose minimum
    per-axis AABB overlap exceeds the solver slop (that minimum bounds the
    possible contact penetration, so drops below slop are grazing pairs, not
    physics).  This replaces the banded pipeline's conservative column
    certificate as the primary gate.
  * column_miss: the sweep_orders coverage certificate at width W (counts
    bodies whose same-column window might have been too narrow — zero means
    candidate discovery was provably complete this step).

Reference anchor: this replaces PhysX's broadphase+narrowphase+PGS stack as
used by the reference (physics_module.cpp:1870-1877 simulate/fetchResults;
external/physx is the black box being re-implemented TPU-natively).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as lm
from lumixengine_tpu.ops import physics_ops as P
from lumixengine_tpu.ops import physics_banded as PBD


def _back_fill(x, d: int, fill):
    """out[..., i+d] = x[..., i], head filled with `fill`."""
    d = min(d, x.shape[-1])
    if d == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (d,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _gather_rows(table, idx):
    """One dynamic row gather — the only traced-index op in the pipeline.
    table [NB, C], idx [P, NB] → [C, P, NB] (component axis leading)."""
    p, nb = idx.shape
    g = jnp.take(table, idx.reshape(-1), axis=0)       # [P*NB, C]
    return jnp.moveaxis(g.reshape(p, nb, -1), -1, 0)


def build_slots(mn, mx, occ, dyn, n_sweeps: int, window: int, slots: int,
                slop: float = 0.005, sat_prune=None):
    """Candidate discovery + compaction.

    sat_prune: optional (pos [3,NB], rot [4,NB], he_eff [3,NB], is_box
    [NB]) — when given, box-box candidates are scored by the 6-FACE-AXIS SAT
    penetration bound instead of the AABB overlap.  The bound is an upper
    bound on true penetration (more axes can only separate further), so
    pruning candidates whose bound ≤ slop is sound, and it is FAR tighter
    than AABBs for tumbled boxes (a diagonal box's AABB overlaps all 26
    lattice neighbours; its face axes separate the 20 non-touching ones).
    Non-box pairs keep the AABB score.

    Returns (partner [P, NB] int32 body ids (-1 = empty), certificates dict:
    slot_drop (count of compaction-dropped candidates whose penetration bound
    exceeds ~slop — exact up to the 0.12 mm priority quantization, rounded
    toward over-counting so it stays sound), column_miss (sweep coverage
    certificate), plus max per-body candidate count for observability).

    TPU SHAPE NOTES (this function went 13 ms → target <4 ms at 10k bodies):
      * every per-sweep rank/banded view is built from ONE packed f32 array
        and ONE packed int32 array — 2 banded_pair_data calls per sweep
        instead of ~20 (banded views are W-way concat chains; call count,
        not bytes, dominated the old cost);
      * candidate (priority, partner-id) packs into a single int32
        (inverted-depth high bits, id low bits), so compaction is ONE
        single-operand int32 sort and each sweep contributes via ONE
        permutation scatter;
      * the reversed-direction rows (out[d-1, i+d] = in[d-1, i]) are built
        by a flat-reshape skew (pad to width S, reinterpret with stride
        S-1) — three reshapes instead of a W-deep shift loop."""
    nb = mn.shape[-1]
    iota = jnp.arange(nb, dtype=jnp.int32)
    orders, ranks, col_keys = PBD.sweep_orders(mn, mx, occ, n_sweeps)
    W = window
    id_bits = max(int(np.ceil(np.log2(nb + 1))), 1)
    pri_bits = min(16, 30 - id_bits)
    if pri_bits < 8:
        raise ValueError(f"{nb} bodies overflow the packed slot sort")
    pri_max = (1 << pri_bits) - 1
    pri_scale = float(pri_max) / 8.0       # depth quantized over 0..8 m
    slop_q = max(int(np.floor(slop * pri_scale)), 1)
    id_mask = (1 << id_bits) - 1
    INVALID = jnp.int32((pri_max << id_bits) | id_mask)  # depth 0, sorts last

    fpack = [mn, mx]
    flags = dyn.astype(jnp.int32) | (occ.astype(jnp.int32) << 1)
    if sat_prune is not None:
        sp_pos, sp_rot, sp_he, sp_isbox = sat_prune
        # world-space face axes (rotation columns), [9, NB]
        eye = jnp.eye(3, dtype=jnp.float32)
        cols = jnp.concatenate([
            lm.quat_rotate(sp_rot, jnp.broadcast_to(eye[:, m, None],
                                                    (3, nb)), axis=0)
            for m in range(3)], axis=0)
        fpack += [sp_pos, cols, sp_he]
        flags = flags | (sp_isbox.astype(jnp.int32) << 2)
    F = jnp.concatenate(fpack, axis=0)                 # [CF, NB]

    def skew_rev(pk):
        """out[d-1, i+d] = pk[d-1, i], INVALID-filled: flat-reshape trick."""
        S = nb + W + 1
        a = jnp.concatenate(
            [pk, jnp.full((W, S - nb), INVALID, jnp.int32)], axis=1)
        flat = a.reshape(-1)
        b = flat[:W * (S - 1)].reshape(W, S - 1)
        return jnp.concatenate(
            [jnp.full((W, 1), INVALID, jnp.int32), b], axis=1)[:, :nb]

    # traced iota comparison: zero constant bytes in the shipped program
    valid_rank = (jnp.arange(1, W + 1, dtype=jnp.int32)[:, None]
                  + jnp.arange(nb, dtype=jnp.int32)[None, :]) < nb
    n_orders = len(orders)
    rank_all = jnp.stack(ranks)                        # [S, NB]

    def sweep_cand(order, col_key, dedup_mask):
        """One sweep's candidate block in BODY order ([2W, NB] packed int32)
        plus its coverage-miss count.  dedup_mask [S] bool marks EARLIER
        sweeps (whose windows already claimed a pair); col_key None = the
        classic min-x sweep (no column certificate)."""
        F_r = jnp.take(F, order, axis=-1)
        I_r = jnp.concatenate([
            jnp.stack([order, jnp.take(flags, order, axis=-1)]),
            jnp.take(rank_all, order, axis=-1)])       # [2+S, NB]
        Fb = PBD.banded_pair_data(F_r, W)              # [CF, W, NB]
        Ib = PBD.banded_pair_data(I_r, W)              # [2+S, W, NB]
        s_mn, s_mx, bmn, bmx = F_r[0:3], F_r[3:6], Fb[0:3], Fb[3:6]
        # minimum per-axis overlap — upper-bounds contact penetration
        ov_amt = jnp.min(jnp.minimum(s_mx[:, None, :], bmx)
                         - jnp.maximum(s_mn[:, None, :], bmn), axis=0)
        if sat_prune is not None:
            s_pos, s_cols, s_he = F_r[6:9], F_r[9:18], F_r[18:21]
            b_pos, b_cols, b_he = Fb[6:9], Fb[9:18], Fb[18:21]
            diff = b_pos - s_pos[:, None, :]           # a → b, [3, W, NB]
            pen = jnp.full(ov_amt.shape, jnp.inf)
            for side in range(2):                      # axes of a, then of b
                own_he = s_he[:, None, :] if side == 0 else b_he
                oth_cols = b_cols if side == 0 else s_cols[:, None, :]
                oth_he = b_he if side == 0 else s_he[:, None, :]
                for m in range(3):
                    if side == 0:
                        L = s_cols[3 * m:3 * m + 3][:, None, :]
                    else:
                        L = b_cols[3 * m:3 * m + 3]
                    dist = jnp.abs(jnp.sum(diff * L, axis=0))
                    proj = own_he[m] + sum(
                        oth_he[j] * jnp.abs(jnp.sum(
                            oth_cols[3 * j:3 * j + 3] * L, axis=0))
                        for j in range(3))
                    pen = jnp.minimum(pen, proj - dist)
            both_box = ((I_r[1] & 4)[None, :] & (Ib[1] & 4)) != 0
            ov_amt = jnp.where(both_box, jnp.minimum(ov_amt, pen), ov_amt)
        either_dyn = ((I_r[1] & 1)[None, :] | (Ib[1] & 1)) != 0
        both_occ = ((I_r[1] & 2)[None, :] & (Ib[1] & 2)) != 0
        ov = (ov_amt > 0.0) & valid_rank & either_dyn & both_occ
        # cross-sweep dedup: pair already inside an earlier sweep's window
        covered = jnp.any((jnp.abs(Ib[2:] - I_r[2:, None, :]) <= W)
                          & dedup_mask[:, None, None], axis=0)
        ov = ov & ~covered
        if col_key is not None:
            miss = PBD.column_window_miss(
                s_mn, s_mx, jnp.take(col_key, order, axis=-1), W,
                occ=(I_r[1] & 2) != 0)
        elif n_orders == 1:
            miss = PBD.window_miss(s_mn, s_mx, W, occ=(I_r[1] & 2) != 0)
        else:
            miss = jnp.int32(0)
        inv_pri = jnp.left_shift(
            pri_max - jnp.clip(ov_amt * pri_scale, 0, pri_max
                               ).astype(jnp.int32), id_bits)
        pk_fwd = jnp.where(ov, inv_pri | Ib[0], INVALID)
        pk_rev = skew_rev(jnp.where(ov, inv_pri | order[None, :], INVALID))
        cand = jnp.concatenate([pk_fwd, pk_rev], axis=0)   # [2W, NB]
        return (jnp.full((2 * W, nb), INVALID, jnp.int32
                         ).at[:, order].set(cand), miss)

    if all(ck is not None for ck in col_keys):
        # homogeneous column sweeps (n_sweeps 2/4, the bench path): ONE
        # lax.scan over stacked sweep operands — the sweep body is traced
        # once instead of n_sweeps times, shrinking the HLO ~4× (the cold
        # remote compile of this function starved the round-4 driver
        # capture; VERDICT-r4 next #1)
        sweep_iota = jnp.arange(n_orders, dtype=jnp.int32)

        def scan_body(cm, xs):
            order, ck, s = xs
            cand_row, miss = sweep_cand(order, ck, sweep_iota < s)
            return cm + miss, cand_row

        column_miss, cand_rows = jax.lax.scan(
            scan_body, jnp.int32(0),
            (jnp.stack(orders), jnp.stack(col_keys), sweep_iota))
        cand_all = cand_rows.reshape(-1, nb)           # [2·sweeps·W, NB]
    else:
        column_miss = jnp.int32(0)
        rows = []
        for s, order in enumerate(orders):
            cand_row, miss = sweep_cand(
                order, col_keys[s],
                jnp.arange(n_orders, dtype=jnp.int32) < s)
            column_miss = column_miss + miss
            rows.append(cand_row)
        cand_all = jnp.concatenate(rows, axis=0)       # [2·sweeps·W, NB]
    srt = jnp.sort(cand_all, axis=0)                   # deepest first
    top = srt[:slots]
    top_id = top & id_mask
    top_valid = top != INVALID
    # duplicate safety net (cross-sweep dedup already ran; this keeps the
    # solver sound even for pathological wrap-around column collisions)
    eq = (top_id[:, None, :] == top_id[None, :, :]) & top_valid[None]
    lower = (jnp.arange(slots)[:, None] > jnp.arange(slots)[None, :])
    dup = jnp.any(eq & lower[:, :, None], axis=1)
    top_valid = top_valid & ~dup
    partner = jnp.where(top_valid, top_id, -1)
    # drop certificate: candidates beyond the P deepest whose quantized
    # penetration bound reaches slop (possible real contacts lost)
    q_dropped = pri_max - jnp.right_shift(srt[slots:], id_bits)
    dropped = jnp.sum((q_dropped >= slop_q)
                      & (srt[slots:] != INVALID)).astype(jnp.int32)
    n_cand = jnp.sum(cand_all != INVALID, axis=0)
    return partner, {
        "slot_drop": dropped,
        "column_miss": column_miss,
        "max_candidates": jnp.max(n_cand).astype(jnp.int32),
    }


def make_slot_world_step(
    shape_np: np.ndarray, radius_np, half_extents_np, dyn_mask_np,
    inv_mass_np, inv_inertia_body_np, friction_np, restitution_np,
    gravity=(0.0, -9.81, 0.0), slots: int = 16, window: int = 48,
    points_per_pair: int = 4, iterations: int = 8,
    position_iterations: int = 3, ground_y: float = 0.0,
    lin_damping: float = 0.05, ang_damping: float = 0.05,
    ground_friction: float = 0.6, n_sweeps: int = 4,
    slop: float = 0.005, relaxation: float = 0.75,
    warm_start: bool = True, mass_split: bool = True,
    sleeping: bool = True, sleep_speed: float = 0.08,
    sleep_frames: int = 30, wake_speed: float = 0.25,
    over_relax: float = 1.0, settle_damping: float = 0.0,
    max_correction: float = 0.04,
):
    """Drop-in alternative to physics_banded.make_banded_world_step for dense
    piles: step(pos, rot, vel, angvel, dt, carry) →
    (pos, rot, vel, angvel, counters, carry'), cold carry from
    step.init_carry().  Single-world layout ([3/4, NB] state).

    mass_split (default, VERDICT-r4 next #3): Jacobi with CONTACT-COUNT-
    SCALED effective masses — each contact's kn/kt uses im_i·n_i (body i's
    inverse mass times its active contact-point count), and the full Δλ is
    applied.  Equivalent stability to the classic mass-splitting Jacobi
    (each body's mass split among its contacts): the per-body impulse sum
    is bounded without the old relax=1.6/deg under-relaxation, whose
    deg≈24 factor (0.067) starved weight transmission through deep piles —
    measured: 10³ cubic pile at 6/2 iterations churned at p50 |v|≈0.7 m/s
    at step 200 and never rested.  The fixed point is unchanged (Δλ=0 ⟺
    every active contact meets its velocity target).

    sleeping (default, PhysX parity — PxRigidDynamic sleep/wake): a body
    whose |v|²+|w|² stays below sleep_speed² for sleep_frames consecutive
    frames is put to sleep: velocities zeroed, gravity skipped, treated as
    STATIC by the solver (im_eff = 0) so it supports awake partners
    without drifting.  Wake is ONE FRAME DELAYED (the partner-speed gather
    rides the solver's existing [NB, 8] table — zero extra gathers): a
    sleeping body wakes when any active slot partner's raw speed exceeds
    wake_speed, or when a solver impulse moves it (its velocity then
    breaks the calm streak automatically)."""
    nb = int(shape_np.shape[0])
    k = points_per_pair
    Pn = slots
    gslots = 4
    # Per-body material/shape tables: numpy here, and — CRITICALLY — offered
    # as jit ARGUMENTS via init_consts().  Closure arrays become embedded
    # HLO constants, and through the TPU tunnel constant bytes ship at
    # ~0.03 MB/s on every process's first execution (measured 425 s for
    # 12 MB; memory: tpu-tunnel-costs).  Arguments ride the fast device_put
    # path instead.  consts=None keeps the embedded-constant behavior
    # (fine on CPU and for small scenes).
    _c_np = {
        "shape": np.asarray(shape_np),
        "radius": np.asarray(radius_np, np.float32),
        "he": np.asarray(half_extents_np, np.float32),
        "dyn": np.asarray(dyn_mask_np),
        "im": np.asarray(inv_mass_np, np.float32),
        "iib": np.asarray(inv_inertia_body_np, np.float32),
        "fric": np.asarray(friction_np, np.float32),
        "rest": np.asarray(restitution_np, np.float32),
    }
    dyn_b = np.asarray(dyn_mask_np, bool)       # static: picks code paths
    any_caps = bool(np.any(shape_np == P.SHAPE_CAPSULE))

    def init_consts():
        """Pass this (device_put once) as step(..., consts=...) so the body
        tables are program ARGUMENTS, not embedded constants — first
        execution through the tunnel is minutes faster (tpu-tunnel-costs)."""
        return dict(_c_np)

    def init_carry():
        # numpy on purpose (jit transfers it once; eager jnp.zeros here is
        # three remote op compiles through the tunnel)
        return (np.zeros((3, k, Pn, nb), np.float32),       # pair λn/λt1/λt2
                np.full((Pn, nb), -1, np.int32),            # pair partner ids
                np.zeros((3, gslots, nb), np.float32),      # ground λ
                np.zeros(nb, np.int32),                     # calm-frame ctr
                np.zeros(nb, bool),                         # delayed wake
                np.zeros(nb, bool))                         # deep-contact flag

    def step(pos, rot, vel, angvel, dt, carry=None, consts=None):
        c_ = _c_np if consts is None else consts
        shape_j, radius_j, he_j = c_["shape"], c_["radius"], c_["he"]
        dyn_j, im_j, iib_j = c_["dyn"], c_["im"], c_["iib"]
        fric_j, rest_j = c_["fric"], c_["rest"]
        # iota/occupancy as traced iota/broadcast ops: zero constant bytes
        occ_j = jnp.ones(nb, bool)
        iota = jnp.arange(nb, dtype=jnp.int32)

        # ---- sleeping: calm-streak counters + one-frame-delayed wake ------
        prev_ctr = prev_wake = prev_deep = None
        if carry is not None and len(carry) >= 5:
            prev_ctr, prev_wake = carry[3], carry[4]
            if len(carry) >= 6:
                prev_deep = carry[5]
        if sleeping and prev_ctr is not None:
            speed2_raw = jnp.sum(vel * vel, 0) + jnp.sum(angvel * angvel, 0)
            calm = (speed2_raw < sleep_speed * sleep_speed) & dyn_j
            # a body may not DOZE OFF while significantly penetrated: asleep
            # ⇒ im_eff = 0 ⇒ position projection can't push it out, so a
            # body that slept mid-depenetration froze 5-8 cm deep (measured
            # in the 10³ pile gate). Gating sleep ENTRY (vs waking sleepers)
            # leaves settled piles asleep — re-waking them re-injected
            # jostle energy and the pile never reached KE < 50.
            if prev_deep is not None:
                calm = calm & ~prev_deep
            sleep_ctr = jnp.where(calm,
                                  jnp.minimum(prev_ctr + 1, sleep_frames), 0)
            asleep = (sleep_ctr >= sleep_frames) & ~prev_wake
            # partners that are themselves asleep (or static) never wake
            wake_sig = jnp.where(asleep | ~dyn_j, 0.0, speed2_raw)
        else:
            speed2_raw = None
            sleep_ctr = jnp.zeros(nb, jnp.int32)
            asleep = jnp.zeros(nb, bool)
            wake_sig = jnp.zeros(nb, jnp.float32)
        im_eff = jnp.where(asleep, 0.0, im_j)

        vel, angvel = P.integrate_velocities(vel, angvel, dt, gravity,
                                             lin_damping, ang_damping, dyn_j)
        if sleeping:
            # asleep = static for this frame: no gravity, no drift
            vel = jnp.where(asleep[None], 0.0, vel)
            angvel = jnp.where(asleep[None], 0.0, angvel)
        mn, mx = P.world_aabb(pos, rot, shape_j, radius_j, he_j)
        any_box = bool(np.any(shape_np == P.SHAPE_BOX))
        sat = ((pos, rot, he_j, shape_j == P.SHAPE_BOX) if any_box else None)
        partner, certs = build_slots(mn, mx, occ_j, dyn_b, n_sweeps,
                                     window, Pn, slop=slop, sat_prune=sat)
        pvalid = partner >= 0
        pidx = jnp.maximum(partner, 0)

        # ---- one static-geometry/pose gather for the narrowphase ---------
        # (iiw zeroed for non-dynamic AND sleeping bodies: both must not
        # accumulate phantom angular velocity from contact impulses —
        # sleeping bodies are static supports until woken)
        iiw = jnp.where((dyn_j & ~asleep)[None, :],
                        P.inv_inertia_world_diag(rot, iib_j), 0.0)
        table = jnp.concatenate([
            pos.T, rot.T, radius_j[:, None], he_j.T,
            shape_j.astype(jnp.float32)[:, None], im_eff[:, None], iiw.T,
            fric_j[:, None], rest_j[:, None],
        ], axis=1)                                          # [NB, 18]
        g18 = _gather_rows(table, pidx)                     # [18, P, NB]
        o_pos, o_rot = g18[0:3], g18[3:7]
        o_rad, o_he = g18[7], g18[8:11]
        o_shape = g18[11].astype(jnp.int32)
        o_im, o_iiw = g18[12], g18[13:16]
        o_fric, o_rest = g18[16], g18[17]

        # ---- canonical (lo, hi) operand order: smaller body id first -----
        is_lo = (iota[None, :] < partner)                   # self is lo
        def pick(self_x, other_x):
            return jnp.where(is_lo, self_x, other_x)
        def sel3(self_x, other_x):                          # [3/4, NB]+[.,P,NB]
            s = jnp.broadcast_to(self_x[:, None, :], other_x.shape)
            return jnp.where(is_lo[None], s, other_x), \
                jnp.where(is_lo[None], other_x, s)

        lo_pos, hi_pos = sel3(pos, o_pos)
        lo_rot, hi_rot = sel3(rot, o_rot)
        lo_rad = pick(jnp.broadcast_to(radius_j[None, :], (Pn, nb)), o_rad)
        hi_rad = pick(o_rad, jnp.broadcast_to(radius_j[None, :], (Pn, nb)))
        lo_he, hi_he = sel3(he_j, o_he)
        lo_shape = pick(jnp.broadcast_to(shape_j[None, :], (Pn, nb)), o_shape)
        hi_shape = pick(o_shape, jnp.broadcast_to(shape_j[None, :], (Pn, nb)))

        def flat(x):
            return x.reshape(x.shape[:-2] + (Pn * nb,))

        point, normal, depth, raw_act = P.pair_contacts_from_data(
            flat(lo_pos), flat(lo_rot), flat(lo_rad), flat(lo_he),
            flat(lo_shape), flat(hi_pos), flat(hi_rot), flat(hi_rad),
            flat(hi_he), flat(hi_shape), points_per_pair=k,
            any_caps=any_caps)

        def grid(x):
            return x.reshape(x.shape[:-1] + (k, Pn, nb))

        point, normal = grid(point), grid(normal)          # [3, k, P, NB]
        depth = grid(depth)                                 # [k, P, NB]
        active = grid(raw_act) & pvalid[None]

        # ---- canonical per-slot solver constants --------------------------
        lo_im = pick(jnp.broadcast_to(im_eff[None, :], (Pn, nb)), o_im)
        hi_im = pick(o_im, jnp.broadcast_to(im_eff[None, :], (Pn, nb)))
        lo_iiw, hi_iiw = sel3(iiw, o_iiw)
        fric_pair = jnp.sqrt(jnp.maximum(fric_j[None, :] * o_fric, 0.0))
        rest_pair = jnp.maximum(rest_j[None, :], o_rest)

        r_lo = point - lo_pos[:, None]                      # [3, k, P, NB]
        r_hi = point - hi_pos[:, None]
        t1, t2 = PBD._tangents0(normal)
        # ---- ground contacts: body-major grids, no gathers ----------------
        g = P.ground_contacts(pos, rot, shape_j, radius_j, he_j, dyn_j,
                              ground_y=ground_y, slots_per_body=gslots)
        g_point = g.point.reshape(3, gslots, nb)
        g_normal = g.normal.reshape(3, gslots, nb)
        g_depth = g.depth.reshape(gslots, nb)
        g_active = g.active.reshape(gslots, nb)
        g_fric = jnp.sqrt(jnp.maximum(fric_j * ground_friction, 0.0))[None]
        g_r = g_point - pos[:, None, :]
        g_t1, g_t2 = PBD._tangents0(g_normal)

        # ---- per-body contact-point count (mass splitting / Jacobi) -------
        deg = (jnp.sum(active, axis=(0, 1)) + jnp.sum(g_active, axis=0)
               ).astype(jnp.float32)                        # [NB]

        # pre-solve relative velocities for restitution targets + partner deg
        sign = jnp.where(is_lo, 1.0, -1.0)                  # +1: self is lo

        def partner_vw(v, w):
            # the 8th column carries the partner's raw-speed wake signal —
            # sleeping wake detection rides the existing gather for free
            vw_t = jnp.concatenate(
                [v.T, w.T, deg[:, None], wake_sig[:, None]], axis=1)
            gvw = _gather_rows(vw_t, pidx)                  # [8, P, NB]
            return gvw[0:3], gvw[3:6], gvw[6], gvw[7]

        def rel_vel(v, w, pv, pw):
            """Canonical relative velocity at each manifold point:
            (v_hi + w_hi x r_hi) - (v_lo + w_lo x r_lo).  Both directed
            copies see the same lo/hi values, so this is bitwise symmetric."""
            lo_v, hi_v = sel3(v, pv)
            lo_w, hi_w = sel3(w, pw)
            va = lo_v[:, None] + lm.cross(
                jnp.broadcast_to(lo_w[:, None], r_lo.shape), r_lo, axis=0)
            vb = hi_v[:, None] + lm.cross(
                jnp.broadcast_to(hi_w[:, None], r_hi.shape), r_hi, axis=0)
            return vb - va                                  # [3, k, P, NB]

        pv0, pw0, p_deg, p_wake = partner_vw(vel, angvel)
        deg_pair = jnp.maximum(deg[None, :], p_deg)         # symmetric

        # delayed wake for NEXT frame: an active slot partner moving faster
        # than wake_speed wakes this body (evaluated on raw pre-step speeds)
        slot_touch = jnp.any(active, axis=0)                # [P, NB]
        wake_next = jnp.any(slot_touch & (p_wake > wake_speed * wake_speed),
                            axis=0)
        # deep-GROUND flag for NEXT frame's sleep-entry gate: 8·slop (4 cm)
        # sits between rest ground depth (~0.5 cm) and the
        # frozen-while-depenetrating failure depth (5-8 cm, must keep
        # solving). Ground only: interior pair contacts rest compressed by
        # several cm under Jacobi pile pressure at the speed tier — gating
        # on them kept the whole pile awake (KE@540 = 294 vs the gate's 50)
        deep_next = jnp.max(jnp.where(g_active, g_depth, 0.0),
                            axis=0) > 8.0 * slop
        # canonical per-contact effective masses.  mass_split: im_i·n_i per
        # body (see factory docstring) and full Δλ; else classic Jacobi
        # under-relaxation 1.6/deg.
        II_lo = lo_iiw[:, None]
        II_hi = hi_iiw[:, None]
        if mass_split:
            lo_deg = pick(jnp.broadcast_to(deg[None, :], (Pn, nb)), p_deg)
            hi_deg = pick(p_deg, jnp.broadcast_to(deg[None, :], (Pn, nb)))
            s_lo = jnp.maximum(lo_deg, 1.0)[None]           # [1, P, NB]
            s_hi = jnp.maximum(hi_deg, 1.0)[None]
            # over_relax > 1 is sound here: splitting by per-POINT count is
            # conservative (the k points of one pair share a normal, so they
            # act as ~one constraint); measured stable and faster-settling
            relax = jnp.float32(over_relax)
            g_split = jnp.maximum(deg, 1.0)[None]           # [1, NB]
            g_relax = jnp.float32(over_relax)
        else:
            s_lo = s_hi = jnp.float32(1.0)
            relax = jnp.minimum(relaxation,
                                1.6 / jnp.maximum(deg_pair, 1.0))[None]
            g_split = jnp.float32(1.0)
            g_relax = jnp.minimum(relaxation,
                                  1.6 / jnp.maximum(deg, 1.0))[None]
        im_lo_c = (lo_im * (s_lo[0] if mass_split else 1.0))[None]
        im_hi_c = (hi_im * (s_hi[0] if mass_split else 1.0))[None]
        kn = jnp.maximum(im_lo_c + im_hi_c
                         + s_lo * PBD._ang0(r_lo, normal, II_lo)
                         + s_hi * PBD._ang0(r_hi, normal, II_hi), 1e-9)
        kt1 = jnp.maximum(im_lo_c + im_hi_c
                          + s_lo * PBD._ang0(r_lo, t1, II_lo)
                          + s_hi * PBD._ang0(r_hi, t1, II_hi), 1e-9)
        kt2 = jnp.maximum(im_lo_c + im_hi_c
                          + s_lo * PBD._ang0(r_lo, t2, II_lo)
                          + s_hi * PBD._ang0(r_hi, t2, II_hi), 1e-9)
        imn = im_eff[None, :]
        g_kn = jnp.maximum(g_split * (imn + PBD._ang0(g_r, g_normal,
                                                      iiw[:, None])), 1e-9)
        g_kt1 = jnp.maximum(g_split * (imn + PBD._ang0(g_r, g_t1,
                                                       iiw[:, None])), 1e-9)
        g_kt2 = jnp.maximum(g_split * (imn + PBD._ang0(g_r, g_t2,
                                                       iiw[:, None])), 1e-9)

        vr0 = rel_vel(vel, angvel, pv0, pw0)
        vn0 = jnp.sum(vr0 * normal, axis=0)
        target = jnp.where(vn0 < -0.5, -rest_pair[None] * vn0, 0.0)
        g_va0 = vel[:, None] + lm.cross(
            jnp.broadcast_to(angvel[:, None], g_r.shape), g_r, axis=0)
        g_vn0 = jnp.sum(-g_va0 * g_normal, axis=0)
        g_target = jnp.where(g_vn0 < -0.5, -rest_j[None] * g_vn0, 0.0)

        # ---- warm start: match canonical λ by partner id -------------------
        if warm_start and carry is not None:
            prev_lam, prev_id, prev_glam = carry[0], carry[1], carry[2]
            # prev_id rows hold UNIQUE partner ids per body (duplicates were
            # -1'd at build), so each (new slot, body) matches at most one
            # old slot and this 0/1 einsum is an exact select — one
            # dot_general instead of a Pn-deep unrolled where-chain
            # (compile time; VERDICT-r4 next #1)
            eq = ((partner[:, None, :] == prev_id[None, :, :])
                  & pvalid[:, None, :])                 # [Pq, Pp, NB]
            wlam = jnp.einsum('qpn,ckpn->ckqn',
                              eq.astype(jnp.float32), prev_lam)
            # contact identity is the unordered pair; the canonical frame is
            # keyed by body ids, which are stable — no t2 flip needed (unlike
            # match_warm_lams' rank-space frames)
            lam_n = jnp.where(active, wlam[0], 0.0)
            lam_1 = jnp.where(active, wlam[1], 0.0)
            lam_2 = jnp.where(active, wlam[2], 0.0)
            gl_n = jnp.where(g_active, prev_glam[0], 0.0)
            gl_1 = jnp.where(g_active, prev_glam[1], 0.0)
            gl_2 = jnp.where(g_active, prev_glam[2], 0.0)
            # apply carried impulses up front (accumulators stay incremental)
            imp = jnp.where(active[None], normal * lam_n[None]
                            + t1 * lam_1[None] + t2 * lam_2[None], 0.0)
            r_self = jnp.where(is_lo[None, None], r_lo, r_hi)
            six = jnp.concatenate([imp, lm.cross(r_self, imp, axis=0)], 0)
            acc = jnp.sum(-sign[None, None] * six, axis=(1, 2))
            g_imp = jnp.where(g_active[None], g_normal * gl_n[None]
                              + g_t1 * gl_1[None] + g_t2 * gl_2[None], 0.0)
            six_g = jnp.concatenate([g_imp, lm.cross(g_r, g_imp, axis=0)], 0)
            acc = acc - jnp.sum(six_g, axis=1)
            vel = vel + acc[0:3] * im_eff[None, :]
            angvel = angvel + acc[3:6] * iiw
        else:
            z = jnp.zeros((k, Pn, nb), jnp.float32)
            zg = jnp.zeros((gslots, nb), jnp.float32)
            lam_n, lam_1, lam_2, gl_n, gl_1, gl_2 = z, z, z, zg, zg, zg

        r_self = jnp.where(is_lo[None, None], r_lo, r_hi)

        def vel_iter(_, c):
            v, w, ln, l1, l2, gn, g1, g2 = c
            pv, pw, _pd, _pk = partner_vw(v, w)
            vr = rel_vel(v, w, pv, pw)
            vn = jnp.sum(vr * normal, axis=0)
            dln = (target - vn) / kn * relax
            new_n = jnp.maximum(ln + dln, 0.0)
            dln = jnp.where(active, new_n - ln, 0.0)
            vt1 = jnp.sum(vr * t1, axis=0)
            vt2 = jnp.sum(vr * t2, axis=0)
            lmax = fric_pair[None] * (ln + dln)
            n1 = jnp.clip(l1 + (-vt1 / kt1) * relax, -lmax, lmax)
            n2 = jnp.clip(l2 + (-vt2 / kt2) * relax, -lmax, lmax)
            d1 = jnp.where(active, n1 - l1, 0.0)
            d2 = jnp.where(active, n2 - l2, 0.0)
            imp = jnp.where(active[None], normal * dln[None]
                            + t1 * d1[None] + t2 * d2[None], 0.0)
            # impulse convention: +imp acts on hi, -imp on lo (normal points
            # lo → hi); sign is +1 when self is lo, so self += -sign · imp
            # (sign is per-slot — apply before the slot reduction)
            six = jnp.concatenate([imp, lm.cross(r_self, imp, axis=0)], 0)
            acc = jnp.sum(-sign[None, None] * six, axis=(1, 2))
            # ground
            g_va = v[:, None] + lm.cross(
                jnp.broadcast_to(w[:, None], g_r.shape), g_r, axis=0)
            g_vr = -g_va
            g_vn = jnp.sum(g_vr * g_normal, axis=0)
            g_dln = (g_target - g_vn) / g_kn * g_relax
            g_new = jnp.maximum(gn + g_dln, 0.0)
            g_dln = jnp.where(g_active, g_new - gn, 0.0)
            g_vt1 = jnp.sum(g_vr * g_t1, axis=0)
            g_vt2 = jnp.sum(g_vr * g_t2, axis=0)
            g_max = g_fric * (gn + g_dln)
            g_n1 = jnp.clip(g1 + (-g_vt1 / g_kt1) * g_relax, -g_max, g_max)
            g_n2 = jnp.clip(g2 + (-g_vt2 / g_kt2) * g_relax, -g_max, g_max)
            g_d1 = jnp.where(g_active, g_n1 - g1, 0.0)
            g_d2 = jnp.where(g_active, g_n2 - g2, 0.0)
            g_imp = jnp.where(g_active[None], g_normal * g_dln[None]
                              + g_t1 * g_d1[None] + g_t2 * g_d2[None], 0.0)
            six_g = jnp.concatenate([g_imp, lm.cross(g_r, g_imp, axis=0)], 0)
            acc = acc - jnp.sum(six_g, axis=1)
            v = v + acc[0:3] * im_eff[None, :]
            w = w + acc[3:6] * iiw
            return (v, w, ln + dln, l1 + d1, l2 + d2,
                    gn + g_dln, g1 + g_d1, g2 + g_d2)

        out = jax.lax.fori_loop(0, iterations, vel_iter,
                                (vel, angvel, lam_n, lam_1, lam_2,
                                 gl_n, gl_1, gl_2))
        vel, angvel = out[0], out[1]
        lam_n, lam_1, lam_2, gl_n, gl_1, gl_2 = out[2:]

        if settle_damping > 0.0:
            # near-sleep stabilization (PhysX-style): a SUPPORTED body moving
            # slower than 4·sleep_speed bleeds extra energy each frame, so
            # the jostle tail crosses the sleep threshold instead of
            # hovering above it. Contact-gated (deg > 0): free flight —
            # projectile apexes, slow throws — is never damped.
            sp2_post = jnp.sum(vel * vel, 0) + jnp.sum(angvel * angvel, 0)
            damp_m = ((sp2_post < (4.0 * sleep_speed) ** 2) & (deg > 0.0)
                      & dyn_j)
            f = jnp.where(damp_m, 1.0 - settle_damping, 1.0)[None]
            vel = vel * f
            angvel = angvel * f

        pos, rot = P.integrate_positions(pos, rot, vel, angvel, dt, dyn_j)

        # ---- split-impulse position projection -----------------------------
        if position_iterations > 0:
            # max_correction (Box2D maxLinearCorrection-style): cap the
            # per-frame positional push so deeply-compressed impact frames
            # depenetrate over several frames instead of teleporting bodies
            # upward — an uncapped push converts penetration into potential
            # energy and the pile "popcorns" (measured max |v| ~10 m/s
            # spikes long after impact without the cap)
            e0 = jnp.where(active,
                           jnp.clip(depth - slop, 0.0, max_correction), 0.0)
            if mass_split:
                k_pos = jnp.maximum(lo_im * s_lo[0] + hi_im * s_hi[0],
                                    1e-9)[None]
            else:
                k_pos = jnp.maximum(lo_im + hi_im, 1e-9)[None]
            g_e0 = jnp.where(g_active,
                             jnp.clip(g_depth - slop, 0.0, max_correction),
                             0.0)
            if mass_split:
                g_kp = jnp.maximum(g_split * imn, 1e-9)
                rx = jnp.float32(1.0)
                g_rx = jnp.float32(1.0)
            else:
                g_kp = jnp.maximum(imn, 1e-9)
                rx = jnp.minimum(0.8, 1.6 / jnp.maximum(deg_pair, 1.0))[None]
                g_rx = jnp.minimum(0.8, 1.6 / jnp.maximum(deg, 1.0))[None]

            def pos_iter(_, c):
                dpos, pl, pgl = c
                dp_t = jnp.concatenate(
                    [dpos.T, jnp.zeros((nb, 1))], axis=1)   # [NB, 4]
                pdp = _gather_rows(dp_t, pidx)[0:3]         # [3, P, NB]
                lo_dp, hi_dp = sel3(dpos, pdp)
                sep = jnp.sum((hi_dp[:, None] - lo_dp[:, None]) * normal,
                              axis=0)
                dl = (e0 - sep) / k_pos * rx
                new = jnp.maximum(pl + dl, 0.0)
                dl = jnp.where(active, new - pl, 0.0)
                step_v = jnp.where(active[None], normal * dl[None], 0.0)
                d_acc = jnp.sum(-sign[None, None] * step_v, axis=(1, 2))
                g_sep = jnp.sum((-dpos[:, None, :]) * g_normal, axis=0)
                g_dl = (g_e0 - g_sep) / g_kp * g_rx
                g_new2 = jnp.maximum(pgl + g_dl, 0.0)
                g_dl = jnp.where(g_active, g_new2 - pgl, 0.0)
                step_g = jnp.where(g_active[None], g_normal * g_dl[None], 0.0)
                d_acc = d_acc - jnp.sum(step_g, axis=1)
                return dpos + d_acc * im_eff[None, :], new, g_new2

            dpos, _, _ = jax.lax.fori_loop(
                0, position_iterations, pos_iter,
                (jnp.zeros_like(pos), jnp.zeros_like(e0),
                 jnp.zeros_like(g_e0)))
            pos = pos + dpos

        counters = {
            "active_contacts": (jnp.sum(active)
                                + jnp.sum(g_active)).astype(jnp.int32),
            "sap_window_miss": certs["slot_drop"] + certs["column_miss"],
            "slot_drop": certs["slot_drop"],
            "column_miss": certs["column_miss"],
            "max_candidates": certs["max_candidates"],
            "sleeping": jnp.sum(asleep).astype(jnp.int32),
        }
        carry_out = (jnp.stack([lam_n, lam_1, lam_2], axis=0), partner,
                     jnp.stack([gl_n, gl_1, gl_2], axis=0),
                     sleep_ctr, wake_next, deep_next)
        return pos, rot, vel, angvel, counters, carry_out

    step.init_carry = init_carry
    step.init_consts = init_consts
    return step
