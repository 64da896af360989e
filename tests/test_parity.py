"""Physics ground-truth parity harness (VERDICT #3; ≙ BASELINE.md "rigid-body
trajectories within 1e-3 of PhysX over 1k steps").

PhysX cannot run in this image (prebuilt Windows/Linux-GL libs, see
ARCHITECTURE.md), so this harness builds the strongest available ground
truth, in three tiers:

  (a) host-oracle trajectories — PhysX's documented update rule (symplectic
      Euler + damping) reimplemented on the host at the SAME dt; the device
      pipeline must track it ≤1e-3 over 1k steps. This is the exact parity
      statement the baseline makes (PhysX at equal dt shares the integrator,
      so equal-semantics ⇒ equal trajectories).
  (b) closed-form invariants at 1k-step horizons — pendulum period vs
      analytic, resting penetration vs slop, stack settle heights, momentum
      conservation and restitution law through impacts.
  (c) statistical gates on the box-drop scene — penetration bound, pile
      height, settle stability, SAP-window integrity.

Any solver change that drifts behavior fails here first."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lumixengine_tpu.engine.engine import Engine
from lumixengine_tpu.physics.module import PhysicsSystem

DT = 1.0 / 60.0


def build_world(actors=8, gravity=(0.0, -9.81, 0.0), ground=True,
                damping=(0.05, 0.05)):
    engine = Engine()
    engine.module_capacities = {"actors": actors, "joints": 8}
    phys = PhysicsSystem(engine, gravity=gravity)
    phys.ground_plane = ground
    phys.linear_damping, phys.angular_damping = damping
    engine.add_system(phys)
    world = engine.create_world(capacity=actors + 8)
    return engine, world, phys


def make_runner(engine, world, record_slot=None):
    """Jitted n-step runner; optionally records one body's position each step."""
    step = engine.build_step(world, jit=False)

    @functools.partial(jax.jit, static_argnums=2)
    def run(state, dt, n):
        def body(i, carry):
            s, traj = carry
            s = step(s, dt)
            if record_slot is not None:
                traj = traj.at[i].set(s.modules["physics"].pos[:, record_slot])
            return s, traj

        traj = jnp.zeros((n if record_slot is not None else 1, 3))
        return jax.lax.fori_loop(0, n, body, (state, traj))

    return run


# -- tier (a): host-oracle trajectory, 1k steps --------------------------------

def test_ballistic_trajectory_vs_host_oracle_1k():
    """Free flight: device trajectory ≤1e-3 from the host symplectic-Euler
    oracle at every one of 1000 steps (≙ PhysX eVELOCITY_CHANGE-free flight)."""
    engine, world, phys = build_world(ground=False)
    e = world.create_entity(position=(0.0, 500.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5)
    slot = world.modules["physics"].actors.slot_of(e)
    run = make_runner(engine, world, record_slot=slot)
    (state, traj) = run(world.device_state(), jnp.float32(DT), 1000)
    traj = np.asarray(traj)

    # float32 oracle — the device pipeline is f32; PhysX is f32 too, so the
    # parity statement is f32-vs-f32 at equal dt
    v = np.zeros(3, np.float32)
    p = np.array([0.0, 500.0, 0.0], np.float32)
    g = np.array([0.0, -9.81, 0.0], np.float32)
    dt = np.float32(DT)
    decay = np.float32(np.exp(-phys.linear_damping * DT))
    err = 0.0
    for i in range(1000):
        v = (v + g * dt) * decay
        p = p + v * dt
        err = max(err, np.abs(traj[i] - p).max())
    assert err < 1e-3, err


def test_tumbling_rotation_vs_host_oracle_1k():
    """Torque-free tumble: quaternion integration matches the host oracle
    (same exponential-map update) over 1k steps."""
    engine, world, phys = build_world(ground=False, gravity=(0.0, 0.0, 0.0))
    e = world.create_entity(position=(0.0, 0.0, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5)
    pm = world.modules["physics"]
    slot = pm.actors.slot_of(e)
    state = world.device_state()
    ms = state.modules["physics"]
    w0 = np.array([0.7, 1.3, -0.4], np.float32)
    ms = ms.replace(angvel=ms.angvel.at[:, slot].set(jnp.asarray(w0)))
    state = state.replace(modules={**state.modules, "physics": ms})
    run = make_runner(engine, world)
    state, _ = run(state, jnp.float32(DT), 1000)
    q_dev = np.asarray(state.modules["physics"].rot[:, slot])

    from lumixengine_tpu.core import host_math as hm

    q = np.array([0, 0, 0, 1.0], np.float32)
    w = w0.copy()
    for _ in range(1000):
        w = w * np.exp(-phys.angular_damping * DT)
        ang = np.linalg.norm(w) * DT
        if ang > 1e-12:
            axis = w / np.linalg.norm(w)
            dq = hm.quat_from_axis_angle(axis, ang)
            q = hm.quat_normalize(hm.quat_mul(dq, q))
    # sign-insensitive quaternion distance
    d = min(np.abs(q_dev - q).max(), np.abs(q_dev + q).max())
    assert d < 1e-3, d


# -- tier (b): closed-form invariants ------------------------------------------

def test_pendulum_period_vs_analytic():
    """Distance-joint pendulum, small amplitude: T = 2π√(L/g) within 3%
    over many cycles (damping off)."""
    engine, world, phys = build_world(ground=False, damping=(0.0, 0.0))
    anchor = world.create_entity(position=(0.0, 2.0, 0.0))
    world.create_component(anchor, "rigid_actor", motion="static", shape="sphere",
                           radius=0.05)
    L = 1.0
    amp = 0.1  # radians — small-angle regime
    bob = world.create_entity(position=(L * np.sin(amp), 2.0 - L * np.cos(amp), 0.0))
    world.create_component(bob, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.05)
    je = world.create_entity()
    world.create_component(je, "distance_joint", body_a=anchor, body_b=bob,
                           length=L)
    pm = world.modules["physics"]
    slot = pm.actors.slot_of(bob)
    run = make_runner(engine, world, record_slot=slot)
    n = 1000
    state, traj = run(world.device_state(), jnp.float32(DT), n)
    x = np.asarray(traj)[:, 0]
    # zero crossings of x → period
    sign_flips = np.nonzero(np.diff(np.sign(x)) != 0)[0]
    assert len(sign_flips) >= 4, "pendulum did not oscillate"
    half_periods = np.diff(sign_flips) * DT
    T = 2 * np.mean(half_periods)
    T_analytic = 2 * np.pi * np.sqrt(L / 9.81)
    assert abs(T - T_analytic) / T_analytic < 0.03, (T, T_analytic)


def test_resting_penetration_bounded_1k():
    """A sphere resting for 1k steps penetrates ≤ slop+1mm and does not creep."""
    engine, world, phys = build_world()
    e = world.create_entity(position=(0.0, 0.7, 0.0))
    world.create_component(e, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5)
    pm = world.modules["physics"]
    slot = pm.actors.slot_of(e)
    run = make_runner(engine, world, record_slot=slot)
    state, traj = run(world.device_state(), jnp.float32(DT), 1000)
    y = np.asarray(traj)[:, 1]
    assert y[-1] > 0.5 - 0.005 - 1e-3, y[-1]       # ≤ slop + 1 mm penetration
    assert abs(y[-1] - y[500]) < 1e-3              # no creep in steady state
    assert float(jnp.abs(state.modules["physics"].vel[:, slot]).max()) < 1e-2


def test_box_stack_settles_to_exact_heights():
    """4-box tower: resting centers at 0.5/1.5/2.5/3.5 ± 2 cm after 1k steps,
    stable between step 500 and 1000 (≙ PhysX stack stability)."""
    engine, world, phys = build_world(actors=4)
    slots = []
    pm = world.modules["physics"]
    for i in range(4):
        e = world.create_entity(position=(0.0, 0.55 + i * 1.05, 0.0))
        world.create_component(e, "rigid_actor", motion="dynamic", shape="box",
                               half_extents=(0.5, 0.5, 0.5), friction=0.8)
        slots.append(pm.actors.slot_of(e))
    step = engine.build_step(world, jit=False)

    @functools.partial(jax.jit, static_argnums=2)
    def run(state, dt, n):
        return jax.lax.fori_loop(0, n, lambda i, s: step(s, dt), state)

    s500 = run(world.device_state(), jnp.float32(DT), 500)
    s1000 = run(s500, jnp.float32(DT), 500)
    y500 = np.asarray(s500.modules["physics"].pos[1])[slots]
    y1000 = np.asarray(s1000.modules["physics"].pos[1])[slots]
    # warm-started solver + split-impulse projection: each interface rests at
    # ~slop depth (PhysX stacks likewise rest slightly compressed)
    expect = np.array([0.5, 1.5, 2.5, 3.5])
    assert np.abs(y1000 - expect).max() < 0.02, y1000       # ≤ 5 mm/interface
    spacing = np.diff(y1000)
    assert (np.abs(spacing - spacing.mean()) < 5e-3).all(), spacing
    assert (spacing > 0.97).all() and (spacing <= 1.0 + 1e-4).all(), spacing
    assert np.abs(y1000 - y500).max() < 1e-3, (y500, y1000)
    # the stack is fully asleep: exactly zero velocity
    assert float(jnp.abs(s1000.modules["physics"].vel).max()) < 1e-4


def test_impact_momentum_and_restitution_law():
    """Two-sphere head-on impact in zero g: momentum conserved; outgoing
    relative normal velocity = restitution · incoming (PhysX restitution
    model above the velocity threshold)."""
    engine, world, phys = build_world(gravity=(0.0, 0.0, 0.0), ground=False,
                                      damping=(0.0, 0.0))
    pm = world.modules["physics"]
    a = world.create_entity(position=(-2.0, 0.0, 0.0))
    world.create_component(a, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, friction=0.0, restitution=0.6)
    b = world.create_entity(position=(2.0, 0.0, 0.0))
    world.create_component(b, "rigid_actor", motion="dynamic", shape="sphere",
                           radius=0.5, friction=0.0, restitution=0.6)
    sa, sb = pm.actors.slot_of(a), pm.actors.slot_of(b)
    state = world.device_state()
    ms = state.modules["physics"]
    v_in = 4.0
    vel = ms.vel.at[0, sa].set(v_in).at[0, sb].set(-v_in)
    state = state.replace(modules={**state.modules,
                                   "physics": ms.replace(vel=vel)})
    run = make_runner(engine, world)
    state, _ = run(state, jnp.float32(DT), 60)
    v = np.asarray(state.modules["physics"].vel[0])
    p_total = v[sa] + v[sb]
    assert abs(p_total) < 1e-4, p_total                      # momentum
    v_rel_out = v[sb] - v[sa]
    v_rel_in = -2 * v_in
    e_eff = -v_rel_out / v_rel_in
    assert abs(e_eff - 0.6) < 0.05, e_eff                    # restitution law


# -- tier (c): box-drop statistics ----------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("pipeline", ["dynamic", "banded"])
def test_box_drop_statistics(pipeline):
    """Box-drop scene (BASELINE config 3, scaled for CPU CI): free fall
    conserves horizontal momentum; settled pile has bounded penetration and
    zero SAP-window misses. Gates BOTH large-world pipelines — the banded
    sweep-order one is what bench --config boxes runs."""
    from lumixengine_tpu.ops import physics_big as PB
    from lumixengine_tpu.ops import physics_banded as PBD
    from lumixengine_tpu.ops import physics_ops as P

    # 256 boxes / 300 settle steps: the exact-SAT banded step costs ~3.3 s
    # per step on this 1-core box at nb=512 — the identical gates on a 16x4x4
    # pile keep the full-suite wall time sane (the bench still runs 10k)
    nb = 256
    rng = np.random.default_rng(0)
    shape = np.full(nb, P.SHAPE_BOX, np.int32)
    radius = np.full(nb, 0.5, np.float32)
    he = np.full((3, nb), 0.5, np.float32)
    dyn = np.ones(nb, bool)
    inv_mass = np.ones(nb, np.float32)
    iib = np.tile(np.full((1, nb), 1.0 / (1.0 / 12 * 2.0), np.float32), (3, 1))
    fric = np.full(nb, 0.6, np.float32)
    rest = np.zeros(nb, np.float32)
    if pipeline == "dynamic":
        step = PB.make_big_world_step(shape, radius, he, dyn, inv_mass, iib,
                                      fric, rest, neighbors=32, iterations=16,
                                      position_iterations=6)
    else:
        # the bench path exactly: guaranteed-coverage multi-sweep + PhysX-
        # style cross-frame warm starting (VERDICT-r2 #4)
        step = PBD.make_banded_world_step(shape, radius, he, dyn, inv_mass,
                                          iib, fric, rest, neighbors=32,
                                          iterations=16,
                                          position_iterations=6,
                                          n_sweeps=4, warm_start=True)
    # jittered non-overlapping grid, long axis = x so each x-plane holds 16
    # boxes — well inside the SAP window (the miss counter gates it below)
    grid = np.stack(np.meshgrid(np.arange(16), np.arange(4), np.arange(4),
                                indexing="ij"), -1).reshape(-1, 3)[:nb]
    p = grid * 1.15 + rng.uniform(0.0, 0.1, (nb, 3)) + [0.0, 1.5, 0.0]
    pos = jnp.asarray(p.T.astype(np.float32))
    rot = jnp.zeros((4, nb)).at[3].set(1.0)
    vel = jnp.zeros((3, nb))
    ang = jnp.zeros((3, nb))

    @functools.partial(jax.jit, static_argnums=1)
    def run(carry, n):
        def body(i, c):
            if pipeline == "banded":
                pos, rot, vel, ang, miss, warm = step(
                    c[0], c[1], c[2], c[3], jnp.float32(DT), c[5])
                return (pos, rot, vel, ang,
                        c[4] + miss["sap_window_miss"], warm)
            pos, rot, vel, ang, miss = step(c[0], c[1], c[2], c[3],
                                            jnp.float32(DT))
            return (pos, rot, vel, ang, c[4] + miss["sap_window_miss"])
        return jax.lax.fori_loop(0, n, body, carry)

    carry = (pos, rot, vel, ang, jnp.int32(0))
    if pipeline == "banded":
        carry = carry + (step.init_carry(),)
    carry = run(carry, 20)  # still falling
    vx = np.asarray(carry[2][0])
    assert abs(vx.sum()) < 1e-2                     # no lateral momentum injected
    carry = run(carry, 300)                          # settle
    y = np.asarray(carry[0][1])
    if pipeline == "banded":
        # warm-started banded pipeline keeps contact identity across frames
        # (match_warm_lams), so the squeezed pile rests at ~slop like the
        # static-pair path — VERDICT-r2 #4's tightened gate
        assert y.min() > 0.5 - 0.012, y.min()        # penetration ≤ ~1 cm
    else:
        # the legacy SAP path has no cross-frame warm start (contact slots
        # change identity every frame): a squeezed pile rests a few cm deep
        assert y.min() > 0.5 - 0.05, y.min()         # penetration ≤ 5 cm
    assert y.max() < 5.0, y.max()                    # no popcorn; pile ≤ 3 layers+fall
    ke = float(jnp.sum(carry[2] ** 2) + jnp.sum(carry[3] ** 2))
    assert ke < 1000.0, ke                           # jostling, not exploding
    assert int(carry[4]) == 0                        # SAP window never missed
