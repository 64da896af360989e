"""Navigation module (≙ reference src/navigation: Recast/Detour navmesh zones +
dtCrowd agents syncing entity transforms, navigation_module.cpp).

Reference: per-zone navmesh built by Recast from render geometry, dtCrowd
steering (path following + separation), agents move entities, .nav serialized
zones.

TPU re-architecture: a zone is a regular walkable GRID (the Recast voxel field
without the polygonization — on TPU the grid IS the fast representation):
  * walkable source: the reference's SHIPPED compiled navmeshes load directly
    (navzones/<guid>.nav → importers/navmesh.py Detour tile decode →
    rasterized polygons), with host physics-primitive baking as the
    no-navmesh fallback
  * pathfinding: host A* on the grid per set_destination request (the slow
    path, like Detour's findPath), producing capacity-bounded waypoint lists
  * steering: the device step moves ALL agents each frame — waypoint seeking
    + sampled velocity-obstacle avoidance (≙ dtCrowd's
    dtObstacleAvoidanceQuery::sampleVelocityAdaptive: head-on streams route
    around each other) + pairwise separation as the overlap resolver —
    dense O(A²) below 256 agents, x-sorted K-window O(A·K) above — and
    writes entity locals back
Zone serialization = the grid + params (".nav" analog).
"""
from __future__ import annotations

import heapq
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.utils.store import DenseStore

MAX_WAYPOINTS = 32


@struct.dataclass
class NavState:
    agent_pos: jnp.ndarray     # f32 [3, A] (authoritative while navigating)
    agent_vel: jnp.ndarray     # f32 [2, A] last chosen xz velocity (VO input)
    waypoints: jnp.ndarray     # f32 [2, W, A] xz waypoints
    wp_count: jnp.ndarray      # int32 [A]
    wp_index: jnp.ndarray      # int32 [A] current target waypoint
    speed: jnp.ndarray         # f32 [A] (data: scripts can change it)
    counters: Dict[str, jnp.ndarray]


class NavZone:
    """Walkable grid zone (≙ NavmeshZone + RecastZone build)."""

    def __init__(self, origin=(0.0, 0.0), size=(64.0, 64.0), cell: float = 1.0):
        self.origin = np.asarray(origin, np.float32)  # xz of cell (0,0) corner
        self.cell = float(cell)
        self.w = int(round(size[0] / cell))
        self.h = int(round(size[1] / cell))
        self.walkable = np.ones((self.h, self.w), bool)
        self.guid = 0                 # reference navzone guid (.nav file)
        self.from_navmesh = False     # walkable came from a shipped .nav

    def to_cell(self, x: float, z: float) -> Tuple[int, int]:
        cx = int((x - self.origin[0]) / self.cell)
        cz = int((z - self.origin[1]) / self.cell)
        return max(0, min(self.w - 1, cx)), max(0, min(self.h - 1, cz))

    def to_world(self, cx: int, cz: int) -> Tuple[float, float]:
        return (self.origin[0] + (cx + 0.5) * self.cell,
                self.origin[1] + (cz + 0.5) * self.cell)

    def block_aabb(self, min_x, min_z, max_x, max_z) -> None:
        x0, z0 = self.to_cell(min_x, min_z)
        x1, z1 = self.to_cell(max_x, max_z)
        self.walkable[z0 : z1 + 1, x0 : x1 + 1] = False

    def bake_from_physics(self, physics_module, pad: float = 0.5) -> None:
        """Rasterize static actors into blocked cells (≙ Recast build from
        collision geometry)."""
        st = physics_module.actors
        for slot in range(st.capacity):
            e = int(st.entity[slot])
            if e < 0:
                continue
            if int(st.data["motion"][slot]) != 0:  # only statics block
                continue
            p, _, _ = physics_module.world.get_global_transform(e)
            if int(st.data["shape"][slot]) == 1:  # box
                he = st.data["half_extents"][slot]
                self.block_aabb(p[0] - he[0] - pad, p[2] - he[2] - pad,
                                p[0] + he[0] + pad, p[2] + he[2] + pad)
            else:
                r = float(st.data["radius"][slot]) + pad
                self.block_aabb(p[0] - r, p[2] - r, p[0] + r, p[2] + r)

    # -- A* (host path request, ≙ dtNavMeshQuery::findPath) ------------------------

    def find_path(self, start_xz, end_xz, max_waypoints: int = MAX_WAYPOINTS) -> Optional[np.ndarray]:
        s = self.to_cell(*start_xz)
        g = self.to_cell(*end_xz)
        if not self.walkable[g[1], g[0]] or not self.walkable[s[1], s[0]]:
            return None
        if s == g:
            return np.asarray([self.to_world(*g)], np.float32)
        # native A* core when built (≙ the reference's native Detour);
        # Python fallback below is semantically identical
        try:
            from lumixengine_tpu.utils import native

            if native.available():
                cells = native.nav_astar(self.walkable, s[0], s[1], g[0], g[1])
                if cells is None:
                    return None
                return self._prune_cells([tuple(c) for c in cells], max_waypoints)
        except Exception:
            pass
        open_q = [(0.0, s)]
        came: Dict[Tuple[int, int], Tuple[int, int]] = {}
        cost = {s: 0.0}
        found = False
        while open_q:
            _, cur = heapq.heappop(open_q)
            if cur == g:
                found = True
                break
            cx, cz = cur
            for dx, dz, c in ((1, 0, 1.0), (-1, 0, 1.0), (0, 1, 1.0), (0, -1, 1.0),
                              (1, 1, 1.414), (1, -1, 1.414), (-1, 1, 1.414), (-1, -1, 1.414)):
                nx, nz = cx + dx, cz + dz
                if not (0 <= nx < self.w and 0 <= nz < self.h):
                    continue
                if not self.walkable[nz, nx]:
                    continue
                if dx and dz and not (self.walkable[cz, nx] and self.walkable[nz, cx]):
                    continue  # no corner cutting
                nc = cost[cur] + c
                if nc < cost.get((nx, nz), np.inf):
                    cost[(nx, nz)] = nc
                    h = np.hypot(nx - g[0], nz - g[1])
                    heapq.heappush(open_q, (nc + h, (nx, nz)))
                    came[(nx, nz)] = cur
        if not found:
            return None
        path = [g]
        while path[-1] != s:
            path.append(came[path[-1]])
        path.reverse()
        return self._prune_cells(path, max_waypoints)

    def _prune_cells(self, path, max_waypoints: int) -> np.ndarray:
        """String-pull-lite: drop collinear cells, resample long paths."""
        if len(path) == 1:
            return np.asarray([self.to_world(*path[0])], np.float32)
        pruned = [path[0]]
        for i in range(1, len(path) - 1):
            a, b, c = pruned[-1], path[i], path[i + 1]
            if (b[0] - a[0]) * (c[1] - b[1]) != (b[1] - a[1]) * (c[0] - b[0]):
                pruned.append(b)
        pruned.append(path[-1])
        if len(pruned) > max_waypoints:  # resample long paths
            idx = np.linspace(0, len(pruned) - 1, max_waypoints).astype(int)
            pruned = [pruned[i] for i in idx]
        return np.asarray([self.to_world(*c) for c in pruned], np.float32)

    def serialize(self) -> dict:
        return {"origin": self.origin.tolist(), "cell": self.cell,
                "walkable": np.packbits(self.walkable).tolist(),
                "shape": [self.h, self.w]}

    @staticmethod
    def deserialize(d: dict) -> "NavZone":
        z = NavZone(origin=d["origin"], size=(d["shape"][1] * d["cell"], d["shape"][0] * d["cell"]),
                    cell=d["cell"])
        z.walkable = np.unpackbits(
            np.asarray(d["walkable"], np.uint8), count=z.h * z.w
        ).reshape(z.h, z.w).astype(bool)
        return z


class NavigationModule(IModule):
    name = "navigation"
    COMPONENT_STORES = {"nav_agent": "agents"}

    def __init__(self, world: World, system: "NavigationSystem", max_agents: int = 256):
        super().__init__(world, system)
        self.agents = DenseStore(
            max_agents,
            {"radius": ((), np.float32, 0.5), "speed": ((), np.float32, 3.0)},
        )
        self.zone = NavZone()
        # separation regime switch: dense O(A²) below, x-sorted window above
        self.separation_window_threshold = 256
        self.separation_window = 24
        # local avoidance: "vo" = sampled velocity obstacles (≙ dtCrowd
        # dtObstacleAvoidanceQuery::sampleVelocity* — head-on streams route
        # around each other), "separation" = push-apart only (legacy)
        self.avoidance = "vo"
        # candidate steering angles (radians, relative to desired velocity);
        # each also sampled at half speed, plus a stop candidate
        self.vo_angles = (0.0, 0.45, -0.45, 0.95, -0.95, 1.6, -1.6)
        self.vo_horizon = 2.5        # seconds of look-ahead (≙ dtCrowd horizTime)
        self._pending_paths: Dict[int, np.ndarray] = {}
        self._statics = None
        self._statics_version = -1

    def component_types(self):
        return ["nav_agent", "nav_zone"]

    def create_component(self, entity: int, ctype: str, **props):
        if ctype == "nav_agent":
            self.agents.add(entity, radius=np.float32(props.get("radius", 0.5)),
                            speed=np.float32(props.get("speed", 3.0)))
            self._statics = None
        elif ctype == "nav_zone":
            self.zone = NavZone(origin=props.get("origin", (0.0, 0.0)),
                                size=props.get("size", (64.0, 64.0)),
                                cell=props.get("cell", 1.0))
            self.zone.guid = int(props.get("guid", 0))
            # the reference SHIPS compiled navmeshes (navzones/<guid>.nav,
            # ≙ NavigationModule::loadZone) — when one exists, its walkable
            # polygon set replaces the all-walkable default; the physics
            # re-bake at start_game then only ADDS obstacles on top
            if self.zone.guid:
                from lumixengine_tpu.importers import navmesh as nvm

                dirs = props.get("nav_dirs") or getattr(
                    self.system.engine, "nav_search_dirs", ())
                try:
                    nav = nvm.load_nav_zone(self.zone.guid, dirs)
                except Exception as exc:   # corrupt/uncodecable zone file
                    from lumixengine_tpu.core.log import log_warning
                    log_warning("navigation",
                                f"navzone {self.zone.guid}: {exc}")
                    nav = None
                if nav is not None:
                    self.zone.walkable = nvm.rasterize_walkable(
                        nav, tuple(self.zone.origin),
                        (self.zone.w * self.zone.cell,
                         self.zone.h * self.zone.cell), self.zone.cell)
                    self.zone.from_navmesh = True
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        if ctype == "nav_agent":
            self.agents.remove(entity)
            self._statics = None

    def prepare_statics(self):
        self.world._refresh_levels()
        if self._statics is None or self._statics_version != self.world.topology_version:
            ents = self.agents.entity
            self._statics = {
                "entity_slots": self.world.to_slots(ents),
                "mask": ents >= 0,
                "radius": np.asarray(self.agents.data["radius"], np.float32),
            }
            self._statics_version = self.world.topology_version

    def statics(self):
        self.prepare_statics()
        return self._statics

    # -- host path API (≙ NavigationModule::navigate) ------------------------------

    def set_destination(self, state: WorldState, entity: int, target_xz) -> WorldState:
        """Plan a path (host A*) and install it into the device state."""
        slot = self.agents.slot_of(entity)
        ns: NavState = state.modules[self.name]
        pos = np.asarray(ns.agent_pos[..., :, slot])
        path = self.zone.find_path((float(pos[0]), float(pos[2])), tuple(target_xz))
        if path is None:
            return state
        wp = np.zeros((2, MAX_WAYPOINTS), np.float32)
        wp[:, : len(path)] = path.T
        ns = ns.replace(
            waypoints=ns.waypoints.at[..., :, :, slot].set(jnp.asarray(wp)),
            wp_count=ns.wp_count.at[..., slot].set(len(path)),
            wp_index=ns.wp_index.at[..., slot].set(0),
        )
        return state.replace(modules={**state.modules, self.name: ns})

    # -- device state ---------------------------------------------------------------

    def device_state(self) -> NavState:
        a = self.agents.capacity
        pos = np.zeros((3, a), np.float32)
        for slot in range(a):
            e = int(self.agents.entity[slot])
            if e >= 0:
                pos[:, slot] = self.world.get_global_transform(e)[0]
        return NavState(
            agent_pos=jnp.asarray(pos),
            agent_vel=jnp.zeros((2, a), jnp.float32),
            waypoints=jnp.zeros((2, MAX_WAYPOINTS, a), jnp.float32),
            wp_count=jnp.zeros(a, jnp.int32),
            wp_index=jnp.zeros(a, jnp.int32),
            speed=jnp.asarray(self.agents.data["speed"]),
            counters={"navigating": jnp.int32(0)},
        )

    def _separation(self, st, pos_xz, mask):
        """dtCrowd local-avoidance push. Two regimes (≙ dtCrowd's
        proximity-grid queries): dense O(A²) pairwise below
        `separation_window_threshold` agents, and an x-sorted WINDOW pass
        above it — each agent interacts with its K nearest x-neighbors
        (O(A·K)), the same trick as the physics SAP broadphase. Separation
        radii are short, so out-of-window pairs cannot interact as long as K
        covers the local crowd density."""
        rr = jnp.asarray(st["radius"])
        a_cap = pos_xz.shape[-1]
        if a_cap <= self.separation_window_threshold:
            d = pos_xz[..., :, None, :] - pos_xz[..., :, :, None]    # [2, A, A]
            d2 = jnp.sum(d * d, axis=-3) + jnp.eye(a_cap) * 1e9
            min_d = rr[None, :] + rr[:, None]
            push_w = jnp.maximum(min_d * min_d * 2.25 - d2, 0.0) / (min_d * min_d * 2.25)
            push_w = push_w * (mask[None, :] & mask[:, None])
            inv_d = jax.lax.rsqrt(jnp.maximum(d2, 1e-9))
            return -jnp.sum(d * (push_w * inv_d)[..., None, :, :], axis=-1)

        k = self.separation_window
        ordx = jnp.argsort(jnp.where(mask, pos_xz[..., 0, :], 1e9))
        sp = jnp.take(pos_xz, ordx, axis=-1)                         # [2, A]
        sr = jnp.take(rr, ordx)
        sm = jnp.take(mask, ordx)
        sep_s = jnp.zeros_like(sp)
        for off in range(1, k + 1):
            a = sp[..., :, :a_cap - off]
            b = sp[..., :, off:]
            d = b - a                                                # [2, A-off]
            d2 = jnp.sum(d * d, axis=-2)
            min_d = sr[:a_cap - off] + sr[off:]
            w = jnp.maximum(min_d * min_d * 2.25 - d2, 0.0) / (min_d * min_d * 2.25)
            w = w * (sm[:a_cap - off] & sm[off:])
            push = d * (w * jax.lax.rsqrt(jnp.maximum(d2, 1e-9)))[..., None, :]
            sep_s = sep_s.at[..., :, :a_cap - off].add(-push)
            sep_s = sep_s.at[..., :, off:].add(push)
        # unsort back to agent order
        return jnp.zeros_like(sep_s).at[..., :, ordx].set(sep_s)

    def _vo_candidates(self, des):
        """Candidate velocity set: the desired velocity rotated by the fixed
        vo_angles at full and half speed, plus a stop sample → [S, 2, A]."""
        ca = np.cos(self.vo_angles).astype(np.float32)
        sa = np.sin(self.vo_angles).astype(np.float32)
        dx, dz = des[..., 0, :], des[..., 1, :]
        rx = ca[:, None] * dx[..., None, :] - sa[:, None] * dz[..., None, :]
        rz = sa[:, None] * dx[..., None, :] + ca[:, None] * dz[..., None, :]
        full = jnp.stack([rx, rz], axis=-2)              # [.., S0, 2, A]
        cands = jnp.concatenate(
            [full, 0.5 * full, jnp.zeros_like(full[..., :1, :, :])], axis=-3)
        return cands                                      # [.., S, 2, A]

    @staticmethod
    def _ttc(d, rv, rad):
        """Time to collision of a relative circle (radius `rad`, separation
        `d`, closing velocity `rv`): smallest t ≥ 0 with |d - rv·t| = rad,
        +inf when diverging / missing, 0 when already overlapping."""
        a = jnp.sum(rv * rv, axis=-2)
        b = jnp.sum(d * rv, axis=-2)                      # >0 ⇒ closing
        c = jnp.sum(d * d, axis=-2) - rad * rad
        disc = b * b - a * c
        hit = (disc >= 0.0) & (b > 0.0)
        t = (b - jnp.sqrt(jnp.maximum(disc, 0.0))) / jnp.maximum(a, 1e-9)
        t = jnp.where(c <= 0.0, 0.0, jnp.where(hit & (t >= 0.0), t, jnp.inf))
        return t

    def _sample_velocity(self, st, pos_xz, des, nvel, mask):
        """Sampled velocity-obstacle avoidance (≙ dtObstacleAvoidanceQuery::
        sampleVelocityAdaptive driven from dtCrowd::update,
        /root/reference/src/navigation/navigation_module.cpp initCrowd):
        every candidate velocity is scored by deviation from the desired
        velocity plus an inverse time-to-collision penalty against neighbor
        agents (circles moving at their last chosen velocity); the cheapest
        candidate wins. Dense O(S·A²) below the window threshold, x-sorted
        K-window O(S·A·K) above — same regime split as _separation."""
        rr = jnp.asarray(st["radius"])
        a_cap = pos_xz.shape[-1]
        cands = self._vo_candidates(des)                  # [.., S, 2, A]
        S = cands.shape[-3]
        horizon = self.vo_horizon
        w_vel, w_toi = 0.15, 1.0

        dev = jnp.sqrt(jnp.maximum(jnp.sum(
            (cands - des[..., None, :, :]) ** 2, axis=-2), 1e-12))

        if a_cap <= self.separation_window_threshold:
            # layout [.., S, Ai, 2, Aj] so _ttc's component axis stays at -2
            d = (pos_xz[..., None, :, :]
                 - jnp.swapaxes(pos_xz, -1, -2)[..., :, :, None])  # [Ai,2,Aj]
            rv = (jnp.swapaxes(cands, -1, -2)[..., :, :, None]
                  - nvel[..., None, :, :])                 # [.., S, Ai, 2, Aj]
            rad = rr[None, :] + rr[:, None] + 0.05         # [Ai, Aj]
            t = self._ttc(d, rv, rad)                      # [.., S, Ai, Aj]
            valid = (mask[..., None, :] & mask[..., :, None]
                     & ~jnp.eye(a_cap, dtype=bool))
            t = jnp.where(valid[..., None, :, :], t, jnp.inf)
            tmin = jnp.min(t, axis=-1)                     # [.., S, A]
        else:
            k = self.separation_window
            ordx = jnp.argsort(jnp.where(mask, pos_xz[..., 0, :], 1e9))
            sp = jnp.take(pos_xz, ordx, axis=-1)
            sr = jnp.take(rr, ordx)
            sm = jnp.take(mask, ordx)
            sv = jnp.take(nvel, ordx, axis=-1)
            sc = jnp.take(cands, ordx, axis=-1)            # [.., S, 2, A]
            tmin_s = jnp.full(sc.shape[:-2] + (a_cap,), jnp.inf)
            for off in range(1, k + 1):
                pa = sp[..., :, :a_cap - off]
                pb = sp[..., :, off:]
                d = pb - pa                                # [2, A-off]
                rad = sr[:a_cap - off] + sr[off:] + 0.05
                pair_ok = sm[:a_cap - off] & sm[off:]
                # i's candidates vs neighbor i+off's current velocity
                rv_a = sc[..., :, :, :a_cap - off] - sv[..., None, :, off:]
                t_a = self._ttc(d[..., None, :, :], rv_a, rad)
                t_a = jnp.where(pair_ok, t_a, jnp.inf)
                tmin_s = tmin_s.at[..., :, :a_cap - off].min(t_a)
                # (i+off)'s candidates vs neighbor i's current velocity
                rv_b = sc[..., :, :, off:] - sv[..., None, :, :a_cap - off]
                t_b = self._ttc((-d)[..., None, :, :], rv_b, rad)
                t_b = jnp.where(pair_ok, t_b, jnp.inf)
                tmin_s = tmin_s.at[..., :, off:].min(t_b)
            tmin = jnp.zeros_like(tmin_s).at[..., ordx].set(tmin_s)

        pen = jnp.where(tmin < horizon,
                        w_toi * (1.0 - tmin / horizon), 0.0)
        cost = w_vel * dev + pen                           # [.., S, A]
        best = jnp.argmin(cost, axis=-2)                   # [.., A]
        chosen = jnp.take_along_axis(
            cands, best[..., None, None, :], axis=-3)[..., 0, :, :]
        return jnp.where(mask[..., None, :], chosen, des)

    # -- phases (≙ navigation_module.cpp update: dtCrowd step) -----------------------

    def update(self, state: WorldState, dt) -> WorldState:
        st = self.statics()
        ns: NavState = state.modules[self.name]
        mask = jnp.asarray(st["mask"])
        navigating = mask & (ns.wp_index < ns.wp_count)

        # current waypoint (xz)
        wi = jnp.clip(ns.wp_index, 0, MAX_WAYPOINTS - 1)
        tgt = jnp.take_along_axis(ns.waypoints, wi[None, None, :], axis=-2)[..., 0, :]  # [2,A]
        pos_xz = jnp.stack([ns.agent_pos[..., 0, :], ns.agent_pos[..., 2, :]], axis=-2)
        to_wp = tgt - pos_xz
        dist = jnp.sqrt(jnp.maximum(jnp.sum(to_wp * to_wp, axis=-2), 1e-12))
        reached = dist < 0.3
        wp_index = jnp.where(navigating & reached, ns.wp_index + 1, ns.wp_index)
        seek = to_wp / dist[..., None, :]

        sep = self._separation(st, pos_xz, mask)

        des = seek * jnp.where(navigating, ns.speed, 0.0)[..., None, :]
        if self.avoidance == "vo":
            # sampled velocity obstacles steer AROUND predicted collisions
            # (≙ dtCrowd's obstacle avoidance); separation stays on as the
            # overlap resolver of last resort
            chosen = self._sample_velocity(st, pos_xz, des, ns.agent_vel,
                                           mask)
        else:
            chosen = des
        vel = chosen + sep * 2.0
        new_xz = pos_xz + vel * dt
        agent_pos = ns.agent_pos.at[..., 0, :].set(jnp.where(mask, new_xz[..., 0, :], ns.agent_pos[..., 0, :]))
        agent_pos = agent_pos.at[..., 2, :].set(jnp.where(mask, new_xz[..., 1, :], ns.agent_pos[..., 2, :]))

        # write agents back into entity locals (≙ dtCrowd agents sync transforms)
        act_cols = np.nonzero(st["mask"])[0].astype(np.int32)
        if act_cols.size:
            eslots = jnp.asarray(st["entity_slots"][act_cols])
            cols = jnp.asarray(act_cols)
            local = state.local.replace(
                pos=state.local.pos.at[..., :, eslots].set(jnp.take(agent_pos, cols, axis=-1))
            )
            state = state.replace(local=local)

        ns = ns.replace(
            agent_pos=agent_pos, wp_index=wp_index, agent_vel=chosen,
            counters={"navigating": jnp.sum(navigating).astype(jnp.int32)},
        )
        return state.replace(modules={**state.modules, self.name: ns})


class NavigationSystem(ISystem):
    name = "navigation_system"

    def create_modules(self, world: World) -> NavigationModule:
        caps = getattr(self.engine, "module_capacities", {})
        return NavigationModule(world, self, max_agents=caps.get("nav_agents", 256))
