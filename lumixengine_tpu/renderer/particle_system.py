"""Particle system runtime (≙ reference renderer/particle_system.{h,cpp}).

Reference runtime: SoA float channels (16-B aligned, grow x1.5), emit-per-
second timer, chunked 1024-particle jobs with a SIMD float4 interpreter over
emitter bytecode, swap-kill compaction with per-chunk kill counters, EMIT
appended to a paged stream under a jobs mutex (particle_system.cpp update/
processChunk).

TPU runtime: channels are fixed-capacity SoA rows [R, cap] with an alive mask —
the reference's own capacity+compaction discipline, minus compaction (masks
replace swap-kill; spawn fills dead slots by prefix-sum ranking). The compiled
script (particle_compiler.py) provides traced update/emit/output functions;
one frame of a whole emitter = a few fused VPU kernels. Cross-emitter EMIT
requests are routed through argsort-compaction into the target's dead slots,
bounded by capacity — overflow drops (counted), like the reference's fixed
chunk buffers.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.renderer.particle_compiler import (
    CompiledEmitter, EmitStmt, If, Vec, compile_source,
)


@struct.dataclass
class EmitterState:
    channels: jnp.ndarray   # f32 [R, cap] var channels (R = packed rows)
    outs: jnp.ndarray       # f32 [O, cap] output channels (render payload)
    alive: jnp.ndarray      # bool [cap]
    emit_acc: jnp.ndarray   # f32 scalar — fractional particles owed
    emitted: jnp.ndarray    # int32 counters (≙ render_module.cpp stats)
    killed: jnp.ndarray
    overflow: jnp.ndarray


def _pack(channels: Dict[str, Vec], layout: List[Tuple[str, int]], cap: int) -> jnp.ndarray:
    rows = []
    for name, w in layout:
        v = channels.get(name)
        if v is None:
            rows.extend([jnp.zeros(cap)] * w)
        else:
            v = v.broadcast_to(w)
            rows.extend(v.comps)
    if not rows:
        return jnp.zeros((0, cap))
    return jnp.stack(rows)


def _unpack(packed: jnp.ndarray, layout: List[Tuple[str, int]]) -> Dict[str, Vec]:
    out = {}
    r = 0
    for name, w in layout:
        out[name] = Vec([packed[..., r + i, :] for i in range(w)])
        r += w
    return out


def _collect_emit_targets(stmts) -> List[str]:
    targets = []
    for st in stmts:
        if isinstance(st, EmitStmt):
            targets.append(st.target)
        elif isinstance(st, If):
            targets += _collect_emit_targets(st.then)
            targets += _collect_emit_targets(st.orelse)
    return targets


class ParticleSystem:
    """One compiled script instance: a set of emitters with cross-emit edges
    (≙ one ParticleSystem resource instance on a ParticleEmitter component)."""

    def __init__(self, emitters: Dict[str, CompiledEmitter],
                 capacity_override: Optional[Dict[str, int]] = None):
        self.emitters = emitters
        self.caps = {}
        for name, em in emitters.items():
            d = em.decl
            default = (d.max_ribbons * d.max_ribbon_length
                       if d.max_ribbons else d.max_particles)
            self.caps[name] = (capacity_override or {}).get(name, max(default, 1))
        # declared `global` inputs (name → width), shared across emitters
        self.globals_decl: Dict[str, int] = {}
        for em in emitters.values():
            self.globals_decl.update(em.globals_decl)
        # topological order over EMIT edges (sources update before targets so
        # same-frame spawns land like the reference's in-update EMIT stream)
        deps: Dict[str, List[str]] = {n: [] for n in emitters}
        for n, em in emitters.items():
            fn = em.decl.fns.get("update")
            if fn:
                for t in _collect_emit_targets(fn.body):
                    if t not in emitters:
                        raise ValueError(f"emit target {t!r} not found")
                    deps[t].append(n)
        order: List[str] = []
        visiting: set = set()

        def visit(n):
            if n in order:
                return
            if n in visiting:
                raise ValueError("emit cycle between emitters")
            visiting.add(n)
            for d in deps[n]:
                visit(d)
            visiting.discard(n)
            order.append(n)

        for n in emitters:
            visit(n)
        self.order = order

    @classmethod
    def from_source(cls, src: str, imports: Optional[Dict[str, str]] = None, **kw):
        return cls(compile_source(src, imports=imports), **kw)

    # -- state ------------------------------------------------------------------

    def device_state(self, system: Optional[Dict[str, object]] = None
                     ) -> Dict[str, EmitterState]:
        states = {}
        for name, em in self.emitters.items():
            cap = self.caps[name]
            d = em.decl
            channels = jnp.zeros((em.channel_rows(), cap), jnp.float32)
            alive = jnp.zeros(cap, bool)
            emit_acc = jnp.float32(d.init_emit_count)
            if d.max_ribbons:
                # ribbon emitters: slots are ribbon-major; the initial
                # population is init_ribbons_count ribbons × init_emit_count
                # particles, emitted eagerly here with ribbon builtins bound
                rlen = max(d.max_ribbon_length, 1)
                slot = np.arange(cap)
                ribbon_index = slot // rlen
                emit_index = slot % rlen
                alive0 = (ribbon_index < d.init_ribbons_count) & \
                    (emit_index < min(d.init_emit_count, rlen))
                extern = self._extern(cap, system,
                                      emit_index=jnp.asarray(emit_index, jnp.float32),
                                      ribbon_index=jnp.asarray(ribbon_index, jnp.float32))
                ch = _unpack(channels, em.channels)
                spawn = em.run_emit(ch, cap, jax.random.PRNGKey(0), extern=extern)
                ch = {n: (spawn[n] if n in spawn else ch[n]) for n in ch}
                channels = _pack(ch, em.channels, cap)
                alive = jnp.asarray(alive0)
                emit_acc = jnp.float32(0.0)
            states[name] = EmitterState(
                channels=channels,
                outs=jnp.zeros((em.out_rows(), cap), jnp.float32),
                alive=alive,
                # init_emit_count owed on the first frame (≙ init_emit_count)
                emit_acc=emit_acc,
                emitted=jnp.int32(0),
                killed=jnp.int32(0),
                overflow=jnp.int32(0),
            )
        return states

    def _extern(self, cap: int, system: Optional[Dict[str, object]],
                **extra) -> Dict[str, Vec]:
        """Named external values for the script: declared globals (zeros
        unless provided), entity_position, and any builtins in `extra`."""
        ext: Dict[str, Vec] = {}
        system = system or {}
        for gname, w in self.globals_decl.items():
            v = system.get(gname)
            if v is None:
                ext[gname] = Vec([jnp.zeros(cap)] * w)
            else:
                arr = jnp.asarray(v, jnp.float32).reshape(-1)
                ext[gname] = Vec([jnp.broadcast_to(arr[i], (cap,)) for i in range(w)])
        ep = system.get("entity_position")
        if ep is None:
            ext["entity_position"] = Vec([jnp.zeros(cap)] * 3)
        else:
            arr = jnp.asarray(ep, jnp.float32).reshape(-1)
            ext["entity_position"] = Vec([jnp.broadcast_to(arr[i], (cap,)) for i in range(3)])
        for k, v in extra.items():
            ext[k] = v if isinstance(v, Vec) else Vec([v])
        return ext

    # -- the per-frame step (pure, traced) ----------------------------------------

    def step(self, states: Dict[str, EmitterState], dt, time, key,
             system: Optional[Dict[str, object]] = None) -> Dict[str, EmitterState]:
        """`system` carries per-frame external inputs: declared `global`
        values by name and `entity_position` (≙ GLOBAL/SYSTEM_VALUE
        DataStreams fed from the game)."""
        dt = jnp.asarray(dt, jnp.float32)
        new_states = dict(states)
        pending: Dict[str, List[tuple]] = {n: [] for n in self.emitters}

        for idx, name in enumerate(self.order):
            em = self.emitters[name]
            cap = self.caps[name]
            st = new_states[name]
            kname = jax.random.fold_in(key, idx)
            d = em.decl
            rlen = max(d.max_ribbon_length, 1)
            slot = jnp.arange(cap)
            ribbon_idx = (slot // rlen if d.max_ribbons
                          else jnp.zeros(cap, jnp.int32)).astype(jnp.float32)
            ext = self._extern(cap, system, ribbon_index=ribbon_idx)

            ch = _unpack(st.channels, em.channels)
            alive = st.alive

            # 1. update alive particles (≙ ParticleSystem::update processChunk)
            upd_ch, kill_mask, emits = em.run_update(
                ch, cap, dt, time, jax.random.fold_in(kname, 0), extern=ext
            )
            ch = {**ch, **upd_ch}
            kill_mask = kill_mask & alive
            killed = jnp.sum(kill_mask).astype(jnp.int32)
            alive = alive & ~kill_mask

            # record cross-emits (masked by source aliveness)
            for req in emits:
                pending[req.target].append((name, req.mask & alive | (req.mask & kill_mask), req.ins))
                # note: particles that emit and then kill() same frame still count —
                # reference EMIT executes before KILL takes effect

            # 2. timed emission (emit-per-second accumulator, ≙ :1467-1478)
            acc = st.emit_acc + em.decl.emit_per_second * dt
            n_timed = jnp.floor(acc)
            acc = acc - n_timed

            dead = ~alive
            rank = jnp.cumsum(dead.astype(jnp.int32))  # 1-based at dead slots
            base = jnp.int32(0)
            spawned_total = jnp.int32(0)

            # timed spawns: emit_index = index within this emission batch
            fill = dead & (rank > base) & (rank <= base + n_timed.astype(jnp.int32))
            emit_index = jnp.maximum(rank.astype(jnp.float32) - 1.0 - base, 0.0)
            spawn_ch = em.run_emit(ch, cap, jax.random.fold_in(kname, 1),
                                   extern={**ext, "emit_index": Vec([emit_index])})
            ch = {
                n: Vec([jnp.where(fill, s, c) for s, c in zip(spawn_ch[n].comps, ch[n].comps)])
                if n in spawn_ch else ch[n]
                for n in ch
            }
            n_fill = jnp.sum(fill).astype(jnp.int32)
            spawned_total = spawned_total + n_fill
            base = base + n_timed.astype(jnp.int32)
            alive = alive | fill

            # 3. routed cross-emitter spawns (≙ EMIT paged stream consumption)
            overflow = jnp.int32(0)
            for r_i, (src_name, req_mask, ins) in enumerate(pending[name]):
                src_cap = self.caps[src_name]
                n_req = jnp.sum(req_mask).astype(jnp.int32)
                req_order = jnp.argsort(~req_mask)  # requesting slots first
                dead = ~alive
                rank = jnp.cumsum(dead.astype(jnp.int32))
                fill = dead & (rank <= n_req)
                take = jnp.clip(rank - 1, 0, src_cap - 1)
                routed: Dict[str, Vec] = {}
                for in_name, v in ins.items():
                    routed[in_name] = Vec(
                        [jnp.take(c, jnp.take(req_order, take), axis=-1) for c in v.comps]
                    )
                emit_index2 = jnp.maximum(rank.astype(jnp.float32) - 1.0, 0.0)
                spawn_ch = em.run_emit(ch, cap, jax.random.fold_in(kname, 10 + r_i), ins=routed,
                                       extern={**ext, "emit_index": Vec([emit_index2])})
                ch = {
                    n: Vec([jnp.where(fill, s, c) for s, c in zip(spawn_ch[n].comps, ch[n].comps)])
                    if n in spawn_ch else ch[n]
                    for n in ch
                }
                filled = jnp.sum(fill).astype(jnp.int32)
                spawned_total = spawned_total + filled
                overflow = overflow + jnp.maximum(n_req - filled, 0)
                alive = alive | fill

            # 4. outputs (≙ output() → instance buffer for the renderer)
            out_vals = em.run_output(ch, cap, dt, time,
                                     jax.random.fold_in(kname, 2), extern=ext)
            outs = _pack(out_vals, em.outs, cap)
            # dead slots emit zeroed payload
            outs = jnp.where(alive[None, :], outs, 0.0) if outs.shape[0] else outs

            new_states[name] = EmitterState(
                channels=_pack(ch, em.channels, cap),
                outs=outs,
                alive=alive,
                emit_acc=acc,
                emitted=st.emitted + spawned_total,
                killed=st.killed + killed,
                overflow=st.overflow + overflow,
            )
        return new_states

    def alive_counts(self, states: Dict[str, EmitterState]) -> Dict[str, jnp.ndarray]:
        return {n: jnp.sum(s.alive).astype(jnp.int32) for n, s in states.items()}
