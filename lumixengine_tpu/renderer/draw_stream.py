"""DrawStream — CPU command buffer (≙ reference renderer/draw_stream.{h,cpp}).

Reference: typed command stream (create/bind/draw/dispatch/barrier ops) built
by jobs into substreams, merged deterministically and replayed on the frame
thread against the gpu:: API (gpu_dx12.cpp).

TPU build: the same abstraction at the data level — the render pipeline emits
typed commands referencing device arrays (instance buffers, palettes, particle
payloads); a backend replays them against whatever presents (a GL/Vulkan
process, a software rasterizer, a capture file). Substream merging keeps the
reference's deterministic ordering when passes record in parallel."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

# command opcodes (≙ draw_stream.h op enum, the TPU-relevant subset)
OP_SET_PASS = "set_pass"
OP_BIND_MATERIAL = "bind_material"
OP_BIND_INSTANCES = "bind_instances"
OP_BIND_PALETTES = "bind_palettes"
OP_DRAW_MODEL = "draw_model"
OP_DRAW_INSTANCED = "draw_instanced"
OP_DRAW_PARTICLES = "draw_particles"
OP_DRAW_TERRAIN = "draw_terrain"
OP_DRAW_2D = "draw_2d"
OP_DISPATCH = "dispatch"
OP_BARRIER = "barrier"


@dataclass
class DrawCommand:
    op: str
    args: Dict[str, Any] = field(default_factory=dict)


class DrawStream:
    def __init__(self, name: str = "main"):
        self.name = name
        self.commands: List[DrawCommand] = []
        self._substreams: List["DrawStream"] = []

    def push(self, op: str, **args) -> None:
        self.commands.append(DrawCommand(op, args))

    def substream(self, name: str = "") -> "DrawStream":
        """≙ DrawStream::createSubstream — parallel recorders merged in order."""
        s = DrawStream(name or f"{self.name}/{len(self._substreams)}")
        self._substreams.append(s)
        return s

    def merge(self) -> None:
        """Deterministic substream merge (≙ merged for deterministic order)."""
        for s in self._substreams:
            s.merge()
            self.commands.extend(s.commands)
        self._substreams = []

    def replay(self, backend) -> int:
        """Replay against a backend object exposing methods named after ops
        (≙ DrawStream::run → gpu::*). Unknown ops go to backend.unknown().
        Per-pass replay time is recorded into the core profiler under
        ``gpu_pass:<name>`` blocks — the GPU-profiler analog (≙ the
        reference's gpu profiler scopes around each pipeline pass)."""
        import contextlib

        from lumixengine_tpu.core import profiler

        self.merge()
        n = 0
        pass_block = None
        try:
            for cmd in self.commands:
                if cmd.op == OP_SET_PASS:
                    if pass_block is not None:
                        pass_block.__exit__(None, None, None)
                    pass_block = profiler.block(
                        f"gpu_pass:{cmd.args.get('name', '?')}")
                    pass_block.__enter__()
                fn = getattr(backend, cmd.op, None)
                if fn is None:
                    fn = getattr(backend, "unknown", lambda **kw: None)
                    fn(op=cmd.op, **cmd.args)
                else:
                    fn(**cmd.args)
                n += 1
        finally:
            if pass_block is not None:
                pass_block.__exit__(None, None, None)
        return n

    def clear(self) -> None:
        self.commands = []
        self._substreams = []


class RenderPlugin:
    """≙ renderer.h RenderPlugin: hooks called at fixed points of every
    frame's command recording. Override any subset; hooks receive the stream,
    the prepared View and the RenderModule and push commands. `tonemap`
    returning True claims the pass (the builtin tonemap dispatch is
    skipped)."""

    def render_opaque(self, stream, view, module):
        pass

    def render_transparent(self, stream, view, module):
        pass

    def render_before_tonemap(self, stream, view, module):
        pass

    def tonemap(self, stream, view, module) -> bool:
        return False

    def render_after_tonemap(self, stream, view, module):
        pass

    def render_ui(self, stream, view, module):
        pass

    def frame(self, renderer_system):
        pass


def record_frame(view, rs, module, stream: Optional[DrawStream] = None) -> DrawStream:
    """Record a full frame's commands from a prepared View (≙ pipeline.cpp
    createCommands writing the DrawStream, with RenderPlugin hooks at the
    reference's call points)."""
    plugins = getattr(module.system, "plugins", ())
    s = stream or DrawStream()
    s.push(OP_SET_PASS, name="gbuffer")
    s.push(OP_BIND_INSTANCES, pos=view.instance_pos, rot=view.instance_rot,
           scale=view.instance_scale, models=view.instance_model,
           slots=getattr(view, "instance_slot", None),
           count=view.visible_count)
    s.push(OP_DRAW_INSTANCED, sorted_by="material")
    anim = getattr(module.world.modules.get("animation"), "name", None)
    if anim:
        s.push(OP_BIND_PALETTES, source="animation.palette")
    # instanced-model chunks that survived culling (≙ encodeInstancedModels)
    st = module.statics()
    if st.im_slots.size:
        import numpy as _np

        vis = _np.asarray(view.instanced_visible)
        for i, e_slot in enumerate(st.im_slots):
            if vis[i]:
                s.push(OP_DRAW_INSTANCED, model=int(st.im_models[i]),
                       chunk=i, source="instanced_model")
    # terrains (≙ terrain render through the gbuffer pass)
    for slot in range(module.terrains.capacity):
        e = int(module.terrains.entity[slot])
        if e >= 0:
            s.push(OP_DRAW_TERRAIN, entity=e,
                   terrain=int(module.terrains.get(e, "terrain")))
    # procedural geometry (triangle soup at the entity transform)
    for e, pg in getattr(module, "procedural_geometries", {}).items():
        if len(pg.get("vertices", ())):
            s.push(OP_DRAW_MODEL, source="procedural_geometry", entity=e)
    # screen-space decal projection (≙ the decal pass over the gbuffer);
    # curve decals sample their bezier into segments of the same pass
    if any(int(store.entity[i]) >= 0
           for store in (module.decals, module.curve_decals)
           for i in range(store.capacity)):
        s.push(OP_DISPATCH, shader="decals")
    # clustered point-light shading (≙ fillClusters + per-pixel light loop)
    if any(int(module.point_lights.entity[i]) >= 0
           for i in range(module.point_lights.capacity)):
        s.push(OP_DISPATCH, shader="deferred_lights")
    for p in plugins:
        p.render_opaque(s, view, module)
    s.push(OP_SET_PASS, name="transparent")
    for key, (entity, ps) in getattr(module, "particle_emitters", {}).items():
        s.push(OP_DRAW_PARTICLES, emitter=key)
    for p in plugins:
        p.render_transparent(s, view, module)
    # tonemap (≙ Pipeline's builtin tonemap unless a plugin claims it)
    s.push(OP_SET_PASS, name="tonemap")
    for p in plugins:
        p.render_before_tonemap(s, view, module)
    if not any(p.tonemap(s, view, module) for p in plugins):
        s.push(OP_DISPATCH, shader="tonemap")
    for p in plugins:
        p.render_after_tonemap(s, view, module)
    s.push(OP_SET_PASS, name="ui")
    s.push(OP_DRAW_2D)
    for p in plugins:
        p.render_ui(s, view, module)
    return s
