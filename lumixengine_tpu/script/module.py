"""Scripting module (≙ reference src/lua: Luau VM, Script + InlineScript
components, per-script env tables, update/start/input callbacks via pcall, and
the meta-generated typed API).

TPU build: Python IS the embedded scripting language — each Script component
gets an isolated environment dict; callbacks (`start`, `update(dt)`,
`on_input(event)`) run host-side in the serial update phase, exactly where the
reference runs Lua (engine update → LuaScriptModule::update). The exposed API
surface mirrors the generated Lua one: an `Entity` handle with transform
accessors + reflected component property access driven by engine/reflection.py
(≙ lua_capi.gen.h / lumix.d.lua).

Device interaction contract: scripts mutate HOST state (transforms, component
properties, controller inputs). Structural edits mark statics dirty and are
picked up at the next state snapshot/trace — scripts are the slow control
path, the fused device step is the fast path (same split as Lua vs C++ jobs in
the reference).
"""
from __future__ import annotations

import traceback
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from lumixengine_tpu.core import log
from lumixengine_tpu.engine import reflection
from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World
from lumixengine_tpu.utils.store import DenseStore


class EntityHandle:
    """Script-facing entity wrapper (≙ the generated Lua Entity class)."""

    def __init__(self, world: World, entity: int):
        self._world = world
        self.id = entity

    # transforms
    @property
    def position(self):
        return self._world.get_global_transform(self.id)[0]

    @position.setter
    def position(self, v):
        self._world.set_global_transform(self.id, position=np.asarray(v, np.float32))

    @property
    def rotation(self):
        return self._world.get_global_transform(self.id)[1]

    @rotation.setter
    def rotation(self, v):
        self._world.set_global_transform(self.id, rotation=np.asarray(v, np.float32))

    @property
    def scale(self):
        return self._world.get_global_transform(self.id)[2]

    @scale.setter
    def scale(self, v):
        self._world.set_global_transform(self.id, scale=np.asarray(v, np.float32))

    @property
    def parent(self) -> Optional["EntityHandle"]:
        p = self._world.get_parent(self.id)
        return EntityHandle(self._world, p) if p >= 0 else None

    @parent.setter
    def parent(self, other):
        self._world.set_parent(self.id, other.id if other is not None else -1)

    @property
    def name(self) -> str:
        return self._world.get_entity_name(self.id)

    # reflected component property access: entity.get("point_light", "range")
    def get(self, ctype: str, prop: str):
        return reflection.registry.get_property(self._world, self.id, ctype, prop)

    def set(self, ctype: str, prop: str, value) -> None:
        reflection.registry.set_property(self._world, self.id, ctype, prop, value)

    def has_component(self, ctype: str) -> bool:
        return self._world.has_component(self.id, ctype)

    def create_component(self, ctype: str, **props):
        return self._world.create_component(self.id, ctype, **props)


class ScriptEnv:
    """One script instance's environment (≙ per-script Lua env table)."""

    def __init__(self, module: "ScriptModule", entity: int, source: str, name: str):
        self.entity = entity
        self.name = name
        w = module.world

        def find_entity(name):
            e = w.find_by_name(name)
            return EntityHandle(w, e) if e >= 0 else None

        def create_entity(**kw):
            return EntityHandle(w, w.create_entity(**kw))

        def instantiate_prefab(blob, position=None):
            from lumixengine_tpu.engine import serialize as ser
            roots = ser.instantiate_prefab(w, blob, position=position)
            return [EntityHandle(w, e) for e in roots]

        self.globals: Dict[str, Any] = {
            "this": EntityHandle(w, entity),
            "world": w,
            "engine_api": module.api,
            "log_info": lambda msg: log.log_info("script", str(msg)),
            "log_error": lambda msg: log.log_error("script", str(msg)),
            "np": np,
            # ≙ lua_api.cpp world/entity surface
            "find_entity": find_entity,
            "create_entity": create_entity,
            "destroy_entity": lambda h: w.destroy_entity(
                h.id if isinstance(h, EntityHandle) else int(h)),
            "instantiate_prefab": instantiate_prefab,
            # ≙ LuaScript timers (setTimer → callback after t seconds)
            "set_timer": lambda t, fn: module.set_timer(float(t), fn),
            # ≙ getScriptEnvironment: peer script globals for cross-script calls
            "get_script_env": module.get_script_env,
            # ≙ lua input API
            "is_key_down": lambda key, device=0:
                module.system.engine.input.is_down(key, device),
            # ≙ lua physics API: raycast against the last frame's sim state
            "raycast": module.raycast_host,
        }
        self.error = None
        try:
            code = compile(source, f"<script:{name}>", "exec")
            exec(code, self.globals)  # noqa: S102 — scripts are trusted game code
        except Exception:
            self.error = traceback.format_exc()
            log.log_error("script", f"{name}: {self.error}")

    def call(self, fn_name: str, *args) -> Any:
        """pcall-style guarded call (≙ lua_script_system.cpp pcall wrappers)."""
        fn = self.globals.get(fn_name)
        if not callable(fn):
            return None
        try:
            return fn(*args)
        except Exception:
            self.error = traceback.format_exc()
            log.log_error("script", f"{self.name}.{fn_name}: {self.error}")
            return None


class ScriptModule(IModule):
    """≙ lua_script_system.h LuaScriptModule: Script + InlineScript components."""

    name = "script"
    COMPONENT_STORES: Dict[str, str] = {}

    def __init__(self, world: World, system: "ScriptSystem", max_scripts: int = 256):
        super().__init__(world, system)
        self.scripts: Dict[int, List[ScriptEnv]] = {}
        self._started = False
        self._timers: List[tuple] = []   # (remaining_s, callback)
        # last frame's device state, set by the Runner before script update —
        # scripts query against the previous sim results like the reference's
        # Lua physics API does
        self.latest_state = None

    def raycast_host(self, origin, direction, layer_mask: int = -1):
        """≙ the Lua physics raycast: → (EntityHandle, t) or None."""
        pm = self.world.modules.get("physics")
        if pm is None or self.latest_state is None:
            return None
        ms = self.latest_state.modules.get("physics")
        if ms is None:
            return None
        d = np.asarray(direction, np.float32)
        d = d / max(float(np.linalg.norm(d)), 1e-9)
        hit, t, idx = pm.raycast(ms, np.asarray(origin, np.float32), d,
                                 layer_mask=layer_mask)
        if not bool(hit):
            return None
        e = int(pm.actors.entity[int(idx)])
        return EntityHandle(self.world, e), float(t)

    def set_timer(self, t: float, fn) -> None:
        """≙ LuaScriptModule::setTimer — fire fn once after t seconds."""
        self._timers.append((t, fn))

    def get_script_env(self, entity, name: str = None):
        """≙ getScriptEnvironment: a peer entity's script globals."""
        e = entity.id if isinstance(entity, EntityHandle) else int(entity)
        for env in self.scripts.get(e, []):
            if name is None or env.name == name:
                return env.globals
        return None

    def component_types(self):
        return ["script", "inline_script"]

    def create_component(self, entity: int, ctype: str, **props):
        if ctype in ("script", "inline_script"):
            src = props.get("source")
            if src is None and "path" in props:
                src = self.system.engine.fs.read(props["path"]).decode()
            env = ScriptEnv(self, entity, src or "", props.get("name", f"script{entity}"))
            self.scripts.setdefault(entity, []).append(env)
            if self._started:
                env.call("start")
            return env
        raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self.scripts.pop(entity, None)

    @property
    def api(self) -> Dict[str, Any]:
        return self.system.api

    # -- lifecycle / frame hooks (host side) --------------------------------------

    def start_game(self) -> None:
        self._started = True
        for envs in self.scripts.values():
            for env in envs:
                env.call("start")

    def stop_game(self) -> None:
        self._started = False
        for envs in self.scripts.values():
            for env in envs:
                env.call("stop")

    def update_host(self, dt: float) -> None:
        """Called by the app runner each frame BEFORE the device step
        (≙ LuaScriptModule::update pcall loop — scripting is host work)."""
        if self._timers:
            due, keep = [], []
            for t, fn in self._timers:
                (due if t - dt <= 0.0 else keep).append((t - dt, fn))
            self._timers = keep
            for _, fn in due:
                try:
                    fn()
                except Exception:
                    log.log_error("script", f"timer: {traceback.format_exc()}")
        for envs in self.scripts.values():
            for env in envs:
                env.call("update", dt)

    def on_input(self, event) -> None:
        for envs in self.scripts.values():
            for env in envs:
                env.call("on_input", event)

    def serialize_components(self):
        out = []
        for e, envs in self.scripts.items():
            for env in envs:
                src = env.globals.get("__source__", None)
                out.append({"type": "inline_script", "entity": e,
                            "props": {"source": src or "", "name": env.name}})
        return out


class ScriptSystem(ISystem):
    name = "script_system"

    def __init__(self, engine):
        super().__init__(engine)
        # functions exposed to scripts (≙ the meta-generated Lua C API)
        self.api: Dict[str, Callable] = {}

    def expose(self, name: str, fn: Callable) -> None:
        self.api[name] = fn

    def create_modules(self, world: World) -> ScriptModule:
        return ScriptModule(world, self)
