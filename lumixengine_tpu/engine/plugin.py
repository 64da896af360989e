"""Plugin framework (≙ reference engine/plugin.h ISystem / IModule / SystemManager).

Reference model: one ``ISystem`` per app (global services, async init), one
``IModule`` per World (per-world component storage + the update phases
updateParallel/update/lateUpdate/endFrame called from Engine::update,
engine.cpp). Systems are registered statically or from DLLs.

TPU model: the same two-level split, but an IModule's update phases are **pure
functions over the WorldState pytree** composed into one jitted step by the
Engine — module state lives in ``state.modules[self.name]``, never on ``self``
during trace. Host-side responsibilities (component create/destroy, asset
binding) stay as ordinary methods.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

from lumixengine_tpu.engine.world import World, WorldState


class IModule:
    """Per-world module. Subclasses own component stores (host numpy) and a
    device state pytree; pure step-phase methods transform WorldState."""

    name: str = "module"

    def __init__(self, world: World, system: "ISystem"):
        self.world = world
        self.system = system

    # ---- host-side component store API ----
    def component_types(self) -> List[str]:
        return []

    def create_component(self, entity: int, ctype: str, **props) -> Any:
        raise NotImplementedError

    def destroy_component(self, entity: int, ctype: str) -> None:
        raise NotImplementedError

    def device_state(self) -> Any:
        """Module's slice of WorldState.modules — any pytree (may be ())."""
        return ()

    def prepare_statics(self) -> None:
        """Host hook called by Engine.build_step BEFORE tracing: build any
        trace-time constant tables here (inside a jit trace, fresh constants
        become tracers and cannot be converted back to numpy)."""

    def load_state(self, module_state: Any) -> None:
        """Optional: copy a device snapshot back into host stores."""

    # ---- serialization (≙ IModule::serialize/deserialize + getVersion) ----
    VERSION: int = 0

    def serialize(self) -> Dict[str, Any]:
        return {}

    def deserialize(self, blob: Dict[str, Any], entity_map) -> None:
        pass

    # ---- pure, trace-time step phases (≙ plugin.h update phases) ----
    # Each receives/returns the full WorldState so modules can interact the way
    # reference modules do through World (physics writes transforms, animation
    # applies root motion). `dt` is a traced f32 scalar.

    def end_frame(self, state: WorldState, dt) -> WorldState:
        return state

    def update_parallel(self, state: WorldState, dt) -> WorldState:
        return state

    def update(self, state: WorldState, dt) -> WorldState:
        return state

    def late_update(self, state: WorldState, dt) -> WorldState:
        return state

    # ---- game lifecycle (host-side; ≙ IModule::startGame/stopGame) ----
    def start_game(self) -> None:
        pass

    def stop_game(self) -> None:
        pass


class ISystem:
    """App-singleton service (≙ plugin.h ISystem). Creates one IModule per World."""

    name: str = "system"

    def __init__(self, engine):
        self.engine = engine

    def init(self) -> None:
        """≙ ISystem::initBegin/initEnd — sync here; asset IO is host-side anyway."""

    def create_modules(self, world: World) -> Optional[IModule]:
        """Create and return this system's module for `world` (or None)."""
        return None

    def update(self, dt: float) -> None:
        """Host-side per-frame system update (≙ ISystem::update)."""

    def start_game(self) -> None:
        pass

    def stop_game(self) -> None:
        pass


class SystemManager:
    """Static plugin registry (≙ plugin.h SystemManager; DLL loading is N/A —
    plugins are Python classes registered explicitly or via entry points)."""

    def __init__(self, engine):
        self.engine = engine
        self.systems: List[ISystem] = []

    def add_system(self, system: ISystem) -> ISystem:
        self.systems.append(system)
        return system

    def get_system(self, name: str) -> Optional[ISystem]:
        for s in self.systems:
            if s.name == name:
                return s
        return None

    def create_all_modules(self, world: World) -> None:
        for s in self.systems:
            module = s.create_modules(world)
            if module is not None:
                world.modules[module.name] = module
                for ctype in module.component_types():
                    world.register_component_type(ctype, module)

    def update(self, dt: float) -> None:
        for s in self.systems:
            s.update(dt)
