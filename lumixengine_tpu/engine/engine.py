"""Engine — owns systems, creates Worlds, composes THE jitted step function.

Reference (engine/engine.cpp EngineImpl::update): per frame —
  1. every module endFrame()
  2. dt = tick * multiplier, smoothed by a trimmed mean of the last 11 samples
  3. PHASE 1: jobs::forEach over modules → updateParallel(dt)   (concurrent)
  4. PHASE 2: serial module->update(dt)
  5. PHASE 3: serial module->lateUpdate(dt)
  6. system updates, input, filesystem callbacks

TPU re-architecture: phases 1-5 become ONE pure function
``step(state, dt) -> state`` built at trace time from the modules' phase
methods, jitted with donated state. The reference's "parallel phase" needs no
scheduler — the module subgraphs are independent and XLA overlaps them. The
eager transform recursion that reference modules trigger mid-frame
(World::setTransform) is replaced by a single hierarchy propagation pass after
the update phase (modules write LOCAL transforms; globals are derived).

Host-side frame pacing (dt smoothing, ≙ engine.cpp:276-287) stays on the host.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lumixengine_tpu.engine.plugin import SystemManager
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.ops import hierarchy as hier


class TimeSmoother:
    """Trimmed-mean dt smoothing over the last 11 frames
    (≙ engine.cpp LastTimeDeltas: drop 2 lowest + 2 highest, average the rest)."""

    WINDOW = 11
    TRIM = 2

    def __init__(self):
        self._samples: list = []

    def push(self, dt: float) -> float:
        self._samples.append(float(dt))
        if len(self._samples) > self.WINDOW:
            self._samples.pop(0)
        s = sorted(self._samples)
        if len(s) > 2 * self.TRIM + 1:
            s = s[self.TRIM : -self.TRIM]
        return float(np.mean(s))


class Engine:
    """≙ engine/engine.h Engine: owns SystemManager, creates Worlds, orchestrates
    the frame. Resource/file services attach lazily (engine/resource.py)."""

    def __init__(self, time_multiplier: float = 1.0, base_path: str = "."):
        from lumixengine_tpu.engine.file_system import FileSystem
        from lumixengine_tpu.engine.input import InputSystem
        from lumixengine_tpu.engine.resource import ResourceManagerHub

        self.system_manager = SystemManager(self)
        self.time_multiplier = float(time_multiplier)
        self.paused = False
        self._next_frame_paused = False
        self._smoother = TimeSmoother()
        self.game_running = False
        # owned services (≙ EngineImpl ctor: FS, resource hub, input)
        self.fs = FileSystem(base_path)
        self.resources = ResourceManagerHub(self.fs)
        self.input = InputSystem()

    # -- systems / worlds -----------------------------------------------------

    def add_system(self, system):
        return self.system_manager.add_system(system)

    def init_systems(self) -> None:
        for s in self.system_manager.systems:
            s.init()

    def create_world(self, capacity: int = 4096) -> World:
        w = World(capacity=capacity)
        self.system_manager.create_all_modules(w)
        return w

    def start_game(self, world: World) -> None:
        self.game_running = True
        for m in world.modules.values():
            m.start_game()
        for s in self.system_manager.systems:
            s.start_game()

    def stop_game(self, world: World) -> None:
        self.game_running = False
        for m in world.modules.values():
            m.stop_game()
        for s in self.system_manager.systems:
            s.stop_game()

    def pause(self, paused: bool) -> None:
        self.paused = paused

    def next_frame(self) -> None:
        """Single-step while paused (≙ Engine::nextFrame)."""
        self._next_frame_paused = True

    # -- THE step -------------------------------------------------------------

    def build_step(
        self,
        world: World,
        donate: bool = True,
        extra: Optional[Callable[[WorldState, jnp.ndarray], WorldState]] = None,
        jit: bool = True,
    ) -> Callable[[WorldState, jnp.ndarray], WorldState]:
        """Compose modules' phase methods into one jitted step(state, dt).

        Phase order matches EngineImpl::update. ``extra`` (e.g. the render
        pipeline's cull pass for benches) runs after lateUpdate. With
        ``jit=False`` returns the raw traceable function (for vmap/shard_map
        lifting by parallel/mesh.py).
        """
        modules = list(world.modules.values())
        for m in modules:  # build trace-time constants on the host, pre-trace
            m.prepare_statics()
        # static slot-space plan: contiguous level segments, static parent
        # positions (see ops/hierarchy.py) — measured fastest on TPU (static
        # indices compile to cheap gathers; dynamic-index pointer jumping is 6x
        # slower, masked level scans ~2x)
        plan = world.plan
        propagate = lambda st: hier.propagate_plan(st.local, plan)  # noqa: E731

        def step(state: WorldState, dt) -> WorldState:
            dt = jnp.asarray(dt, jnp.float32)
            for m in modules:  # endFrame (≙ engine.cpp:291)
                state = m.end_frame(state, dt)
            for m in modules:  # PHASE 1 updateParallel (≙ engine.cpp:319)
                state = m.update_parallel(state, dt)
            for m in modules:  # PHASE 2 update (≙ engine.cpp:322)
                state = m.update(state, dt)
            for m in modules:  # PHASE 3 lateUpdate (≙ engine.cpp:330)
                state = m.late_update(state, dt)
            # derive globals once after all local writes (replaces the
            # reference's eager transformEntity recursion mid-frame; culling
            # and render extraction below see fresh globals)
            state = state.replace(world=propagate(state))
            if extra is not None:
                state = extra(state, dt)
            return state.replace(frame=state.frame + 1, time=state.time + dt)

        if not jit:
            return step
        if donate:
            return jax.jit(step, donate_argnums=0)
        return jax.jit(step)

    def update_host(self, dt_raw: float) -> float:
        """Host side of the frame: dt smoothing + system updates. Returns the
        smoothed dt to feed the jitted step."""
        if self.paused and not self._next_frame_paused:
            dt = 0.0
        else:
            dt = self._smoother.push(dt_raw * self.time_multiplier)
        self._next_frame_paused = False
        self.system_manager.update(dt)
        # ≙ engine.cpp: input->update, fs->processCallbacks at frame end
        self.input.update()
        self.fs.process_callbacks()
        # AssetCompiler watch → recompile, when attached (≙ the editor's
        # FileSystemWatcher driving AssetCompiler::onFileChanged)
        ac = getattr(self, "asset_compiler", None)
        if ac is not None:
            ac.poll()
        return dt
