"""Animation controller graphs (≙ reference src/animation/{controller,nodes}.{h,cpp}).

Reference model: a Controller resource is a node tree (Input/Const/math ops/
Blend1D/Blend2D/Select/Switch/PlayRate/Animation/Layers/IK — nodes.h NodeType);
per-animator runtime state holds input values and per-node time; evaluating the
tree emits a **blend stack** — a byte stream of {SAMPLE slot, weight, time}
ops executed against the Pose (controller.h BlendStackInstructions,
controller.cpp evalBlendStack).

TPU re-architecture: the tree is COMPILED at build time into a traced function
over the whole animator batch. Value nodes become jnp expressions over input
rows [I, A]; pose nodes emit **blend slots** — fixed-length lists of
(clip_id [A], time [A], weight [A]) — the blend stack becomes data, executed
by the module as one batched two-hot sampling matmul + sequential nlerp.
Per-node clock state lives in the module state as rows of [T, A].

Node semantics notes vs reference:
  * Select/Switch cross-fade over `blend_length` seconds (≙ the reference's
    transition blending), tracking (current, previous, fade-elapsed) in state
    rows; the newly entered subtree's Animation clocks reset on entry
    (≙ PoseNode::enter()). blend_length=0 gives a hard switch.
  * Inactive Animation nodes keep advancing their clocks while not selected
    (the reference skips them; both are valid for looping clips).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class ValueNode:
    """Evaluates to a float/bool row [A]."""

    def eval(self, ctx) -> jnp.ndarray:
        raise NotImplementedError


@dataclass
class Input(ValueNode):
    """≙ nodes.h InputNode — reads a controller input by index/name."""

    index: int

    def eval(self, ctx):
        return ctx.inputs[self.index]


@dataclass
class Const(ValueNode):
    value: float

    def eval(self, ctx):
        return jnp.full(ctx.num_animators, jnp.float32(self.value))


@dataclass
class Math(ValueNode):
    """≙ nodes.h MathNode family: MUL/DIV/ADD/SUB/CMP_*/AND/OR."""

    op: str
    a: ValueNode
    b: ValueNode

    _OPS = {
        "add": lambda a, b: a + b,
        "sub": lambda a, b: a - b,
        "mul": lambda a, b: a * b,
        "div": lambda a, b: a / jnp.where(jnp.abs(b) < 1e-12, 1e-12, b),
        "gt": lambda a, b: (a > b).astype(jnp.float32),
        "gte": lambda a, b: (a >= b).astype(jnp.float32),
        "lt": lambda a, b: (a < b).astype(jnp.float32),
        "lte": lambda a, b: (a <= b).astype(jnp.float32),
        "eq": lambda a, b: (a == b).astype(jnp.float32),
        "neq": lambda a, b: (a != b).astype(jnp.float32),
        "and": lambda a, b: ((a != 0) & (b != 0)).astype(jnp.float32),
        "or": lambda a, b: ((a != 0) | (b != 0)).astype(jnp.float32),
    }

    def eval(self, ctx):
        return self._OPS[self.op](self.a.eval(ctx), self.b.eval(ctx))


class PoseNode:
    """Emits blend slots; may own a clock row in the state."""

    def setup(self, ctrl: "Controller") -> None:
        """Allocate clock rows / register clips."""

    def advance(self, ctx) -> None:
        """Advance owned clocks by ctx.dt (scaled by play rate)."""

    def emit(self, ctx, weight: jnp.ndarray) -> None:
        """Append (clip, time, weight) slots scaled by `weight` [A]."""
        raise NotImplementedError


@dataclass
class AnimationNode(PoseNode):
    """≙ nodes.h AnimationNode: plays one looping clip."""

    clip: int
    rate: Optional[ValueNode] = None
    _clock: int = field(default=-1, init=False)

    def setup(self, ctrl):
        self._clock = ctrl.alloc_clock()

    def advance(self, ctx):
        r = self.rate.eval(ctx) if self.rate is not None else 1.0
        length = float(ctx.statics.clip_length[self.clip])
        t = ctx.clocks[self._clock] + ctx.dt * r
        ctx.new_clocks[self._clock] = jnp.mod(t, length)

    def emit(self, ctx, weight):
        ctx.slots.append(
            (
                jnp.full(ctx.num_animators, np.int32(self.clip)),
                ctx.new_clocks[self._clock],
                weight,
                ctx.clocks[self._clock],  # pre-advance clock (root-motion deltas)
            )
        )


@dataclass
class PlayRate(PoseNode):
    """≙ nodes.h PLAYRATE: scales child's clock advance."""

    rate: ValueNode
    child: PoseNode

    def setup(self, ctrl):
        # push the rate into Animation children (clocks are per-Animation)
        def push(n):
            if isinstance(n, AnimationNode):
                n.rate = self.rate if n.rate is None else Math("mul", n.rate, self.rate)
            for c in getattr(n, "children_nodes", lambda: [])():
                push(c)
        push(self.child)
        self.child.setup(ctrl)

    def advance(self, ctx):
        self.child.advance(ctx)

    def emit(self, ctx, weight):
        self.child.emit(ctx, weight)


@dataclass
class Blend1D(PoseNode):
    """≙ nodes.h BLEND1D: value-indexed blend over children at fixed points."""

    value: ValueNode
    children: Sequence[Tuple[float, PoseNode]]  # (point, node), points ascending

    def children_nodes(self):
        return [c for _, c in self.children]

    def setup(self, ctrl):
        for _, c in self.children:
            c.setup(ctrl)

    def advance(self, ctx):
        for _, c in self.children:
            c.advance(ctx)

    def emit(self, ctx, weight):
        x = self.value.eval(ctx)
        pts = np.asarray([p for p, _ in self.children], np.float32)
        x = jnp.clip(x, pts[0], pts[-1])
        for i, (p, child) in enumerate(self.children):
            # hat function around point i
            left = pts[i - 1] if i > 0 else pts[0]
            right = pts[i + 1] if i < len(pts) - 1 else pts[-1]
            wl = jnp.where(
                x <= p,
                1.0 if i == 0 else jnp.clip((x - left) / max(p - left, 1e-9), 0.0, 1.0),
                0.0,
            )
            wr = jnp.where(
                x > p,
                0.0 if i == len(pts) - 1 else jnp.clip((right - x) / max(right - p, 1e-9), 0.0, 1.0),
                0.0,
            )
            w = jnp.where(x <= p, wl, wr)
            child.emit(ctx, weight * w)


def _collect_clocks(node) -> List[int]:
    out = []
    if isinstance(node, AnimationNode) and node._clock >= 0:
        out.append(node._clock)
    for c in getattr(node, "children_nodes", lambda: [])():
        out.extend(_collect_clocks(c))
    return out


@dataclass
class Select(PoseNode):
    """≙ nodes.h SELECT: integer-valued select with cross-fade transitions.

    State rows: current selection, previous selection, fade-elapsed seconds.
    On selection change the fade restarts and the entered child subtree's
    Animation clocks reset (≙ enter())."""

    value: ValueNode
    children: Sequence[PoseNode]
    blend_length: float = 0.3
    _cur: int = field(default=-1, init=False)
    _prev: int = field(default=-1, init=False)
    _fade: int = field(default=-1, init=False)
    _child_clocks: list = field(default_factory=list, init=False)

    def children_nodes(self):
        return list(self.children)

    def setup(self, ctrl):
        for c in self.children:
            c.setup(ctrl)
        self._cur = ctrl.alloc_clock()
        self._prev = ctrl.alloc_clock()
        self._fade = ctrl.alloc_clock()
        self._child_clocks = [_collect_clocks(c) for c in self.children]

    def advance(self, ctx):
        for c in self.children:
            c.advance(ctx)
        v = jnp.round(self.value.eval(ctx)).astype(jnp.float32)
        v = jnp.clip(v, 0, len(self.children) - 1)
        cur = ctx.clocks[self._cur]
        changed = v != cur
        ctx.new_clocks[self._prev] = jnp.where(changed, cur, ctx.clocks[self._prev])
        ctx.new_clocks[self._cur] = v
        ctx.new_clocks[self._fade] = jnp.where(changed, 0.0, ctx.clocks[self._fade] + ctx.dt)
        # enter(): reset entered subtree clocks where it just became current
        for i, clocks in enumerate(self._child_clocks):
            entered = changed & (v == i)
            for ci in clocks:
                ctx.new_clocks[ci] = jnp.where(entered, 0.0, ctx.new_clocks[ci])

    def emit(self, ctx, weight):
        cur = ctx.new_clocks[self._cur]
        prev = ctx.new_clocks[self._prev]
        if self.blend_length > 0:
            f = jnp.clip(ctx.new_clocks[self._fade] / self.blend_length, 0.0, 1.0)
        else:
            f = jnp.ones(ctx.num_animators, jnp.float32)
        for i, c in enumerate(self.children):
            w = (cur == i).astype(jnp.float32) * f + (prev == i).astype(jnp.float32) * (1.0 - f)
            c.emit(ctx, weight * w)


@dataclass
class Switch(PoseNode):
    """≙ nodes.h SWITCH: boolean switch with the same cross-fade machinery."""

    cond: ValueNode
    on_true: PoseNode
    on_false: PoseNode
    blend_length: float = 0.3
    _sel: object = field(default=None, init=False)

    def children_nodes(self):
        return [self.on_true, self.on_false]

    def setup(self, ctrl):
        self._sel = Select(Math("neq", self.cond, Const(0.0)),
                           [self.on_false, self.on_true],
                           blend_length=self.blend_length)
        self._sel.setup(ctrl)

    def advance(self, ctx):
        self._sel.advance(ctx)

    def emit(self, ctx, weight):
        self._sel.emit(ctx, weight)


@dataclass
class Blend2D(PoseNode):
    """≙ nodes.h BLEND2D: children at 2D points, blended by two inputs.

    Weighting: gradient-band interpolation over the point set (the reference
    precomputes editor-side triangles; gradient bands give equivalent smooth
    barycentric-like weights without a triangulation step)."""

    value_x: ValueNode
    value_y: ValueNode
    children: Sequence[Tuple[Tuple[float, float], PoseNode]]  # ((x, y), node)

    def children_nodes(self):
        return [c for _, c in self.children]

    def setup(self, ctrl):
        for _, c in self.children:
            c.setup(ctrl)

    def advance(self, ctx):
        for _, c in self.children:
            c.advance(ctx)

    def emit(self, ctx, weight):
        px = self.value_x.eval(ctx)
        py = self.value_y.eval(ctx)
        pts = np.asarray([p for p, _ in self.children], np.float32)  # [C,2]
        # gradient band: w_i = min_j (1 - clamp(dot(p-pi, pj-pi)/|pj-pi|^2))
        ws = []
        for i in range(len(pts)):
            wi = None
            dx_i = px - pts[i, 0]
            dy_i = py - pts[i, 1]
            for j in range(len(pts)):
                if i == j:
                    continue
                ex = pts[j, 0] - pts[i, 0]
                ey = pts[j, 1] - pts[i, 1]
                denom = max(ex * ex + ey * ey, 1e-9)
                h = jnp.clip(1.0 - (dx_i * ex + dy_i * ey) / denom, 0.0, 1.0)
                wi = h if wi is None else jnp.minimum(wi, h)
            ws.append(wi if wi is not None else jnp.ones_like(px))
        total = sum(ws) + 1e-9
        for (pt, child), w in zip(self.children, ws):
            child.emit(ctx, weight * w / total)


@dataclass
class IKNode(PoseNode):
    """≙ nodes.h IK: FABRIK toward a target read from 3 controller inputs,
    alpha-blended (controller.cpp). Wraps a child pose; emits the child's
    slots and records an IK request the module applies post compute_absolute."""

    child: PoseNode
    chain: Sequence[int]          # bone indices, root → effector
    target_inputs: Tuple[int, int, int]  # input rows for target x/y/z
    alpha: object = 1.0           # float, or int = input row index

    def children_nodes(self):
        return [self.child]

    def setup(self, ctrl):
        self.child.setup(ctrl)
        ctrl.ik_requests.append(self)

    def advance(self, ctx):
        self.child.advance(ctx)

    def emit(self, ctx, weight):
        self.child.emit(ctx, weight)


@dataclass
class Layers(PoseNode):
    """≙ nodes.h LAYERS: base layer blended over by masked layers.

    Emitted as ordinary slots plus per-slot bone masks (mask id per slot);
    the module applies masked blends in emission order."""

    layers: Sequence[Tuple[PoseNode, Optional[np.ndarray], float]]  # (node, bone_mask, weight)

    def children_nodes(self):
        return [n for n, _, _ in self.layers]

    def setup(self, ctrl):
        for n, mask, _ in self.layers:
            n.setup(ctrl)

    def advance(self, ctx):
        for n, _, _ in self.layers:
            n.advance(ctx)

    def emit(self, ctx, weight):
        for i, (n, mask, w) in enumerate(self.layers):
            start = len(ctx.slots)
            n.emit(ctx, weight * jnp.float32(w))
            if mask is not None:
                for s in range(start, len(ctx.slots)):
                    ctx.slot_masks[s] = mask


class _Ctx:
    def __init__(self, controller, inputs, clocks, dt, statics):
        self.inputs = inputs
        self.clocks = clocks
        self.new_clocks = list(clocks)
        self.dt = dt
        self.statics = statics
        self.num_animators = inputs.shape[-1]
        self.slots: List[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = []
        self.slot_masks: Dict[int, np.ndarray] = {}


class Controller:
    """≙ controller.h Controller resource: named inputs + a root pose node.

    compile-time surface: `eval(inputs [I,A], clocks [T,A], dt) →
    (slots, slot_masks, new_clocks)` — all traced."""

    def __init__(self, name: str, statics, root: PoseNode, inputs: Sequence[str] = ()):
        self.name = name
        self.statics = statics  # ClipBankStatics
        self.root = root
        self.input_names = list(inputs)
        self._num_clocks = 0
        self.ik_requests: List[IKNode] = []  # filled by IKNode.setup
        root.setup(self)

    def alloc_clock(self) -> int:
        i = self._num_clocks
        self._num_clocks += 1
        return i

    @property
    def num_clocks(self) -> int:
        return self._num_clocks

    @property
    def num_inputs(self) -> int:
        return len(self.input_names)

    def input_index(self, name: str) -> int:
        return self.input_names.index(name)

    def eval(self, inputs: jnp.ndarray, clocks: jnp.ndarray, dt):
        """inputs [I, A], clocks [T, A], dt scalar →
        (slots [(clip[A], time[A], weight[A], prev_time[A])...],
        slot_masks {i: bone_mask}, new_clocks [T, A])."""
        clock_rows = [clocks[i] for i in range(self._num_clocks)]
        ctx = _Ctx(self, inputs, clock_rows, dt, self.statics)
        self.root.advance(ctx)
        self.root.emit(ctx, jnp.ones(ctx.num_animators, jnp.float32))
        new_clocks = (
            jnp.stack(ctx.new_clocks) if ctx.new_clocks else jnp.zeros((0, ctx.num_animators))
        )
        return ctx.slots, ctx.slot_masks, new_clocks
