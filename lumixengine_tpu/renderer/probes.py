"""Probe baking — EnvironmentProbe / ReflectionProbe capture (≙ the
reference's editor-side probe bake: render the scene six times from the
probe position into a cubemap the renderer then samples;
/root/reference/src/renderer/render_module.h ReflectionProbe/
EnvironmentProbe + the renderer/editor capture path).

Each face is rastered with a 90° pinhole camera whose basis is derived from
postprocess.cubemap_sky's texel→direction convention, so a baked cubemap can
be sampled by the same function (and by CubemapSkyPlugin) with no seam
remapping. Faces store linear [6, S, S, 3] f32.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from lumixengine_tpu.renderer import raster

# face → (axis, du, dv) matching postprocess.cubemap_sky's uv extraction:
# direction(u, v) ∝ axis + u*du + v*dv, u/v in [-1, 1], +X,-X,+Y,-Y,+Z,-Z
_FACES = [
    ((1, 0, 0), (0, 0, -1), (0, -1, 0)),
    ((-1, 0, 0), (0, 0, 1), (0, -1, 0)),
    ((0, 1, 0), (1, 0, 0), (0, 0, 1)),
    ((0, -1, 0), (1, 0, 0), (0, 0, -1)),
    ((0, 0, 1), (1, 0, 0), (0, -1, 0)),
    ((0, 0, -1), (-1, 0, 0), (0, -1, 0)),
]


def _quat_from_basis(x, y, z) -> np.ndarray:
    """Quaternion (x,y,z,w) for the rotation with world-space columns
    [x y z] (local→world)."""
    m = np.stack([np.asarray(x, np.float64), np.asarray(y, np.float64),
                  np.asarray(z, np.float64)], axis=1)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([(m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
                      (m[1, 0] - m[0, 1]) / s, 0.25 * s])
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (m[j, i] + m[i, j]) / s
        q[k] = (m[k, i] + m[i, k]) / s
        q[3] = (m[k, j] - m[j, k]) / s
    return (q / np.linalg.norm(q)).astype(np.float32)


def face_rotations() -> list:
    """Six right-handed camera quaternions: camera -Z looks down each face
    axis, +Y up = -dv. A cube face viewed from INSIDE is the mirror image of
    the camera's view, so every rastered face is column-flipped afterwards
    to match the (u, v) texel layout (bake_probe does the flip)."""
    out = []
    for axis, du, dv in _FACES:
        z = -np.asarray(axis, np.float32)
        y = -np.asarray(dv, np.float32)
        x = np.cross(y, z)
        out.append(_quat_from_basis(x, y, z))
    return out


def _scene_instances(runner, max_instances: int):
    """All alive model instances (pos [N,3], rot [N,4], scale [N,3],
    model [N]) — probes see the whole scene, not one camera's culled set."""
    rmod = runner.world.modules["renderer"]
    st = rmod.statics()
    state = runner.state
    eidx = np.maximum(np.asarray(st.mi_slots), 0)
    alive = np.asarray(state.alive)[eidx] & np.asarray(st.mi_mask)
    sel = np.nonzero(alive)[0][:max_instances]
    e = eidx[sel]
    return (np.asarray(state.world.pos)[:, e].T,
            np.asarray(state.world.rot)[:, e].T,
            np.asarray(state.world.scale)[:, e].T,
            np.asarray(st.mi_model)[sel], rmod)


def bake_probe(runner, position, size: int = 64,
               max_instances: int = 2048) -> np.ndarray:
    """Render the scene from `position` into a [6, S, S, 3] f32 linear
    cubemap (sky-colored background where nothing is hit)."""
    ipos, irot, iscale, models, rmod = _scene_instances(runner, max_instances)
    pos = np.asarray(position, np.float32)
    faces = np.zeros((6, size, size, 3), np.float32)
    for f, rot in enumerate(face_rotations()):
        fb = np.full((size, size, 3), 18.0, np.float32)
        zb = np.full((size, size), np.inf, np.float32)
        raster.raster_instances(fb, zb, ipos, irot, iscale, models,
                                rmod.system.models, pos, rot,
                                np.pi / 2, size, size)
        faces[f] = fb[:, ::-1] / 255.0   # inside-view mirror → texel layout
    return faces


def bake_all_probes(runner, size: int = 64) -> Dict[int, np.ndarray]:
    """Bake every ReflectionProbe/EnvironmentProbe component and register
    the cubemaps on the RendererSystem (`probe_cubemaps[entity]`) for
    shaders/plugins to sample (≙ the editor's bake-all command)."""
    rmod = runner.world.modules["renderer"]
    out = getattr(rmod.system, "probe_cubemaps", None)
    if out is None:
        out = rmod.system.probe_cubemaps = {}
    for store in (rmod.reflection_probes, rmod.environment_probes):
        for slot in range(store.capacity):
            e = int(store.entity[slot])
            if e < 0:
                continue
            p = np.asarray(runner.state.world.pos)[:, runner.world.slot(e)]
            out[e] = bake_probe(runner, p, size=size)
    return out
