"""Software GPU backend — a presenting DrawStream consumer (≙ the role of
/root/reference/src/renderer/gpu_dx12.cpp behind DrawStream::run, scoped to
headless TPU use: no swapchain, the "present" is a PNG/array readback).

Replays every OP_* the pipeline records: instanced model draws go through the
z-buffered software rasterizer (raster.py), particles splat from their
emitters' OUT channels, the GUI draw list blits rects and real font-atlas
glyphs, and OP_DISPATCH executes the named post-process shader as a jitted
JAX image pass (postprocess.py) over the HDR framebuffer — so the builtin
RenderPlugin set (plugins.py ≙ renderer.cpp:444-470) produces real pixels.

Rasterization is host numpy (diagnostic-grade, like the editor scene view);
every dispatch after it is device compute. That split mirrors the engine's
design boundary: the hot path is the jitted world step, the presented frame
is a debug/readback surface.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import host_math as hm
from lumixengine_tpu.renderer import postprocess as pp
from lumixengine_tpu.renderer import raster

_jit_bloom = jax.jit(pp.bloom, static_argnames="levels")
_jit_ssao = jax.jit(pp.ssao, static_argnames="taps")
_jit_sss = jax.jit(pp.sss_shadow, static_argnames="steps")
_jit_tdao_hm = jax.jit(pp.tdao_heightmap, static_argnames="grid")
_jit_tdao = jax.jit(pp.tdao)
_jit_atmo = jax.jit(pp.atmo)
_jit_cubemap = jax.jit(pp.cubemap_sky)
_jit_dof = jax.jit(pp.dof)
_jit_taa = jax.jit(pp.taa)
_jit_grain = jax.jit(pp.film_grain)
_jit_tonemap = jax.jit(pp.tonemap_aces)
_jit_fsr = jax.jit(pp.fsr_upscale, static_argnames=("out_h", "out_w"))
_jit_decals = jax.jit(pp.decal_pass)
_jit_lights = jax.jit(pp.deferred_lights, static_argnames=("grid",))


class SoftwareGpuBackend:
    """One frame's replay target. Construct per frame (or reuse across frames
    to keep TAA history), replay a recorded stream, then `finish()`."""

    def __init__(self, runner, cam_slot: int = 0, width: int = 480,
                 height: int = 270, max_instances: int = 2048,
                 exposure: float = 1.3):
        self.runner = runner
        self.width = width
        self.height = height
        self.max_instances = max_instances
        self.exposure = exposure

        world = runner.world
        state = runner.state
        self.rmod = world.modules["renderer"]
        rs = state.modules["renderer"]
        st = self.rmod.statics()
        from lumixengine_tpu.renderer.pipeline import resolve_cam_slot

        self.cam_slot = resolve_cam_slot(st, cam_slot)
        cam_e = max(int(st.cam_slots[self.cam_slot]), 0)
        self.cam_pos = np.asarray(state.world.pos[:, cam_e])
        self.cam_rot = np.asarray(state.world.rot[:, cam_e])
        self.fov = float(np.asarray(rs.cam_fov[self.cam_slot]))
        self.far = float(np.asarray(rs.cam_far[self.cam_slot]))
        self.aspect = width / height

        # directional light = environment entity's forward (-Z), like the
        # reference's Environment; fall back to a fixed key light
        env = int(np.asarray(rs.env_entity))
        if env >= 0:
            erot = np.asarray(state.world.rot[:, env])
            self.sun_dir = -hm.quat_rotate(erot[None], np.array(
                [[0.0, 0.0, -1.0]], np.float32))[0]
        else:
            self.sun_dir = np.array([0.45, 0.8, 0.35], np.float32)
        self.sun_dir = self.sun_dir / np.linalg.norm(self.sun_dir)

        self.fb = np.full((height, width, 3), 18.0, np.float32)
        self.zb = np.full((height, width), np.inf, np.float32)
        self.color: Optional[jnp.ndarray] = None   # linear HDR, device
        self.depth: Optional[jnp.ndarray] = None
        self.history: Optional[jnp.ndarray] = None  # TAA
        self.frame_index = int(getattr(state, "frame", 0))
        self.pass_name = ""
        self._bound = None
        self._rays = None
        self.draw_calls = 0

    # -- raster-phase ops ---------------------------------------------------

    def set_pass(self, name: str = "?"):
        self.pass_name = name

    def bind_material(self, **kw):
        pass

    def bind_palettes(self, **kw):
        pass

    def bind_instances(self, pos=None, rot=None, scale=None, models=None,
                       count=None, slots=None, **kw):
        n = min(int(count), self.max_instances) if count is not None else 0
        self._bound = None
        if n:
            self._bound = (np.asarray(pos).T[:n], np.asarray(rot).T[:n],
                           np.asarray(scale).T[:n],
                           np.asarray(models)[:n],
                           np.asarray(slots)[:n] if slots is not None
                           else np.full(n, -1, np.int32))

    def draw_instanced(self, **kw):
        self.draw_calls += 1
        if kw.get("source") == "instanced_model":
            return self._draw_instanced_chunk(kw.get("chunk", 0),
                                              kw.get("model", -1))
        if self._bound is None:
            return
        ipos, irot, iscale, models, slots = self._bound
        # skinned instances draw their POSED mesh (dual-quat skin on the
        # animation palette, ≙ computeSkeletonDualQuats consumed by the
        # skinning vertex path); the rest draw the bind-pose mesh
        skin_map = self._skin_map()
        drawn = np.zeros(len(models), bool)
        if skin_map:
            registry = self.rmod.system.models
            pal = None
            for i, slot in enumerate(slots):
                col = skin_map.get(int(slot))
                if col is None:
                    continue
                m = registry.get(int(models[i])) if models[i] >= 0 else None
                if m is None or m.vertex_weights is None \
                        or m.vertex_positions is None \
                        or getattr(m, "vertex_triangles", None) is None:
                    continue
                if pal is None:
                    pal = np.asarray(
                        self.runner.state.modules["animation"].palette)
                posed = skin_points_dq_np(pal[:, :, col],
                                          np.asarray(m.vertex_positions),
                                          np.asarray(m.vertex_bones4),
                                          np.asarray(m.vertex_weights))
                w = hm.quat_rotate(
                    np.broadcast_to(irot[i], (len(posed), 4)),
                    posed * iscale[i]) + ipos[i]
                raster.raster_mesh(self.fb, self.zb, w,
                                   m.vertex_triangles,
                                   raster.model_base_color(
                                       int(models[i]), registry,
                                       self.rmod.system.materials),
                                   self.cam_pos, self.cam_rot, self.fov,
                                   self.width, self.height)
                drawn[i] = True
        keep = ~drawn
        raster.raster_instances(self.fb, self.zb, ipos[keep], irot[keep],
                                iscale[keep], models[keep],
                                self.rmod.system.models, self.cam_pos,
                                self.cam_rot, self.fov, self.width,
                                self.height,
                                materials=self.rmod.system.materials)
        self._bound = None

    def _skin_map(self):
        if getattr(self, "_skin", None) is None:
            self._skin = skin_map(self.runner.world)
        return self._skin

    def draw_model(self, **kw):
        if kw.get("source") == "procedural_geometry":
            return self._draw_procedural(kw.get("entity"))
        self.draw_instanced(**kw)

    def _draw_procedural(self, entity):
        """Triangle-soup fill at the entity transform (≙ ProceduralGeometry
        draw — vertices are consecutive triangles)."""
        self.draw_calls += 1
        pg = self.rmod.procedural_geometries.get(entity)
        if not pg or not len(pg["vertices"]):
            return
        verts = np.asarray(pg["vertices"], np.float32)
        n = (len(verts) // 3) * 3
        if n == 0:
            return
        slot = self.runner.world.slot(entity)
        epos = np.asarray(self.runner.state.world.pos[:, slot])
        erot = np.asarray(self.runner.state.world.rot[:, slot])
        w = hm.quat_rotate(np.broadcast_to(erot, (n, 4)), verts[:n]) + epos
        tris = np.arange(n, dtype=np.int32).reshape(-1, 3)
        raster.raster_mesh(self.fb, self.zb, w, tris,
                           np.array([176, 122, 161], np.float32),
                           self.cam_pos, self.cam_rot, self.fov,
                           self.width, self.height)

    def _draw_instanced_chunk(self, chunk: int, model: int):
        """Replay one culled InstancedModel chunk (≙ encodeInstancedModels'
        per-chunk transform blob). Instance transforms are stored relative
        to the owner entity — the cull pass bounds them as owner_pos +
        center (pipeline._cull_instanced), so drawing translates by the
        owner the same way. Caps at max_instances per chunk."""
        # same filtered order as ViewStatics (empty chunks are skipped there)
        ims = [(e, im) for e, im in self.rmod.instanced_models.items()
               if len(im["pos"])]
        if not (0 <= chunk < len(ims)):
            return
        owner, im = ims[chunk]
        n = min(len(im["pos"]), self.max_instances)
        if n == 0:
            return
        epos = np.asarray(self.runner.state.world.pos)[
            :, self.runner.world.slot(owner)]
        models = np.full(n, im["model"] if model < 0 else model, np.int32)
        raster.raster_instances(self.fb, self.zb, im["pos"][:n] + epos,
                                im["rot"][:n], im["scale"][:n], models,
                                self.rmod.system.models, self.cam_pos,
                                self.cam_rot, self.fov, self.width,
                                self.height,
                                materials=self.rmod.system.materials)

    def draw_particles(self, emitter=None, **kw):
        """Splat alive particles' position OUT channel as additive points."""
        self.draw_calls += 1
        rs = self.runner.state.modules["renderer"]
        sub = rs.particles.get(emitter) if emitter else None
        if not sub:
            return
        ps = dict(self.rmod.particle_emitters).get(emitter)
        ps = ps[1] if ps else None
        for ekey, est in sub.items():
            em = getattr(ps, "emitters", {}).get(ekey) if ps else None
            pos3, col, size = _particle_outputs(est, em)
            if pos3 is None:
                continue
            alive = np.asarray(est.alive)
            pts = pos3[alive]
            if not len(pts):
                continue
            cols = (col[alive] * 255.0 if col is not None
                    else np.full((len(pts), 3), 80.0, np.float32))
            xy, depth = _project_np(pts, self.cam_pos, self.cam_rot,
                                    self.fov, self.aspect,
                                    self.width, self.height)
            ok = (depth > 1e-3) & (xy[:, 0] >= 0) & (xy[:, 0] < self.width) \
                & (xy[:, 1] >= 0) & (xy[:, 1] < self.height)
            xi = xy[ok, 0].astype(np.int32)
            yi = xy[ok, 1].astype(np.int32)
            zok = depth[ok] < self.zb[yi, xi]
            # splat radius in pixels from the scale OUT channel (additive)
            f = 1.0 / np.tan(self.fov * 0.5)
            sc = (size[alive][ok] if size is not None
                  else np.full(ok.sum(), 0.15, np.float32))
            px = np.clip(sc * f / np.maximum(depth[ok], 1e-3)
                         * self.height * 0.5, 0.5, 6.0)
            yi, xi, px = yi[zok], xi[zok], px[zok]
            cz = cols[ok][zok]
            dz = depth[ok][zok]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ring = max(abs(dy), abs(dx))
                    sel = (px >= 0.0) if ring == 0 else (px > 1.6 * ring)
                    y2 = np.clip(yi[sel] + dy, 0, self.height - 1)
                    x2 = np.clip(xi[sel] + dx, 0, self.width - 1)
                    np.add.at(self.fb, (y2, x2), cz[sel] * 0.8)
                    # splats own their depth so the sky/fog passes treat
                    # them as scene content, not empty background
                    np.minimum.at(self.zb, (y2, x2), dz[sel])

    def draw_terrain(self, entity=None, terrain=-1, **kw):
        """Raster the heightfield as a coarse grid mesh (≙ terrain LOD draw,
        downsampled to viewer-debug density)."""
        self.draw_calls += 1
        reg = getattr(self.rmod.system, "terrains", None)
        if reg is None or terrain < 0 or entity is None:
            return
        try:
            tr = reg.get(int(terrain))
        except (KeyError, IndexError):
            return
        hmap = tr["heights"]
        hgt, wid = hmap.shape
        step = max(1, int(np.ceil(max(hgt, wid) / 48)))
        sub = hmap[::step, ::step]
        sh, sw = sub.shape
        if sh < 2 or sw < 2:
            return
        xs = np.arange(sw, dtype=np.float32) * (tr["xz_scale"] * step)
        zs = np.arange(sh, dtype=np.float32) * (tr["xz_scale"] * step)
        gx, gz = np.meshgrid(xs, zs)
        verts = np.stack([gx, sub * tr["y_scale"], gz], -1).reshape(-1, 3)
        idx = np.arange(sh * sw).reshape(sh, sw)
        q00 = idx[:-1, :-1].ravel()
        q10 = idx[:-1, 1:].ravel()
        q01 = idx[1:, :-1].ravel()
        q11 = idx[1:, 1:].ravel()
        tris = np.concatenate([np.stack([q00, q10, q11], -1),
                               np.stack([q00, q11, q01], -1)])
        slot = self.runner.world.slot(entity)
        epos = np.asarray(self.runner.state.world.pos[:, slot])
        erot = np.asarray(self.runner.state.world.rot[:, slot])
        w = hm.quat_rotate(np.broadcast_to(erot, (len(verts), 4)),
                           verts) + epos
        raster.raster_mesh(self.fb, self.zb, w, tris,
                           np.array([89, 140, 79], np.float32),
                           self.cam_pos, self.cam_rot, self.fov,
                           self.width, self.height)
        if tr.get("grass_types"):
            self._draw_grass(int(terrain), tr, epos, erot)

    def _draw_grass(self, tid: int, tr, epos, erot, max_blades: int = 512):
        """Grass types scatter over the heightmap (terrain.scatter_grass) and
        draw as one batched blade-triangle mesh (≙ Terrain grass)."""
        from lumixengine_tpu.renderer import terrain as T

        reg = self.rmod.system.terrains
        bank = reg.bank
        hgt, wid = tr["heights"].shape
        ext = (wid * tr["xz_scale"], hgt * tr["xz_scale"])
        for gi, gt in enumerate(tr["grass_types"]):
            pos, yaw, mask = T.scatter_grass(
                bank, tid, float(gt.get("density", 0.2)), ext,
                jax.random.PRNGKey(17 + gi), max_instances=max_blades)
            sel = np.asarray(mask)
            p = np.asarray(pos).T[sel][:max_blades]      # [N, 3]
            if not len(p):
                continue
            pw_ = hm.quat_rotate(np.broadcast_to(erot, (len(p), 4)),
                                 p) + epos
            h = float(gt.get("height", 0.5))
            r = 0.08
            verts = np.concatenate([pw_ + [-r, 0, 0], pw_ + [r, 0, 0],
                                    pw_ + [0, h, 0]])
            n = len(pw_)
            tris = np.stack([np.arange(n), np.arange(n) + n,
                             np.arange(n) + 2 * n], -1).astype(np.int32)
            raster.raster_mesh(self.fb, self.zb, verts, tris,
                               np.array([96, 168, 72], np.float32),
                               self.cam_pos, self.cam_rot, self.fov,
                               self.width, self.height)

    def draw_2d(self, **kw):
        """GUI overlay: rect fills + real font-atlas glyph blits. Draw-list
        coordinates are canvas pixels (GuiModule.canvas_size, 1920x1080 by
        default — the reference's virtual GUI resolution); scaled to the
        framebuffer here, like the reference's GUI render against the
        actual viewport."""
        self.draw_calls += 1
        gui = self.runner.world.modules.get("gui")
        if gui is None:
            return
        cw, ch = getattr(gui, "canvas_size", (self.width, self.height))
        sx = self.width / float(cw)
        sy = self.height / float(ch)
        # the ui pass runs post-tonemap (≙ the reference's GUI render into
        # the post-tonemap target): blit the display image when the device
        # color path is live, the raster fb otherwise
        if self.color is not None:
            buf = np.array(self.color) * 255.0
        else:
            buf = self.fb
        compose_gui(buf, self.runner, self.width, self.height)
        if self.color is not None:
            self.color = jnp.asarray(np.clip(buf, 0, 255) / 255.0)

    def draw_nav_debug(self, nav_module=None, y: float = 0.1):
        """Navigation debug draw (≙ NavigationModule debug draw of the
        navmesh): overlay zone walkability — cyan dots on walkable cells
        adjacent to blocked ones (the walkable boundary), orange on blocked
        cells — splatted at ground height."""
        nav = nav_module or self.runner.world.modules.get("navigation")
        if nav is None:
            return
        zones = [z for z in (getattr(nav, "zone", None),) if z is not None]
        for zone in zones:
            wk = zone.walkable
            blocked = ~wk
            # boundary: walkable cells with any blocked 4-neighbor
            nb = np.zeros_like(wk)
            nb[1:] |= blocked[:-1]
            nb[:-1] |= blocked[1:]
            nb[:, 1:] |= blocked[:, :-1]
            nb[:, :-1] |= blocked[:, 1:]
            for mask, col in ((wk & nb, (90.0, 220.0, 220.0)),
                              (blocked, (230.0, 140.0, 40.0))):
                zc, xc = np.nonzero(mask)
                if not len(zc):
                    continue
                wx = zone.origin[0] + (xc + 0.5) * zone.cell
                wz = zone.origin[1] + (zc + 0.5) * zone.cell
                pts = np.stack([wx, np.full_like(wx, y), wz], -1)
                xy, depth = _project_np(pts.astype(np.float32), self.cam_pos,
                                        self.cam_rot, self.fov, self.aspect,
                                        self.width, self.height)
                ok = (depth > 1e-3) \
                    & (xy[:, 0] >= 0) & (xy[:, 0] < self.width) \
                    & (xy[:, 1] >= 0) & (xy[:, 1] < self.height)
                xi = xy[ok, 0].astype(np.int32)
                yi = xy[ok, 1].astype(np.int32)
                zok = depth[ok] < self.zb[yi, xi] + 0.5
                if self.color is not None:
                    # post-tonemap: paint the display-referred image
                    import jax.numpy as _jnp

                    img = np.array(self.color)     # writable copy
                    img[yi[zok], xi[zok]] = np.asarray(col) / 255.0
                    self.color = _jnp.asarray(img)
                else:
                    self.fb[yi[zok], xi[zok]] = np.asarray(col, np.float32)

    def barrier(self, **kw):
        pass

    def unknown(self, op=None, **kw):
        pass

    # -- dispatch (post-process shaders) -------------------------------------

    def _to_device(self):
        if self.color is None:
            self.color = jnp.asarray(self.fb) / 255.0
            self.depth = jnp.asarray(self.zb)

    def _world_rays(self):
        if self._rays is None:
            self._rays = pp.world_rays(jnp.asarray(self.cam_rot), self.fov,
                                       self.aspect, self.height, self.width)
        return self._rays

    def dispatch(self, shader: str = "", **params):
        if shader == "decals":
            # scene-content pass inside the gbuffer: runs on the current fb
            # and writes back, so later raster draws (particles, 2d) still
            # land on the host framebuffer
            return self._run_decals(params)
        if shader == "deferred_lights":
            return self._run_lights(params)
        self._to_device()
        c, d = self.color, self.depth
        if shader == "tonemap":
            c = _jit_tonemap(c, params.get("exposure", self.exposure))
        elif shader == "bloom":
            c = _jit_bloom(c, params.get("threshold", 0.85),
                           params.get("intensity", 0.6))
        elif shader == "ssao":
            ao = _jit_ssao(d, self.fov, self.aspect,
                           params.get("radius", 0.8),
                           params.get("strength", 1.0), far=self.far)
            c = c * ao[..., None]
        elif shader == "sss":
            sun_view = hm.quat_rotate(
                hm.quat_conjugate(self.cam_rot)[None],
                self.sun_dir[None].astype(np.float32))[0]
            lit = _jit_sss(d, self.fov, self.aspect, jnp.asarray(sun_view),
                           steps=int(params.get("steps", 8)),
                           shadow=params.get("shadow", 0.45), far=self.far)
            c = c * lit[..., None]
        elif shader == "tdao":
            ao = self._run_tdao(d, params)
            if ao is not None:
                c = c * ao[..., None]
        elif shader == "atmo":
            c = _jit_atmo(c, d, self._world_rays(),
                          jnp.asarray(self.sun_dir), self.far)
        elif shader == "cubemap_sky":
            faces = params.get("faces")
            faces = jnp.asarray(faces) if faces is not None \
                else pp.default_cubemap()
            c = _jit_cubemap(c, d, self._world_rays(), faces, self.far)
        elif shader == "dof":
            c = _jit_dof(c, d, params.get("focus_dist", 20.0),
                         params.get("focus_range", 25.0), far=self.far)
        elif shader == "taa":
            if self.history is not None \
                    and self.history.shape == c.shape:
                c = _jit_taa(c, self.history, params.get("alpha", 0.15))
            self.history = c
        elif shader == "film_grain":
            key = jax.random.fold_in(jax.random.PRNGKey(7), self.frame_index)
            c = _jit_grain(c, key, params.get("amount", 0.06))
        elif shader == "fsr_upscale":
            scale = params.get("scale", 1.5)
            oh = int(round(self.height * scale))
            ow = int(round(self.width * scale))
            c = _jit_fsr(c, oh, ow, params.get("sharpness", 0.4))
            self.depth = jax.image.resize(d, (oh, ow), "nearest")
            self.height, self.width = oh, ow
        # unknown shader names fall through unchanged (forward-compat)
        self.color = c

    def _run_decals(self, params):
        st = self.runner.state
        mod = self.rmod
        ents, pos, rot, he, tints = [], [], [], [], []
        for slot in range(mod.decals.capacity):
            e = int(mod.decals.entity[slot])
            if e < 0:
                continue
            ws = self.runner.world.slot(e)
            pos.append(np.asarray(st.world.pos)[:, ws])
            rot.append(np.asarray(st.world.rot)[:, ws])
            he.append(np.asarray(mod.decals.data["half_extents"][slot]))
            mat = int(mod.decals.data["material"][slot])
            tints.append(raster._PALETTE[mat % len(raster._PALETTE)] / 255.0)
            ents.append(e)
        # curve decals: quadratic bezier (p0 → entity origin → p2 in the
        # entity's XZ plane) sampled into oriented OBB segments that ride
        # the same projection pass (≙ CurveDecal, render_module.h)
        for slot in range(mod.curve_decals.capacity):
            e = int(mod.curve_decals.entity[slot])
            if e < 0:
                continue
            ws = self.runner.world.slot(e)
            epos = np.asarray(st.world.pos)[:, ws]
            erot = np.asarray(st.world.rot)[:, ws]
            bhe = np.asarray(mod.curve_decals.data["half_extents"][slot])
            p0 = np.asarray(mod.curve_decals.data["bezier_p0"][slot])
            p2 = np.asarray(mod.curve_decals.data["bezier_p2"][slot])
            mat = int(mod.curve_decals.data["material"][slot])
            tint = raster._PALETTE[mat % len(raster._PALETTE)] / 255.0
            nseg = 8
            ts = np.linspace(0.0, 1.0, nseg + 1)
            bz = ((1 - ts) ** 2)[:, None] * p0[None] \
                + (ts ** 2)[:, None] * p2[None]        # [n+1, 2] xz, p1=0
            for i in range(nseg):
                a, b = bz[i], bz[i + 1]
                mid = (a + b) * 0.5
                d = b - a
                ln = float(np.hypot(d[0], d[1]))
                yaw = float(np.arctan2(d[0], d[1]))
                qy = np.array([0.0, np.sin(yaw / 2), 0.0,
                               np.cos(yaw / 2)], np.float32)
                local = np.array([mid[0], 0.0, mid[1]], np.float32)
                pos.append(epos + hm.quat_rotate(erot[None],
                                                 local[None])[0])
                rot.append(hm.quat_mul(erot, qy))
                he.append(np.array([bhe[0], bhe[1], ln / 2 + 0.05],
                                   np.float32))
                tints.append(tint)
                ents.append(e)
        if not ents:
            return
        out = _jit_decals(jnp.asarray(self.fb) / 255.0, jnp.asarray(self.zb),
                          self.fov, self.aspect, jnp.asarray(self.cam_pos),
                          jnp.asarray(self.cam_rot),
                          jnp.asarray(np.stack(pos)), jnp.asarray(np.stack(rot)),
                          jnp.asarray(np.stack(he)),
                          jnp.asarray(np.stack(tints)),
                          alpha=params.get("alpha", 0.65), far=self.far)
        self.fb[:] = np.asarray(out) * 255.0

    def _run_lights(self, params):
        """Clustered point-light shading (fill_clusters bins → per-pixel
        light loop, ≙ pipeline.cpp clustered shading). Round-trips the host
        framebuffer like decals (scene light, pre-postprocess)."""
        from lumixengine_tpu.renderer import clusters as _cls

        rmod = self.rmod
        st = rmod.statics()
        if st.pl_slots.size == 0 or not np.any(st.pl_mask):
            return
        state = self.runner.state
        rs = state.modules["renderer"]
        cl = _cls.fill_clusters(state, rmod, cam_slot=self.cam_slot,
                                statics=st)
        le = np.maximum(np.asarray(st.pl_slots), 0)
        lw = np.asarray(state.world.pos)[:, le].T           # [L, 3]
        inv = hm.quat_conjugate(self.cam_rot)
        lv = hm.quat_rotate(np.broadcast_to(inv, (len(lw), 4)),
                            lw - self.cam_pos)
        near = float(np.asarray(rs.cam_near[self.cam_slot]))
        farc = float(np.asarray(rs.cam_far[self.cam_slot]))
        out = _jit_lights(
            jnp.asarray(self.fb) / 255.0, jnp.asarray(self.zb),
            self.fov, self.aspect, jnp.asarray(lv),
            jnp.asarray(np.asarray(rs.pl_color).T),
            jnp.asarray(rs.pl_intensity), jnp.asarray(rs.pl_range),
            cl.lights, grid=_cls.GRID, near=near, far_cluster=farc,
            far=self.far)
        self.fb[:] = np.clip(np.asarray(out), 0.0, 4.0) * 255.0

    def _run_tdao(self, d, params):
        if self._bound_scene() is None:
            return None
        ipos, irad = self._bound_scene()
        mn = ipos.min(axis=0) - 1.0
        mx = ipos.max(axis=0) + 1.0
        inv = 1.0 / np.maximum(mx - mn, 1e-3)
        hm_grid = _jit_tdao_hm(jnp.asarray(ipos), jnp.asarray(irad),
                               jnp.asarray([mn[0], mn[2]]),
                               jnp.asarray([inv[0], inv[2]]))
        return _jit_tdao(d, hm_grid, jnp.asarray(self.cam_pos),
                         jnp.asarray(self.cam_rot), self.fov, self.aspect,
                         jnp.asarray([mn[0], mn[2]]),
                         jnp.asarray([inv[0], inv[2]]),
                         params.get("strength", 0.7), far=self.far)

    def _bound_scene(self):
        if getattr(self, "_scene_spheres", None) is None:
            view = self.runner.prepare_view(self.cam_slot)
            n = min(int(view.visible_count), self.max_instances)
            if n == 0:
                return None
            ipos = np.asarray(view.instance_pos).T[:n]
            models = np.asarray(view.instance_model)[:n]
            scale = np.asarray(view.instance_scale).T[:n]
            bank = self.rmod.system.bank
            rad = np.asarray(bank.bounding_radius)[np.maximum(models, 0)]
            rad = rad * np.max(np.abs(scale), axis=-1)
            self._scene_spheres = (ipos.astype(np.float32),
                                   rad.astype(np.float32))
        return self._scene_spheres

    # -- readback -------------------------------------------------------------

    def finish(self) -> np.ndarray:
        """Present: final uint8 [H, W, 3] (display-referred)."""
        if self.color is None:
            return np.clip(self.fb, 0, 255).astype(np.uint8)
        arr = np.asarray(self.color)
        return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


def compose_gui(buf: np.ndarray, runner, width: int, height: int) -> np.ndarray:
    """GUI overlay onto a float [H,W,3] 0-255 buffer IN PLACE: rect fills +
    real font-atlas glyph blits + input-field carets, canvas coordinates
    scaled to the framebuffer (≙ gui_system.cpp rendering into the
    post-tonemap target). Shared by the software backend's draw_2d and the
    TPU present's host-side composite (Runner.present_tpu gui=True —
    the UI is host content, so it composites after the device framebuffer
    lands, exactly like the reference GUI drawing into the swapchain)."""
    gui = runner.world.modules.get("gui")
    if gui is None:
        return buf
    cw, ch = getattr(gui, "canvas_size", (width, height))
    sx = width / float(cw)
    sy = height / float(ch)
    for it in gui.draw_list(runner.state):
        r = it["rect"]
        x0 = int(max(r[0] * sx, 0))
        y0 = int(max(r[1] * sy, 0))
        x1 = min(int(r[2] * sx), width)
        y1 = min(int(r[3] * sy), height)
        if x0 < x1 and y0 < y1 and "color" in it:
            c = np.asarray(it["color"][:3], np.float32) * 255.0
            a = it["color"][3] if len(it["color"]) > 3 else 0.6
            buf[y0:y1, x0:x1] = (buf[y0:y1, x0:x1] * (1 - a)
                                 + c[None, None] * a)
        for g in it.get("glyphs", ()):
            _blit_glyph_np(gui, it, g, sx, sy, buf, width, height)
        if "caret" in it:
            cx0, cy0, cx1, cy1 = it["caret"]
            x0 = int(max(cx0 * sx, 0))
            x1 = min(int(max(cx1 * sx, x0 + 1)), width)
            y0 = int(max(cy0 * sy, 0))
            y1 = min(int(cy1 * sy), height)
            if x0 < x1 and y0 < y1:
                buf[y0:y1, x0:x1] = 235.0
    return buf


def _blit_glyph_np(gui, item, g, sx, sy, buf, width, height):
    """g = (x0,y0,x1,y1, u0,v0,u1,v1) — Font.layout's quad format in canvas
    pixels; the atlas crop is nearest-resampled to the scaled quad size."""
    font = gui._font(item.get("font_size", 24))
    gx0, gy0, gx1, gy1, u0, v0, u1, v1 = g
    x0 = int(max(gx0 * sx, 0))
    y0 = int(max(gy0 * sy, 0))
    x1 = min(int(round(gx1 * sx)), width)
    y1 = min(int(round(gy1 * sy)), height)
    if x0 >= x1 or y0 >= y1 or v1 <= v0 or u1 <= u0:
        return
    src = font.atlas[v0:v1, u0:u1].astype(np.float32) / 255.0
    h, w = y1 - y0, x1 - x0
    ri = (np.arange(h) * (src.shape[0] / h)).astype(np.int32)
    ci = (np.arange(w) * (src.shape[1] / w)).astype(np.int32)
    a = src[ri][:, ci][..., None]
    buf[y0:y1, x0:x1] = (buf[y0:y1, x0:x1] * (1 - a) + 235.0 * a)


def skin_map(world) -> dict:
    """World slot → palette pool column (animables region first, then
    animators at +animables.capacity — animation/module.py pool layout).
    Shared by the software backend's posed-skin draw and the TPU soup bake
    (gpu_tpu.py)."""
    out = {}
    amod = world.modules.get("animation")
    if amod is not None:
        st = amod.statics()
        a1 = amod.animables.capacity
        for g in getattr(st, "an_groups", ()):
            for c, s in zip(g["cols"], g["entity_slots"]):
                out[int(s)] = int(c)
        for g in getattr(st, "at_groups", ()):
            for c, s in zip(g["cols"], g["entity_slots"]):
                out[int(s)] = int(a1 + c)
    return out


def skin_points_dq_np(pal, points, bones4, weights) -> np.ndarray:
    """Host dual-quat skinning (the numpy mirror of ops/skinning.py's
    blend_palette + skin_points, for the diagnostic raster path).
    pal [8, B] (x,y,z,w real | dual), points [V,3], bones4 [V,4] int,
    weights [V,4] → posed points [V,3]."""
    # hemisphere: flip each bone against bone 0's real part (the same
    # convention as ops/skinning.blend_palette — parity-tested)
    d = np.sum(pal[:4] * pal[:4, 0:1], axis=0)        # [B]
    pal = pal * np.where(d < 0.0, -1.0, 1.0)[None]
    q = pal[:, bones4]                                # [8, V, 4]
    b = np.sum(q * weights[None], axis=-1)            # [8, V]
    n = np.linalg.norm(b[:4], axis=0)
    b = b / np.maximum(n, 1e-9)[None]
    qr = b[:4].T                                      # [V, 4]
    qd = b[4:].T
    t = 2.0 * hm.quat_mul(qd, hm.quat_conjugate(qr))[:, :3]
    return hm.quat_rotate(qr, np.asarray(points, np.float32)) + t


def _particle_outputs(est, em):
    """(positions [cap,3], colors [cap,3] | None, sizes [cap] | None) from an
    EmitterState's OUT rows by name (i_position/i_color/i_scale in the
    shipped .pat scripts; falls back to the first 3-wide output for
    position)."""
    outs = getattr(em, "outs", None)
    if not outs:
        return None, None, None
    rows = {}
    row = 0
    first3 = None
    for name, w in outs:
        rows[name.lower()] = (row, w)
        if w >= 3 and first3 is None:
            first3 = row
        row += w
    pos_row = first3
    for name, (r, w) in rows.items():
        if "pos" in name and w >= 3:
            pos_row = r
    if pos_row is None:
        return None, None, None
    arr = np.asarray(est.outs)
    pos = arr[pos_row:pos_row + 3].T.astype(np.float32)
    col = None
    for name, (r, w) in rows.items():
        if "color" in name and w >= 3:
            col = np.clip(arr[r:r + 3].T.astype(np.float32), 0.0, 4.0)
            if w >= 4:
                col = col * np.clip(arr[r + 3][:, None], 0.0, 1.0)
            break
    size = None
    for name, (r, w) in rows.items():
        if ("scale" in name or "size" in name) and w == 1:
            size = np.abs(arr[r].astype(np.float32))
            break
    return pos, col, size


def _project_np(points, cam_pos, cam_rot, fov_y, aspect, width, height):
    inv = hm.quat_conjugate(cam_rot)
    local = hm.quat_rotate(np.broadcast_to(inv, (len(points), 4)),
                           points - cam_pos)
    depth = -local[:, 2]
    f = 1.0 / np.tan(fov_y * 0.5)
    safe = np.maximum(depth, 1e-3)
    sx = ((local[:, 0] * f / aspect) / safe * 0.5 + 0.5) * width
    sy = (1.0 - ((local[:, 1] * f) / safe * 0.5 + 0.5)) * height
    return np.stack([sx, sy], -1), depth


def render_frame(runner, path: Optional[str] = None, cam_slot: int = 0,
                 width: int = 480, height: int = 270,
                 backend: Optional[SoftwareGpuBackend] = None,
                 max_instances: int = 2048, debug_nav: bool = False):
    """Record the frame's DrawStream (with whatever RenderPlugins are
    registered) and replay it through the software backend — the headless
    "present". Returns (uint8 image, backend); saves a PNG when `path`.
    Pass the previous frame's backend to keep TAA history."""
    from lumixengine_tpu.renderer.draw_stream import record_frame

    rmod = runner.world.modules["renderer"]
    view = runner.prepare_view(cam_slot)
    prev_hist = backend.history if backend is not None else None
    be = SoftwareGpuBackend(runner, cam_slot, width, height, max_instances)
    be.history = prev_hist
    stream = record_frame(view, runner.state.modules["renderer"], rmod)
    stream.replay(be)
    if debug_nav:
        be.draw_nav_debug()
    img = be.finish()
    if path:
        from PIL import Image

        Image.fromarray(img).save(path)
    return img, be
