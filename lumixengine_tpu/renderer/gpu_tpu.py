"""TPU-native present path (≙ /root/reference/src/renderer/gpu_dx12.cpp — the
reference's hardware GPU backend, 3263 LoC of D3D12 swapchain/PSO/barrier
management). The software backend (gpu_soft.py + raster.py) is the diagnostic
host rasterizer; THIS is the performance present: the culled View's triangle
soup is rasterized ON the TPU as one jitted tile-binned pipeline, so a
headless deployment never moves geometry to the host — only the final
framebuffer (and the engine state it reads is already device-resident).

Design (TPU-first — a vector-machine rasterizer, not a GPU translation):

 * **static soup** — the scene's meshes are baked once per topology into an
   instance-expanded triangle soup (every (instance, triangle) pair gets a
   static slot), so per-frame work is pure fixed-shape device math: no
   data-dependent shapes, everything jits once.
 * **vertex stage** — all expanded vertices transform + project in one
   batched op (instance SRT gathered per vertex).
 * **binning** — each triangle's screen bbox claims up to WINDOW×WINDOW
   tile slots; (tile, tri) keys are argsorted and per-tile slot lists read
   off contiguously (the same sorted-compaction trick as the physics slots
   pipeline, ops/physics_slots.py). Triangles larger than the window take a
   brute-force "large" path over every tile (top-L by screen area) — a
   bounded two-path split instead of variable-rate hardware rasterization.
 * **fill** — each 32×32-pixel tile z-tests its K binned + L large
   triangles with edge-function barycentrics over the whole pixel block at
   once; the block is laid out as an (8,128) f32 VPU tile. A lax.fori_loop
   over K-chunks keeps the live set VMEM-sized.
 * **honesty counter** — like the physics certificates, the raster returns
   `overflow` = number of (tile, tri) pairs that didn't fit the K slot cap;
   a nonzero overflow means the image may be incomplete.

Shading matches raster.py (flat Lambert |n·L|, palette by model id, both
faces lit, bg 18) so the host and TPU rasterizers are cross-checkable.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from lumixengine_tpu.core import math as dm
from lumixengine_tpu.renderer.raster import _mesh_of, _PALETTE, _LIGHT

TILE = 32          # spatial tile edge (pixels); 32x32 = 1024 px = (8,128) VPU tile


class SoupStatics(NamedTuple):
    """Host-baked instance-expanded soup (static per scene topology)."""

    vpos: np.ndarray     # f32 [VE,3] model-local positions, instance-expanded
    vinst: np.ndarray    # int32 [VE] owning instance (store slot)
    tri: np.ndarray      # int32 [E,3] indices into the expanded vertex arrays
    tinst: np.ndarray    # int32 [E] owning instance
    tcolor: np.ndarray   # f32 [E,3] base color (palette by model id)
    num_instances: int
    vbone4: np.ndarray   # int32 [VE,4] skin bone ids (0 when unskinned)
    vweight: np.ndarray  # f32 [VE,4] skin weights (0 when unskinned)
    vskin_col: np.ndarray  # int32 [VE] animation palette pool column, -1=rigid


def terrain_mesh(tr: dict, max_grid: int = 128):
    """Heightfield → entity-local triangle mesh (decimated to ≤max_grid²
    vertices — same quad-split as the software path's draw_terrain, at a
    higher static budget since it bakes once per topology)."""
    hmap = tr["heights"]
    hgt, wid = hmap.shape
    step = max(1, int(np.ceil(max(hgt, wid) / max_grid)))
    sub = hmap[::step, ::step]
    sh, sw = sub.shape
    if sh < 2 or sw < 2:
        return None
    xs = np.arange(sw, dtype=np.float32) * (tr["xz_scale"] * step)
    zs = np.arange(sh, dtype=np.float32) * (tr["xz_scale"] * step)
    gx, gz = np.meshgrid(xs, zs)
    verts = np.stack([gx, sub * tr["y_scale"], gz], -1).reshape(-1, 3)
    idx = np.arange(sh * sw).reshape(sh, sw)
    q00, q10 = idx[:-1, :-1].ravel(), idx[:-1, 1:].ravel()
    q01, q11 = idx[1:, :-1].ravel(), idx[1:, 1:].ravel()
    tris = np.concatenate([np.stack([q00, q10, q11], -1),
                           np.stack([q00, q11, q01], -1)]).astype(np.int32)
    return verts.astype(np.float32), tris


def grass_mesh(reg, tid: int, tr: dict, max_blades: int = 512):
    """Grass blades for one terrain as a single entity-local triangle mesh
    (terrain.scatter_grass, same seeds/density/slope rules as
    gpu_soft._draw_grass)."""
    import jax

    from lumixengine_tpu.renderer import terrain as T

    bank = reg.bank
    hgt, wid = tr["heights"].shape
    ext = (wid * tr["xz_scale"], hgt * tr["xz_scale"])
    verts, tris, base = [], [], 0
    for gi, gt in enumerate(tr["grass_types"]):
        pos, yaw, mask = T.scatter_grass(
            bank, tid, float(gt.get("density", 0.2)), ext,
            jax.random.PRNGKey(17 + gi), max_instances=max_blades)
        sel = np.asarray(mask)
        p = np.asarray(pos).T[sel][:max_blades]
        if not len(p):
            continue
        h = float(gt.get("height", 0.5))
        r = 0.08
        n = len(p)
        verts += [p + [-r, 0, 0], p + [r, 0, 0], p + [0, h, 0]]
        tris.append(np.stack([np.arange(n), np.arange(n) + n,
                              np.arange(n) + 2 * n], -1).astype(np.int32)
                    + base)
        base += 3 * n
    if not tris:
        return None
    return np.concatenate(verts).astype(np.float32), np.concatenate(tris)


def bake_soup(statics, registry, max_tris_per_model: int = 200_000,
              materials=None, extra_meshes=None,
              skin_cols=None) -> SoupStatics:
    """Expand (instance, model mesh) into one static soup (host, per topology).

    Models without triangle data fall back to raster.py's unit octahedron
    scaled by bounding radius, so every visible instance draws — same rule
    as the host rasterizer. Per-mesh MATERIAL albedo (color_r/g/b uniforms,
    ≙ material.cpp u_color) AND the material's first texture sampled at
    each triangle's UV centroid bake into the triangle colors when
    `materials` is given — same rule as the host path
    (raster.model_triangle_colors; bake-time centroid sampling keeps the
    hot raster gather-free, the TPU-honest texturing)."""
    from lumixengine_tpu.renderer.raster import model_triangle_colors

    vpos, vinst, tris, tinst, tcol = [], [], [], [], []
    vb4, vw4, vcol = [], [], []

    def _skin_rows(n_v, mid, k):
        """Per-vertex skin data for instance k's n_v expanded vertices —
        real bone4/weights + the instance's palette pool column for models
        the animation module poses, rigid (-1) otherwise."""
        col = -1 if not skin_cols else int(skin_cols.get(
            int(statics.mi_slots[k]), -1))
        m = registry.get(mid) if mid >= 0 else None
        if (col >= 0 and m is not None
                and getattr(m, "vertex_bones4", None) is not None
                and m.vertex_weights is not None
                and len(m.vertex_bones4) == n_v):
            vb4.append(np.asarray(m.vertex_bones4, np.int32))
            vw4.append(np.asarray(m.vertex_weights, np.float32))
            vcol.append(np.full(n_v, col, np.int32))
        else:
            vb4.append(np.zeros((n_v, 4), np.int32))
            vw4.append(np.zeros((n_v, 4), np.float32))
            vcol.append(np.full(n_v, -1, np.int32))

    voff = 0
    for k in range(len(statics.mi_model)):
        if not statics.mi_mask[k]:
            continue
        mid = int(statics.mi_model[k])
        verts, t = _mesh_of(mid, registry)
        if len(t) > max_tris_per_model:
            t = t[:max_tris_per_model]
        vpos.append(np.asarray(verts, np.float32))
        vinst.append(np.full(len(verts), k, np.int32))
        tris.append(np.asarray(t, np.int32) + voff)
        tinst.append(np.full(len(t), k, np.int32))
        tcol.append(model_triangle_colors(mid, registry,
                                          materials)[: len(t)])
        _skin_rows(len(verts), mid, k)
        voff += len(verts)
    # extra static meshes (terrain heightfields): instance ids continue
    # past the model-instance store so callers append their entity slots
    # and visibility flags after the mi_* arrays
    n_extra = 0
    for verts, t, color in (extra_meshes or []):
        k = len(statics.mi_model) + n_extra
        vpos.append(np.asarray(verts, np.float32))
        vinst.append(np.full(len(verts), k, np.int32))
        tris.append(np.asarray(t, np.int32) + voff)
        tinst.append(np.full(len(t), k, np.int32))
        tcol.append(np.tile(np.asarray(color, np.float32), (len(t), 1)))
        vb4.append(np.zeros((len(verts), 4), np.int32))
        vw4.append(np.zeros((len(verts), 4), np.float32))
        vcol.append(np.full(len(verts), -1, np.int32))
        voff += len(verts)
        n_extra += 1
    if not tris:
        vpos = [np.zeros((3, 3), np.float32)]
        vinst = [np.zeros(3, np.int32)]
        tris = [np.zeros((1, 3), np.int32)]
        tinst = [np.full(1, -1, np.int32)]
        tcol = [np.zeros((1, 3), np.float32)]
        vb4 = [np.zeros((3, 4), np.int32)]
        vw4 = [np.zeros((3, 4), np.float32)]
        vcol = [np.full(3, -1, np.int32)]
    return SoupStatics(
        vpos=np.concatenate(vpos),
        vinst=np.concatenate(vinst),
        tri=np.concatenate(tris),
        tinst=np.concatenate(tinst),
        tcolor=np.concatenate(tcol).astype(np.float32),
        num_instances=len(statics.mi_model) + n_extra,
        vbone4=np.concatenate(vb4),
        vweight=np.concatenate(vw4),
        vskin_col=np.concatenate(vcol),
    )


def make_raster(soup: SoupStatics, width: int, height: int,
                k_slots: int = 192, window: int = 4, large_cap: int = 256,
                chunk: int = 8):
    """Build the jitted raster(ipos, irot, iscale, visible, cam_pos, cam_rot,
    fov) -> (rgb u8 [H,W,3], depth f32 [H,W], overflow i32) for one soup.

    width/height are rounded up to the 32-px tile grid internally and the
    image cropped on return, so callers keep arbitrary sizes."""
    W = int(np.ceil(width / TILE)) * TILE
    H = int(np.ceil(height / TILE)) * TILE
    tx_n, ty_n = W // TILE, H // TILE
    nt = tx_n * ty_n
    if nt >= 8192:  # (tile<<18 | depth) bin keys must fit int32
        raise ValueError(f"framebuffer {width}x{height} = {nt} tiles; "
                         "the int32 bin-key space caps at 8191 tiles (~2.7K x 1.5K)")
    E = len(soup.tri)

    # static per-tile pixel centers, tile-major [NT, 1024]
    ty, tx = np.divmod(np.arange(nt), tx_n)
    py0 = (ty * TILE)[:, None] + (np.arange(TILE * TILE) // TILE)[None, :]
    px0 = (tx * TILE)[:, None] + (np.arange(TILE * TILE) % TILE)[None, :]
    px_c = jnp.asarray(px0.astype(np.float32) + 0.5)
    py_c = jnp.asarray(py0.astype(np.float32) + 0.5)

    tri = jnp.asarray(soup.tri)
    tinst = jnp.asarray(soup.tinst)
    tcolor = jnp.asarray(soup.tcolor.T.copy())      # [3,E] SoA
    vpos = jnp.asarray(soup.vpos.T.copy())          # [3,VE] SoA
    vinst = jnp.asarray(soup.vinst)
    f_cam = 1.0
    aspect = width / height
    n_keys = E * window * window
    # skinned vertices: DQS on the animation palette happens in the VERTEX
    # stage (per-vertex bone gathers ONCE per frame — never per pixel),
    # so characters animate on the device present
    # (≙ gpu_dx12's skinning vertex shader over computeSkeletonDualQuats)
    has_skin = bool(np.any(soup.vskin_col >= 0))
    if has_skin:
        vb = jnp.asarray(soup.vbone4)                       # [VE,4]
        vw = jnp.asarray(soup.vweight)                      # [VE,4]
        vc = jnp.asarray(np.maximum(soup.vskin_col, 0))     # [VE]
        vmask = jnp.asarray(soup.vskin_col >= 0)

    def _posed(palette):
        """Rest → posed local positions [3,VE] (hemisphere-coherent DQS,
        same convention as ops/skinning.blend_palette)."""
        dqs = palette[:, vb, vc[:, None]]                   # [8,VE,4]
        ref = dqs[:4, :, 0:1]
        d = jnp.sum(dqs[:4] * ref, axis=0)                  # [VE,4]
        w = vw * jnp.where(d < 0.0, -1.0, 1.0)
        dq = jnp.einsum("cvk,vk->cv", dqs, w,
                        preferred_element_type=jnp.float32)
        dq = dm.dual_quat_normalize(dq, axis=0)
        posed = dm.dual_quat_transform(dq, vpos, axis=0)
        return jnp.where(vmask[None], posed, vpos)

    def raster(ipos, irot, iscale, visible, cam_pos, cam_rot, fov,
               palette=None):
        # -- vertex stage: world → camera → screen (matches raster.py) -------
        local_v = vpos if (palette is None or not has_skin) \
            else _posed(palette)
        scale_v = jnp.take(iscale, vinst, axis=-1)          # [3,VE]
        rot_v = jnp.take(irot, vinst, axis=-1)              # [4,VE]
        pos_v = jnp.take(ipos, vinst, axis=-1)              # [3,VE]
        wv = dm.quat_rotate(rot_v, local_v * scale_v, axis=0) + pos_v
        inv = dm.quat_conjugate(cam_rot, axis=0)
        local = dm.quat_rotate(inv[:, None], wv - cam_pos[:, None], axis=0)
        depth = -local[2]
        safe = jnp.maximum(depth, 1e-3)
        f = 1.0 / jnp.tan(fov * 0.5)
        sx = ((local[0] * f / aspect) / safe * 0.5 + 0.5) * width
        sy = (1.0 - ((local[1] * f) / safe * 0.5 + 0.5)) * height

        # -- triangle setup ---------------------------------------------------
        i0, i1, i2 = tri[:, 0], tri[:, 1], tri[:, 2]
        ax, ay, az = sx[i0], sy[i0], depth[i0]
        bx, by, bz = sx[i1], sy[i1], depth[i1]
        cx, cy, cz = sx[i2], sy[i2], depth[i2]
        area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        vis_t = jnp.take(visible, jnp.maximum(tinst, 0)) & (tinst >= 0)
        keep = (vis_t & (az > 1e-3) & (bz > 1e-3) & (cz > 1e-3)
                & (jnp.abs(area2) > 1e-9))
        # flat Lambert from the world-space face normal (both faces lit)
        e1w = jnp.stack([wv[d][i1] - wv[d][i0] for d in range(3)])
        e2w = jnp.stack([wv[d][i2] - wv[d][i0] for d in range(3)])
        nx = e1w[1] * e2w[2] - e1w[2] * e2w[1]
        ny = e1w[2] * e2w[0] - e1w[0] * e2w[2]
        nz = e1w[0] * e2w[1] - e1w[1] * e2w[0]
        nlen = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        keep &= nlen > 1e-9
        ndl = jnp.abs(nx * _LIGHT[0] + ny * _LIGHT[1] + nz * _LIGHT[2]) \
            / jnp.maximum(nlen, 1e-9)
        shade = 0.35 + 0.65 * ndl
        col = tcolor * shade                                  # [3,E]

        # screen bbox in tile coords
        minx = jnp.minimum(jnp.minimum(ax, bx), cx)
        maxx = jnp.maximum(jnp.maximum(ax, bx), cx)
        miny = jnp.minimum(jnp.minimum(ay, by), cy)
        maxy = jnp.maximum(jnp.maximum(ay, by), cy)
        keep &= (maxx >= 0) & (minx < width) & (maxy >= 0) & (miny < height)
        tx0 = jnp.clip(jnp.floor(minx / TILE), 0, tx_n - 1).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor(maxx / TILE), 0, tx_n - 1).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor(miny / TILE), 0, ty_n - 1).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor(maxy / TILE), 0, ty_n - 1).astype(jnp.int32)
        spanx, spany = tx1 - tx0 + 1, ty1 - ty0 + 1
        small = keep & (spanx <= window) & (spany <= window)
        large = keep & ~small

        # -- binning: (tile, depth, tri) keys, sorted, read off contiguously -
        # depth rides the key's low 18 bits so each tile's slot list comes
        # out NEAR-TO-FAR: if a tile overflows its k_slots cap, the dropped
        # triangles are the scene's farthest (usually occluded) ones — and
        # the overflow counter still reports the drop honestly.
        s = jnp.arange(window * window, dtype=jnp.int32)
        sx_off, sy_off = s % window, s // window              # [S]
        cand_tx = tx0[:, None] + sx_off[None, :]
        cand_ty = ty0[:, None] + sy_off[None, :]
        cand_ok = (small[:, None] & (cand_tx <= tx1[:, None])
                   & (cand_ty <= ty1[:, None]))
        minz = jnp.minimum(jnp.minimum(az, bz), cz)
        depth_q = (minz / (minz + 32.0) * 262143.0).astype(jnp.int32)  # 18 bit
        tile_id = cand_ty * tx_n + cand_tx
        key = jnp.where(cand_ok,
                        (tile_id << 18) | depth_q[:, None],
                        jnp.int32(nt) << 18).reshape(-1)
        order = jnp.argsort(key)                              # [E*S]
        skey = jnp.take(key, order)
        stri = jnp.take(
            jnp.broadcast_to(jnp.arange(E, dtype=jnp.int32)[:, None],
                             (E, window * window)).reshape(-1), order)
        bounds = jnp.arange(nt + 1, dtype=jnp.int32) << 18
        starts = jnp.searchsorted(skey, bounds[:-1])
        ends = jnp.searchsorted(skey, bounds[1:])
        counts = ends - starts                                # [NT]
        # per-tile slot list [NT, KS] (tri index or -1)
        kk = jnp.arange(k_slots, dtype=jnp.int32)
        slot_pos = jnp.minimum(starts[:, None] + kk[None, :], n_keys - 1)
        slot_tri = jnp.where(kk[None, :] < jnp.minimum(counts, k_slots)[:, None],
                             jnp.take(stri, slot_pos), -1)    # [NT,KS]

        # large triangles: top-L by |area|, every tile tests them.
        # L pads up to a chunk multiple so the fill's dynamic_slice never
        # reads past the slot table (tiny scenes: E < chunk)
        big_score = jnp.where(large, jnp.abs(area2), -1.0)
        L = min(large_cap, E)
        L_pad = ((L + chunk - 1) // chunk) * chunk
        _, big_idx = jax.lax.top_k(big_score, L)
        big_tri = jnp.where(jnp.take(big_score, big_idx) > 0.0,
                            big_idx.astype(jnp.int32), -1)    # [L]
        big_tri = jnp.concatenate(
            [big_tri, jnp.full((L_pad - L,), -1, jnp.int32)])
        large_dropped = jnp.maximum(
            jnp.sum(large.astype(jnp.int32)) - large_cap, 0)

        # -- fill: z-test chunks of triangles over each tile's pixel block ---
        # All per-triangle setup is gathered into slot-list layout ONCE per
        # frame ([NT,KS] / [L] arrays); the chunked fill then runs on pure
        # vector ops. The first cut gathered per chunk AND selected colors
        # with a per-PIXEL gather (col[wtri]) — ~160M scalar-core gathers a
        # frame, 1.7s at 720p on v5e. Gathers on TPU belong outside the hot
        # loop; selection inside it is unrolled jnp.where (one-hot style).
        inv_za, inv_zb, inv_zc = 1.0 / az, 1.0 / bz, 1.0 / cz

        def slot_layout(idx):           # gather setup for a slot table
            t = jnp.maximum(idx, 0)
            ok = (idx >= 0).astype(jnp.float32)
            # pack 12 per-tri scalars as one leading axis for one gather op
            flat = jnp.stack([ax, ay, bx, by, cx, cy, area2,
                              inv_za, inv_zb, inv_zc], 0)     # [10,E]
            setup = flat[:, t]                                # [10,...]
            cols = col[:, t]                                  # [3,...]
            return setup, cols, ok

        def fill_chunks(carry, setup, cols, ok, n_chunks, kc):
            # setup [10, NT?, KS], cols [3, NT?, KS], ok [NT?, KS] —
            # NT? is nt for the binned path, broadcastable 1 for the large
            # path. Scan chunks of kc slots; inner kc unrolled as selects.
            px = px_c[:, None, :]                             # [NT,1,PIX]
            py = py_c[:, None, :]

            def body(i, c):
                zbuf, r, g, b = c
                s = jax.lax.dynamic_slice_in_dim(setup, i * kc, kc, axis=2)
                cc = jax.lax.dynamic_slice_in_dim(cols, i * kc, kc, axis=2)
                okc = jax.lax.dynamic_slice_in_dim(ok, i * kc, kc, axis=1)
                gax, gay, gbx, gby, gcx, gcy, ga2, iza, izb, izc = s
                w0 = ((gby - gcy)[..., None] * (px - gcx[..., None])
                      + (gcx - gbx)[..., None] * (py - gcy[..., None])) \
                    / ga2[..., None]
                w1 = ((gcy - gay)[..., None] * (px - gax[..., None])
                      + (gax - gcx)[..., None] * (py - gay[..., None])) \
                    / ga2[..., None]
                w2 = 1.0 - w0 - w1
                inside = ((w0 >= 0) & (w1 >= 0) & (w2 >= 0)
                          & (okc[..., None] > 0))
                zinv = (w0 * iza[..., None] + w1 * izb[..., None]
                        + w2 * izc[..., None])
                d = jnp.where(inside & (zinv > 1e-9), 1.0 / zinv, jnp.inf)
                # kc-unrolled z-test/select: pure vector selects, no argmin/
                # take_along_axis lowering to per-pixel gathers
                for j in range(kc):
                    dj = d[:, j]                              # [NT,PIX]
                    upd = dj < zbuf
                    zbuf = jnp.where(upd, dj, zbuf)
                    r = jnp.where(upd, cc[0, :, j, None], r)
                    g = jnp.where(upd, cc[1, :, j, None], g)
                    b = jnp.where(upd, cc[2, :, j, None], b)
                return (zbuf, r, g, b)

            return jax.lax.fori_loop(0, n_chunks, body, carry)

        pix = TILE * TILE
        carry = (jnp.full((nt, pix), jnp.inf, jnp.float32),
                 jnp.full((nt, pix), 18.0, jnp.float32),
                 jnp.full((nt, pix), 18.0, jnp.float32),
                 jnp.full((nt, pix), 18.0, jnp.float32))
        setup, cols, ok = slot_layout(slot_tri)               # [·,NT,KS]
        carry = fill_chunks(carry, setup, cols, ok,
                            (k_slots + chunk - 1) // chunk, chunk)
        # large path: every tile tests the same L triangles (broadcast axis)
        setup_l, cols_l, ok_l = slot_layout(big_tri[None, :])  # [·,1,L]
        carry = fill_chunks(carry, setup_l, cols_l, ok_l,
                            (len(big_tri) + chunk - 1) // chunk, chunk)
        zbuf, r, g, b = carry

        # -- occlusion-sound completeness certificate -------------------------
        # Slot lists are NEAR-TO-FAR, so if a tile overflowed its cap, every
        # dropped triangle starts at the first-dropped entry's depth or
        # farther. The drop can only matter if that depth beats something the
        # tile actually shows: incomplete ⇔ count > K AND q(first_dropped) ≤
        # q(max filled z in tile) (a tile with any background pixel counts
        # as z = ∞ and always fails on drop). This mirrors hierarchical-z
        # rejection — and keeps the counter honest without unbounded slots.
        zmax_t = jnp.max(zbuf, axis=1)                        # [NT]
        zmax_q = jnp.where(jnp.isfinite(zmax_t),
                           (zmax_t / (zmax_t + 32.0) * 262143.0)
                           .astype(jnp.int32), jnp.int32(262144))
        first_drop = jnp.where(
            counts > k_slots,
            jnp.take(skey, jnp.minimum(starts + k_slots, n_keys - 1))
            & jnp.int32(0x3FFFF),
            jnp.int32(262145))
        incomplete = (counts > k_slots) & (first_drop <= zmax_q)
        overflow = jnp.sum(incomplete.astype(jnp.int32)) + large_dropped

        # -- untile [NT,PIX] → [H,W], crop, pack ------------------------------
        def untile(x):
            x = x.reshape(ty_n, tx_n, TILE, TILE)
            return x.transpose(0, 2, 1, 3).reshape(H, W)[:height, :width]

        rgb = jnp.stack([untile(r), untile(g), untile(b)], axis=-1)
        rgb = jnp.clip(rgb, 0, 255).astype(jnp.uint8)
        return rgb, untile(zbuf), overflow

    return jax.jit(raster)


def _decal_rows(rmod, world):
    """Static decal rows for the device decal pass: (entity slots [D],
    local offsets [3,D], local rots [4,D], half extents [D,3], tints
    [D,3]). Curve decals sample their bezier into OBB segments exactly like
    the software path (gpu_soft._run_decals)."""
    from lumixengine_tpu.renderer.raster import _PALETTE

    slots, loc, lrot, he, tint = [], [], [], [], []
    for slot in range(rmod.decals.capacity):
        e = int(rmod.decals.entity[slot])
        if e < 0:
            continue
        slots.append(world.slot(e))
        loc.append(np.zeros(3, np.float32))
        lrot.append(np.array([0, 0, 0, 1], np.float32))
        he.append(np.asarray(rmod.decals.data["half_extents"][slot]))
        mat = int(rmod.decals.data["material"][slot])
        tint.append(_PALETTE[mat % len(_PALETTE)] / 255.0)
    for slot in range(rmod.curve_decals.capacity):
        e = int(rmod.curve_decals.entity[slot])
        if e < 0:
            continue
        bhe = np.asarray(rmod.curve_decals.data["half_extents"][slot])
        p0 = np.asarray(rmod.curve_decals.data["bezier_p0"][slot])
        p2 = np.asarray(rmod.curve_decals.data["bezier_p2"][slot])
        mat = int(rmod.curve_decals.data["material"][slot])
        t = _PALETTE[mat % len(_PALETTE)] / 255.0
        nseg = 8
        ts = np.linspace(0.0, 1.0, nseg + 1)
        bz = ((1 - ts) ** 2)[:, None] * p0[None] \
            + (ts ** 2)[:, None] * p2[None]
        for i in range(nseg):
            a, b = bz[i], bz[i + 1]
            mid = (a + b) * 0.5
            d = b - a
            ln = float(np.hypot(d[0], d[1]))
            yaw = float(np.arctan2(d[0], d[1]))
            slots.append(world.slot(e))
            loc.append(np.array([mid[0], 0.0, mid[1]], np.float32))
            lrot.append(np.array([0.0, np.sin(yaw / 2), 0.0,
                                  np.cos(yaw / 2)], np.float32))
            he.append(np.array([bhe[0], bhe[1], ln / 2 + 0.05], np.float32))
            tint.append(t)
    if not slots:
        return None
    import jax.numpy as _jnp

    return (_jnp.asarray(np.asarray(slots, np.int64)),
            _jnp.asarray(np.stack(loc).T), _jnp.asarray(np.stack(lrot).T),
            _jnp.asarray(np.stack(he)), _jnp.asarray(np.stack(tint)))


def _particle_rows(rmod):
    """Host-side OUT-channel row map per (emitter entity, sub-emitter):
    (pos_row, col_row, col_width, size_row) — same name rules as the
    software splat (gpu_soft._particle_outputs)."""
    out = []
    for ent, (_eid, ps) in dict(rmod.particle_emitters).items():
        for ekey, em in getattr(ps, "emitters", {}).items():
            rows, row, first3 = {}, 0, None
            for name, w in (getattr(em, "outs", None) or []):
                rows[name.lower()] = (row, w)
                if w >= 3 and first3 is None:
                    first3 = row
                row += w
            pos_row = first3
            for name, (r, w) in rows.items():
                if "pos" in name and w >= 3:
                    pos_row = r
            if pos_row is None:
                continue
            col_row, col_w, size_row = -1, 0, -1
            for name, (r, w) in rows.items():
                if "color" in name and w >= 3 and col_row < 0:
                    col_row, col_w = r, w
                if ("scale" in name or "size" in name) and w == 1 \
                        and size_row < 0:
                    size_row = r
            out.append((ent, ekey, pos_row, col_row, col_w, size_row))
    return out


def splat_particles(rgb_f, zbuf, est, rows, cam_pos, cam_rot, fov,
                    width: int, height: int):
    """Additive point splats with z-test + depth write, on device — the
    jnp mirror of the software backend's draw_particles (gpu_soft.py:225):
    same 3×3 ring rule, same 0.8 additive weight, splats own their depth.
    Cost: O(capacity) scatters once per frame (bounded by the emitter's
    static cap — fine at scene scale; the 1M stress config never presents).
    rgb_f is float 0-255 [H,W,3]; returns (rgb_f', zbuf')."""
    pos_row, col_row, col_w, size_row = rows
    pos = est.outs[pos_row:pos_row + 3]                  # [3, cap]
    alive = est.alive
    inv = dm.quat_conjugate(cam_rot, axis=0)
    local = dm.quat_rotate(inv[:, None], pos - cam_pos[:, None], axis=0)
    depth = -local[2]
    safe = jnp.maximum(depth, 1e-3)
    f = 1.0 / jnp.tan(fov * 0.5)
    aspect = width / height
    sx = ((local[0] * f / aspect) / safe * 0.5 + 0.5) * width
    sy = (1.0 - ((local[1] * f) / safe * 0.5 + 0.5)) * height
    ok = (alive & (depth > 1e-3) & (sx >= 0) & (sx < width)
          & (sy >= 0) & (sy < height))
    xi = jnp.clip(sx.astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(sy.astype(jnp.int32), 0, height - 1)
    if col_row >= 0:
        col = jnp.clip(est.outs[col_row:col_row + 3], 0.0, 4.0)
        if col_w >= 4:
            col = col * jnp.clip(est.outs[col_row + 3][None], 0.0, 1.0)
        col = col * 255.0
    else:
        col = jnp.full((3,) + alive.shape, 80.0, jnp.float32)
    sc = (est.outs[size_row] if size_row >= 0
          else jnp.full(alive.shape, 0.15, jnp.float32))
    px = jnp.clip(sc * f / safe * height * 0.5, 0.5, 6.0)
    flat_rgb = rgb_f.reshape(-1, 3)
    flat_z = zbuf.reshape(-1)
    lin = yi * width + xi
    vis = ok & (depth < flat_z[lin])
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ring = max(abs(dy), abs(dx))
            sel = vis & ((px > 1.6 * ring) if ring else (px >= 0.0))
            y2 = jnp.clip(yi + dy, 0, height - 1)
            x2 = jnp.clip(xi + dx, 0, width - 1)
            l2 = y2 * width + x2
            add = jnp.where(sel[None], col * 0.8, 0.0).T    # [cap,3]
            flat_rgb = flat_rgb.at[l2].add(add)
            flat_z = flat_z.at[l2].min(jnp.where(sel, depth, jnp.inf))
    return flat_rgb.reshape(rgb_f.shape), flat_z.reshape(zbuf.shape)


class TpuPresent:
    """Cached TPU present for a Runner: rebakes the soup on topology change,
    reuses the jitted raster across frames (≙ gpu_dx12's PSO/heap reuse)."""

    def __init__(self, width: int = 480, height: int = 270,
                 lights: bool = True, particles: bool = True, **kw):
        self.width, self.height = width, height
        self.kw = kw
        self.lights = lights
        self.particles = particles
        self._raster = None
        self._soup_version = None

    def device_frame(self, runner, cam_slot: int = 0):
        """One jitted device dispatch: instance gathers + raster fused; the
        visibility mask is the step's own cull output (state.mi_visible) so
        presenting adds NO extra cull or host round trips. Returns DEVICE
        arrays (rgb u8 [H,W,3], depth f32 [H,W], overflow i32) — reading
        back `overflow` (4 bytes) is the cheap way to fence a frame through
        the tunnel; fetch rgb only when actually blitting."""
        world = runner.world
        rmod = world.modules["renderer"]
        st = rmod.statics()
        from lumixengine_tpu.renderer.pipeline import resolve_cam_slot
        cam_slot = resolve_cam_slot(st, cam_slot)
        ver = (world.topology_version, cam_slot)
        if self._raster is None or self._soup_version != ver:
            # terrain heightfields bake into the soup as extra static
            # instances (entity-local grid mesh, terrain_mesh) — the TPU
            # present draws the same ground the software path does. Bakes
            # per topology; live sculpt preview stays the soft path's job.
            extra, extra_slots = [], []
            treg = getattr(rmod.system, "terrains", None)
            tstore = getattr(rmod, "terrains", None)
            if treg is not None and tstore is not None:
                ents = np.asarray(tstore.entity)
                tids = np.asarray(tstore.data["terrain"])
                for e, tid in zip(ents, tids):
                    if e < 0 or tid < 0:
                        continue
                    try:
                        tm = terrain_mesh(treg.get(int(tid)))
                    except (KeyError, IndexError):
                        continue
                    if tm is None:
                        continue
                    extra.append((tm[0], tm[1],
                                  np.array([89, 140, 79], np.float32)))
                    extra_slots.append(world.slot(int(e)))
                    # grass types: seeded scatter → one static blade-
                    # triangle mesh in terrain-local space (same scatter +
                    # color as the software path's _draw_grass; static per
                    # topology since the scatter is seed-deterministic)
                    tr = treg.get(int(tid))
                    if tr.get("grass_types"):
                        gm = grass_mesh(treg, int(tid), tr)
                        if gm is not None:
                            extra.append((gm[0], gm[1],
                                          np.array([96, 168, 72],
                                                   np.float32)))
                            extra_slots.append(world.slot(int(e)))
            # InstancedModel chunks: every sub-instance's mesh pre-
            # transforms into OWNER-entity-local space at bake (the blob's
            # transforms are owner-relative, render_module.py), so the
            # whole chunk rides one soup instance and follows the live
            # owner transform (≙ encodeInstancedModels' chunk draw)
            from lumixengine_tpu.core import host_math as hm
            from lumixengine_tpu.renderer.raster import model_base_color

            for ent, im in getattr(rmod, "instanced_models", {}).items():
                mid = int(im["model"])
                verts, t = _mesh_of(mid, rmod.system.models)
                n_sub = len(im["pos"])
                if n_sub == 0 or len(t) == 0:
                    continue
                if n_sub * len(t) > 200_000:     # static soup budget
                    n_sub = max(200_000 // len(t), 1)
                V = len(verts)
                vv = np.tile(verts, (n_sub, 1)) \
                    * np.repeat(im["scale"][:n_sub], V, axis=0)
                vv = hm.quat_rotate(np.repeat(im["rot"][:n_sub], V, axis=0),
                                    vv) + np.repeat(im["pos"][:n_sub], V,
                                                    axis=0)
                tt = (np.tile(t, (n_sub, 1))
                      + (np.repeat(np.arange(n_sub), len(t)) * V)[:, None]
                      ).astype(np.int32)
                extra.append((vv.astype(np.float32), tt,
                              model_base_color(mid, rmod.system.models,
                                               rmod.system.materials)))
                extra_slots.append(world.slot(int(ent)))
            # procedural geometry: entity-local triangle soups (consecutive
            # triples, ≙ the software path's _draw_procedural fill)
            for ent, pg in getattr(rmod, "procedural_geometries",
                                   {}).items():
                verts = np.asarray(pg.get("vertices", ()), np.float32)
                n = (len(verts) // 3) * 3
                if n == 0:
                    continue
                extra.append((verts[:n],
                              np.arange(n, dtype=np.int32).reshape(-1, 3),
                              np.array([176, 122, 161], np.float32)))
                extra_slots.append(world.slot(int(ent)))
            from lumixengine_tpu.renderer.gpu_soft import skin_map

            soup = bake_soup(st, rmod.system.models,
                             materials=rmod.system.materials,
                             extra_meshes=extra,
                             skin_cols=skin_map(world))
            raster = make_raster(soup, self.width, self.height, **self.kw)
            has_skin = bool(np.any(soup.vskin_col >= 0)) \
                and "animation" in world.modules
            eidx = jnp.asarray(np.concatenate(
                [np.maximum(st.mi_slots, 0),
                 np.asarray(extra_slots, np.int64)]).astype(np.int64))
            n_extra = len(extra_slots)
            cam_e = max(int(st.cam_slots[cam_slot]), 0)
            # clustered point lights shade the raster output DEFERRED,
            # on-device, with the SAME pass the software present uses
            # (postprocess.deferred_lights ≙ pipeline.cpp clustered
            # shading) — raster emits albedo+depth, the light pass
            # reconstructs view positions/normals from depth
            has_lights = (self.lights and st.pl_slots.size > 0
                          and bool(np.any(st.pl_mask)))
            prt_rows = _particle_rows(rmod) if self.particles else []
            # decals + curve decals: static (entity slot, local offset,
            # local rot, half extents, tint) rows; poses compose with the
            # LIVE entity transform in-frame, then the same depth-projected
            # OBB pass the software present runs (postprocess.decal_pass)
            dec = _decal_rows(rmod, world)
            le = jnp.asarray(np.maximum(st.pl_slots, 0))
            aspect = self.width / self.height

            @jax.jit
            def frame(state):
                wpos = state.world.pos
                wrot = state.world.rot
                rs = state.modules["renderer"]
                cam_pos, cam_rot = wpos[:, cam_e], wrot[:, cam_e]
                vis = rs.mi_visible
                if n_extra:     # terrain instances are always visible
                    vis = jnp.concatenate(
                        [vis, jnp.ones(n_extra, vis.dtype)])
                pal = (state.modules["animation"].palette
                       if has_skin else None)
                rgb, zbuf, overflow = raster(
                    jnp.take(wpos, eidx, axis=-1),
                    jnp.take(wrot, eidx, axis=-1),
                    jnp.take(state.world.scale, eidx, axis=-1),
                    vis, cam_pos, cam_rot, rs.cam_fov[cam_slot],
                    palette=pal)
                if dec is not None:
                    from lumixengine_tpu.renderer import postprocess as pp

                    slots_d, loc, lrot, he_d, tint_d = dec
                    ep = jnp.take(wpos, slots_d, axis=-1)       # [3,D]
                    er = jnp.take(wrot, slots_d, axis=-1)       # [4,D]
                    dpos = ep + dm.quat_rotate(er, loc, axis=0)
                    drot = dm.quat_mul(er, lrot, axis=0)
                    out = pp.decal_pass(
                        rgb.astype(jnp.float32) / 255.0, zbuf,
                        rs.cam_fov[cam_slot], aspect, cam_pos, cam_rot,
                        dpos.T, drot.T, he_d, tint_d)
                    rgb = jnp.clip(out * 255.0, 0, 255).astype(jnp.uint8)
                if has_lights:
                    from lumixengine_tpu.renderer import clusters as _cls
                    from lumixengine_tpu.renderer import postprocess as pp

                    cl = _cls.fill_clusters(state, rmod, cam_slot=cam_slot,
                                            statics=st)
                    lw = jnp.take(wpos, le, axis=-1)          # [3, L]
                    inv = dm.quat_conjugate(cam_rot, axis=0)
                    lv = dm.quat_rotate(inv[:, None],
                                        lw - cam_pos[:, None], axis=0).T
                    lit = pp.deferred_lights(
                        rgb.astype(jnp.float32) / 255.0, zbuf,
                        rs.cam_fov[cam_slot], aspect, lv,
                        jnp.moveaxis(rs.pl_color, 0, -1), rs.pl_intensity,
                        rs.pl_range, cl.lights, grid=_cls.GRID,
                        near=rs.cam_near[cam_slot],
                        far_cluster=rs.cam_far[cam_slot])
                    rgb = jnp.clip(lit * 255.0, 0, 255).astype(jnp.uint8)
                if prt_rows:
                    # particle splats draw AFTER the light pass: splats own
                    # their depth but have no surface normal, so they must
                    # not feed the depth-reconstructed deferred shading
                    rgb_f = rgb.astype(jnp.float32)
                    for ent, ekey, *rows in prt_rows:
                        est = rs.particles.get(ent, {}).get(ekey)
                        if est is None:
                            continue
                        rgb_f, zbuf = splat_particles(
                            rgb_f, zbuf, est, tuple(rows), cam_pos, cam_rot,
                            rs.cam_fov[cam_slot], self.width, self.height)
                    rgb = jnp.clip(rgb_f, 0, 255).astype(jnp.uint8)
                return rgb, zbuf, overflow

            self._frame = frame
            self._soup_version = ver
            self._raster = raster
        return self._frame(runner.state)

    def __call__(self, runner, cam_slot: int = 0):
        return self.device_frame(runner, cam_slot)
