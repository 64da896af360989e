"""Post-process image passes — the reference's builtin RenderPlugin set
(≙ /root/reference/src/renderer/renderer.cpp:444-470: Atmo, CubemapSky,
TDAO, SSS, FilmGrain, DOF, Bloom, SSAO, TAA; FSR3 upscaler in fsr3.inl).

The reference implements each as an HLSL compute pass dispatched through the
DrawStream against DX12. Here each is a pure JAX image kernel over the
software backend's HDR framebuffer: elementwise math, separable convolutions
and resamples — exactly the shapes XLA tiles well onto the VPU/MXU — jitted
once per framebuffer size and replayed by `gpu_soft.SoftwareGpuBackend` when
it executes the stream's OP_DISPATCH commands.

Conventions: `color` is linear HDR [H, W, 3] f32 (scene scale ~[0, 2]);
`depth` is positive view-space distance [H, W] f32 with `inf`/far meaning
sky. Static shape → one compile per resolution; all effect parameters are
traced scalars so tweaking them never recompiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates


# ---------------------------------------------------------------------------
# geometry helpers


def pixel_view_rays(h: int, w: int, fov_y, aspect):
    """Per-pixel view-space ray through each pixel center as (x/z, y/z) slopes
    — multiply by view depth to reconstruct view position [x, y, -depth]."""
    t = jnp.tan(fov_y * 0.5)
    ys = (0.5 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h) * 2.0 * t
    xs = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 0.5) * 2.0 * t * aspect
    sx = jnp.broadcast_to(xs[None, :], (h, w))
    sy = jnp.broadcast_to(ys[:, None], (h, w))
    return sx, sy


def view_positions(depth, fov_y, aspect):
    """Depth [H,W] → view-space positions [H,W,3] (camera looks down -Z)."""
    h, w = depth.shape
    sx, sy = pixel_view_rays(h, w, fov_y, aspect)
    return jnp.stack([sx * depth, sy * depth, -depth], axis=-1)


def world_rays(cam_rot, fov_y, aspect, h: int, w: int):
    """Unit world-space ray directions [H,W,3] for camera quaternion
    `cam_rot` (x,y,z,w)."""
    sx, sy = pixel_view_rays(h, w, fov_y, aspect)
    d = jnp.stack([sx, sy, -jnp.ones_like(sx)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    x, y, z, qw = cam_rot[0], cam_rot[1], cam_rot[2], cam_rot[3]
    u = jnp.stack([x, y, z])
    t = 2.0 * jnp.cross(jnp.broadcast_to(u, d.shape), d)
    return d + qw * t + jnp.cross(jnp.broadcast_to(u, d.shape), t)


def _project_view(p, fov_y, aspect, h, w):
    """View positions [...,3] → (row, col) pixel coordinates."""
    t = jnp.tan(fov_y * 0.5)
    z = jnp.maximum(-p[..., 2], 1e-4)
    col = (p[..., 0] / (z * t * aspect) * 0.5 + 0.5) * w - 0.5
    row = (0.5 - p[..., 1] / (z * t) * 0.5) * h - 0.5
    return row, col


def _sample(img, row, col):
    """Bilinear sample img [H,W] at fractional (row, col), edge-clamped."""
    return map_coordinates(img, [row, col], order=1, mode="nearest")


# ---------------------------------------------------------------------------
# separable blur / pyramid


def blur5(img):
    """Separable 5-tap binomial blur ([1,4,6,4,1]/16) on [H,W,C] or [H,W]."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0

    def along(x, axis):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (2, 2)
        xp = jnp.pad(x, pads, mode="edge")
        out = jnp.zeros_like(x)
        for i in range(5):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + x.shape[axis])
            out = out + k[i] * xp[tuple(sl)]
        return out

    return along(along(img, 0), 1)


def downsample2(img):
    """2x2 average pool (edge-pads odd sizes)."""
    h, w = img.shape[0], img.shape[1]
    ph, pw = h % 2, w % 2
    if ph or pw:
        pads = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
        img = jnp.pad(img, pads, mode="edge")
        h, w = h + ph, w + pw
    shp = (h // 2, 2, w // 2, 2) + img.shape[2:]
    return jnp.mean(img.reshape(shp), axis=(1, 3))


def upsample_to(img, h: int, w: int):
    return jax.image.resize(img, (h, w) + img.shape[2:], method="bilinear")


# ---------------------------------------------------------------------------
# the plugin passes


def bloom(color, threshold, intensity, levels: int = 3):
    """≙ Bloom plugin: bright-pass → blurred mip chain → additive composite."""
    h, w = color.shape[:2]
    bright = jnp.maximum(color - threshold, 0.0)
    acc = jnp.zeros_like(color)
    level = bright
    for _ in range(levels):
        level = blur5(downsample2(level))
        acc = acc + upsample_to(level, h, w)
    return color + intensity * (acc / levels)


def ssao(depth, fov_y, aspect, radius, strength, taps: int = 8,
         far: float = 1e8):
    """≙ SSAO plugin: scalable ambient obscurance from the depth buffer.
    Screen-space spiral taps, view-space occlusion test against the surface
    normal reconstructed from depth gradients. Returns AO factor [H,W]."""
    h, w = depth.shape
    d = jnp.where(jnp.isfinite(depth), depth, far)
    p = view_positions(d, fov_y, aspect)
    # surface normal from view-position gradients
    dy = jnp.gradient(p, axis=0)
    dx = jnp.gradient(p, axis=1)
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    n = jnp.where(n[..., 2:3] < 0, -n, n)          # face the camera

    rows = jnp.broadcast_to(jnp.arange(h, dtype=jnp.float32)[:, None], (h, w))
    cols = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :], (h, w))
    # screen-space tap radius shrinks with distance (perspective)
    t = jnp.tan(fov_y * 0.5)
    px_r = radius / (2.0 * t) * h / jnp.maximum(d, 1e-3)
    occ = jnp.zeros((h, w))
    golden = 2.399963
    for i in range(taps):
        ang = i * golden
        rr = (i + 1) / taps
        orow = jnp.sin(ang) * rr * px_r
        ocol = jnp.cos(ang) * rr * px_r
        sd = _sample(d, rows + orow, cols + ocol)
        q = view_positions_at(sd, rows + orow, cols + ocol, fov_y, aspect, h, w)
        v = q - p
        vn = jnp.sum(v * n, axis=-1)
        vv = jnp.sum(v * v, axis=-1)
        occ = occ + jnp.maximum(vn - 0.02 * d, 0.0) / (vv + 1e-4)
    ao = jnp.clip(1.0 - strength * occ * (radius / taps), 0.05, 1.0)
    return jnp.where(jnp.isfinite(depth) & (depth < far * 0.99), ao, 1.0)


def view_positions_at(depth, rows, cols, fov_y, aspect, h, w):
    """View positions for arbitrary fractional pixel coords."""
    t = jnp.tan(fov_y * 0.5)
    sx = ((cols + 0.5) / w - 0.5) * 2.0 * t * aspect
    sy = (0.5 - (rows + 0.5) / h) * 2.0 * t
    return jnp.stack([sx * depth, sy * depth, -depth], axis=-1)


def sss_shadow(depth, fov_y, aspect, sun_view, steps: int = 8,
               max_dist=0.5, shadow=0.45, far: float = 1e8):
    """≙ SSS plugin (screen-space contact shadows): short depth-buffer ray
    march from each pixel toward the sun; an intervening closer surface
    shadows the pixel. Returns light factor [H,W] in [shadow, 1]."""
    h, w = depth.shape
    d = jnp.where(jnp.isfinite(depth), depth, far)
    p = view_positions(d, fov_y, aspect)
    sdir = sun_view / jnp.maximum(jnp.linalg.norm(sun_view), 1e-9)
    occluded = jnp.zeros((h, w), bool)
    for i in range(1, steps + 1):
        s = p + sdir * (max_dist * i / steps)
        row, col = _project_view(s, fov_y, aspect, h, w)
        sd = _sample(d, row, col)
        sz = -s[..., 2]
        occluded = occluded | ((sd < sz - 0.02) & (sd > sz - max_dist * 2.0))
    lit = jnp.where(occluded, shadow, 1.0)
    return jnp.where(jnp.isfinite(depth) & (depth < far * 0.99), lit, 1.0)


def tdao_heightmap(ipos, irad, bounds_min, inv_extent, grid: int = 128):
    """Top-down height grid from instance bounding spheres: scatter-max of
    sphere tops over an XZ grid (≙ the TDAO plugin's top-down depth render,
    which the reference feeds from voxelized models)."""
    gx = jnp.clip(((ipos[:, 0] - bounds_min[0]) * inv_extent[0] * grid)
                  .astype(jnp.int32), 0, grid - 1)
    gz = jnp.clip(((ipos[:, 2] - bounds_min[1]) * inv_extent[1] * grid)
                  .astype(jnp.int32), 0, grid - 1)
    tops = ipos[:, 1] + irad
    hm = jnp.full((grid, grid), -1e9)
    return hm.at[gz, gx].max(tops)


def tdao(depth, heightmap, cam_pos, cam_rot, fov_y, aspect,
         bounds_min, inv_extent, strength, falloff=0.35, far: float = 1e8):
    """≙ TDAO plugin: darken pixels lying under nearby geometry tops.
    Returns AO factor [H,W]."""
    h, w = depth.shape
    grid = heightmap.shape[0]
    d = jnp.where(jnp.isfinite(depth), depth, far)
    pv = view_positions(d, fov_y, aspect)
    pw_ = world_from_view(pv, cam_pos, cam_rot)
    # 3x3 max-pooled height (cheap cone): roll-based
    hm = heightmap
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            hm = jnp.maximum(hm, jnp.roll(heightmap, (dr, dc), (0, 1)))
    col = jnp.clip((pw_[..., 0] - bounds_min[0]) * inv_extent[0] * grid,
                   0, grid - 1)
    row = jnp.clip((pw_[..., 2] - bounds_min[1]) * inv_extent[1] * grid,
                   0, grid - 1)
    hmax = _sample(hm, row, col)
    over = jnp.maximum(hmax - pw_[..., 1], 0.0)
    ao = jnp.clip(1.0 - strength * (1.0 - jnp.exp(-over * falloff)), 0.2, 1.0)
    return jnp.where(jnp.isfinite(depth) & (depth < far * 0.99), ao, 1.0)


def world_from_view(pv, cam_pos, cam_rot):
    x, y, z, qw = cam_rot[0], cam_rot[1], cam_rot[2], cam_rot[3]
    u = jnp.stack([x, y, z])
    t = 2.0 * jnp.cross(jnp.broadcast_to(u, pv.shape), pv)
    return cam_pos + pv + qw * t + jnp.cross(jnp.broadcast_to(u, pv.shape), t)


def atmo(color, depth, rays, sun_dir, far):
    """≙ Atmo plugin: analytic Rayleigh/Mie-flavored sky where the depth
    buffer is empty, plus distance fog (aerial perspective) on geometry."""
    sun = sun_dir / jnp.maximum(jnp.linalg.norm(sun_dir), 1e-9)
    mu = jnp.sum(rays * sun, axis=-1)
    up = jnp.clip(rays[..., 1], -1.0, 1.0)
    horizon = jnp.exp(-jnp.maximum(up, 0.0) * 4.0)
    zenith = jnp.asarray([0.18, 0.34, 0.72])
    haze = jnp.asarray([0.75, 0.82, 0.92])
    sky = zenith[None, None] * (1 - horizon[..., None]) \
        + haze[None, None] * horizon[..., None]
    # Mie forward lobe + sun disc
    mie = 0.25 * jnp.maximum(mu, 0.0) ** 8
    disc = jnp.where(mu > 0.9995, 4.0, 0.0)
    sun_col = jnp.asarray([1.0, 0.93, 0.82])
    sky = sky + (mie + disc)[..., None] * sun_col[None, None]
    ground = (jnp.asarray([0.16, 0.15, 0.14])[None, None]
              * (0.4 + 0.6 * jnp.exp(up * 6.0))[..., None])
    sky = jnp.where(up[..., None] < 0, ground, sky)
    is_sky = (~jnp.isfinite(depth)) | (depth >= far * 0.99)
    out = jnp.where(is_sky[..., None], sky, color)
    # aerial perspective on geometry
    fog = 1.0 - jnp.exp(-jnp.where(is_sky, 0.0, depth) * (1.5 / far))
    return out * (1 - fog[..., None]) + haze[None, None] * fog[..., None]


def cubemap_sky(color, depth, rays, faces, far):
    """≙ CubemapSky plugin: sample a [6,S,S,3] cubemap by ray direction where
    the depth buffer is empty. Face order +X,-X,+Y,-Y,+Z,-Z."""
    s = faces.shape[1]
    ax, ay, az = rays[..., 0], rays[..., 1], rays[..., 2]
    aax, aay, aaz = jnp.abs(ax), jnp.abs(ay), jnp.abs(az)
    # dominant axis selects the face; (u,v) from the two minor axes
    fx = jnp.where(ax > 0, 0, 1)
    fy = jnp.where(ay > 0, 2, 3)
    fz = jnp.where(az > 0, 4, 5)
    face = jnp.where((aax >= aay) & (aax >= aaz), fx,
                     jnp.where(aay >= aaz, fy, fz))
    m = jnp.maximum(jnp.maximum(aax, aay), aaz)
    u = jnp.select([face == 0, face == 1, face == 2, face == 3,
                    face == 4, face == 5],
                   [-az, az, ax, ax, ax, -ax]) / m
    v = jnp.select([face == 0, face == 1, face == 2, face == 3,
                    face == 4, face == 5],
                   [-ay, -ay, az, -az, -ay, -ay]) / m
    col = jnp.clip((u * 0.5 + 0.5) * (s - 1), 0, s - 1)
    row = jnp.clip((v * 0.5 + 0.5) * (s - 1), 0, s - 1)
    sky = jnp.stack([
        map_coordinates(faces[..., c], [face.astype(jnp.float32) + 0.0,
                                        row, col], order=0, mode="nearest")
        for c in range(3)], axis=-1)
    is_sky = (~jnp.isfinite(depth)) | (depth >= far * 0.99)
    return jnp.where(is_sky[..., None], sky, color)


def dof(color, depth, focus_dist, focus_range, max_amount=0.85,
        far: float = 1e8):
    """≙ DOF plugin: circle-of-confusion lerp toward a blurred mip."""
    d = jnp.where(jnp.isfinite(depth), depth, far)
    blurred = upsample_to(blur5(downsample2(blur5(downsample2(color)))),
                          *color.shape[:2])
    coc = jnp.clip(jnp.abs(d - focus_dist) / focus_range, 0.0, 1.0)
    coc = (coc * coc * max_amount)[..., None]
    return color * (1 - coc) + blurred * coc


def taa(color, history, alpha):
    """≙ TAA plugin: exponential history blend with 3x3 neighborhood clamp
    (static camera reprojection — the software backend re-renders every
    frame from the current view)."""
    lo, hi = color, color
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            r = jnp.roll(color, (dr, dc), (0, 1))
            lo = jnp.minimum(lo, r)
            hi = jnp.maximum(hi, r)
    hist = jnp.clip(history, lo, hi)
    return hist + (color - hist) * alpha


def film_grain(color, key, amount):
    """≙ FilmGrain plugin: per-pixel multiplicative noise."""
    n = jax.random.uniform(key, color.shape[:2]) - 0.5
    return jnp.maximum(color * (1.0 + n[..., None] * amount), 0.0)


def tonemap_aces(color, exposure):
    """Builtin tonemap (≙ Pipeline's tonemap pass): ACES fitted curve,
    linear HDR → display [0,1]."""
    x = color * exposure
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


def fsr_upscale(color, out_h: int, out_w: int, sharpness):
    """≙ FSR3 plugin (fsr3.inl): bilinear upscale + RCAS-style contrast-
    adaptive sharpen, clamped to the local neighborhood (no ringing)."""
    up = jax.image.resize(color, (out_h, out_w) + color.shape[2:], "bilinear")
    lo, hi, acc = up, up, jnp.zeros_like(up)
    for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
        r = jnp.roll(up, (dr, dc), (0, 1))
        lo = jnp.minimum(lo, r)
        hi = jnp.maximum(hi, r)
        acc = acc + r
    sharp = up + (up - acc / 4.0) * sharpness
    return jnp.clip(sharp, lo, hi)


def _rotate_by_quat(q, v):
    """Rotate [..., 3] vectors by one quaternion [4] (x,y,z,w)."""
    u = q[:3]
    t = 2.0 * jnp.cross(jnp.broadcast_to(u, v.shape), v)
    return v + q[3] * t + jnp.cross(jnp.broadcast_to(u, v.shape), t)


def decal_pass(color, depth, fov_y, aspect, cam_pos, cam_rot,
               dpos, drot, dhe, tints, alpha=0.65, far: float = 1e8):
    """≙ Decal components (render_module.h Decal): project each decal's OBB
    against the depth buffer — geometry pixels whose reconstructed world
    position falls inside the box take the decal tint. dpos [D,3], drot
    [D,4], dhe [D,3], tints [D,3]; D is static (unrolled)."""
    d = jnp.where(jnp.isfinite(depth), depth, far)
    pw = world_from_view(view_positions(d, fov_y, aspect), cam_pos, cam_rot)
    geo = (jnp.isfinite(depth) & (depth < far * 0.99))[..., None]
    out = color
    for i in range(dpos.shape[0]):
        qi = drot[i]
        inv = jnp.concatenate([-qi[:3], qi[3:4]])
        local = _rotate_by_quat(inv, pw - dpos[i])
        inside = jnp.all(jnp.abs(local) <= dhe[i], axis=-1)[..., None] & geo
        out = jnp.where(inside, out * (1 - alpha) + tints[i] * alpha, out)
    return out


def deferred_lights(color, depth, fov_y, aspect,
                    lpos_view, lcolor, lintensity, lrange,
                    cluster_lights, grid, near, far_cluster,
                    far: float = 1e8):
    """≙ the clustered-shading light loop (pipeline.cpp fillClusters +
    per-pixel shading): reconstruct view position + normal per pixel, find
    the pixel's cluster, accumulate diffuse N·L from the cluster's light
    list with smooth range falloff. Returns lit color.

    lpos_view [L,3] view-space light positions, cluster_lights [C,MAX]
    (-1 padded, from clusters.fill_clusters), grid (nx, ny, nz)."""
    h, w = depth.shape
    nx, ny, nz = grid
    d = jnp.where(jnp.isfinite(depth), depth, far)
    p = view_positions(d, fov_y, aspect)              # [H,W,3]
    dy = jnp.gradient(p, axis=0)
    dx = jnp.gradient(p, axis=1)
    n = jnp.cross(dx, dy)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    n = jnp.where(n[..., 2:3] < 0, -n, n)             # face the camera

    # cluster index: x/y from screen tile, z from the exponential slice
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    cx = jnp.clip((cols / w * nx).astype(jnp.int32), 0, nx - 1)
    cy = jnp.clip((rows / h * ny).astype(jnp.int32), 0, ny - 1)
    cy = (ny - 1) - cy                 # cluster y grows upward in view space
    t = jnp.log(jnp.clip(d, near, far_cluster) / near) \
        / jnp.log(far_cluster / near)
    cz = jnp.clip((t * nz).astype(jnp.int32), 0, nz - 1)
    # fill_clusters flattens [nz, ny, nx] (clusters._cluster_bounds)
    cidx = (cz * ny + jnp.broadcast_to(cy, (h, w))) * nx + cx
    slots = cluster_lights[cidx]                       # [H,W,MAX]

    acc = jnp.zeros(depth.shape + (3,))
    for k in range(slots.shape[-1]):
        li = slots[..., k]
        ok = (li >= 0)[..., None]
        lif = jnp.maximum(li, 0)
        lp = lpos_view[lif]                            # [H,W,3]
        lv = lp - p
        dist = jnp.linalg.norm(lv, axis=-1, keepdims=True)
        ndotl = jnp.maximum(jnp.sum(n * lv / jnp.maximum(dist, 1e-6),
                                    axis=-1, keepdims=True), 0.0)
        rng = lrange[lif][..., None]
        fall = jnp.clip(1.0 - (dist / jnp.maximum(rng, 1e-6)) ** 2, 0.0, 1.0)
        inten = lintensity[lif][..., None]
        acc = acc + jnp.where(ok, lcolor[lif] * (ndotl * fall ** 2 * inten
                                                 / (1.0 + dist * dist)), 0.0)
    geo = (jnp.isfinite(depth) & (depth < far * 0.99))[..., None]
    return color + jnp.where(geo, color * acc, 0.0)


def default_cubemap(size: int = 64):
    """Procedural fallback cubemap (vertical gradient + sun-ish patch) used
    when no .dds sky is bound."""
    import numpy as np

    faces = np.zeros((6, size, size, 3), np.float32)
    v = np.linspace(1.0, -1.0, size)[:, None]  # +v is up in face space here
    for f in range(6):
        up = {2: 1.0, 3: -1.0}.get(f, 0.0)
        grad = np.clip(0.5 + 0.5 * (v * (0.0 if f in (2, 3) else 1.0) + up),
                       0.0, 1.0)
        faces[f] = (np.asarray([0.2, 0.35, 0.7])[None, None]
                    * (0.4 + 0.6 * grad[..., None])
                    + np.asarray([0.5, 0.45, 0.35])[None, None]
                    * (1.0 - grad[..., None]) * 0.5)
    return jnp.asarray(faces)
