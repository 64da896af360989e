"""Texture loading pipeline (≙ reference renderer/texture.cpp: TGA, RAW and
DDS loaders feeding Texture resources, plus mip generation).

Host side: byte-level TGA (uncompressed + RLE, the format the reference's own
content uses — 16 of its shipped textures are .tga) and RAW u16 heightmap
parsers written here; PNG/DDS delegate to PIL. Device side: a bilinear
sampler over jnp arrays used by terrain splat / particle GRADIENT / GUI
sprite consumers.
"""
from __future__ import annotations

import io
import struct as pystruct
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from lumixengine_tpu.renderer.material import Texture


def load_tga(blob: bytes, name: str = "tga") -> Texture:
    """TGA types 2/3 (uncompressed BGR(A)/gray) and 10/11 (RLE)
    (≙ texture.cpp loadTGA)."""
    hdr = blob[:18]
    id_len = hdr[0]
    img_type = hdr[2]
    w = pystruct.unpack_from("<H", hdr, 12)[0]
    h = pystruct.unpack_from("<H", hdr, 14)[0]
    bpp = hdr[16] // 8
    desc = hdr[17]
    top_down = bool(desc & 0x20)
    off = 18 + id_len
    n = w * h

    if img_type in (2, 3):
        raw = np.frombuffer(blob, np.uint8, count=n * bpp, offset=off)
        px = raw.reshape(h, w, bpp)
    elif img_type in (10, 11):
        out = np.empty((n, bpp), np.uint8)
        src = np.frombuffer(blob, np.uint8, offset=off)
        i = j = 0
        while j < n:
            packet = int(src[i])
            count = (packet & 0x7F) + 1
            if packet & 0x80:  # RLE run
                out[j:j + count] = src[i + 1:i + 1 + bpp]
                i += 1 + bpp
            else:              # literal run
                out[j:j + count] = src[i + 1:i + 1 + count * bpp].reshape(count, bpp)
                i += 1 + count * bpp
            j += count
        px = out.reshape(h, w, bpp)
    else:
        raise ValueError(f"tga: unsupported image type {img_type}")

    if bpp not in (1, 3, 4):
        raise ValueError(f"tga: unsupported depth {bpp * 8} bpp")
    if not top_down:
        px = px[::-1]
    if bpp == 1:
        rgba = np.repeat(px, 4, axis=-1)
        rgba[..., 3] = 255
    elif bpp == 3:
        rgba = np.concatenate([px[..., 2:3], px[..., 1:2], px[..., 0:1],
                               np.full((h, w, 1), 255, np.uint8)], axis=-1)
    else:
        rgba = np.concatenate([px[..., 2:3], px[..., 1:2], px[..., 0:1],
                               px[..., 3:4]], axis=-1)
    return Texture(name=name, data=np.ascontiguousarray(rgba))


def load_raw(blob: bytes, name: str = "raw") -> Texture:
    """RAW u16 grayscale (square heightmaps; ≙ texture.cpp loadRaw)."""
    vals = np.frombuffer(blob, np.uint16)
    side = int(round(len(vals) ** 0.5))
    if side * side != len(vals):
        raise ValueError("raw: not square")
    data = (vals.reshape(side, side).astype(np.float32) / 65535.0)
    return Texture(name=name, data=data[..., None], srgb=False)


def load_image(blob: bytes, name: str = "img") -> Texture:
    """PNG/JPG/DDS via PIL."""
    from PIL import Image

    img = Image.open(io.BytesIO(blob)).convert("RGBA")
    return Texture(name=name, data=np.asarray(img, np.uint8))


def load_texture(name: str, blob: bytes) -> Texture:
    """Extension/magic dispatch (≙ Texture::load switching on extension)."""
    low = name.lower()
    if low.endswith(".tga"):
        return load_tga(blob, name)
    if low.endswith(".raw"):
        return load_raw(blob, name)
    return load_image(blob, name)


def build_mips(data: np.ndarray, max_levels: int = 16) -> List[np.ndarray]:
    """Box-filtered mip chain down to 1x1 (≙ Texture mips)."""
    mips = [data]
    cur = data.astype(np.float32)
    while (cur.shape[0] > 1 or cur.shape[1] > 1) and len(mips) < max_levels:
        h, w = cur.shape[:2]
        a = cur[: (h // 2) * 2 or 1, : (w // 2) * 2 or 1]
        if h >= 2:
            a = (a[0::2] + a[1::2]) * 0.5
        if w >= 2:
            a = (a[:, 0::2] + a[:, 1::2]) * 0.5
        cur = a
        mips.append(cur.astype(np.float32) if data.dtype == np.float32
                    else np.clip(cur + 0.5, 0, 255).astype(np.uint8))
    return mips


def sample_bilinear(tex, u, v, wrap: str = "repeat"):
    """Device bilinear sample: tex [H, W, C] (jnp), u/v [...] in [0,1] →
    [..., C]."""
    t = jnp.asarray(tex)
    h, w = t.shape[0], t.shape[1]
    if wrap == "repeat":
        # texel-center convention with modulo neighbors: the seam blends
        # texel w-1 with texel 0 (clamping there would double the edge texel
        # and show a visible seam on tiling textures)
        x = jnp.mod(u, 1.0) * w - 0.5
        y = jnp.mod(v, 1.0) * h - 0.5
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        x0 = jnp.mod(x0f.astype(jnp.int32), w)
        y0 = jnp.mod(y0f.astype(jnp.int32), h)
        x1 = jnp.mod(x0 + 1, w)
        y1 = jnp.mod(y0 + 1, h)
        fx_ = (x - x0f)[..., None]
        fy_ = (y - y0f)[..., None]
    else:
        u = jnp.clip(u, 0.0, 1.0)
        v = jnp.clip(v, 0.0, 1.0)
        x = u * (w - 1)
        y = v * (h - 1)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        fx_ = (x - x0)[..., None]
        fy_ = (y - y0)[..., None]
    fx = fx_
    fy = fy_
    tf = t.astype(jnp.float32)
    c00 = tf[y0, x0]
    c10 = tf[y0, x1]
    c01 = tf[y1, x0]
    c11 = tf[y1, x1]
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def register_texture_plugins(compiler, registry) -> None:
    """Hook the loaders into the AssetCompiler (≙ texture plugin in
    asset_compiler registration): .tga/.raw/.png/.dds/.jpg → Texture added
    to the MaterialRegistry."""
    def compile_tex(path: str, blob: bytes):
        tex = load_texture(path, blob)
        registry.add_texture(tex)
        return tex

    for ext in ("tga", "raw", "png", "dds", "jpg"):
        compiler.add_plugin(ext, compile_tex)
