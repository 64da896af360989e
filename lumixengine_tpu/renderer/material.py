"""Materials / shaders / textures — the data layer (≙ reference
renderer/material.cpp, shader.cpp, texture.cpp, docs/shaders.md).

Reference: HLSL shaders with //@surface directives + defines compiled by FXC;
a material = shader + uniform values + render layer + define set; textures are
compressed on import. None of that GPU machinery runs on TPU — what the engine
still owns is the DATA: material parameter blocks that sort keys and draw
commands reference, texture payloads for CPU-side sampling (terrain splat,
particle gradients), and define/layer bookkeeping. Uniform blocks bake into a
device bank so per-instance material params can be gathered in batch (≙ the
reference's material uniform buffer)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct


@dataclass
class Shader:
    """≙ shader.cpp: named program + declared uniforms + defines."""

    name: str
    uniforms: List[str] = field(default_factory=list)   # uniform block layout
    defines: List[str] = field(default_factory=list)
    surfaces: List[str] = field(default_factory=list)   # ≙ //@surface directives


@dataclass
class Texture:
    name: str
    data: np.ndarray          # [H, W, C] u8 or f32
    srgb: bool = True
    wrap: str = "repeat"

    def sample_host(self, u: float, v: float):
        h, w = self.data.shape[:2]
        x = int(np.clip(u * w, 0, w - 1))
        y = int(np.clip(v * h, 0, h - 1))
        return self.data[y, x]


@dataclass
class Material:
    """≙ material.cpp: shader + uniform values + textures + layer + defines."""

    name: str
    shader: str = "standard"
    layer: str = "default"
    uniforms: Dict[str, float] = field(default_factory=dict)
    textures: Dict[str, str] = field(default_factory=dict)
    defines: List[str] = field(default_factory=list)
    alpha_blend: bool = False


@struct.dataclass
class MaterialBank:
    """Uniform blocks baked to device: [M, U] — gathered per draw batch
    (≙ the material uniform buffer, renderer.cpp)."""

    uniforms: jnp.ndarray     # f32 [M, U]
    layer_id: jnp.ndarray     # int32 [M]
    alpha: jnp.ndarray        # bool [M]


UNIFORM_SLOTS = ["roughness", "metallic", "emission", "alpha_ref",
                 "color_r", "color_g", "color_b", "color_a"]


class MaterialRegistry:
    def __init__(self):
        self.shaders: Dict[str, Shader] = {
            "standard": Shader("standard", uniforms=list(UNIFORM_SLOTS),
                               surfaces=["default"]),
        }
        self.textures: Dict[str, Texture] = {}
        self.materials: List[Material] = [Material("default")]
        self._by_name: Dict[str, int] = {"default": 0}
        self.layers: List[str] = ["default", "transparent", "decal", "ui"]
        self._bank: Optional[MaterialBank] = None

    def add_shader(self, shader: Shader) -> None:
        self.shaders[shader.name] = shader

    def add_texture(self, tex: Texture) -> None:
        self.textures[tex.name] = tex

    def add(self, mat: Material) -> int:
        if mat.shader not in self.shaders:
            raise KeyError(f"unknown shader {mat.shader!r}")
        mid = len(self.materials)
        self.materials.append(mat)
        self._by_name[mat.name] = mid
        self._bank = None
        return mid

    def get_id(self, name: str) -> int:
        return self._by_name[name]

    def get(self, mid: int) -> Material:
        return self.materials[mid]

    def layer_id(self, name: str) -> int:
        if name not in self.layers:
            self.layers.append(name)
        return self.layers.index(name)

    @property
    def bank(self) -> MaterialBank:
        if self._bank is None:
            m = len(self.materials)
            u = np.zeros((m, len(UNIFORM_SLOTS)), np.float32)
            u[:, UNIFORM_SLOTS.index("roughness")] = 0.8
            u[:, 4:8] = 1.0  # default color
            layer = np.zeros(m, np.int32)
            alpha = np.zeros(m, bool)
            for i, mat in enumerate(self.materials):
                for k, v in mat.uniforms.items():
                    if k in UNIFORM_SLOTS:
                        u[i, UNIFORM_SLOTS.index(k)] = v
                layer[i] = self.layer_id(mat.layer)
                alpha[i] = mat.alpha_blend
            self._bank = MaterialBank(
                uniforms=jnp.asarray(u), layer_id=jnp.asarray(layer),
                alpha=jnp.asarray(alpha),
            )
        return self._bank
