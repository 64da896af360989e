"""Audio module (≙ reference src/audio: Clip resources, AudioDevice backends
(DirectSound/ALSA), AmbientSound + Listener + EchoZone/ChorusZone components,
per-frame 3D positioning — audio_module.h, audio_device.cpp).

TPU re-architecture: the ENGINE side of audio — per-frame 3D gain/pan
computation for every playing sound (distance attenuation vs the listener,
zone effects) — is a batched device pass inside the fused step. Actual sample
mixing is a separate batched kernel (`mix_block`) producing interleaved stereo
float blocks from the baked clip bank: useful for offline render/headless
sims; a platform output device (the DSound/ALSA analog) would just consume
those blocks.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from lumixengine_tpu.engine.plugin import IModule, ISystem
from lumixengine_tpu.engine.world import World, WorldState
from lumixengine_tpu.utils.store import DenseStore


@struct.dataclass
class AudioState:
    playing: jnp.ndarray    # bool [S]
    cursor: jnp.ndarray     # f32 [S] playback position (samples)
    gain: jnp.ndarray       # f32 [S] computed 3D gain
    pan: jnp.ndarray        # f32 [S] -1..1
    echo_mix: jnp.ndarray   # f32 [] listener echo-zone wetness
    counters: Dict[str, jnp.ndarray]


class AudioClip:
    """PCM clip resource (mono f32; ≙ audio Clip). Procedural or WAV-loaded."""

    def __init__(self, name: str, samples: np.ndarray, rate: int = 44100, looping: bool = True):
        self.name = name
        self.samples = np.asarray(samples, np.float32)
        self.rate = rate
        self.looping = looping

    @staticmethod
    def sine(name: str, freq: float = 440.0, seconds: float = 1.0, rate: int = 22050):
        t = np.arange(int(seconds * rate)) / rate
        return AudioClip(name, 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32), rate)

    @staticmethod
    def from_wav(name: str, blob: bytes):
        import io
        import wave

        with wave.open(io.BytesIO(blob)) as w:
            n = w.getnframes()
            raw = np.frombuffer(w.readframes(n), dtype=np.int16).astype(np.float32) / 32768.0
            if w.getnchannels() == 2:
                raw = raw.reshape(-1, 2).mean(axis=1)
            return AudioClip(name, raw, w.getframerate())


class AudioModule(IModule):
    name = "audio"
    COMPONENT_STORES = {"ambient_sound": "sounds", "echo_zone": "echo_zones"}

    def __init__(self, world: World, system: "AudioSystem", max_sounds: int = 64):
        super().__init__(world, system)
        self.sounds = DenseStore(
            max_sounds,
            {"clip": ((), np.int32, -1), "volume": ((), np.float32, 1.0),
             "is_3d": ((), np.bool_, True), "range": ((), np.float32, 20.0),
             "autoplay": ((), np.bool_, True)},
        )
        self.echo_zones = DenseStore(
            16, {"radius": ((), np.float32, 10.0), "wetness": ((), np.float32, 0.5)}
        )
        self.listener_entity = -1
        self._statics = None
        self._statics_version = -1

    def component_types(self):
        return ["ambient_sound", "listener", "echo_zone", "chorus_zone"]

    def create_component(self, entity: int, ctype: str, **props):
        self._statics = None
        if ctype == "ambient_sound":
            clip = props.get("clip", -1)
            if isinstance(clip, str):
                clip = self.system.clip_id(clip)
            self.sounds.add(entity, clip=np.int32(clip),
                            volume=np.float32(props.get("volume", 1.0)),
                            is_3d=np.bool_(props.get("is_3d", True)),
                            range=np.float32(props.get("range", 20.0)),
                            autoplay=np.bool_(props.get("autoplay", True)))
        elif ctype == "listener":
            self.listener_entity = entity
        elif ctype == "echo_zone":
            self.echo_zones.add(entity, radius=np.float32(props.get("radius", 10.0)),
                                wetness=np.float32(props.get("wetness", 0.5)))
        elif ctype == "chorus_zone":
            # kept for component parity; effect params land with the DSP pass
            self.echo_zones.add(entity, radius=np.float32(props.get("radius", 10.0)),
                                wetness=np.float32(props.get("wetness", 0.25)))
        else:
            raise KeyError(ctype)

    def destroy_component(self, entity: int, ctype: str) -> None:
        self._statics = None
        if ctype == "ambient_sound":
            self.sounds.remove(entity)
        elif ctype == "listener":
            self.listener_entity = -1
        elif ctype in ("echo_zone", "chorus_zone"):
            self.echo_zones.remove(entity)

    def prepare_statics(self):
        self.world._refresh_levels()
        if self._statics is not None and self._statics_version == self.world.topology_version:
            return
        self._statics = {
            "sound_slots": self.world.to_slots(self.sounds.entity),
            "mask": self.sounds.entity >= 0,
            "volume": np.asarray(self.sounds.data["volume"], np.float32),
            "is_3d": np.asarray(self.sounds.data["is_3d"], bool),
            "range": np.asarray(self.sounds.data["range"], np.float32),
            "clip": np.asarray(self.sounds.data["clip"], np.int32),
            "listener_slot": self.world.slot(self.listener_entity) if self.listener_entity >= 0 else -1,
            "echo_slots": self.world.to_slots(self.echo_zones.entity),
            "echo_mask": self.echo_zones.entity >= 0,
            "echo_radius": np.asarray(self.echo_zones.data["radius"], np.float32),
            "echo_wet": np.asarray(self.echo_zones.data["wetness"], np.float32),
        }
        self._statics_version = self.world.topology_version

    def statics(self):
        self.prepare_statics()
        return self._statics

    def device_state(self) -> AudioState:
        s = self.sounds.capacity
        return AudioState(
            playing=jnp.asarray(np.asarray(self.sounds.data["autoplay"], bool)
                                & (self.sounds.entity >= 0)),
            cursor=jnp.zeros(s, jnp.float32),
            gain=jnp.zeros(s, jnp.float32),
            pan=jnp.zeros(s, jnp.float32),
            echo_mix=jnp.float32(0.0),
            counters={"audible": jnp.int32(0)},
        )

    # -- frame: 3D positioning (≙ audio_module.cpp update) ---------------------------

    def update(self, state: WorldState, dt) -> WorldState:
        st = self.statics()
        ms: AudioState = state.modules[self.name]
        if st["listener_slot"] < 0:
            return state
        lpos = state.world.pos[..., :, st["listener_slot"]]
        lrot = state.world.rot[..., :, st["listener_slot"]]
        spos = jnp.take(state.world.pos, jnp.asarray(np.maximum(st["sound_slots"], 0)), axis=-1)
        d = spos - lpos[..., None]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-2), 1e-9))
        rng = jnp.asarray(st["range"])
        # inverse-distance rolloff clamped to range
        att = jnp.clip(1.0 - dist / rng, 0.0, 1.0)
        gain = jnp.asarray(st["volume"]) * jnp.where(jnp.asarray(st["is_3d"]), att, 1.0)
        gain = gain * ms.playing * jnp.asarray(st["mask"])
        # pan from listener-space x (≙ 3D positioning)
        from lumixengine_tpu.core import math as lm

        right = lm.quat_rotate(lrot, jnp.asarray([1.0, 0.0, 0.0]))
        pan = jnp.sum(d * right[..., None], axis=-2) / dist
        pan = jnp.where(jnp.asarray(st["is_3d"]), jnp.clip(pan, -1.0, 1.0), 0.0)
        # echo zones: wetness of the deepest zone containing the listener
        if st["echo_mask"].any():
            ez = jnp.take(state.world.pos, jnp.asarray(np.maximum(st["echo_slots"], 0)), axis=-1)
            ed = jnp.sqrt(jnp.maximum(jnp.sum((ez - lpos[..., None]) ** 2, axis=-2), 1e-9))
            inside = (ed < jnp.asarray(st["echo_radius"])) & jnp.asarray(st["echo_mask"])
            echo = jnp.max(jnp.where(inside, jnp.asarray(st["echo_wet"]), 0.0), axis=-1)
        else:
            echo = jnp.float32(0.0)
        # advance cursors
        rates = jnp.asarray(self.system.clip_rates())[np.maximum(st["clip"], 0)]
        cursor = ms.cursor + dt * rates * ms.playing
        ms = ms.replace(
            gain=gain, pan=pan, cursor=cursor, echo_mix=echo,
            counters={"audible": jnp.sum(gain > 1e-3).astype(jnp.int32)},
        )
        return state.replace(modules={**state.modules, self.name: ms})

    # -- host control (≙ AudioModule play/stop API) ---------------------------------

    def play(self, state: WorldState, entity: int) -> WorldState:
        slot = self.sounds.slot_of(entity)
        ms: AudioState = state.modules[self.name]
        ms = ms.replace(playing=ms.playing.at[..., slot].set(True),
                        cursor=ms.cursor.at[..., slot].set(0.0))
        return state.replace(modules={**state.modules, self.name: ms})

    def stop(self, state: WorldState, entity: int) -> WorldState:
        slot = self.sounds.slot_of(entity)
        ms: AudioState = state.modules[self.name]
        ms = ms.replace(playing=ms.playing.at[..., slot].set(False))
        return state.replace(modules={**state.modules, self.name: ms})

    # -- mixing kernel (the AudioDevice stand-in) -------------------------------------

    def mix_block(self, ms: AudioState, frames: int = 512) -> jnp.ndarray:
        """Produce one stereo block [2, frames] by sampling every playing
        clip at its cursor with its gain/pan (batched device mix)."""
        st = self.statics()
        bank, lengths = self.system.clip_bank()
        clip = jnp.asarray(np.maximum(st["clip"], 0))
        base = ms.cursor[..., :, None] + jnp.arange(frames)[None, :]
        ln = jnp.asarray(lengths)[clip][..., :, None]
        idx = jnp.mod(base, jnp.maximum(ln, 1.0)).astype(jnp.int32)
        rows = jnp.take(bank, clip, axis=0)                      # [S, L]
        samp = jnp.take_along_axis(rows, idx, axis=-1)           # [S, frames]
        g = ms.gain[..., :, None]
        pan = ms.pan[..., :, None]
        left = jnp.sum(samp * g * (0.5 * (1.0 - pan)), axis=-2)
        right = jnp.sum(samp * g * (0.5 * (1.0 + pan)), axis=-2)
        return jnp.stack([left, right])


class AudioSystem(ISystem):
    """≙ audio_system.cpp — owns clips + the output device hookup."""

    name = "audio_system"

    def __init__(self, engine):
        super().__init__(engine)
        self.clips: List[AudioClip] = []
        self._by_name: Dict[str, int] = {}
        self._bank = None

    def add_clip(self, clip: AudioClip) -> int:
        cid = len(self.clips)
        self.clips.append(clip)
        self._by_name[clip.name] = cid
        self._bank = None
        return cid

    def clip_id(self, name: str) -> int:
        return self._by_name[name]

    def clip_rates(self) -> np.ndarray:
        return np.asarray([c.rate for c in self.clips] or [44100], np.float32)

    def clip_bank(self):
        if self._bank is None:
            n = max(len(self.clips), 1)
            maxlen = max([len(c.samples) for c in self.clips] or [1])
            bank = np.zeros((n, maxlen), np.float32)
            lengths = np.ones(n, np.float32)
            for i, c in enumerate(self.clips):
                bank[i, : len(c.samples)] = c.samples
                lengths[i] = len(c.samples)
            self._bank = (jnp.asarray(bank), lengths)
        return self._bank

    def create_modules(self, world: World) -> AudioModule:
        caps = getattr(self.engine, "module_capacities", {})
        return AudioModule(world, self, max_sounds=caps.get("sounds", 64))
