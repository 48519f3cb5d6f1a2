"""Deterministic audio/video container codecs — the raw-AV stand-ins that
turn the multimodal stubs into REAL seek/decode ops without ffmpeg/librosa
(this container ships neither).

- ``rawv`` is an honest video container: a fixed header
  (magic, w, h, n_frames, fps) followed by n_frames raw RGB24 frames.
  Frames are byte-addressable, so ``decode_frame`` SEEKS — it touches only
  the requested frame's bytes, the exact access pattern an mp4 keyframe
  sampler has (and the property the frame-sampling stage's test pins:
  seek-decode ≡ full-decode's frame).
- ``rawa`` is an honest audio container: (magic, sample_rate, n_samples)
  + int16 PCM mono. Real DSP runs on it (RMS, zero crossings, FFT band
  energies) — swapping in ffmpeg/librosa later only changes the decode
  call, not the Ray plumbing.

Both are pure functions of their inputs; the synthetic generators derive
every sample/pixel from the media id via the repo's seed-stable hash, so
tests and faces are deterministic end-to-end.
"""

from __future__ import annotations

import struct

import numpy as np

from ..core.hashing import hash64

_V_MAGIC = b"RAWV"
_A_MAGIC = b"RAWA"
_V_HDR = struct.Struct("<4sHHIH")   # magic, w, h, n_frames, fps
_A_HDR = struct.Struct("<4sII")     # magic, sample_rate, n_samples


# ------------------------------------------------------------------ video
def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 → container bytes."""
    n, h, w, c = frames.shape
    assert c == 3 and frames.dtype == np.uint8
    return _V_HDR.pack(_V_MAGIC, w, h, n, fps) + frames.tobytes()


def rawv_info(blob: bytes) -> tuple[int, int, int, int]:
    """(w, h, n_frames, fps) from the header alone — no frame bytes read."""
    magic, w, h, n, fps = _V_HDR.unpack_from(blob, 0)
    if magic != _V_MAGIC:
        raise ValueError("not a rawv container")
    return w, h, n, fps


def decode_rawv_frame(blob: bytes, idx: int) -> np.ndarray:
    """SEEK-decode one frame: touches only that frame's byte range."""
    w, h, n, _ = rawv_info(blob)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    frame_bytes = w * h * 3
    off = _V_HDR.size + idx * frame_bytes
    return np.frombuffer(blob, dtype=np.uint8, count=frame_bytes,
                         offset=off).reshape(h, w, 3)


def decode_rawv(blob: bytes) -> np.ndarray:
    """Full decode — the test oracle for the seek path."""
    w, h, n, _ = rawv_info(blob)
    return np.frombuffer(blob, dtype=np.uint8, count=n * h * w * 3,
                         offset=_V_HDR.size).reshape(n, h, w, 3)


def synth_video(media_id: int, w: int = 8, h: int = 8,
                n_frames: int = 12, fps: int = 10) -> bytes:
    """Deterministic synthetic clip: each frame's pixels derive from
    (media_id, frame) via the seed-stable hash — a pure function, so any
    engine regenerates identical bytes."""
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for t in range(n_frames):
        rng = np.random.Generator(np.random.PCG64(
            hash64(f"vid:{media_id}:{t}".encode())))
        frames[t] = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return encode_rawv(frames, fps)


# ------------------------------------------------------------------ audio
def encode_rawa(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    assert samples.dtype == np.int16
    return _A_HDR.pack(_A_MAGIC, sample_rate, len(samples)) \
        + samples.tobytes()


def decode_rawa(blob: bytes) -> tuple[np.ndarray, int]:
    magic, rate, n = _A_HDR.unpack_from(blob, 0)
    if magic != _A_MAGIC:
        raise ValueError("not a rawa container")
    return np.frombuffer(blob, dtype=np.int16, count=n,
                         offset=_A_HDR.size), rate


def synth_audio(media_id: int, n_samples: int = 4000,
                sample_rate: int = 8000) -> bytes:
    """Deterministic clip: a two-tone signal whose frequencies derive from
    the media id, plus hash-seeded noise — gives the FFT features real
    structure to find."""
    h = hash64(f"aud:{media_id}".encode())
    f1 = 100 + h % 900            # 100..999 Hz
    f2 = 1000 + (h >> 16) % 2000  # 1000..2999 Hz
    t = np.arange(n_samples) / sample_rate
    rng = np.random.Generator(np.random.PCG64(h))
    sig = (8000 * np.sin(2 * np.pi * f1 * t)
           + 4000 * np.sin(2 * np.pi * f2 * t)
           + 500 * rng.standard_normal(n_samples))
    return encode_rawa(np.clip(sig, -32768, 32767).astype(np.int16),
                       sample_rate)


def synth_video_overlapping(media_id: int, base_mod: int = 16,
                            shift: int = 2, w: int = 8, h: int = 8,
                            n_frames: int = 12, fps: int = 10) -> bytes:
    """Deterministic clip with PLANTED near-dup structure: frame t of clip
    v is the base frame (v % base_mod, t + shift·(v // base_mod)) — so
    clips congruent mod ``base_mod`` are time-shifted versions of the
    same footage sharing n_frames − shift·Δ frames. The fixture the video
    near-dup op's pytest oracle is computed against."""
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    base = media_id % base_mod
    off = shift * (media_id // base_mod)
    for t in range(n_frames):
        rng = np.random.Generator(np.random.PCG64(
            hash64(f"vbase:{base}:{t + off}".encode())))
        frames[t] = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return encode_rawv(frames, fps)
