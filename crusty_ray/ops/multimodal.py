"""Multimodal column operators — opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata columns beside
them; every transform is an actor-pool ``map_batches`` stage with small
batches (wide rows). What's real here vs stubbed (this container has no
image/audio libs — the plumbing, schemas, batch sizing and actor signatures
are the tested product; codecs are swappable):

- **decode**: real for the formats ``codecs/images.py`` implements (png +
  the deterministic lossy stand-ins); `NotImplementedError` for external
  formats (gif/avif/mp4/...), surfaced per-row as ``decode_ok=false`` rather
  than poisoning the batch.
- **resize**: REAL nearest-neighbor resample (pure numpy index math).
- **frame_sample / audio features**: STUB — deterministic hash-derived
  feature vectors standing in for ffmpeg/librosa output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.images import decode_image, encode_image
from ..core.hashing import hash64


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resize (HxWx3 → out_h x out_w x 3)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


class DecodeResizeStage:
    """binary image column → decoded, resized, re-encoded thumbnail column."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["bytes"].to_pylist()
        fmts = batch["fmt"].to_pylist()
        thumbs, ok = [], []
        for blob, fmt in zip(blobs, fmts):
            try:
                px = decode_image(blob, fmt)
                thumb = resize_nearest(px, self.out_w, self.out_h)
                thumbs.append(encode_image(thumb, "png"))
                ok.append(True)
            except (NotImplementedError, Exception):
                thumbs.append(None)
                ok.append(False)
        return batch.append_column("thumb_png", pa.array(thumbs, pa.binary())) \
                    .append_column("decode_ok", pa.array(ok, pa.bool_()))


class AudioFeatureStub:
    """STUB: deterministic fake features where librosa would run.

    Real plumbing: binary column in, fixed-width float32 feature vector out,
    one model "load" per actor. Swap ``_features`` for a real extractor.
    """

    N_MFCC = 13

    def __init__(self):
        self.ready = True  # model load goes here

    def _features(self, blob: bytes) -> np.ndarray:
        h = hash64(blob or b"")
        rng = np.random.Generator(np.random.PCG64(h))
        return rng.standard_normal(self.N_MFCC).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(b) for b in batch["bytes"].to_pylist()]
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())))


def frame_sample_stub(n_frames: int):
    """STUB: video frame sampling — returns deterministic frame indices where
    ffmpeg seek/decode would run (uniform stride over a fake duration)."""
    def stage(batch: pa.Table) -> pa.Table:
        out = []
        for blob in batch["bytes"].to_pylist():
            dur = 1 + hash64(blob or b"") % 300  # fake duration (s)
            idx = [int(i * dur / n_frames) for i in range(n_frames)]
            out.append(idx)
        return batch.append_column("frame_indices",
                                   pa.array(out, pa.list_(pa.int32())))
    return stage
