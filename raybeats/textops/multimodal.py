"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this container — clearly marked below); everything Ray-side is real and
tested: schema, actor-pool stage shape, batch sizing for large binary
payloads, and output layout. A real deployment replaces ``_decode_stub``
with PIL/libav calls inside the same actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),       # image | audio | video
    ("payload", pa.binary()),    # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),       # typed metadata travels beside the blob
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 5, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for tests/benches."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    payloads = [rng.integers(0, 256, size=payload_bytes,
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kinds[i % 3] for i in range(n)], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["application/octet-stream"] * n, pa.string()),
        "width": pa.array([64 + (i % 8) * 32 for i in range(n)], pa.int32()),
        "height": pa.array([64] * n, pa.int32()),
        "duration_ms": pa.array([0] * n, pa.int32()),
    })


class MediaFeatureExtractor:
    """Actor-pool stage for decode/feature-extract. Small batches: a batch
    of B rows holds B × payload bytes in the worker heap, so size
    ``batch_size`` by bytes (e.g. 64 for 4 MB images), not rows.

    The decode step is a deterministic STUB (no codec libs in this
    container): features are derived from a digest of the payload. The
    actor/batch plumbing is the real, tested part.
    """

    def __init__(self, feature_dim: int = 8, real_decoder=None):
        self.dim = feature_dim
        self.decoder = real_decoder  # plug PIL/libav here in production

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # STUB: stands in for image/audio decode + model inference
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.dim * 4) // len(digest) + 1))
                            [:self.dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, tbl: pa.Table) -> pa.Table:
        feats = []
        for payload in tbl.column("payload").to_pylist():
            if payload is None:
                feats.append(None)
                continue
            if self.decoder is not None:  # pragma: no cover
                feats.append(self.decoder(payload))
            else:
                feats.append(self._decode_stub(bytes(payload)).tolist())
        return pa.table({
            "media_id": tbl.column("media_id"),
            "kind": tbl.column("kind"),
            "features": pa.array(feats, pa.list_(pa.float32())),
        })


def extract_media_features(ds, concurrency: int = 2, batch_size: int = 64,
                           feature_dim: int = 8):
    """Actor-pool map_batches with byte-aware batch sizing."""
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=(1, concurrency),
                          fn_constructor_kwargs={"feature_dim": feature_dim})


class MediaResizer:
    """Actor-pool resize stage. The RESIZE ITSELF is a deterministic
    STUB (no image codecs in this container — a real deployment swaps
    ``_resize_stub`` for PIL/opencv inside the same actor); the real,
    tested parts are the aspect-preserving target arithmetic, the
    metadata update travelling beside the blob, and the byte-aware
    actor-pool batch shape."""

    def __init__(self, target_w: int, real_resizer=None):
        if target_w <= 0:
            raise ValueError(f"target_w must be positive: {target_w}")
        self.target_w = target_w
        self.resizer = real_resizer

    @staticmethod
    def target_size(w: int, h: int, target_w: int) -> tuple[int, int]:
        """Aspect-preserving integer target: width clamps to
        ``target_w`` (never upscales), height floors proportionally
        with a 1px minimum."""
        nw = min(int(w), target_w)
        nh = max(1, (int(h) * nw) // max(1, int(w)))
        return nw, nh

    def _resize_stub(self, payload: bytes, nw: int, nh: int) -> bytes:
        # STUB: stands in for decode → resample → re-encode
        import hashlib as _h
        seed = _h.sha256(payload).digest()
        need = max(1, (nw * nh) // 64)
        return (seed * (need // len(seed) + 1))[:need]

    def __call__(self, tbl: pa.Table) -> pa.Table:
        w = tbl.column("width").to_pylist()
        h = tbl.column("height").to_pylist()
        # null width/height (metadata unknown): the row passes through
        # untouched with null output metadata — one unknown row must
        # not kill the whole actor-pool batch
        sizes = [self.target_size(int(a), int(b), self.target_w)
                 if a is not None and b is not None else None
                 for a, b in zip(w, h)]
        payloads = []
        for p, s in zip(tbl.column("payload").to_pylist(), sizes):
            if p is None or s is None:
                payloads.append(p)
            elif self.resizer is not None:  # pragma: no cover
                payloads.append(self.resizer(p, *s))
            else:
                payloads.append(self._resize_stub(bytes(p), *s))
        return pa.table({
            "media_id": tbl.column("media_id"),
            "kind": tbl.column("kind"),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([s[0] if s else None for s in sizes],
                              pa.int32()),
            "height": pa.array([s[1] if s else None for s in sizes],
                               pa.int32()),
        })


def resize_media(ds, target_w: int = 256, concurrency: int = 2,
                 batch_size: int = 64):
    """Actor-pool resize with byte-aware batch sizing (same rationale
    as :func:`extract_media_features`)."""
    return ds.map_batches(MediaResizer, batch_format="pyarrow",
                          batch_size=batch_size,
                          concurrency=(1, concurrency),
                          fn_constructor_kwargs={"target_w": target_w})


def sample_frames_table(t: pa.Table, *, every_ms: int, fps: int,
                        sig_len: int = 8) -> pa.Table:
    """Frame-sampling kernel (flat-map shape): each video row explodes
    to one row per sampled frame at ``every_ms`` spacing over
    ``[0, duration_ms)`` — ``ceil(duration/every)`` frames, at least
    one for any positive duration. The timing/index arithmetic
    (``ts_ms = k·every_ms``, ``frame_idx = ts_ms·fps // 1000``) is
    REAL and integer-exact; the per-frame decode is the container's
    deterministic digest STUB (``sha256(payload ‖ '-' ‖ ts)`` hex
    prefix), kept SQL-expressible so the pipeline gets a value oracle.
    Rows with non-positive duration emit no frames (nothing to
    sample). Vectorized explode via np.repeat + the aranges trick —
    only the per-frame digest is a python loop (it stands in for the
    decode call, which dominates it in any real deployment)."""
    import hashlib as _h

    dur = t.column("duration_ms").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    n_frames = np.where(dur > 0, (dur - 1) // every_ms + 1, 0)
    ridx = np.repeat(np.arange(len(dur)), n_frames)
    offs = np.cumsum(n_frames) - n_frames
    k = np.arange(int(n_frames.sum())) - offs[ridx]
    ts = k * every_ms
    payloads = t.column("payload").to_pylist()
    sigs = [_h.sha256(bytes(payloads[r]) + b"-" + str(int(ts_i)).encode())
            .hexdigest()[:sig_len] if payloads[r] is not None else None
            for r, ts_i in zip(ridx, ts)]
    mid = t.column("media_id")
    mid = mid.combine_chunks() if isinstance(mid, pa.ChunkedArray) else mid
    return pa.table({
        "media_id": pc.take(mid, pa.array(ridx, pa.int64())),
        "ts_ms": pa.array(ts, pa.int64()),
        "frame_idx": pa.array(ts * fps // 1000, pa.int64()),
        "frame_sig": pa.array(sigs, pa.string()),
    })


def sample_frames(ds, *, every_ms: int = 2500, fps: int = 30,
                  batch_size: int = 64):
    """Frame sampling over a media dataset — one output row per
    sampled frame. Narrow (no shuffle, stateless task pool): the
    explode happens inside each batch; ``batch_size`` is the
    byte-aware knob (rows × payload bytes in the worker heap)."""
    import functools
    return ds.map_batches(
        functools.partial(sample_frames_table, every_ms=every_ms,
                          fps=fps),
        batch_format="pyarrow", batch_size=batch_size)
