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
