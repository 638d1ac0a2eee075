"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode kernels themselves are STUBBED (the image/audio libraries are not
in this container): :class:`MediaDecoder` raises ``NotImplementedError``
unless constructed with ``fake=True``, in which case it produces a
deterministic fake decode so the Ray-side plumbing — schema, actor-pool
signature, batch sizing, output layout — is real and tested.

Schema convention:

```
media: (media_id: string, media_type: string, payload: binary,
        width: int32, height: int32, sample_rate: int32)
```

Stages are actor pools (``map_batches(Cls, concurrency=N, batch_size=B)``)
with small batch sizes — large binary payloads mean a batch × concurrency
must fit each worker's heap; callers tune ``batch_size`` down as payload
size grows.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.default_rng(seed)
    types = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array([f"m-{seed}-{i:06d}" for i in range(n)], pa.string()),
            "media_type": pa.array(types.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(64, 1024, n, dtype=np.int32)),
            "height": pa.array(rng.integers(64, 1024, n, dtype=np.int32)),
            "sample_rate": pa.array(np.where(types == "audio", 16000, 0).astype(np.int32)),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage.

    Real decoding requires PIL/ffmpeg (not in this container) — construct
    with ``fake=True`` for a deterministic stand-in that derives a
    fixed-length feature vector from the payload's sha256.  The actor loads
    its (stub) codec table once in ``__init__``.
    """

    def __init__(self, feature_dim: int = 32, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake
        self.codecs = {"image": "stub-png", "audio": "stub-pcm", "video": "stub-h264"}

    def _decode_one(self, payload: bytes, media_type: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real media decode needs PIL/soundfile/ffmpeg (not in container); "
                "construct MediaDecoder(fake=True) for the deterministic stub"
            )
        digest = hashlib.sha256(payload).digest()
        raw = np.frombuffer((digest * ((self.feature_dim * 4) // len(digest) + 1))[: self.feature_dim * 4], dtype=np.uint32)
        return (raw % 1000).astype(np.float32) / 1000.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = [
            self._decode_one(p, t) for p, t in zip(batch["payload"], batch["media_type"])
        ]
        # sig: payload checksum (provenance/idempotency key, same role as the
        # reference's content-derived storage keys) — also the only output a
        # SQL engine can recompute, so it anchors the driver oracle
        sigs = [hashlib.sha256(p).hexdigest() for p in batch["payload"]]
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "sig": sigs,
                "features": feats,
            }
        )


def media_from_documents(ds, payload_bytes_col: str = "text"):
    """Derive a media table from a text corpus: payload = utf-8 bytes.

    Gives the decode plumbing a DRIVER-CHECKABLE corpus: the payload is a
    deterministic function of a pre-registered table, so a SQL oracle can
    recompute ``sha256(payload)``.  media_type cycles image/audio/video by
    ``doc_id % 3`` (same CASE in SQL).
    """
    types = np.array(["image", "audio", "video"])

    def build(b: pd.DataFrame) -> pd.DataFrame:
        doc_id = b["doc_id"].to_numpy()
        return pd.DataFrame(
            {
                "media_id": doc_id.astype(np.int64),
                "media_type": types[doc_id % 3],
                "payload": [t.encode("utf-8") for t in b[payload_bytes_col].astype(str)],
                "width": np.zeros(len(b), dtype=np.int32),
                "height": np.zeros(len(b), dtype=np.int32),
                "sample_rate": np.zeros(len(b), dtype=np.int32),
            }
        )

    return ds.map_batches(build, batch_format="pandas")


class FrameSampler:
    """Video frame-sampling plumbing: emits ``n_frames`` rows per video row
    (flat-map shape), each with a frame index and the (stub) frame payload
    slice — demonstrating row-expansion through Ray Data."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vids = batch[batch["media_type"] == "video"]
        if not len(vids):
            return pd.DataFrame({"media_id": [], "frame_idx": [], "frame": []})
        if not self.fake:
            raise NotImplementedError("real frame extraction needs ffmpeg")
        out = []
        for _, row in vids.iterrows():
            payload = row["payload"]
            step = max(1, len(payload) // self.n_frames)
            for i in range(self.n_frames):
                out.append(
                    {
                        "media_id": row["media_id"],
                        "frame_idx": np.int32(i),
                        "frame": payload[i * step : (i + 1) * step],
                    }
                )
        return pd.DataFrame(out)


def decode_features(ds, feature_dim: int = 32, concurrency: int = 2, batch_size: int = 16):
    """Corpus-level decode: small batches (binary payloads), actor pool."""
    from ..util import pool_size

    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs=dict(feature_dim=feature_dim, fake=True),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=pool_size(concurrency),
    )
