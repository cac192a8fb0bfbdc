"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The decode kernels themselves are STUBBED (this environment ships no
image/audio libraries — see the import guards); everything Ray-side is real
and tested: schema, actor-pool stage shape, batch sizing for large binary
payloads, and the typed-metadata output layout. Swap ``_decode_*`` for a
real decoder (PIL / torchaudio / pyav) on a cluster that has one.

Batch-size guidance: binary payloads are large — keep ``batch_size`` small
(64–256) and ``batch_format="pyarrow"`` (binary columns do not round-trip
through pandas cleanly —
https://docs.ray.io/en/latest/data/batch_inference.html).
"""

from __future__ import annotations

import hashlib

import numpy as np

from flashray.datapipe import _util
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("meta", pa.string()),  # JSON sidecar (width/height/duration/...)
    ]
)

try:  # pragma: no cover - not present in this environment
    import PIL.Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake decode: payload bytes → pseudo 8x8 grayscale
    'image' derived from a digest. Replace with PIL decode on a real
    cluster."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 2)[:64], dtype=np.uint8)
    return arr.reshape(8, 8)


class ImageFeatures:
    """Actor-pool stage: decode (stubbed) + feature-extract per image.

    Real deployments put model loading here (once per actor)."""

    def __init__(self, *, use_real_decoder: bool = False):
        if use_real_decoder and not _HAVE_PIL:
            raise NotImplementedError(
                "image decoding requires PIL, which is not installed in this "
                "environment; run with use_real_decoder=False for the "
                "deterministic stub"
            )
        self.use_real = use_real_decoder and _HAVE_PIL

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        means, stds, shapes = [], [], []
        for p in payloads:
            img = _decode_image_stub(p or b"")
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            shapes.append(f"{img.shape[0]}x{img.shape[1]}")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "px_mean": pa.array(means, type=pa.float64()),
                "px_std": pa.array(stds, type=pa.float64()),
                "shape": pa.array(shapes, type=pa.string()),
            }
        )


class FrameSampler:
    """Actor-pool stage: sample N pseudo-frames per video payload
    (deterministic stub; flat_map-style 1→N row expansion)."""

    def __init__(self, frames_per_item: int = 4):
        self.n = frames_per_item

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_fp = [], [], []
        for mid, p in zip(ids, payloads):
            digest = hashlib.sha256(p or b"").digest()
            for f in range(self.n):
                out_id.append(int(mid))
                out_frame.append(f)
                out_fp.append(
                    int.from_bytes(digest[f * 4 : f * 4 + 8], "big")
                    & 0x7FFF_FFFF_FFFF_FFFF
                )
        return pa.table(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int32()),
                "frame_fingerprint": pa.array(out_fp, type=pa.int64()),
            }
        )


def media_table_from_documents(docs: pa.Table) -> pa.Table:
    """Build a deterministic media table from the documents fixture (text
    bytes as payload) — lets the plumbing be tested with no media files."""
    doc_id = docs["doc_id"].to_numpy(zero_copy_only=False)
    texts = docs["text"].to_pylist()
    kinds = ["image", "audio", "video"]
    return pa.Table.from_arrays(
        [
            pa.array(doc_id),
            pa.array([kinds[int(i) % 3] for i in doc_id], type=pa.string()),
            pa.array([(t or "").encode() for t in texts], type=pa.binary()),
            pa.array(["application/octet-stream"] * len(texts), type=pa.string()),
            pa.array(["{}"] * len(texts), type=pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


def image_features(ds, *, concurrency: int = 2, batch_size: int = 128):
    return ds.map_batches(
        ImageFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_util.pool_size(concurrency),
    )


def sample_frames(ds, *, frames_per_item: int = 4, concurrency: int = 2,
                  batch_size: int = 128):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"frames_per_item": frames_per_item},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_util.pool_size(concurrency),
    )
