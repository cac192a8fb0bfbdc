"""Pure-numpy binary media codecs: 24-bit BMP images, 16-bit PCM WAV audio,
and a minimal multi-frame container ("FRV1") for video-style frame sampling.

These are REAL encoders/decoders for the real on-disk formats (verified
round-trip in tests/test_datapipe.py) — no image/audio libraries exist in
this environment, but BMP (Windows BITMAPINFOHEADER) and WAV (RIFF PCM)
are simple enough to implement exactly with struct + numpy. They back the
multimodal pipeline (flashray/datapipe/multimodal.py) so `media_features`
/ `frame_samples` decode genuine binary payloads instead of hashing them.

Covers SURVEY.md §2 "multimodal columns": decode / feature-extract /
frame-sample as actor-pool map_batches stages over opaque binary columns.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP — uncompressed 24-bit, BITMAPINFOHEADER, bottom-up rows, BGR order,
# rows padded to 4-byte boundaries. This is the classic Windows V3 DIB.
# --------------------------------------------------------------------------

_BMP_FILE_HDR = struct.Struct("<2sIHHI")  # magic, file size, res, res, offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit uncompressed BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) RGB array, got {img.shape}")
    h, w, _ = img.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    # RGB -> BGR, top-down -> bottom-up, pad rows
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    pixel_bytes = rows.tobytes()
    offset = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    file_hdr = _BMP_FILE_HDR.pack(b"BM", offset + len(pixel_bytes), 0, 0, offset)
    info_hdr = _BMP_INFO_HDR.pack(
        _BMP_INFO_HDR.size, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pixel_bytes


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (H, W, 3) uint8 RGB array.

    Handles both bottom-up (positive height, the normal case) and top-down
    (negative height) row orders; rejects compressed / non-24-bit files.
    """
    if len(data) < _BMP_FILE_HDR.size + 4 or data[:2] != b"BM":
        raise ValueError("not a BMP file (bad magic)")
    _, _, _, _, offset = _BMP_FILE_HDR.unpack_from(data, 0)
    hdr_size = struct.unpack_from("<I", data, _BMP_FILE_HDR.size)[0]
    if hdr_size < _BMP_INFO_HDR.size:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    (_, w, h, planes, bpp, compression, *_rest) = _BMP_INFO_HDR.unpack_from(
        data, _BMP_FILE_HDR.size
    )
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    pixels = np.frombuffer(data, dtype=np.uint8, count=h * stride, offset=offset)
    rows = pixels.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    bgr = rows if top_down else rows[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])


# --------------------------------------------------------------------------
# WAV — RIFF container, PCM 16-bit little-endian, mono or interleaved.
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               channels: int = 1) -> bytes:
    """Encode an int16 sample array as a PCM-16 RIFF/WAVE file."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate,
        channels * 2, 16,
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a PCM-16 WAV file → (int16 samples, sample_rate, channels).

    Walks the RIFF chunk list (tolerates extra chunks like LIST/fact before
    data); rejects non-PCM / non-16-bit encodings.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, fmt_tag = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = pos + 8
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
        elif cid == b"data":
            if rate is None:
                raise ValueError("WAV data chunk before fmt chunk")
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"only PCM-16 supported (fmt={fmt_tag}, bits={bits})"
                )
            samples = np.frombuffer(data, dtype="<i2", count=size // 2,
                                    offset=body)
            return samples, rate, channels
        pos = body + size + (size & 1)  # chunks are word-aligned
    raise ValueError("WAV file has no data chunk")


# --------------------------------------------------------------------------
# FRV1 — a minimal frame container standing in for a video file: magic,
# frame count, then length-prefixed BMP frames. Lets frame-sampling be a
# real parse-seek-decode operation without a video library.
# --------------------------------------------------------------------------

_FRV1_MAGIC = b"FRV1"


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """Pack a list of (H, W, 3) uint8 frames into an FRV1 container."""
    parts = [_FRV1_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        bmp = encode_bmp(f)
        parts.append(struct.pack("<I", len(bmp)))
        parts.append(bmp)
    return b"".join(parts)


def frame_count(data: bytes) -> int:
    if data[:4] != _FRV1_MAGIC:
        raise ValueError("not an FRV1 container")
    return struct.unpack_from("<I", data, 4)[0]


def decode_frame(data: bytes, index: int) -> np.ndarray:
    """Seek to frame `index` and decode it (without decoding earlier frames'
    pixel data — only their length prefixes are read)."""
    n = frame_count(data)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range (container has {n})")
    pos = 8
    for _ in range(index):
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4 + size
    (size,) = struct.unpack_from("<I", data, pos)
    return decode_bmp(data[pos + 4 : pos + 4 + size])


def decode_all_frames(data: bytes) -> list[np.ndarray]:
    return [decode_frame(data, i) for i in range(frame_count(data))]
