"""Multimodal column stages: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages (SURVEY.md §1.2 binary columns; M1/M6/M12 analogs).

The decode kernels are STUBBED — this container has no image/audio
libraries — behind ``codec="stub"`` (deterministic fake derived from the
payload bytes) with ``NotImplementedError`` for real codecs, clearly
marked. Everything Ray-side is real and tested: schema (binary payload +
struct metadata), bytes-bounded batch sizing, actor signature, output
layout. Swapping in PIL/ffmpeg touches only ``_decode_*``.

Batch-size guidance: binary payloads inflate batches — callers size
``batch_size`` by BYTES (target_batch_bytes / typical payload), not rows,
and keep payload columns out of wide intermediate schemas
(``select_columns`` after feature extraction).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.arrow_utils import as_array

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("media_type", pa.string()),          # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.struct([("declared_w", pa.int32()),
                        ("declared_h", pa.int32()),
                        ("duration_ms", pa.int32())])),
])


def synth_payload(media_ref: str, kind: str = "image") -> bytes:
    """Deterministic fake payload: sha1-keyed pseudorandom bytes with a
    4-byte magic prefix per media type."""
    magic = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}[kind]
    seed = int.from_bytes(hashlib.sha1(media_ref.encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return magic + rng.integers(0, 256, size=256, dtype=np.uint8).tobytes()


class MediaDecoder:
    """Actor-pool decode stage: payload binary -> typed features.

    ``codec="stub"``: deterministic fake decode (dims/energy from payload
    bytes). Real codecs raise NotImplementedError until their libraries
    exist in the image — the call sites and schemas don't change.
    """

    def __init__(self, codec: str = "stub"):
        if codec != "stub":
            raise NotImplementedError(
                f"codec={codec!r}: real decoders (PIL/libsndfile/ffmpeg) are "
                "not available in this environment; use codec='stub'")
        self.codec = codec

    @staticmethod
    def _decode_stub(payload: bytes) -> tuple[int, int, int, int]:
        """-> (width, height, n_frames, energy_x1e3), all deterministic."""
        body = np.frombuffer(payload[4:], dtype=np.uint8)
        h = hashlib.sha1(payload).digest()
        width = 64 + h[0] * 4
        height = 64 + h[1] * 4
        n_frames = 1 + h[2] % 32
        energy = int(float(body.mean()) * 1000) if len(body) else 0
        return width, height, n_frames, energy

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = as_array(batch.column("payload")).to_pylist()
        w, ht, nf, en = [], [], [], []
        for p in payloads:
            a, b, c, d = self._decode_stub(p)
            w.append(a); ht.append(b); nf.append(c); en.append(d)
        out = batch.drop_columns(["payload"])       # prune heavy bytes
        return (out.append_column("width", pa.array(w, type=pa.int32()))
                   .append_column("height", pa.array(ht, type=pa.int32()))
                   .append_column("n_frames", pa.array(nf, type=pa.int32()))
                   .append_column("energy_x1e3", pa.array(en, type=pa.int64())))


class FrameSampler:
    """Actor-pool frame-sample stage (video analog): 1 media row ->
    ceil(n_frames / stride) frame rows with deterministic frame refs."""

    def __init__(self, stride: int = 8):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, frames = [], [], []
        media = as_array(batch.column("media_ref")).to_pylist()
        docs = as_array(batch.column("doc_id")).to_pylist()
        nfs = as_array(batch.column("n_frames")).to_pylist()
        for doc, ref, nf in zip(docs, media, nfs):
            for f in range(0, nf, self.stride):
                doc_ids.append(doc)
                refs.append(f"{ref}#frame={f}")
                frames.append(f)
        return pa.Table.from_arrays(
            [pa.array(doc_ids, type=pa.string()),
             pa.array(refs, type=pa.string()),
             pa.array(frames, type=pa.int32())],
            names=["doc_id", "frame_ref", "frame_index"])
