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


SCENE_SEGMENT_LEN = 12     # frames per synthetic "scene" segment
SCENE_JITTER = 0.02        # per-frame luminance noise inside a scene


def synth_frame_gray(video_ref: str, frame_index: int) -> "np.ndarray":
    """Deterministic stub FRAME decode: a (16, 16) grayscale image that
    is stable within a scene segment (same base image for all frames in
    one SCENE_SEGMENT_LEN window, plus a few percent of per-frame
    noise) and unrelated across segments — the temporal structure a
    real codec's frames have at shot boundaries. Real decoders replace
    exactly this function; the pHash/cut kernels downstream are the
    production path."""
    def gray(seed_key: str) -> np.ndarray:
        seed = int.from_bytes(
            hashlib.sha1(seed_key.encode()).digest()[:8], "big")
        rng = np.random.default_rng(seed)
        return rng.random((16, 16)) * 255.0

    seg = frame_index // SCENE_SEGMENT_LEN
    base = gray(f"{video_ref}|seg={seg}")
    jit = gray(f"{video_ref}|frame={frame_index}")
    return base * (1.0 - SCENE_JITTER) + jit * SCENE_JITTER


_VARIANT_CLUSTER = 10      # docs per shared-asset window


def synth_payload_variant(media_ref: str, kind: str = "image") -> bytes:
    """Payload whose CONTENT is keyed on the asset name scoped to a
    BOUNDED window of documents, with a few ref-specific byte flips on
    top — the web reality that the same source image recurs across a
    handful of documents with slight recompression noise. Refs sharing
    (asset name, doc window) => payloads within a couple of bytes of
    each other; anything else => unrelated bytes. The window bound
    (<=10 docs per asset) keeps near-dup cluster size O(1), so the pair
    count grows LINEARLY with the corpus — an unbounded shared-asset
    keyspace would make every pair stage quadratic at scale."""
    head, _, suffix = media_ref.rpartition("/")
    digits = "".join(ch for ch in head if ch.isdigit())
    window = int(digits) // _VARIANT_CLUSTER if digits \
        else int.from_bytes(hashlib.sha1(head.encode()).digest()[:4], "big")
    base = bytearray(synth_payload(f"{window}:{suffix}", kind))
    h = hashlib.sha1(media_ref.encode()).digest()
    for i in range(h[0] % 3):                       # 0-2 noisy bytes
        base[4 + h[i + 1]] = h[i + 5]
    return bytes(base)


class MediaDecoder:
    """Actor-pool decode stage: payload binary -> typed features.

    ``codec="stub"``: deterministic fake decode (dims/energy from payload
    bytes). ``codec="pil"`` dispatches to Pillow when the runtime image
    has it (``functions/imaging.py`` probe — the lance pattern) and
    raises NotImplementedError otherwise; other real codecs
    (libsndfile/ffmpeg) stay gated the same way. The call sites and
    output schema are identical on every path.
    """

    def __init__(self, codec: str = "stub", keep_payload: bool = False):
        if codec == "pil":
            from ..functions.imaging import pil_image
            pil_image()            # raises unless Pillow is installed
        elif codec != "stub":
            raise NotImplementedError(
                f"codec={codec!r}: real decoders (libsndfile/ffmpeg) are "
                "not available in this environment; use codec='stub'")
        self.codec = codec
        # downstream payload-transform stages (resize) need the bytes;
        # feature-only consumers keep the default pruning
        self.keep_payload = keep_payload

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
        if self.codec == "pil":
            from ..functions.imaging import pil_decode
            decode = pil_decode
        else:
            decode = self._decode_stub
        w, ht, nf, en = [], [], [], []
        for p in payloads:
            a, b, c, d = decode(p)
            w.append(a); ht.append(b); nf.append(c); en.append(d)
        out = batch if self.keep_payload \
            else batch.drop_columns(["payload"])    # prune heavy bytes
        return (out.append_column("width", pa.array(w, type=pa.int32()))
                   .append_column("height", pa.array(ht, type=pa.int32()))
                   .append_column("n_frames", pa.array(nf, type=pa.int32()))
                   .append_column("energy_x1e3", pa.array(en, type=pa.int64())))


class MediaResizer:
    """Actor-pool resize stage (image analog): given decoded dims, emit
    target dims preserving aspect ratio (longest side -> ``max_dim``)
    plus a deterministic "resized" payload whose length scales with the
    area ratio — the real-codec seam is the same ``codec="stub"`` gate
    as MediaDecoder (PIL would replace ``_resize_stub`` only)."""

    def __init__(self, max_dim: int = 128, codec: str = "stub"):
        if codec == "pil":
            from ..functions.imaging import pil_image
            pil_image()            # raises unless Pillow is installed
        elif codec != "stub":
            raise NotImplementedError(
                f"codec={codec!r}: real resize needs an imaging library; "
                "use codec='stub'")
        self.codec = codec
        self.max_dim = max_dim

    def _dims(self, w: int, h: int) -> tuple[int, int]:
        if max(w, h) <= self.max_dim:
            return w, h
        scale = self.max_dim / max(w, h)
        return max(1, int(w * scale)), max(1, int(h * scale))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ws = as_array(batch.column("width")).to_pylist()
        hs = as_array(batch.column("height")).to_pylist()
        payloads = as_array(batch.column("payload")).to_pylist() \
            if "payload" in batch.column_names else [b""] * len(ws)
        nw, nh, out_payload = [], [], []
        for w, h, p in zip(ws, hs, payloads):
            w2, h2 = self._dims(w, h)
            nw.append(w2)
            nh.append(h2)
            if self.codec == "pil":
                from ..functions.imaging import pil_resize
                out_payload.append(pil_resize(p, w2, h2))
                continue
            # deterministic stub: keep a prefix proportional to area ratio
            keep = max(8, int(len(p) * (w2 * h2) / max(w * h, 1)))
            out_payload.append(p[:keep])
        out = batch.drop_columns(
            [c for c in ("payload",) if c in batch.column_names])
        return (out.append_column("out_width",
                                  pa.array(nw, type=pa.int32()))
                   .append_column("out_height",
                                  pa.array(nh, type=pa.int32()))
                   .append_column("resized_payload",
                                  pa.array(out_payload, type=pa.binary())))


AUDIO_BANDS = 4


class AudioFeaturizer:
    """Actor-pool audio feature stage: payload bytes as a fake int8
    waveform -> per-band spectral energy (numpy rfft, AUDIO_BANDS bands).
    The FFT is real compute over the binary column — the plumbing a real
    libsndfile decode would feed."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = as_array(batch.column("payload")).to_pylist()
        feats = []
        for p in payloads:
            wave = np.frombuffer(p[4:], dtype=np.int8).astype(np.float64)
            if len(wave) == 0:
                feats.append([0] * AUDIO_BANDS)
                continue
            spec = np.abs(np.fft.rfft(wave)) ** 2
            bands = np.array_split(spec, AUDIO_BANDS)
            feats.append([int(b.sum()) for b in bands])
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "band_energy", pa.array(feats, type=pa.list_(pa.int64())))


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
