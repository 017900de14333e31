"""Media pipeline: build the opaque-binary media table from the corpus's
image spans, decode features (actor pool), sample frames. The payloads
are deterministic fakes (no media libs here) but the table/actor/batch
plumbing is exactly what real decode needs."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..functions.arrow_utils import as_array
from ..stages.multimodal import (MEDIA_SCHEMA, FrameSampler, MediaDecoder,
                                 synth_payload_variant)
from ..sources.io import read_docs
from .analysis import _corpus_for


def media_table_from_docs(ds: Dataset) -> Dataset:
    """Explode image spans into one media row per media_ref, synthesizing
    deterministic payloads (media_type cycles by ref hash)."""

    TYPES = np.array(["image", "audio", "video"])

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = as_array(pc.list_flatten(spans))
        parent = as_array(pc.list_parent_indices(spans))
        kind = pc.struct_field(flat, "kind")
        mask = pc.equal(kind, "image")
        ref_arr = as_array(pc.filter(
            pc.fill_null(pc.struct_field(flat, "media_ref"), ""), mask))
        doc_arr = as_array(pc.take(batch.column("doc_id"),
                                   pc.filter(parent, mask)))
        n = len(ref_arr)
        refs = ref_arr.to_pylist()
        # Type by a hash of the FULL ref: generator refs end only in
        # -0/-1, so any suffix-derived typing silently never yields
        # "video" (round-1 bug: media_frames was always empty). One sha1
        # per ref (sha1 of a short string is the irreducible per-row
        # work); typing and column assembly are numpy/Arrow — no row
        # dicts, no from_pylist (r2 verdict item 5).
        first = np.frombuffer(
            b"".join(hashlib.sha1(r.encode()).digest()[:1] for r in refs),
            dtype=np.uint8) if n else np.zeros(0, dtype=np.uint8)
        mts = TYPES[first % 3]
        payloads = [synth_payload_variant(r, m)       # stub-only synthesis
                    for r, m in zip(refs, mts)]
        zeros = pa.array(np.zeros(n, dtype=np.int32))
        meta = pa.StructArray.from_arrays(
            [zeros, zeros, zeros],
            names=["declared_w", "declared_h", "duration_ms"])
        return pa.Table.from_arrays(
            [doc_arr, ref_arr, pa.array(mts, type=pa.string()),
             pa.array(payloads, type=pa.binary()), meta],
            schema=MEDIA_SCHEMA)

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None)


def features_pipeline(ds: Dataset, *,
                      decode_num_gpus: float | None = None,
                      decode_resources: dict | None = None) -> Dataset:
    """Decode stub features for every media payload in a docs Dataset.

    ``decode_num_gpus`` / ``decode_resources``: per-actor accelerator
    claim for a real hardware decoder (NVDEC/DALI-class); default off."""
    from ..functions.cluster import accel_remote_args, half_pool
    media = media_table_from_docs(ds)
    # bytes-bounded batches: payloads are ~260B fakes; real images would
    # push batch_size down to target_bytes/payload_size
    return media.map_batches(MediaDecoder, batch_format="pyarrow",
                             batch_size=512, concurrency=half_pool(),
                             num_cpus=1,
                             fn_constructor_kwargs={"codec": "stub"},
                             **accel_remote_args(decode_num_gpus,
                                                 decode_resources))


def frames_pipeline(ds: Dataset) -> Dataset:
    """Frame sampling over decoded video rows (flat explode)."""
    feats = features_pipeline(ds)
    vids = feats.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "video")),
        batch_format="pyarrow", batch_size=None)
    return vids.map_batches(FrameSampler, batch_format="pyarrow",
                            batch_size=512, concurrency=(1, 2), num_cpus=1)


def media_features(sf_dir: str):
    """Decode stub features for every media payload (rows-only check)."""
    return features_pipeline(read_docs(_corpus_for(sf_dir)))


def media_frames(sf_dir: str):
    """Frame sampling over decoded video rows (flat explode)."""
    return frames_pipeline(read_docs(_corpus_for(sf_dir)))


def media_resized(sf_dir: str):
    """Image resize plumbing: decode (payload kept) -> actor-pool resize
    (aspect-preserving to max dim 128, payload bytes shrunk by the area
    ratio) over the image rows only; payload pruned after."""
    from ..functions.cluster import half_pool
    from ..stages.multimodal import MediaResizer

    media = media_table_from_docs(read_docs(_corpus_for(sf_dir)))
    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "image")),
        batch_format="pyarrow", batch_size=None)
    decoded = imgs.map_batches(MediaDecoder, batch_format="pyarrow",
                               batch_size=512, concurrency=half_pool(),
                               num_cpus=1,
                               fn_constructor_kwargs={"keep_payload": True})
    resized = decoded.map_batches(MediaResizer, batch_format="pyarrow",
                                  batch_size=512, concurrency=(1, 2),
                                  num_cpus=1)
    return resized.drop_columns(["resized_payload"])


def media_audio_features(sf_dir: str):
    """Spectral band energies for audio rows (numpy rfft over the
    payload-as-waveform; AUDIO_BANDS int64 energies per row)."""
    from ..stages.multimodal import AudioFeaturizer

    media = media_table_from_docs(read_docs(_corpus_for(sf_dir)))
    audio = media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "audio")),
        batch_format="pyarrow", batch_size=None)
    return audio.map_batches(AudioFeaturizer, batch_format="pyarrow",
                             batch_size=512, concurrency=(1, 2), num_cpus=1)


def media_payload_dedup(sf_dir: str, docs: Dataset | None = None):
    """Exact dedup over opaque BINARY payloads: sha1 of the payload
    bytes -> representative (min media_ref) + copy count per content
    group. The binary-column analog of doc_dedup_exact: only the
    fixed-width digest and ref shuffle, never payload bytes."""
    from ray.data.aggregate import Count, Min

    media = media_table_from_docs(
        docs if docs is not None else read_docs(_corpus_for(sf_dir)))

    def keyed(batch: pa.Table) -> pa.Table:
        sha = pa.array([hashlib.sha1(p).hexdigest()
                        for p in batch["payload"].to_pylist()],
                       type=pa.string())
        return pa.Table.from_arrays([sha, batch["media_ref"]],
                                    names=["payload_sha1", "media_ref"])

    return (media.map_batches(keyed, batch_format="pyarrow", batch_size=None)
            .groupby("payload_sha1")
            .aggregate(Min("media_ref", alias_name="rep_media_ref"),
                       Count(alias_name="n_copies"))
            .sort("payload_sha1"))


def phash_features(media: Dataset) -> Dataset:
    """(media_ref, phash int64) for every image row — DCT pHash over the
    decoded 32x32 thumbnail, vectorized per batch."""
    from ..functions import phash as P

    def fn(batch: pa.Table) -> pa.Table:
        imgs = P.payload_gray32(batch["payload"].to_pylist())
        h = P.phash64(imgs)
        return pa.Table.from_pydict({
            "media_ref": batch["media_ref"].to_numpy(zero_copy_only=False),
            "phash": h.view(np.int64)})

    return media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "image")),
        batch_format="pyarrow", batch_size=None).map_batches(fn, batch_format="pyarrow", batch_size=None)


def phash_pairs_from_media(media: Dataset):
    """Image near-dup pairs by banded pHash search: every image emits
    8 (band_key, ref, hash) rows; one coarse exchange groups band
    collisions; each group Hamming-verifies its candidates against the
    full 64-bit hash it carried along (8 bytes — unlike text, the hash
    itself rides the shuffle, so no re-join). 8 bands x 8 bits makes
    candidate recall EXACT at Hamming <= 7 (pigeonhole: 7 flips can't
    touch all 8 bands) for buckets up to DEDUP_STAR_THRESHOLD members;
    past that the hot-bucket star guard pairs members to the bucket's
    min-ref representative only — a repeated-asset flood (site logo on
    every page) keeps linear pair output and full rep-connectivity, but
    two near-dups both far from the representative can be missed inside
    such a flood bucket (the same documented recall/cost tradeoff as
    the text dedup tier). Cross-band duplicate pairs collapse in one
    tiny second exchange keyed on the pair."""
    from ..functions import phash as P

    from ..functions.cluster import default_n_coarse
    N_COARSE = default_n_coarse()

    def bands(batch: pa.Table) -> pa.Table:
        imgs = P.payload_gray32(batch["payload"].to_pylist())
        h = P.phash64(imgs)
        keys = P.band_keys(h)                      # (n, N_BANDS)
        n = len(batch)
        refs = np.repeat(batch["media_ref"].to_numpy(zero_copy_only=False),
                         P.N_BANDS)
        flat = keys.reshape(-1)
        return pa.Table.from_pydict({
            "key": flat,
            "coarse": (flat.view(np.uint64)
                       % np.uint64(N_COARSE)).astype(np.int64),
            "media_ref": refs,
            "phash": np.repeat(h.view(np.int64), P.N_BANDS)})

    import pandas as pd

    def pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        from ..functions.hashing import hamming_distance
        empty = pd.DataFrame({"ref_a": pd.Series(dtype="object"),
                              "ref_b": pd.Series(dtype="object"),
                              "hamming": pd.Series(dtype="int64")})
        key = g["key"].to_numpy()
        ref = g["media_ref"].to_numpy()
        ph = g["phash"].to_numpy().view(np.uint64)
        order = np.lexsort((ref, key))
        key, ref, ph = key[order], ref[order], ph[order]
        if not len(key):
            return empty
        new = np.empty(len(key), dtype=bool)
        new[0] = True
        np.not_equal(key[1:], key[:-1], out=new[1:])
        starts = np.nonzero(new)[0]
        counts = np.diff(np.append(starts, len(key)))
        # same hot-bucket star guard as the text dedup tier: a repeated
        # asset (site logo on every page) floods one phash bucket
        from .dedup import _bucket_pair_indices
        ai_parts, bj_parts = [], []
        tri_cache: dict[int, tuple] = {}
        for s, c in zip(starts[counts >= 2], counts[counts >= 2]):
            ai_b, bj_b = _bucket_pair_indices(int(c), tri_cache)
            ai_parts.append(ai_b + s)
            bj_parts.append(bj_b + s)
        if not ai_parts:
            return empty
        ai, bj = np.concatenate(ai_parts), np.concatenate(bj_parts)
        d = hamming_distance(ph[ai], ph[bj])
        keep = (d <= P.MAX_HAMMING) & (ref[ai] != ref[bj])
        a, b = ref[ai][keep], ref[bj][keep]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"ref_a": a2, "ref_b": b2,
                             "hamming": pd.Series(d[keep], dtype="int64")})

    def distinct(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.drop_duplicates(["ref_a", "ref_b"])

    cand = media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "image")),
        batch_format="pyarrow", batch_size=None) \
        .map_batches(bands, batch_format="pyarrow", batch_size=None) \
        .groupby("coarse").map_groups(pairs, batch_format="pandas")

    def pair_key(batch: pa.Table) -> pa.Table:
        import pandas as pd_
        h = pd_.util.hash_array(
            (pc.binary_join_element_wise(batch["ref_a"], batch["ref_b"],
                                         "|")).to_numpy(zero_copy_only=False)
            .astype(str))
        return batch.append_column(
            "pcoarse", pa.array((h % np.uint64(N_COARSE)).astype(np.int64)))

    return cand.map_batches(pair_key, batch_format="pyarrow", batch_size=None) \
        .groupby("pcoarse") \
        .map_groups(lambda g: distinct(g.drop(columns=["pcoarse"])),
                    batch_format="pandas") \
        .sort(["ref_a", "ref_b"])


def media_phash(sf_dir: str):
    """Perceptual-hash feature table for every image (rows-only)."""
    return phash_features(
        media_table_from_docs(read_docs(_corpus_for(sf_dir))))


def media_phash_pairs(sf_dir: str):
    """Image near-duplicate pairs over the corpus media table: the same
    asset recurring across documents carries a couple of bytes of
    recompression-style noise (synth_payload_variant), so the pHash
    pair search finds real cross-document near-dups at every sf."""
    return phash_pairs_from_media(
        media_table_from_docs(read_docs(_corpus_for(sf_dir))))


SCENE_CUT_HAMMING = 19     # consecutive-frame pHash distance => cut.
#  pHash bits near the DCT median flip under any jitter, so within-scene
#  distances have a tail to ~18 while cross-scene distances concentrate
#  at ~32 with a floor near 20 (measured at two sfs): 19 sits in the
#  gap. Detection is statistical by nature — the differential test
#  asserts >= 98% agreement with planted boundaries, not exactness.


def media_scene_changes(sf_dir: str):
    """Temporal scene-change (shot-boundary) detection over sampled
    video frames: decode each sampled frame (stub; real codecs replace
    only the frame decode), pHash it, and within each video compare
    consecutive sampled frames — Hamming distance above
    SCENE_CUT_HAMMING marks a cut. Frame hashing is batch-local; the
    only exchange moves (video, frame_index, 8-byte hash) rows through
    a coarse video-keyed shuffle, so payload bytes never cross the
    wire. A video's own frame list is bounded by duration x sample
    rate, so the per-group sort is O(frames-per-video), never
    corpus-shaped. Differential-tested against the frame generator's
    planted segment boundaries."""
    import numpy as np
    import pandas as pd

    from ..functions.phash import phash64
    from ..stages.multimodal import synth_frame_gray

    frames = frames_pipeline(read_docs(_corpus_for(sf_dir)))

    def hash_frames(batch: pa.Table) -> pa.Table:
        refs = batch["frame_ref"].to_pylist()
        idxs = batch["frame_index"].to_numpy(zero_copy_only=False)
        vids = [r.rsplit("#frame=", 1)[0] for r in refs]
        if not refs:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "media_ref": pa.array([], type=pa.string()),
                             "frame_index": pa.array([], type=pa.int64()),
                             "phash": pa.array([], type=pa.int64())})
        imgs = np.stack([synth_frame_gray(v, int(i))
                         for v, i in zip(vids, idxs)])
        h = phash64(imgs).view(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "media_ref": pa.array(vids, type=pa.string()),
                         "frame_index": pa.array(idxs.astype(np.int64)),
                         "phash": pa.array(h)})

    hashed = frames.map_batches(hash_frames, batch_format="pyarrow",
                                batch_size=None)

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pandas as _pd
        h = _pd.util.hash_array(
            batch["media_ref"].to_numpy(zero_copy_only=False).astype(str))
        return batch.append_column(
            "_coarse", pa.array((h % np.uint64(16)).astype(np.int64))) \
            .replace_schema_metadata(None)

    def cuts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_coarse"]) \
            .sort_values(["media_ref", "frame_index"])
        prev_hash = g.groupby("media_ref")["phash"].shift(1)
        x = (g["phash"].to_numpy(np.int64).view(np.uint64)
             ^ prev_hash.fillna(g["phash"]).to_numpy(np.int64)
             .view(np.uint64))
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1) \
            .sum(axis=1).astype(np.int64)
        ham[prev_hash.isna().to_numpy()] = -1     # first sampled frame
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "media_ref": g["media_ref"].to_numpy(),
            "frame_index": g["frame_index"].to_numpy(np.int64),
            "hamming_prev": ham,
            "is_cut": (ham > SCENE_CUT_HAMMING).astype(np.int64)})

    return (hashed.map_batches(add_coarse, batch_format="pyarrow",
                               batch_size=None)
            .groupby("_coarse").map_groups(cuts, batch_format="pandas")
            .sort(["media_ref", "frame_index"]))


def media_text_pairs(sf_dir: str, docs: "Dataset | None" = None):
    """Image-text pair mining: every image span pairs with the NEAREST
    text span by span offset within its own document (ties to the
    preceding text) — the (image, caption-candidate) dataset
    construction step of a contrastive multimodal pipeline. Entirely
    doc-local: a document's spans live inside one batch row, so pairing
    is a per-row searchsorted with zero exchange; only the (ref, text,
    gap) pairs leave the stage. Output: (doc_id, media_ref, pair_text,
    offset_gap)."""
    import pandas as pd

    src = docs if docs is not None else read_docs(_corpus_for(sf_dir))

    def pair(batch: pa.Table) -> pa.Table:
        import numpy as np
        out = {"doc_id": [], "media_ref": [], "pair_text": [],
               "offset_gap": []}
        for row in batch.to_pylist():
            spans = row["spans"]
            t_off = np.array([s["offset"] for s in spans
                              if s["kind"] == "text"], dtype=np.int64)
            t_txt = [s["text"] for s in spans if s["kind"] == "text"]
            if len(t_off) == 0:
                continue
            order = np.argsort(t_off, kind="stable")
            t_off = t_off[order]
            t_txt = [t_txt[i] for i in order]
            for s in spans:
                if s["kind"] != "image":
                    continue
                i = int(np.searchsorted(t_off, s["offset"]))
                cands = []
                if i > 0:
                    cands.append((abs(int(s["offset"] - t_off[i - 1])),
                                  0, i - 1))
                if i < len(t_off):
                    cands.append((abs(int(t_off[i] - s["offset"])),
                                  1, i))
                gap, _, j = min(cands)
                out["doc_id"].append(row["doc_id"])
                out["media_ref"].append(s["media_ref"])
                out["pair_text"].append(t_txt[j])
                out["offset_gap"].append(gap)
        return pa.Table.from_pydict(
            out, schema=pa.schema([("doc_id", pa.string()),
                                   ("media_ref", pa.string()),
                                   ("pair_text", pa.string()),
                                   ("offset_gap", pa.int64())]))

    return src.map_batches(pair, batch_format="pyarrow", batch_size=None)


AUDIO_SEG_WINDOW = 64          # frame length over the fake int8 waveform


def media_audio_segments(sf_dir: str):
    """Energy-threshold (VAD-style) segmentation over audio payloads:
    the waveform splits into {AUDIO_SEG_WINDOW}-sample frames, a frame
    is ACTIVE when its integer energy exceeds the clip's mean frame
    energy, and contiguous active runs emit one segment row — the
    speech-detection front end of an audio curation pipeline (a real
    decoder replaces only the waveform read). All-integer energies;
    per-clip work is payload-bounded. Output: (doc_id, media_ref,
    seg_index, frame_start, frame_end, energy)."""
    from ..stages.multimodal import as_array

    media = media_table_from_docs(read_docs(_corpus_for(sf_dir)))
    audio = media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "audio")),
        batch_format="pyarrow", batch_size=None)

    def segments(batch: pa.Table) -> pa.Table:
        import numpy as np
        out = {"doc_id": [], "media_ref": [], "seg_index": [],
               "frame_start": [], "frame_end": [], "energy": []}
        docs = as_array(batch.column("doc_id")).to_pylist()
        refs = as_array(batch.column("media_ref")).to_pylist()
        payloads = as_array(batch.column("payload")).to_pylist()
        for doc, ref, p in zip(docs, refs, payloads):
            wave = np.frombuffer(p[4:], dtype=np.int8).astype(np.int64)
            n_fr = len(wave) // AUDIO_SEG_WINDOW
            if n_fr == 0:
                continue
            fr = wave[:n_fr * AUDIO_SEG_WINDOW] \
                .reshape(n_fr, AUDIO_SEG_WINDOW)
            en = (fr * fr).sum(axis=1)
            thr = int(en.sum()) // n_fr          # integer mean energy
            active = en > thr
            seg = 0
            i = 0
            while i < n_fr:
                if active[i]:
                    j = i
                    while j + 1 < n_fr and active[j + 1]:
                        j += 1
                    out["doc_id"].append(doc)
                    out["media_ref"].append(ref)
                    out["seg_index"].append(seg)
                    out["frame_start"].append(i)
                    out["frame_end"].append(j)
                    out["energy"].append(int(en[i:j + 1].sum()))
                    seg += 1
                    i = j + 1
                else:
                    i += 1
        return pa.Table.from_pydict(
            out, schema=pa.schema([("doc_id", pa.string()),
                                   ("media_ref", pa.string()),
                                   ("seg_index", pa.int64()),
                                   ("frame_start", pa.int64()),
                                   ("frame_end", pa.int64()),
                                   ("energy", pa.int64())]))

    return audio.map_batches(segments, batch_format="pyarrow",
                             batch_size=512)


def media_keyframes(sf_dir: str):
    """Keyframe selection: split each video's sampled frames into shots
    at the detected scene cuts, then pick per shot the frame with the
    highest gradient-energy sharpness (tie -> smallest frame index) —
    the storyboard/thumbnail primitive of a video training pipeline.
    Frame decode + pHash + sharpness are one batch-local vectorized
    pass; the only exchange moves (video, frame, hash, sharpness) rows
    through the same coarse video-keyed shuffle as scene detection, and
    the per-group shot fold is bounded by frames-per-video. Output:
    (doc_id, media_ref, shot_id, keyframe_index, n_frames,
    sharpness_x100)."""
    import numpy as np
    import pandas as pd

    from ..functions.phash import phash64
    from ..stages.multimodal import synth_frame_gray

    frames = frames_pipeline(read_docs(_corpus_for(sf_dir)))

    def hash_and_sharpen(batch: pa.Table) -> pa.Table:
        refs = batch["frame_ref"].to_pylist()
        idxs = batch["frame_index"].to_numpy(zero_copy_only=False)
        if not refs:
            return pa.table({"doc_id": pa.array([], type=pa.string()),
                             "media_ref": pa.array([], type=pa.string()),
                             "frame_index": pa.array([], type=pa.int64()),
                             "phash": pa.array([], type=pa.int64()),
                             "sharp_x100": pa.array([], type=pa.int64())})
        vids = [r.rsplit("#frame=", 1)[0] for r in refs]
        imgs = np.stack([synth_frame_gray(v, int(i))
                         for v, i in zip(vids, idxs)])
        h = phash64(imgs).view(np.int64)
        gx = np.abs(np.diff(imgs, axis=2)).sum(axis=(1, 2))
        gy = np.abs(np.diff(imgs, axis=1)).sum(axis=(1, 2))
        sharp = np.round((gx + gy) * 100.0).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "media_ref": pa.array(vids, type=pa.string()),
                         "frame_index": pa.array(idxs.astype(np.int64)),
                         "phash": pa.array(h),
                         "sharp_x100": pa.array(sharp)})

    hashed = frames.map_batches(hash_and_sharpen, batch_format="pyarrow",
                                batch_size=None)

    def add_coarse(batch: pa.Table) -> pa.Table:
        import pandas as _pd
        h = _pd.util.hash_array(
            batch["media_ref"].to_numpy(zero_copy_only=False).astype(str))
        return batch.append_column(
            "_coarse", pa.array((h % np.uint64(16)).astype(np.int64))) \
            .replace_schema_metadata(None)

    def shots(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_coarse"]) \
            .sort_values(["media_ref", "frame_index"])
        prev_hash = g.groupby("media_ref")["phash"].shift(1)
        x = (g["phash"].to_numpy(np.int64).view(np.uint64)
             ^ prev_hash.fillna(g["phash"]).to_numpy(np.int64)
             .view(np.uint64))
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1) \
            .sum(axis=1).astype(np.int64)
        is_cut = (ham > SCENE_CUT_HAMMING) & prev_hash.notna().to_numpy()
        g = g.assign(shot_id=is_cut.astype(np.int64))
        g["shot_id"] = g.groupby("media_ref")["shot_id"].cumsum()
        # keyframe per (video, shot): max sharpness, then min frame idx
        g = g.sort_values(["media_ref", "shot_id", "sharp_x100",
                           "frame_index"],
                          ascending=[True, True, False, True])
        agg = g.groupby(["media_ref", "shot_id"], as_index=False).agg(
            doc_id=("doc_id", "first"),
            keyframe_index=("frame_index", "first"),
            sharpness_x100=("sharp_x100", "first"),
            n_frames=("frame_index", "size"))
        return agg[["doc_id", "media_ref", "shot_id", "keyframe_index",
                    "n_frames", "sharpness_x100"]].astype(
            {"shot_id": "int64", "keyframe_index": "int64",
             "n_frames": "int64", "sharpness_x100": "int64"})

    return (hashed.map_batches(add_coarse, batch_format="pyarrow",
                               batch_size=None)
            .groupby("_coarse").map_groups(shots, batch_format="pandas")
            .sort(["media_ref", "shot_id"]))


PATCH_GRID = 4


def media_patches(sf_dir: str, docs: "Dataset | None" = None):
    """ViT-style patch tiling: every image decodes to the 16x16 stub
    thumbnail and tiles into a PATCH_GRID x PATCH_GRID grid; one row
    per patch with integer mean/energy features — the patch-embedding
    front end of any vision-transformer training pipeline (the real
    codec swaps in under the same schema). Fully vectorized: one
    reshape/transpose per batch, no per-patch Python."""
    from ..functions import phash as P

    media = media_table_from_docs(
        docs if docs is not None else read_docs(_corpus_for(sf_dir)))

    def tile(batch: pa.Table) -> pa.Table:
        imgs = P.payload_gray32(batch["payload"].to_pylist())
        n = imgs.shape[0]
        g = P.GRAY_N // PATCH_GRID
        p = imgs.reshape(n, PATCH_GRID, g, PATCH_GRID, g) \
            .transpose(0, 1, 3, 2, 4).reshape(n, PATCH_GRID, PATCH_GRID, -1)
        mean = p.mean(axis=3)
        energy = (p * p).sum(axis=3)
        refs = np.repeat(batch["media_ref"].to_numpy(zero_copy_only=False),
                         PATCH_GRID * PATCH_GRID)
        rr, cc = np.meshgrid(np.arange(PATCH_GRID), np.arange(PATCH_GRID),
                             indexing="ij")
        return pa.Table.from_pydict({
            "media_ref": refs,
            "patch_row": np.tile(rr.ravel(), n).astype(np.int64),
            "patch_col": np.tile(cc.ravel(), n).astype(np.int64),
            "mean_x1e6": np.round(mean.reshape(-1) * 1e6).astype(np.int64),
            "energy_x100": np.round(energy.reshape(-1) * 100.0)
            .astype(np.int64)})

    return (media.map_batches(
        lambda t: t.filter(pc.equal(t["media_type"], "image")),
        batch_format="pyarrow", batch_size=None)
        .map_batches(tile, batch_format="pyarrow", batch_size=512))


MEDIA_QUERIES: dict[str, tuple] = {
    "media_text_pairs": (media_text_pairs, None),
    "media_audio_segments": (media_audio_segments, None),
    "media_keyframes": (media_keyframes, None),
    "media_patches": (media_patches, None),
    "media_scene_changes": (media_scene_changes, None),
    "media_phash": (media_phash, None),
    "media_phash_pairs": (media_phash_pairs, None),
    "media_payload_dedup": (media_payload_dedup, None),
    "media_features": (media_features, None),
    "media_frames": (media_frames, None),
    "media_resized": (media_resized, None),
    "media_audio_features": (media_audio_features, None),
}
