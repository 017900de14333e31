"""Media pipeline tests: frame-sampler semantics and the planted-video
invariant (round-1 bug: suffix-derived typing never produced "video", so
``media_frames`` was silently always empty — these tests pin the fix)."""

import glob

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pdf_extraction_ray.stages.multimodal import FrameSampler


def test_frame_sampler_stride_ceil():
    """ceil(n_frames / stride) frames per row, indices 0, s, 2s, ..."""
    batch = pa.table({
        "doc_id": ["d1", "d2", "d3"],
        "media_ref": ["m1", "m2", "m3"],
        "media_type": ["video"] * 3,
        "n_frames": pa.array([1, 8, 17], type=pa.int32()),
    })
    out = FrameSampler(stride=8)(batch)
    per_doc = {}
    for d in out.column("doc_id").to_pylist():
        per_doc[d] = per_doc.get(d, 0) + 1
    assert per_doc == {"d1": 1, "d2": 1, "d3": 3}
    d3 = out.filter(pc.equal(out["doc_id"], "d3"))
    assert d3.column("frame_index").to_pylist() == [0, 8, 16]
    assert d3.column("frame_ref").to_pylist() == [
        "m3#frame=0", "m3#frame=8", "m3#frame=16"]


def test_frame_sampler_empty_batch_stable_schema():
    batch = pa.table({
        "doc_id": pa.array([], type=pa.string()),
        "media_ref": pa.array([], type=pa.string()),
        "n_frames": pa.array([], type=pa.int32()),
    })
    out = FrameSampler()(batch)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "frame_ref", "frame_index"]


@pytest.fixture(scope="module")
def media_corpus(ray_session):
    from pdf_extraction_ray.fixtures import ensure_corpus
    return ensure_corpus("media_t", 7, 300)


def test_media_types_cover_all_three(media_corpus):
    """Full-ref-hash typing must yield image, audio AND video."""
    from pdf_extraction_ray.pipelines.media import media_table_from_docs
    from pdf_extraction_ray.sources.io import read_docs
    media = media_table_from_docs(read_docs(media_corpus))
    types = set(
        media.groupby("media_type").count().to_pandas()["media_type"])
    assert types == {"image", "audio", "video"}


def test_media_frames_nonempty_one_plus_per_video(media_corpus):
    """Every decoded video row yields >=1 frame row; counts obey
    ceil(n_frames / stride) with the default stride."""
    from pdf_extraction_ray.pipelines.media import (features_pipeline,
                                                    frames_pipeline)
    from pdf_extraction_ray.sources.io import read_docs
    feats = features_pipeline(read_docs(media_corpus)).to_pandas()
    vids = feats[feats.media_type == "video"]
    assert len(vids) > 0, "corpus must plant videos"
    frames = frames_pipeline(read_docs(media_corpus)).to_pandas()
    assert len(frames) > 0
    expected = int(((vids.n_frames + 7) // 8).sum())  # default stride=8
    assert len(frames) == expected
    # frame refs are unique and parse back to their media refs
    assert frames.frame_ref.is_unique


def test_media_resizer_dims_and_payload():
    from pdf_extraction_ray.stages.multimodal import MediaResizer
    batch = pa.table({
        "media_ref": ["a", "b"],
        "width": pa.array([320, 64], type=pa.int32()),
        "height": pa.array([160, 100], type=pa.int32()),
        "payload": [b"x" * 1000, b"y" * 1000]})
    out = MediaResizer(max_dim=128)(batch)
    assert out.column("out_width").to_pylist() == [128, 64]   # aspect kept
    assert out.column("out_height").to_pylist() == [64, 100]  # small kept
    rp = out.column("resized_payload").to_pylist()
    assert len(rp[0]) < 1000          # shrunk by area ratio
    assert len(rp[1]) == 1000         # no-op resize keeps all bytes
    assert "payload" not in out.column_names


def test_audio_featurizer_deterministic_nonzero():
    from pdf_extraction_ray.stages.multimodal import (AUDIO_BANDS,
                                                      AudioFeaturizer,
                                                      synth_payload)
    batch = pa.table({"media_ref": ["m"],
                      "payload": [synth_payload("m", "audio")]})
    out1 = AudioFeaturizer()(batch)
    out2 = AudioFeaturizer()(batch)
    assert out1.column("band_energy").to_pylist() \
        == out2.column("band_energy").to_pylist()
    bands = out1.column("band_energy").to_pylist()[0]
    assert len(bands) == AUDIO_BANDS and sum(bands) > 0


def test_media_resized_and_audio_pipelines(media_corpus):
    from pdf_extraction_ray.pipelines import media as M
    orig = M._corpus_for
    M._corpus_for = lambda sf: media_corpus
    try:
        rs = M.media_resized("ignored").to_pandas()
        au = M.media_audio_features("ignored").to_pandas()
    finally:
        M._corpus_for = orig
    assert len(rs) > 0 and (rs["out_width"] <= 128).all() \
        and (rs["out_height"] <= 128).all()
    assert len(au) > 0 and au["band_energy"].map(sum).gt(0).all()


@pytest.mark.usefixtures("ray_session")
def test_media_payload_dedup_partitions_media_rows():
    from pdf_extraction_ray.pipelines.media import (
        media_payload_dedup, media_table_from_docs)
    from pdf_extraction_ray.pipelines.analysis import _corpus_for
    from pdf_extraction_ray.sources.io import read_docs

    sf = "/root/testdata/sf0.001"
    groups = media_payload_dedup(sf).to_pandas()
    n_media = media_table_from_docs(read_docs(_corpus_for(sf))).count()
    # every media row lands in exactly one content group
    assert groups["n_copies"].sum() == n_media
    assert (groups["n_copies"] >= 1).all()
    assert groups["payload_sha1"].is_unique


@pytest.mark.usefixtures("ray_session")
def test_media_payload_dedup_groups_planted_duplicates():
    """Two docs referencing the SAME media asset produce one content
    group with n_copies=2 and the lexicographically-first ref as rep."""
    import pyarrow as pa
    import ray.data as rd
    from pdf_extraction_ray.pipelines.media import media_payload_dedup
    from pdf_extraction_ray.schema import OUT_SCHEMA

    shared = "media://shared/asset-0"
    rows = [
        {"doc_id": f"d{i}", "spans": [
            {"kind": "image", "text": "", "media_ref": shared, "offset": 0}]}
        for i in range(2)
    ] + [{"doc_id": "d2", "spans": [
        {"kind": "image", "text": "", "media_ref": "media://solo/x-1",
         "offset": 0}]}]
    docs = rd.from_arrow(pa.Table.from_pylist(rows, schema=OUT_SCHEMA))
    groups = media_payload_dedup("unused", docs=docs).to_pandas()
    assert len(groups) == 2
    dup = groups[groups.n_copies == 2]
    assert len(dup) == 1 and dup.iloc[0]["rep_media_ref"] == shared
    assert (groups.n_copies.sum()) == 3


# ---------------------------------------------------------------------------
# Perceptual hash (pHash) near-dup
# ---------------------------------------------------------------------------

def test_phash_noise_robust_and_discriminative():
    import numpy as np
    from pdf_extraction_ray.functions import phash as P
    from pdf_extraction_ray.functions.hashing import hamming_distance
    from pdf_extraction_ray.stages.multimodal import synth_payload

    a = synth_payload("asset-A")
    noisy = bytearray(a)
    noisy[10] ^= 0xFF
    noisy[200] ^= 0x55
    b = synth_payload("asset-B")
    h = P.phash64(P.payload_gray32([a, bytes(noisy), b, a]))
    assert h[0] == h[3]                               # deterministic
    d_near = int(hamming_distance(h[:1], h[1:2])[0])
    d_far = int(hamming_distance(h[:1], h[2:3])[0])
    assert d_near <= P.MAX_HAMMING, d_near
    assert d_far > P.MAX_HAMMING, d_far


def test_phash_band_recall_guarantee():
    """Any two hashes within Hamming MAX_HAMMING share >=1 band key —
    the pigeonhole property the banded search's exact recall rests on."""
    import numpy as np
    from pdf_extraction_ray.functions import phash as P

    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**63, size=200, dtype=np.int64).view(np.uint64)
    for h in base:
        flips = rng.choice(64, size=P.MAX_HAMMING, replace=False)
        h2 = h
        for f in flips:
            h2 = h2 ^ (np.uint64(1) << np.uint64(f))
        k1 = P.band_keys(np.array([h]))[0]
        k2 = P.band_keys(np.array([h2]))[0]
        assert (k1 == k2).any()


@pytest.mark.usefixtures("ray_session")
def test_phash_pairs_planted_near_duplicates():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from pdf_extraction_ray.functions import phash as P
    from pdf_extraction_ray.pipelines.media import phash_pairs_from_media
    from pdf_extraction_ray.stages.multimodal import (MEDIA_SCHEMA,
                                                      synth_payload)

    a = synth_payload("asset-A")
    noisy = bytearray(a)
    noisy[33] ^= 0x0F
    rows = []
    for ref, payload in [("media://d1/a", a),
                         ("media://d2/a-noisy", bytes(noisy)),
                         ("media://d3/b", synth_payload("asset-B")),
                         ("media://d4/c", synth_payload("asset-C"))]:
        rows.append({"doc_id": ref.split("/")[2], "media_ref": ref,
                     "media_type": "image", "payload": payload,
                     "meta": {"declared_w": 0, "declared_h": 0,
                              "duration_ms": 0}})
    media = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    pairs = phash_pairs_from_media(media).to_pandas()
    assert len(pairs) == 1, pairs
    assert pairs.iloc[0]["ref_a"] == "media://d1/a"
    assert pairs.iloc[0]["ref_b"] == "media://d2/a-noisy"
    assert pairs.iloc[0]["hamming"] <= P.MAX_HAMMING


@pytest.mark.usefixtures("ray_session")
def test_phash_pairs_nonempty_on_sf_corpus():
    """The variant payload model plants cross-document near-dups of the
    same asset, so the corpus query must find pairs at every sf (a
    0-row result here would mean the operator went dead — the round-1
    embedding-dedup failure mode)."""
    from pdf_extraction_ray.pipelines.media import media_phash_pairs

    pairs = media_phash_pairs("/root/testdata/sf0.001").to_pandas()
    assert len(pairs) > 0
    assert (pairs["hamming"] <= 7).all()
    assert (pairs["ref_a"] < pairs["ref_b"]).all()


def test_media_patches_grid_and_consistency(media_corpus):
    """Every image tiles to exactly PATCH_GRID^2 patches; patch means
    are deterministic and average back to the full-image mean (tiling
    is a partition of the pixels)."""
    import numpy as np
    import pandas as pd

    from pdf_extraction_ray.functions import phash as P
    from pdf_extraction_ray.pipelines.media import (PATCH_GRID,
                                                    media_patches,
                                                    media_table_from_docs)
    from pdf_extraction_ray.sources.io import read_docs

    docs = read_docs(media_corpus)
    df = media_patches("", docs=docs).to_pandas()
    per = df.groupby("media_ref").size()
    assert (per == PATCH_GRID * PATCH_GRID).all() and len(per) > 0

    # determinism across runs
    df2 = media_patches("", docs=read_docs(media_corpus)).to_pandas()
    key = ["media_ref", "patch_row", "patch_col"]
    pd.testing.assert_frame_equal(
        df.sort_values(key).reset_index(drop=True),
        df2.sort_values(key).reset_index(drop=True))

    # partition property vs an independent full-image decode
    media = media_table_from_docs(read_docs(media_corpus)).to_pandas()
    imgs = media[media["media_type"] == "image"].head(5)
    full = P.payload_gray32(list(imgs["payload"]))
    for ref, img in zip(imgs["media_ref"], full):
        sub = df[df["media_ref"] == ref]
        patch_mean = sub["mean_x1e6"].to_numpy() / 1e6
        assert abs(patch_mean.mean() - img.mean()) < 1e-4, ref


@pytest.mark.usefixtures("ray_session")
def test_text_pairs_nearest_semantics(tmp_path):
    """Image pairs with the nearest text by offset; equidistant ties go
    to the PRECEDING text; image-only docs emit nothing."""
    import pyarrow as pa
    import ray.data as rd
    from pdf_extraction_ray.pipelines.media import media_text_pairs
    from pdf_extraction_ray.schema import DOCS_SCHEMA

    def span(kind, text, ref, off):
        return {"kind": kind, "text": text, "media_ref": ref,
                "offset": off, "font_size": 10.0, "page": 1,
                "link_density": 0.0, "bbox": [0.1, 0.1, 0.2, 0.2]}

    docs = [
        {"doc_id": "d1", "spans": [
            span("text", "before", "", 10),
            span("image", "", "m://d1/a", 13),   # gap 3 back, 7 fwd
            span("text", "after", "", 20),
            span("image", "", "m://d1/b", 15),   # tie: 5 back, 5 fwd
        ], "regions": []},
        {"doc_id": "d2", "spans": [
            span("image", "", "m://d2/a", 5),    # no text at all
        ], "regions": []},
    ]
    for d in docs:
        d.setdefault("n_pages", 1)
    tbl = pa.Table.from_pylist(docs, schema=DOCS_SCHEMA)
    out = media_text_pairs("", docs=rd.from_arrow(tbl)).to_pandas() \
        .set_index("media_ref")
    assert out.loc["m://d1/a", "pair_text"] == "before"
    assert out.loc["m://d1/a", "offset_gap"] == 3
    assert out.loc["m://d1/b", "pair_text"] == "before"   # tie -> prev
    assert "m://d2/a" not in out.index


@pytest.mark.usefixtures("ray_session")
def test_audio_segments_match_reference():
    """Engine segments equal a per-clip python reference (same integer
    mean-energy threshold, same contiguity rule)."""
    import numpy as np
    from pdf_extraction_ray.pipelines.media import (AUDIO_SEG_WINDOW,
                                                    media_audio_segments,
                                                    media_table_from_docs)
    from pdf_extraction_ray.pipelines.analysis import _corpus_for
    from pdf_extraction_ray.sources.io import read_docs
    import pyarrow.compute as pc

    sf = "/root/testdata/sf0.001"
    out = media_audio_segments(sf).to_pandas()
    assert len(out) > 0
    media = media_table_from_docs(read_docs(_corpus_for(sf))) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["media_type"], "audio")),
            batch_format="pyarrow", batch_size=None).take_all()
    want = []
    for row in media:
        wave = np.frombuffer(row["payload"][4:],
                             dtype=np.int8).astype(np.int64)
        n_fr = len(wave) // AUDIO_SEG_WINDOW
        if n_fr == 0:
            continue
        fr = wave[:n_fr * AUDIO_SEG_WINDOW].reshape(n_fr, -1)
        en = (fr * fr).sum(axis=1)
        thr = int(en.sum()) // n_fr
        seg, i = 0, 0
        while i < n_fr:
            if en[i] > thr:
                j = i
                while j + 1 < n_fr and en[j + 1] > thr:
                    j += 1
                want.append((row["media_ref"], seg, i, j,
                             int(en[i:j + 1].sum())))
                seg += 1
                i = j + 1
            else:
                i += 1
    got = sorted(zip(out.media_ref, out.seg_index, out.frame_start,
                     out.frame_end, out.energy))
    assert got == sorted(want)
