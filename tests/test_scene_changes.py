"""Scene-change detection over sampled video frames: the detected cuts
must track the frame generator's planted segment boundaries (>= 98%
agreement — pHash cut detection is statistical by design), with exact
structural invariants (first frame unflagged, hashes video-local)."""

import numpy as np
import pytest

from pdf_extraction_ray.functions.phash import phash64
from pdf_extraction_ray.stages.multimodal import (SCENE_SEGMENT_LEN,
                                                  synth_frame_gray)


class TestFrameGenerator:
    def test_within_segment_stable_across_segment_not(self):
        a = synth_frame_gray("media://d/1-0", 0)
        b = synth_frame_gray("media://d/1-0", 1)          # same segment
        c = synth_frame_gray("media://d/1-0", SCENE_SEGMENT_LEN)  # next
        ha, hb, hc = phash64(np.stack([a, b, c]))
        assert int(ha ^ hb).bit_count() <= 18
        assert int(ha ^ hc).bit_count() >= 20

    def test_deterministic(self):
        x = synth_frame_gray("media://d/2-1", 5)
        y = synth_frame_gray("media://d/2-1", 5)
        assert np.array_equal(x, y)


@pytest.mark.usefixtures("ray_session")
def test_cuts_track_planted_boundaries():
    from pdf_extraction_ray.pipelines.media import media_scene_changes

    df = media_scene_changes("/root/testdata/sf0.001").to_pandas() \
        .sort_values(["media_ref", "frame_index"])
    assert len(df) > 0
    prev = df.groupby("media_ref")["frame_index"].shift(1)
    # first sampled frame of each video is never a cut and carries -1
    first = prev.isna()
    assert (df.loc[first, "hamming_prev"] == -1).all()
    assert (df.loc[first, "is_cut"] == 0).all()
    expected = ((df.frame_index // SCENE_SEGMENT_LEN)
                != (prev // SCENE_SEGMENT_LEN)) & prev.notna()
    agreement = (df.is_cut.astype(bool) == expected).mean()
    assert agreement >= 0.98, agreement
    assert expected.sum() > 0                 # non-vacuous: cuts planted
    assert df.is_cut.sum() > 0


@pytest.mark.usefixtures("ray_session")
def test_keyframes_match_pure_python_reference():
    """media_keyframes equals a per-video pure-python recomputation
    (same pHash cuts, same gradient-energy sharpness, same max-sharp /
    min-index tie-break) over the engine's own sampled frame list."""
    from pdf_extraction_ray.pipelines.media import (SCENE_CUT_HAMMING,
                                                    media_frames,
                                                    media_keyframes)

    sf = "/root/testdata/sf0.001"
    out = media_keyframes(sf).to_pandas()
    assert len(out) > 0
    assert (out.groupby("media_ref")["shot_id"].min() == 0).all()
    assert out.n_frames.sum() == out.groupby("media_ref")["n_frames"] \
        .sum().sum()

    frames = media_frames(sf).to_pandas()
    vids = sorted(frames.frame_ref.str.rsplit("#frame=", n=1).str[0]
                  .unique())[:3]
    for v in vids:
        idxs = sorted(frames[frames.frame_ref.str.startswith(v + "#")]
                      ["frame_index"].tolist())
        imgs = [synth_frame_gray(v, int(i)) for i in idxs]
        hs = [int(h) for h in phash64(np.stack(imgs))]
        sharp = [int(round((np.abs(np.diff(im, axis=1)).sum()
                            + np.abs(np.diff(im, axis=0)).sum()) * 100.0))
                 for im in imgs]
        shot, rows = 0, []
        for k, i in enumerate(idxs):
            if k > 0 and bin(hs[k] ^ hs[k - 1]).count("1") \
                    > SCENE_CUT_HAMMING:
                shot += 1
            rows.append((shot, i, sharp[k]))
        want = {}
        for shot, i, s in rows:
            best = want.get(shot)
            if best is None or s > best[1]:
                want[shot] = (i, s)
        got = out[out.media_ref == v].set_index("shot_id")
        assert len(got) == len(want), v
        for shot, (i, s) in want.items():
            assert got.loc[shot, "keyframe_index"] == i, (v, shot)
            assert got.loc[shot, "sharpness_x100"] == s, (v, shot)
