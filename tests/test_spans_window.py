"""Span-window queries over the interleaved payload: kernel edge cases
(media before any title, doc without titles, cross-doc carry-over
guard) plus DuckDB parity at sf0.001 (also covered by the global
parity harness; repeated here so the window tier fails loudly on its
own)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extraction_ray.pipelines import spans as S

SF = "/root/testdata/sf0.001"


def _mk_batch(docs):
    """docs: list of (doc_id, [(kind, text, ref, off), ...])."""
    rows = [{"doc_id": d,
             "spans": [{"kind": k, "text": t, "media_ref": r, "offset": o}
                       for (k, t, r, o) in sp]}
            for d, sp in docs]
    return pa.Table.from_pylist(rows, schema=S.INTERLEAVED_SCHEMA)


class TestLastTitleKernel:
    def test_no_carry_across_docs(self):
        # doc 1 ends with a title; doc 2's media must NOT inherit it
        kind = np.array(["title", "image", "text", "image"])
        doc_start = np.array([0, 0, 2, 2])
        last = S._last_title(kind, doc_start)
        assert last.tolist() == [0, 0, -1, -1]

    def test_media_before_first_title(self):
        kind = np.array(["image", "title", "image"])
        last = S._last_title(kind, np.zeros(3, dtype=np.int64))
        assert last.tolist() == [-1, 1, 1]

    def test_all_text(self):
        kind = np.array(["text", "text"])
        assert S._last_title(kind, np.zeros(2, dtype=np.int64)).tolist() \
            == [-1, -1]


class TestMediaContextBatchKernel:
    def test_planted(self):
        batch = _mk_batch([
            (1, [("image", "", "m0", 0), ("title", "Intro", "", 2),
                 ("text", "body", "", 4), ("image", "", "m1", 5),
                 ("title", "Methods", "", 6), ("image", "", "m2", 7)]),
            (2, [("image", "", "m3", 0)]),
        ])
        doc_ids, parent, doc_start, kind, text, ref, off = \
            S._flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        last = S._last_title(kind_np, doc_start)
        sel = np.flatnonzero(kind_np == "image")
        ctx = [text[i].as_py() if i >= 0 else "" for i in last[sel]]
        assert ctx == ["", "Intro", "Methods", ""]
        assert doc_ids[parent[sel]].tolist() == [1, 1, 1, 2]


@pytest.mark.usefixtures("ray_session")
class TestParity:
    def _duck(self, sql):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        return con.sql(sql).df()

    @staticmethod
    def _canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    def test_media_context_parity(self):
        ray_df = self._canon(S.span_media_context(SF).to_pandas())
        duck_df = self._canon(self._duck(S.SPAN_MEDIA_CONTEXT_SQL))
        assert len(ray_df) == len(duck_df) and len(ray_df) > 0
        pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False)

    def test_section_stats_parity(self):
        ray_df = self._canon(S.span_section_stats(SF).to_pandas())
        duck_df = self._canon(self._duck(S.SPAN_SECTION_STATS_SQL))
        assert len(ray_df) == len(duck_df) and len(ray_df) > 0
        pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False)

    def test_sections_cover_all_spans(self):
        df = S.span_section_stats(SF).to_pandas()
        med = S.span_media_context(SF).to_pandas()
        assert df["n_media"].sum() == len(med)
        assert (df.groupby("doc_id")["section_off"].min() <= 0).all()


class TestMediaGapsKernel:
    def test_planted(self):
        # doc 1: 4 chars, media, 9 chars (title+text), media; doc 2:
        # media first (gap 0 — no carry from doc 1's trailing text)
        batch = _mk_batch([
            (1, [("text", "abcd", "", 0), ("image", "", "m0", 1),
                 ("title", "Intro", "", 2), ("text", "body", "", 3),
                 ("image", "", "m1", 4), ("text", "tail", "", 5)]),
            (2, [("image", "", "m2", 0), ("text", "x", "", 1)]),
        ])
        doc_ids, parent, doc_start, kind, text, ref, off = \
            S._flat_spans(batch)
        kind_np = kind.to_numpy(zero_copy_only=False)
        chars = np.array([len(t) for t in
                          text.to_pylist()], dtype=np.int64)
        cum_excl = np.cumsum(chars) - chars
        idx = np.arange(len(kind_np), dtype=np.int64)
        lastm = np.maximum.accumulate(
            np.where(kind_np == "image", idx, -1))
        prev = np.concatenate([[-1], lastm[:-1]])
        prev = np.where(prev >= doc_start, prev, -1)
        sel = np.flatnonzero(kind_np == "image")
        base = np.where(prev[sel] >= 0,
                        cum_excl[np.maximum(prev[sel], 0)],
                        cum_excl[doc_start[sel]])
        assert (cum_excl[sel] - base).tolist() == [4, 9, 0]


@pytest.mark.usefixtures("ray_session")
class TestInterleavedCuration:
    def _duck(self, sql):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{SF}/documents.parquet')")
        return con.sql(sql).df()

    def test_media_gaps_parity(self):
        ray_df = TestParity._canon(S.span_media_gaps(SF).to_pandas())
        duck_df = TestParity._canon(self._duck(S.SPAN_MEDIA_GAPS_SQL))
        assert len(ray_df) == len(duck_df) and len(ray_df) > 0
        pd.testing.assert_frame_equal(ray_df, duck_df, check_dtype=False)

    def test_filter_gate_bites_both_ways(self):
        df = S.docs_interleaved_filter(SF).to_pandas()
        assert df["keep"].isin([0, 1]).all()
        assert 0 < df["keep"].sum() < len(df)
        # every no-media doc is rejected
        assert (df.loc[df["n_media"] == 0, "keep"] == 0).all()
        # every kept doc satisfies the density bound
        kept = df[df["keep"] == 1]
        assert (kept["n_chars"]
                <= S._DENSITY_MAX * kept["n_media"]).all()

    def test_dup_texts_all_cross_doc(self):
        df = S.span_dup_texts(SF).to_pandas()
        assert len(df) > 0
        assert (df["n_docs"] >= 2).all()
        assert (df["n"] >= df["n_docs"]).all()

    def test_line_dedup_consistent_with_filter_chars(self):
        # media spans carry no chars, so the filter's n_chars equals the
        # dedup's total line chars: kept_chars == n_chars iff no removal
        ded = S.span_line_dedup(SF).to_pandas().set_index("doc_id")
        fil = S.docs_interleaved_filter(SF).to_pandas() \
            .set_index("doc_id")
        j = ded.join(fil, how="inner")
        assert len(j) == len(ded)
        assert ded["n_removed"].sum() > 0              # dups exist
        clean = j[j["n_removed"] == 0]
        assert (clean["kept_chars"] == clean["n_chars"]).all()
        dirty = j[j["n_removed"] > 0]
        assert (dirty["kept_chars"] < dirty["n_chars"]).all()


@pytest.mark.usefixtures("ray_session")
class TestCaptionPairs:
    def test_pairs_subset_of_context_and_gated(self):
        from pdf_extraction_ray.pipelines.spans import (
            _PAIR_MIN_CHARS, span_caption_pairs, span_media_context)
        pairs = span_caption_pairs(SF).to_pandas()
        ctx = span_media_context(SF).to_pandas()
        assert 0 < len(pairs) < len(ctx)          # the gate bites
        assert (pairs["section_chars"] >= _PAIR_MIN_CHARS).all()
        assert (pairs["context"] != "").all()
        # every pair's (doc, media_ref) exists in the full context table
        k = set(zip(ctx["doc_id"], ctx["media_ref"]))
        assert all((d, m) in k
                   for d, m in zip(pairs["doc_id"], pairs["media_ref"]))
