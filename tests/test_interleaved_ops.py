"""Interleaved training-prep operators: render serialization,
media-atomic greedy packing, the reading-order audit and the template
detector eval. DuckDB parity is covered by the global harness; these
tests pin the INVARIANTS the oracle can't see (budget bound, media
atomicity, token conservation, planted-violation detection, perfect
recall where the evidence rule can fire)."""

import os
import sys

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_extraction_ray.pipelines import spans as S
from pdf_extraction_ray.pipelines.cleaning import template_detector_eval

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def packed(ray_session):
    return S.packed_interleaved(SF).to_pandas()


@pytest.fixture(scope="module")
def rendered(ray_session):
    return S.docs_render_interleaved(SF).to_pandas()


class TestInterleaveDerivation:
    def test_vectorized_matches_reference(self):
        docs = duckdb.sql(
            f"SELECT doc_id, text FROM "
            f"read_parquet('{SF}/documents.parquet')").arrow()
        docs = pa.table({"doc_id": docs["doc_id"],
                         "text": docs["text"]})
        assert S._interleave_rows(docs).equals(
            S._interleave_rows_ref(docs))

    @given(st.lists(st.one_of(
        st.none(),
        st.text(alphabet="ab c.é#\n<", max_size=130)), max_size=12))
    @settings(max_examples=40, deadline=None)
    def test_vectorized_matches_ref_fuzz(self, texts):
        t = pa.Table.from_pydict(
            {"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
             "text": pa.array(texts, pa.string())})
        assert S._interleave_rows(t).equals(S._interleave_rows_ref(t))

    def test_vectorized_edge_cases(self):
        edge = pa.Table.from_pydict(
            {"doc_id": pa.array([7, 8, 9], pa.int64()),
             "text": pa.array([None, "", "x" * 95])})
        assert S._interleave_rows(edge).equals(
            S._interleave_rows_ref(edge))
        empty = pa.Table.from_pydict(
            {"doc_id": pa.array([], pa.int64()),
             "text": pa.array([], pa.string())})
        assert S._interleave_rows(empty).equals(
            S._interleave_rows_ref(empty))


class TestPackedInterleaved:
    def test_budget_bound(self, packed):
        # a sequence only exceeds the budget when it is a single span
        over = packed[packed["n_tokens"] > S._PACK_BUDGET]
        assert (over["n_spans"] == 1).all()
        assert (packed["n_spans"] >= 1).all()

    def test_seq_ids_contiguous(self, packed):
        g = packed.sort_values(["doc_id", "seq_id"]).groupby("doc_id")
        assert (g["seq_id"].min() == 0).all()
        assert (g["seq_id"].max() + 1 == g["seq_id"].size()).all()

    def test_token_conservation(self, packed):
        # per-doc packed token totals == per-doc span cost totals,
        # recomputed independently from documents.text in SQL
        con = duckdb.connect()
        ref = con.sql(f"""
            WITH gs AS (
              SELECT doc_id, coalesce(text, '') AS txt,
                     unnest(range(0, CAST(ceil(length(coalesce(text,
                         '')) / {S._SCHUNK}.0) AS BIGINT))) AS g
              FROM read_parquet('{SF}/documents.parquet'))
            SELECT doc_id,
                   CAST(sum((length(substring(txt,
                            1 + {S._SCHUNK} * CAST(g AS INT),
                            {S._SCHUNK})) + 3) // 4
                        + CASE WHEN g % {S._MEDIA_MOD} = {S._MEDIA_AT}
                               THEN {S._PACK_MEDIA_COST} ELSE 0 END)
                        AS BIGINT) AS n_tokens
            FROM gs GROUP BY doc_id ORDER BY doc_id""").df()
        got = packed.groupby("doc_id", as_index=False)["n_tokens"] \
            .sum().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)

    def test_span_costs_and_cut_math(self):
        # text(8 tok) image(16) text(10): at budget 25 the greedy cut
        # lands BEFORE the trailing text span — the image's 16-token
        # cost stays whole inside sequence 0 (media atomicity)
        kind = np.array(["text", "image", "text"])
        text = pa.array(["x" * 32, "", "y" * 40])
        costs = S._span_costs(kind, text)
        assert costs.tolist() == [8, S._PACK_MEDIA_COST, 10]
        prefix = np.cumsum(costs)
        cut = np.searchsorted(prefix, 0 + 25, side="right")
        assert cut == 2              # spans 0,1 fit; span 2 starts new

    def test_media_never_split(self, packed):
        # every packed media span contributes exactly its fixed cost:
        # token totals minus text costs are a multiple of the media cost
        assert ((packed["n_tokens"]
                 - (packed["n_spans"] - packed["n_media"])) >= 0).all()
        assert (packed["n_media"] * S._PACK_MEDIA_COST
                <= packed["n_tokens"]).all()

    def test_rows_cover_all_docs(self, packed):
        n_docs = duckdb.sql(
            f"SELECT count(*) FROM read_parquet"
            f"('{SF}/documents.parquet') WHERE length(coalesce(text,"
            f" '')) > 0").fetchone()[0]
        assert packed["doc_id"].nunique() == n_docs


class TestGreedyBoundsKernel:
    def test_matches_python_greedy_with_giant_doc(self):
        # one 50k-cost giant + short docs around it; the vectorized
        # multi-doc kernel must equal the obvious per-doc greedy scan
        rng = np.random.default_rng(7)
        doc_lens = [3, 6000, 1, 17, 0, 42]       # spans per doc
        costs = rng.integers(1, S._PACK_BUDGET + 1,
                             size=sum(doc_lens)).astype(np.int64)
        starts = np.concatenate(
            [[0], np.cumsum(doc_lens)]).astype(np.int64)
        got = S._greedy_bounds(costs, starts)
        exp = []
        for d in range(len(doc_lens)):
            s, e = starts[d], starts[d + 1]
            cum = None
            for i in range(s, e):
                if cum is None or cum + costs[i] > S._PACK_BUDGET:
                    exp.append(i)
                    cum = costs[i]
                else:
                    cum += costs[i]
        assert got.tolist() == exp

    def test_round_count_bounded_by_max_sequences(self):
        # a 1M-cost doc packs in ~cost/budget rounds, not per-span work
        costs = np.full(20000, 50, dtype=np.int64)   # 1 seq per span
        starts = np.array([0, len(costs)], dtype=np.int64)
        b = S._greedy_bounds(costs, starts)
        assert len(b) == 20000       # 50+50 > 64 -> every span its own


class TestCurationFunnel:
    def test_exchange_path_matches_broadcast(self, ray_session):
        # force the doc-keyed exchange (cap 0) — the scale path must
        # reproduce the broadcast fast path exactly
        fast = S.interleaved_curation_funnel(SF)
        slow = S.interleaved_curation_funnel(SF, max_broadcast_bytes=0)
        pd.testing.assert_frame_equal(fast, slow)

    def test_exchange_path_on_dup_heavy_corpus(self, ray_session,
                                               tmp_path):
        # duplicate-heavy random corpus (the shape that forces the
        # scale path in production): both paths must agree with each
        # other AND with the DuckDB oracle
        rng = np.random.default_rng(3)
        base = [" ".join(rng.choice(["aa", "bb", "cc", "dd", "ee"],
                                    size=30)) for _ in range(6)]
        texts = [base[i % 6] for i in range(48)]      # heavy dup lines
        d = tmp_path / "dup"
        d.mkdir()
        pd.DataFrame({"doc_id": np.arange(48, dtype=np.int64),
                      "text": texts}).to_parquet(d / "documents.parquet")
        fast = S.interleaved_curation_funnel(str(d))
        slow = S.interleaved_curation_funnel(str(d),
                                             max_broadcast_bytes=0)
        pd.testing.assert_frame_equal(fast, slow)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        ora = con.sql(S.INTERLEAVED_FUNNEL_SQL).df()
        pd.testing.assert_frame_equal(
            fast.astype("int64"), ora.astype("int64"))
        assert fast["n_spans_removed"].iloc[0] > 0

    def test_funnel_monotone(self, ray_session):
        df = S.interleaved_curation_funnel(SF)
        r = df.iloc[0]
        assert 0 < r["n_docs_kept"] <= r["n_docs_in"]
        assert r["n_spans_removed"] > 0       # planted cross-doc dups
        assert r["n_sequences"] > 0
        assert r["n_tokens_packed"] > 0
        # packing the deduped corpus can't exceed the raw token mass
        packed = S.packed_interleaved(SF).to_pandas()
        assert r["n_tokens_packed"] <= packed["n_tokens"].sum()


class TestRealTableInterop:
    """The 8 batch-local span ops accept a REAL (doc_id, spans) table
    via ``ds=`` — the driver input_hint's storage shape — and must
    produce byte-identical results to the derived-corpus query path."""

    OPS = ["span_media_context", "span_section_stats",
           "span_caption_pairs", "span_media_gaps",
           "docs_interleaved_filter", "docs_render_interleaved",
           "packed_interleaved", "span_lang_mixing",
           "span_media_alignment"]

    def test_written_table_matches_query_path(self, ray_session,
                                              tmp_path):
        import ray.data as rd
        out = str(tmp_path / "interleaved")
        S.interleaved_docs(SF).write_parquet(out)
        from pdf_extraction_ray.sources.io import read_docs
        real = read_docs(out)
        for op in self.OPS:
            fn = getattr(S, op)
            a = fn(SF).to_pandas()
            b = fn(None, ds=real).to_pandas()
            a = a[sorted(a.columns)].sort_values(
                by=sorted(a.columns)).reset_index(drop=True)
            b = b[sorted(b.columns)].sort_values(
                by=sorted(b.columns)).reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, obj=op)

    def test_extraction_corpus_spans_flow_through(self, ray_session,
                                                  t2_corpus):
        # the flagship fixtures' span tables (DOCS_SCHEMA) use the same
        # struct — prove the analytics run over them directly
        import pyarrow.parquet as pq
        import ray.data as rd
        path, docs = t2_corpus
        ds = rd.from_arrow(docs.select(["doc_id", "spans"]))
        packed = S.packed_interleaved(None, ds=ds).to_pandas()
        assert packed["doc_id"].nunique() > 0
        assert (packed["n_tokens"] > 0).all()


class TestWeightedSample:
    def test_heavier_docs_overrepresented(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import (
            docs_weighted_sample_k, _WRS_K)
        df = docs_weighted_sample_k(SF)
        assert len(df) == _WRS_K
        assert not df["doc_id"].duplicated().any()
        corpus_mean = duckdb.sql(
            f"SELECT avg(greatest(len(regexp_split_to_array("
            f"trim(text), '\\s+')), 1)) FROM read_parquet"
            f"('{SF}/documents.parquet')").fetchone()[0]
        # P(selected) ~ weight: the sample's mean weight must exceed
        # the corpus mean (deterministic given the fixed hash mix)
        assert df["weight"].mean() > corpus_mean


class TestGreedyBoundsProperty:
    @given(st.lists(st.lists(st.integers(1, 80), max_size=30),
                    max_size=8))
    @settings(max_examples=60, deadline=None)
    def test_matches_python_greedy(self, docs):
        costs = np.array([c for d in docs for c in d], dtype=np.int64)
        starts = np.concatenate(
            [[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
        got = S._greedy_bounds(costs, starts).tolist()
        exp = []
        for d in range(len(docs)):
            s, e = starts[d], starts[d + 1]
            cum = None
            for i in range(s, e):
                if cum is None or cum + costs[i] > S._PACK_BUDGET:
                    exp.append(i)
                    cum = costs[i]
                else:
                    cum += costs[i]
        assert got == exp


class TestMediaFetchAudit:
    def test_planted_failures_found(self, ray_session):
        got = S.media_fetch_audit(SF).iloc[0]
        # replay the plant: every media span's (doc*31+g) % 11 == 4
        docs = duckdb.sql(
            f"SELECT doc_id, coalesce(text,'') AS text FROM "
            f"read_parquet('{SF}/documents.parquet')").df()
        n_refs = n_miss = n_docs = 0
        for _, row in docs.iterrows():
            d, text = int(row["doc_id"]), row["text"]
            miss_here = 0
            for g in range(-(-len(text) // S._SCHUNK)):
                if g % S._MEDIA_MOD == S._MEDIA_AT:
                    n_refs += 1
                    if (d * 31 + g) % S._FETCH_MOD == S._FETCH_AT:
                        miss_here += 1
            n_miss += miss_here
            n_docs += miss_here > 0
        assert (got["n_refs"], got["n_missing"],
                got["n_docs_affected"]) == (n_refs, n_miss, n_docs)
        assert n_miss > 0


class TestRenderInterleaved:
    def test_placeholder_count_matches_media(self, rendered):
        n_ph = rendered["rendered"].str.count("<image:")
        assert (n_ph == rendered["n_media"]).all()

    def test_roundtrip_lossless(self, ray_session, rendered):
        # the serialization is invertible whenever no text chunk
        # starts with a marker ('# ', '<image:') or contains a newline
        # — true of the word-soup corpora by construction (asserted);
        # a production renderer would escape markers
        docs = S.interleaved_docs(SF).take_all()
        by_id = {r["doc_id"]: r["spans"] for r in docs}
        for _, row in rendered.iterrows():
            spans = by_id[row["doc_id"]]
            got = []
            for line in row["rendered"].split("\n"):
                if line.startswith("<image:"):
                    got.append(("image", "", line[7:-1]))
                elif line.startswith("# "):
                    got.append(("title", line[2:], ""))
                else:
                    assert "\n" not in line
                    got.append(("text", line, ""))
            exp = [(s["kind"], s["text"], s["media_ref"])
                   for s in spans]
            assert got == exp, row["doc_id"]

    def test_linecount_is_span_count(self, ray_session, rendered):
        stats = S.span_section_stats(SF).to_pandas() \
            .groupby("doc_id")["n_spans"].sum()
        lines = rendered.set_index("doc_id")["rendered"] \
            .str.count("\n") + 1
        got = lines.reindex(stats.index)
        assert (got == stats).all()


class TestSpanOrderAudit:
    def test_planted_counts_exact(self, ray_session):
        got = S.span_order_audit(SF).iloc[0]
        # brute-force replay in pandas over the same derivation
        docs = duckdb.sql(
            f"SELECT doc_id, coalesce(text, '') AS text FROM "
            f"read_parquet('{SF}/documents.parquet')").df()
        inv = dup = docs_i = docs_d = n_docs = 0
        for _, row in docs.iterrows():
            d, text = int(row["doc_id"]), row["text"]
            offs = []
            for g in range(-(-len(text) // S._SCHUNK)):
                offs.append(2 * g)
                if g % S._MEDIA_MOD == S._MEDIA_AT:
                    offs.append(2 * g + 1)
            if not offs:
                continue
            n_docs += 1
            if len(offs) >= 2 and d % S._AUD_SWAP_MOD == S._AUD_SWAP_AT:
                offs[0], offs[1] = offs[1], offs[0]
            elif len(offs) >= 2 and d % S._AUD_DUP_MOD == S._AUD_DUP_AT:
                offs[1] = offs[0]
            di = sum(b < a for a, b in zip(offs, offs[1:]))
            dd = sum(b == a for a, b in zip(offs, offs[1:]))
            inv += di
            dup += dd
            docs_i += di > 0
            docs_d += dd > 0
        assert got["n_docs"] == n_docs
        assert got["n_inversions"] == inv and inv > 0
        assert got["n_dup_offsets"] == dup and dup > 0
        assert got["docs_inverted"] == docs_i
        assert got["docs_dup"] == docs_d


class TestSnapshotDiff:
    def test_status_matches_mod_rules(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import (
            corpus_snapshot_diff, _DIFF_NEW_BASE)
        df = corpus_snapshot_diff(SF).to_pandas()
        assert not df.duplicated("doc_id").any()
        ids = duckdb.sql(
            f"SELECT doc_id FROM read_parquet"
            f"('{SF}/documents.parquet')").df()["doc_id"].to_numpy()
        by = df.set_index("doc_id")["status"]
        for d in ids:
            d = int(d)
            if d % 10 == 3:
                assert by.get(d) == "removed"
            elif d % 10 == 7:
                assert by.get(d) == "changed"
            else:
                assert d not in by.index
            if d % 10 == 1:
                assert by.get(d + _DIFF_NEW_BASE) == "added"
        # every diff row traces back to a rule
        n_rules = sum(1 for d in ids if int(d) % 10 in (3, 7)) \
            + sum(1 for d in ids if int(d) % 10 == 1)
        assert len(df) == n_rules


class TestSpanLangMixing:
    def test_profile_invariants(self, ray_session):
        df = S.span_lang_mixing(SF).to_pandas()
        assert (df["n_lang_spans"] <= df["n_spans"]).all()
        assert (df["n_langs"] <= df["n_lang_spans"]).all()
        und = df[df["n_langs"] == 0]
        assert (und["major_lang"] == "und").all()
        assert (df[df["n_langs"] > 0]["major_lang"] != "und").all()
        assert df["major_lang"].isin(
            ["und", "en", "fr", "es", "de"]).all()


class TestPreferenceAndBudgets:
    def test_dpo_pairs_extremes(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import \
            dpo_pairs_by_source
        df = dpo_pairs_by_source(SF)
        assert (df["margin_x1e6"] >= 0).all()
        # chosen and rejected must differ whenever the margin is
        # positive; equal-ratio sources may tie on the same best doc id
        pos = df[df["margin_x1e6"] > 0]
        assert (pos["chosen_doc"] != pos["rejected_doc"]).all()
        assert len(df) > 0

    def test_dedup_weights_bounded(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import \
            dedup_weighted_sampling
        df = dedup_weighted_sampling(SF).to_pandas()
        assert (df["effective_x1e6"] <= df["n_docs"] * 1_000_000).all()
        assert (df["effective_x1e6"] > 0).all()
        # planted re-crawl copies mean real groups of size > 1: the
        # effective mass must be strictly below the raw doc mass
        assert int(df["effective_x1e6"].sum()) \
            < int(df["n_docs"].sum()) * 1_000_000
        total = duckdb.sql(f"""
            WITH d AS (
              SELECT doc_id, md5(lower(trim(text))) h
              FROM read_parquet('{SF}/documents.parquet')
              UNION ALL
              SELECT doc_id + 500001, md5(lower(trim(text)))
              FROM read_parquet('{SF}/documents.parquet')
              WHERE doc_id % 7 = 2),
            n AS (SELECT h, count(*) c FROM d GROUP BY h)
            SELECT CAST(sum(c * (1000000 // c)) AS BIGINT) FROM n
            """).fetchone()[0]
        assert int(df["effective_x1e6"].sum()) == int(total)

    def test_leakage_audit_finds_planted_straddles(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import (
            split_leakage_safe, split_naive_leakage)
        audit = split_naive_leakage(SF).iloc[0]
        assert audit["n_straddled"] > 0          # planted structure
        assert audit["n_docs_straddled"] >= 2 * audit["n_straddled"]
        safe = split_leakage_safe(SF)
        assert int(safe["n_groups"].sum()) == int(audit["n_groups"])
        assert set(safe["split"]) == {"train", "val", "test"}
        assert (safe["n_docs"] >= safe["n_groups"]).all()

    def test_weak_labels_partition_corpus(self, ray_session):
        from pdf_extraction_ray.pipelines.textops import \
            quality_weak_labels
        df = quality_weak_labels(SF)
        n = duckdb.sql(f"SELECT count(*) FROM read_parquet"
                       f"('{SF}/documents.parquet')").fetchone()[0]
        assert int(df["n_docs"].sum()) == int(n)
        assert set(df["label"]) == {"high", "low", "abstain"}


class TestTemplateDetectorEval:
    def test_recall_perfect_where_rule_can_fire(self, ray_session):
        out = template_detector_eval(SF)
        tot = duckdb.sql(
            f"SELECT source, count(*) n FROM read_parquet"
            f"('{SF}/documents.parquet') GROUP BY source").df()
        nd = dict(zip(tot["source"], tot["n"]))
        multi = out[out["source"].map(nd) >= 2]
        single = out[out["source"].map(nd) < 2]
        # planted header+footer appear in EVERY doc of a site: any site
        # with >= 2 docs trivially passes the (>=2 docs, >=30%) rule
        assert (multi["recall"] == 1.0).all() and len(multi) > 0
        assert (single["tp"] == 0).all()
        assert (out["fp"] == out["n_pred"] - out["tp"]).all()
        assert (out["fn"] == 2 - out["tp"]).all()


class TestMediaAlignment:
    def test_argmax_and_tiebreak_planted(self, ray_session):
        """Hand-built spans table through ds=: best_text_off is the
        argmax of the shared md5-based similarity; a media span in a
        text-less doc emits nothing (matches the oracle's inner join)."""
        import hashlib

        import pyarrow as pa
        import ray.data as rd

        def h(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        spans0 = [
            {"kind": "text", "text": "alpha", "media_ref": "", "offset": 0},
            {"kind": "image", "text": "", "media_ref": "imgA", "offset": 1},
            {"kind": "text", "text": "beta", "media_ref": "", "offset": 2},
            {"kind": "title", "text": "gamma", "media_ref": "",
             "offset": 4},
        ]
        spans1 = [  # media-only doc: dropped
            {"kind": "image", "text": "", "media_ref": "imgB", "offset": 0},
        ]
        tbl = pa.Table.from_pylist(
            [{"doc_id": 10, "spans": spans0},
             {"doc_id": 11, "spans": spans1}],
            schema=S.INTERLEAVED_SCHEMA)
        out = S.span_media_alignment(None, ds=rd.from_arrow(tbl)) \
            .to_pandas()
        assert list(out["doc_id"]) == [10]
        P, M = 1_000_003, 31
        sims = {o: (h("imgA") * M + h(t)) % P
                for o, t in [(0, "alpha"), (2, "beta"), (4, "gamma")]}
        best_off = min(sorted(sims), key=lambda o: (-sims[o], o))
        assert out["best_text_off"].iloc[0] == best_off
        assert out["sim"].iloc[0] == sims[best_off]

    def test_every_media_span_aligned(self, ray_session):
        out = S.span_media_alignment(SF).to_pandas()
        ctx = S.span_media_context(SF).to_pandas()
        # one row per media span, same universe as span_media_context
        assert len(out) == len(ctx)
        assert (out["best_text_off"] >= 0).all()
        assert (out["sim"] >= 0).all()


class TestDupMediaConflicts:
    def test_recrawl_groups_planted(self, ray_session, tmp_path):
        """doc_id % 7 == 2 re-crawls under +500001: every such doc with
        media must surface as a 2-doc conflict group whose distinct
        refs double the per-doc media count, keeping the original id."""
        import os

        from pdf_extraction_ray.pipelines.spans import (
            span_dup_media_conflicts)
        d = str(tmp_path)
        texts = {0: "x" * 200,       # 5 chunks, media after g=2 -> 1+
                 2: "y" * 200,       # recrawled (2 % 7 == 2)
                 9: "z" * 390,       # recrawled (9 % 7 == 2)
                 3: "w" * 30}        # 1 chunk, no media, not recrawled
        ids = sorted(texts)
        pd.DataFrame({
            "doc_id": np.array(ids, dtype=np.int64),
            "text": [texts[i] for i in ids],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [len(texts[i]) for i in ids]}) \
            .to_parquet(os.path.join(d, "documents.parquet"))
        out = span_dup_media_conflicts(d).to_pandas() \
            .sort_values("keep_doc_id").reset_index(drop=True)
        # docs 2 and 9 each form a group with their re-crawl copy
        assert list(out["keep_doc_id"]) == [2, 9]
        assert list(out["n_docs"]) == [2, 2]
        # 200 chars -> 5 chunks -> media at g=2; 390 -> 10 chunks ->
        # media at g in {2, 6} -> 2 per doc
        assert list(out["n_media_per_doc"]) == [1, 2]
        assert list(out["n_distinct_refs"]) == [2, 4]
