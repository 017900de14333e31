"""Corpus-family operators on a PLANTED tiny table (edge cases the sf
fixtures don't exercise): empty text, single token, exact duplicates,
repeated bigrams, unicode — each checked bit-exactly against the same
DuckDB oracle SQL run over the same parquet file."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdf_extraction_ray.pipelines.corpus import CORPUS_QUERIES

PLANTED = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4, 5],
    "text": [
        "",                                        # empty
        "solo",                                    # single token
        "alpha beta gamma delta epsilon zeta",     # normal
        "alpha beta gamma delta epsilon zeta",     # exact dup of 2
        "spin spin spin spin spin stop",           # repeated bigram
        "café naïve über café naïve",  # unicode
    ],
    "lang": ["en", "en", "fr", "fr", "de", "de"],
    "source": ["src0", "src1", "src2", "src0", "src1", "src2"],
})
PLANTED["n_chars"] = PLANTED["text"].str.len().astype("int64")


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted_docs")
    PLANTED.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


def _oracle(planted_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{planted_dir}/documents.parquet')")
    return con.sql(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


ORACLED = sorted(n for n, (_f, sql) in CORPUS_QUERIES.items()
                 if sql is not None)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", ORACLED)
def test_corpus_op_on_planted_edge_cases(planted_dir, name):
    fn, sql = CORPUS_QUERIES[name]
    res = fn(planted_dir)
    ray_df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    duck_df = _oracle(planted_dir, sql)
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(duck_df),
                                  check_dtype=False, check_exact=True,
                                  obj=name)


@pytest.mark.usefixtures("ray_session")
def test_planted_semantics_spot_checks(planted_dir):
    from pdf_extraction_ray.pipelines.corpus import (
        doc_repetition, doc_dup_block_stats)
    rep = doc_repetition(planted_dir).to_pandas().set_index("doc_id")
    assert rep.loc[0, "n_tokens"] == 1          # '' splits to one '' token
    assert rep.loc[4, "top_bigram_cnt"] == 4    # 'spin spin' x4
    assert rep.loc[4, "distinct_ratio_x1e6"] == 2_000_000 // 6

    dup = doc_dup_block_stats(planted_dir).to_pandas().set_index("doc_id")
    # docs 2 and 3 are verbatim duplicates -> their (single, short) block
    # is a cross-corpus duplicate
    assert dup.loc[2, "dup_blocks"] == 1
    assert dup.loc[3, "dup_blocks"] == 1
    assert dup.loc[1, "dup_blocks"] == 0

    from pdf_extraction_ray.pipelines.corpus import doc_dedup_blocks
    dd = doc_dedup_blocks(planted_dir).to_pandas().set_index("doc_id")
    # keep-first rewrite: doc 2 (the earlier copy) keeps its block, the
    # verbatim duplicate doc 3 loses everything
    assert dd.loc[2, "kept_blocks"] == 1
    assert dd.loc[2, "text_kept"] == "alpha beta gamma delta epsilon zeta"
    assert dd.loc[3, "kept_blocks"] == 0
    assert dd.loc[3, "text_kept"] == ""
    # unique docs come back tokenization-normalized but intact
    assert dd.loc[4, "text_kept"] == "spin spin spin spin spin stop"


PII_PLANTED = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "text": [
        "contact bob.smith+x@example.co.uk or see https://ex.org/a?b=c now",
        "customer met another customer",          # corpus-visible rule
        "plain text with no sensitive content",   # no rule fires
        "",                                       # empty
        "mid http://a.b/c@d.ef tail",             # email inside URL: order
    ],
    "lang": ["en"] * 5,
    "source": ["s"] * 5,
})


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pii_docs")
    PII_PLANTED.to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_pii_masking_planted(pii_dir):
    from pdf_extraction_ray.pipelines.textops import (
        doc_pii_masked, PII_MASK_SQL)
    got = doc_pii_masked(pii_dir).to_pandas().set_index("doc_id")

    assert got.loc[0, "masked"] == \
        "contact [EMAIL] or see [URL] now"
    assert got.loc[0, "n_masked"] == 2
    assert got.loc[1, "masked"] == "[ENTITY] met another [ENTITY]"
    assert got.loc[1, "n_masked"] == 2
    assert got.loc[2, "masked"] == PII_PLANTED.loc[2, "text"]
    assert got.loc[2, "n_masked"] == 0
    assert got.loc[3, "masked"] == ""
    # email rule runs first ('c@d.ef' -> [EMAIL]), then the URL rule
    # swallows the whole rewritten token — deterministic in both engines
    # because both apply the rules in the same order
    assert got.loc[4, "n_masked"] == 2
    assert got.loc[4, "masked"] == "mid [URL] tail"

    duck_df = _oracle(pii_dir, PII_MASK_SQL)
    pd.testing.assert_frame_equal(
        _canon(got.reset_index()), _canon(duck_df),
        check_dtype=False, check_exact=True, obj="doc_pii_masked")


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_docs")
    PLANTED.iloc[0:0].to_parquet(os.path.join(d, "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_corpus_family_on_empty_table(empty_dir):
    """Every documents-family operator must return an empty (or
    well-defined aggregate) result on an empty input, not crash — empty
    partitions are routine at scale."""
    from pdf_extraction_ray.pipelines.corpus import CORPUS_QUERIES
    from pdf_extraction_ray.pipelines.textops import TEXT_QUERIES
    from pdf_extraction_ray.pipelines.packing import PACKING_QUERIES

    for name, (fn, _sql) in {**CORPUS_QUERIES, **TEXT_QUERIES,
                             **PACKING_QUERIES}.items():
        res = fn(empty_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert df is not None, name
        if name in ("corpus_vocab_stats", "packing_stats"):
            assert len(df) == 1, name          # one-row aggregates
        elif name == "doc_quality_threshold_sweep":
            # fixed threshold grid: the oracle's LEFT JOIN keeps all 10
            # thresholds (zero counts) even over an empty corpus
            assert len(df) == 10 and df["n_docs_kept"].sum() == 0, name
        elif name in ("quality_weak_labels", "split_leakage_safe"):
            # fixed label/split grids (oracle: names LEFT JOIN), zeroed
            assert len(df) == 3 and df["n_docs"].sum() == 0, name
        elif name == "split_naive_leakage":
            assert len(df) == 1 and df["n_groups"].iloc[0] == 0, name
        else:
            assert len(df) == 0, name


def test_spans_cleaning_families_on_empty_table(empty_dir):
    """The interleaved-span and cleaning tiers on an EMPTY documents
    table: summary ops return their one all-zero row (matching their
    oracles' scalar aggregates), everything else returns no rows."""
    from pdf_extraction_ray.pipelines.cleaning import CLEANING_QUERIES
    from pdf_extraction_ray.pipelines.spans import SPANS_QUERIES

    one_zero_row = {"span_order_audit", "media_fetch_audit",
                    "interleaved_curation_funnel"}
    for name, (fn, _sql) in {**SPANS_QUERIES,
                             **CLEANING_QUERIES}.items():
        res = fn(empty_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        if name in one_zero_row:
            assert len(df) == 1, name
            assert (df.iloc[0] == 0).all(), name
        else:
            assert len(df) == 0, name
        # empty results must still be TYPED (schema survives): a
        # schema-less empty frame KeyErrors column-selecting consumers
        assert df.shape[1] > 0, f"{name}: schema lost on empty input"


@pytest.fixture(scope="module")
def empty_tables_dir(tmp_path_factory):
    import pyarrow.parquet as pq
    import pyarrow as pa
    d = tmp_path_factory.mktemp("empty_tables")
    src = "/root/testdata/sf0.001"
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), os.path.join(d, f"{t}.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_relational_family_on_empty_tables(empty_tables_dir):
    """Relational operators over fully-empty tables must return empty
    (or well-defined aggregate) results, not crash."""
    from pdf_extraction_ray.pipelines.relational import RELATIONAL_QUERIES

    for name, (fn, _sql) in RELATIONAL_QUERIES.items():
        res = fn(empty_tables_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert df is not None, name


@pytest.mark.usefixtures("ray_session")
def test_tpch_family_on_empty_tables(empty_tables_dir):
    from pdf_extraction_ray.pipelines.tpch import TPCH_QUERIES

    for name, (fn, _sql) in TPCH_QUERIES.items():
        res = fn(empty_tables_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert df is not None, name


@pytest.mark.usefixtures("ray_session")
def test_storage_streaming_family_on_empty_tables(empty_tables_dir):
    from pdf_extraction_ray.pipelines.storage import STORAGE_QUERIES
    from pdf_extraction_ray.pipelines.streaming import STREAMING_QUERIES

    for name, (fn, _sql) in {**STORAGE_QUERIES,
                             **STREAMING_QUERIES}.items():
        res = fn(empty_tables_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert df is not None, name
        assert len(df) == 0, name


@pytest.mark.usefixtures("ray_session")
def test_dedup_family_on_empty_tables(empty_tables_dir):
    from pdf_extraction_ray.pipelines.dedup import DEDUP_QUERIES

    for name, (fn, _sql) in DEDUP_QUERIES.items():
        res = fn(empty_tables_dir)
        df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
        assert df is not None, name
        assert len(df) == 0, name


@pytest.mark.usefixtures("ray_session")
def test_curation_funnel_every_stage_drops(tmp_path):
    """Planted corpus where each funnel stage removes something: a
    non-English doc (langid), a short doc (quality), an exact duplicate
    (dedup) — stage counts must match the CTE-chain oracle and strictly
    decrease through stage 3."""
    import duckdb

    from pdf_extraction_ray.pipelines.textops import (
        corpus_curation_stages, _curation_sql)

    en = ("the cat and the dog are in the house and they have seen "
          "it with his her its they what which over after under again")
    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [en, en,                       # exact duplicates
                 "le la les des une est et dans pour avec sur " * 4,
                 "the and of to a in is it the and of to",  # en, short
                 en + " more unique tail words to differ",
                 ""],
        "lang": ["en"] * 6,
        "source": ["s"] * 6})
    d = str(tmp_path)
    docs.to_parquet(os.path.join(d, "documents.parquet"))

    got = corpus_curation_stages(d)
    by = got.set_index("stage_name")
    assert by.loc["raw", "n_docs"] == 6
    assert by.loc["langid_en", "n_docs"] < 6          # french + empty out
    assert by.loc["quality", "n_docs"] < by.loc["langid_en", "n_docs"]
    assert by.loc["dedup_exact", "n_docs"] \
        == by.loc["quality", "n_docs"] - 1            # one dup dropped

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    want = con.sql(_curation_sql()).df()
    rc = got.sort_values("stage").reset_index(drop=True)
    oc = want.sort_values("stage").reset_index(drop=True)
    pd.testing.assert_frame_equal(rc, oc, check_dtype=False)


# ---------------------------------------------------------------------------
# TextRank keywords
# ---------------------------------------------------------------------------

@pytest.mark.usefixtures("ray_session")
def test_textrank_matches_pure_python(tmp_path):
    """Engine TextRank equals a dict-loop pure-python PageRank over the
    same (sorted) edge list bit-exactly, and a planted hub word wins."""
    from pdf_extraction_ray.pipelines.corpus import (
        TEXTRANK_DAMPING, TEXTRANK_ITERS, _textrank_edges,
        corpus_textrank_keywords)
    d = str(tmp_path)
    # 'data' is adjacent to many distinct words repeatedly (hub); other
    # words only chain among themselves; short/non-alpha tokens ignored
    texts = (["data model data layout data engine data format"] * 3
             + ["model layout engine format alpha beta"] * 2
             + ["xy 12 a!b zz"] * 2)
    pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "text": texts}) \
        .to_parquet(os.path.join(d, "documents.parquet"))

    out = corpus_textrank_keywords(d)
    assert out.term.iloc[0] == "data"

    edges = _textrank_edges(d).sort_values(["w1", "w2"]) \
        .reset_index(drop=True)
    terms = sorted(set(edges.w1) | set(edges.w2))
    wdeg = {t: 0.0 for t in terms}
    for r in edges.itertuples(index=False):
        wdeg[r.w1] += float(r.n)
        wdeg[r.w2] += float(r.n)
    rank = {t: 1.0 for t in terms}
    for _ in range(TEXTRANK_ITERS):
        contrib = {t: 0.0 for t in terms}
        for r in edges.itertuples(index=False):
            contrib[r.w2] += float(r.n) * rank[r.w1] / wdeg[r.w1]
            contrib[r.w1] += float(r.n) * rank[r.w2] / wdeg[r.w2]
        rank = {t: (1.0 - TEXTRANK_DAMPING)
                + TEXTRANK_DAMPING * contrib[t] for t in terms}
    for r in out.itertuples(index=False):
        assert rank[r.term] == r.score, r.term


@pytest.mark.usefixtures("ray_session")
def test_token_allocation_sums_to_budget(tmp_path):
    """Hamilton apportionment: quotas sum EXACTLY to the budget and
    respect quota monotonicity (floor <= quota <= floor+1)."""
    from pdf_extraction_ray.pipelines.textops import (ALLOC_BUDGET,
                                                      source_token_allocation)
    d = str(tmp_path)
    rng = np.random.default_rng(3)
    texts = [" ".join(["w"] * int(rng.integers(1, 50)))
             for _ in range(60)]
    pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                  "text": texts,
                  "source": rng.choice(["a", "b", "c"], size=60)}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    out = source_token_allocation(d)
    assert out.quota.sum() == ALLOC_BUDGET
    total = out.n_tokens.sum()
    for r in out.itertuples(index=False):
        fl = int(r.n_tokens) * ALLOC_BUDGET // int(total)
        assert fl <= r.quota <= fl + 1


@pytest.mark.usefixtures("ray_session")
def test_word_embeddings_planted_structure(tmp_path):
    """Words that always co-occur ('alpha beta') end up closer in the
    PPMI-eigenvector space than words that never do."""
    import os
    d = str(tmp_path)
    rng = np.random.default_rng(21)
    docs = []
    fills = (["red", "green", "pink"], ["blue", "cyan", "gray"])
    for i in range(60):
        # omega lives in red/green/pink contexts, sigma in
        # blue/cyan/gray — disjoint neighborhoods; alpha-beta share
        # every context and are always adjacent
        words = list(rng.choice(fills[i % 2], size=12))
        pos = int(rng.integers(0, 10))
        words[pos:pos] = ["alpha", "beta"]
        words.insert(int(rng.integers(0, 5)),
                     "sigma" if i % 2 else "omega")
        docs.append(" ".join(words))
    pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                  "text": docs}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    from pdf_extraction_ray.pipelines.corpus import corpus_word_embeddings
    out = corpus_word_embeddings(d).set_index("term")
    e = {t: out.loc[t, ["dim0_x1e6", "dim1_x1e6"]]
         .to_numpy(np.float64) for t in out.index}
    close = float(np.linalg.norm(e["alpha"] - e["beta"]))
    far = float(np.linalg.norm(e["omega"] - e["sigma"]))
    assert close < far
    # determinism: a second run is bit-identical
    out2 = corpus_word_embeddings(d).set_index("term")
    assert out.equals(out2)


@pytest.mark.usefixtures("ray_session")
def test_zipf_fit_on_planted_power_law(tmp_path):
    """Tokens drawn with frequency proportional to 1/rank fit slope
    ~ -1 with high R^2."""
    import os
    d = str(tmp_path)
    words = [f"w{i}" for i in range(1, 40)]
    doc = []
    for r, w in enumerate(words, start=1):
        doc += [w] * max(1, 4000 // r)         # freq ~ 1/rank
    pd.DataFrame({"doc_id": np.array([0], dtype=np.int64),
                  "text": [" ".join(doc)]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    from pdf_extraction_ray.pipelines.corpus import corpus_zipf_fit
    out = corpus_zipf_fit(d)
    slope = out["slope_x1e6"].iloc[0] / 1e6
    assert -1.1 < slope < -0.9
    assert out["r2_x1e6"].iloc[0] > 980_000


@pytest.mark.usefixtures("ray_session")
def test_dsir_ranks_targetlike_doc_first(tmp_path):
    """DSIR semantics: a raw-pool doc WRITTEN IN the target domain's
    vocabulary must outrank raw-pool docs written in non-target
    vocabulary (the whole point of importance resampling)."""
    from pdf_extraction_ray.pipelines.corpus import corpus_dsir_selection
    target_vocab = "stream batch shuffle arrow block " * 6
    other_vocab = "bonjour monde fleuve papier hiver " * 6
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [target_vocab, target_vocab,          # the target domain
                 target_vocab,                        # raw doc, target-like
                 other_vocab, other_vocab, other_vocab],
        "lang": ["en", "en", "fr", "fr", "de", "zh"],
        "source": ["s0"] * 6})
    d = tmp_path / "dsir"
    d.mkdir()
    df.to_parquet(str(d / "documents.parquet"))
    out = corpus_dsir_selection(str(d))
    assert list(out["doc_id"]) [0] == 2          # target-like raw doc wins
    assert int(out.loc[0, "sel_rank"]) == 1
    assert out["weight_x1e6"].iloc[0] > out["weight_x1e6"].iloc[1]
    assert set(out["doc_id"]) == {2, 3, 4, 5}    # target docs never selected


@pytest.mark.usefixtures("ray_session")
def test_compression_ratio_differential_and_planted(tmp_path):
    """doc_compression_ratio matches direct zlib exactly, and a
    degenerate repetitive doc gates while natural-ish prose passes."""
    import zlib
    from pdf_extraction_ray.pipelines.textops import (
        COMPRESSION_GATE_X1E6, doc_compression_ratio)
    rng = np.random.default_rng(9)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    natural = " ".join(
        "".join(rng.choice(alpha, size=int(rng.integers(4, 9))))
        for _ in range(400))        # high-entropy prose stand-in
    degenerate = "spam " * 400
    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [natural, degenerate, "", "tiny"],
        "lang": ["en"] * 4, "source": ["s0"] * 4})
    d = tmp_path / "cr"
    d.mkdir()
    df.to_parquet(str(d / "documents.parquet"))
    out = doc_compression_ratio(str(d)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(df["text"]):
        raw = t.encode()
        want = len(zlib.compress(raw, 6)) * 1_000_000 // len(raw) \
            if raw else 0
        assert int(out.loc[i, "ratio_x1e6"]) == want
        assert int(out.loc[i, "n_bytes"]) == len(raw)
    assert bool(out.loc[1, "degenerate"])           # "spam spam spam..."
    assert not bool(out.loc[0, "degenerate"])       # natural-ish prose
    assert not bool(out.loc[2, "degenerate"])       # empty: no signal
    assert int(out.loc[1, "ratio_x1e6"]) < COMPRESSION_GATE_X1E6


@pytest.mark.usefixtures("ray_session")
def test_unimax_capped_prefix_hand_computed(tmp_path):
    """Skewed language sizes exercise the capped branch: the tiny
    language hits the 3-epoch cap; the rest split the remaining budget
    equally (hand-computed waterfill)."""
    from pdf_extraction_ray.pipelines.corpus import docs_unimax_alloc
    d = str(tmp_path)

    def doc(n):           # exactly n whitespace tokens
        return " ".join(["w"] * n)

    rows = [("aa", doc(10)), ("bb", doc(60)), ("bb", doc(40)),
            ("cc", doc(500)), ("cc", doc(500))]
    pd.DataFrame({
        "doc_id": np.arange(len(rows), dtype=np.int64),
        "text": [t for _, t in rows],
        "lang": [l for l, _ in rows],
        "source": ["s"] * len(rows),
        "n_chars": [len(t) for _, t in rows]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    out = docs_unimax_alloc(d).set_index("lang")
    # totals 10/100/1000, budget 555: aa capped at 30 (3 epochs),
    # bb and cc share (555-30)//2 = 262 each
    assert out.loc["aa", "alloc_tokens"] == 30
    assert out.loc["aa", "epochs_x1e6"] == 3_000_000
    assert out.loc["bb", "alloc_tokens"] == 262
    assert out.loc["bb", "epochs_x1e6"] == 2_620_000
    assert out.loc["cc", "alloc_tokens"] == 262
    assert out.loc["cc", "epochs_x1e6"] == 262_000
    assert int(out["alloc_tokens"].sum()) <= 555


@pytest.mark.usefixtures("ray_session")
def test_topics_planted_vocabulary_recovery(tmp_path):
    """Three disjoint-vocabulary doc groups: no topic may mix
    vocabularies, every vocabulary surfaces as some topic's top terms,
    and sizes cover the corpus."""
    from pdf_extraction_ray.pipelines.corpus import corpus_topics
    d = str(tmp_path)
    vocabs = [["aurora", "breeze", "canyon", "dune"],
              ["ember", "fjord", "glade", "harbor"],
              ["island", "jungle", "krill", "lagoon"]]
    rng = np.random.default_rng(11)
    texts, n_per = [], 12
    for v in vocabs:
        for _ in range(n_per):
            texts.append(" ".join(rng.choice(v, size=30)))
    pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["s"] * len(texts),
        "n_chars": [len(t) for t in texts]}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    flat_vocab = {w: i for i, v in enumerate(vocabs) for w in v}
    # BOTH paths must recover: driver fast path (default at this size)
    # and the distributed barrier passes (driver_max=0)
    for dm in (None, 0):
        out = corpus_topics(d) if dm is None else corpus_topics(
            d, driver_max=0)
        seen_vocabs = set()
        for tid, g in out.groupby("topic_id"):
            owners = {flat_vocab[t] for t in g["term"]}
            assert len(owners) == 1, f"topic {tid} mixes vocabularies"
            seen_vocabs |= owners
        assert seen_vocabs == {0, 1, 2}
        assert out.groupby("topic_id")["n_docs"].first().sum() \
            == len(texts)


@pytest.mark.usefixtures("ray_session")
def test_topics_driver_vs_distributed_bit_equal():
    """The driver fast path and the distributed partial-sum path are
    BIT-identical on real sf0.001 data: TOPICS_QSCALE dyadic
    quantization makes every float64 per-cluster sum exact, so Lloyd
    updates are order-invariant across block layouts (ADVICE r4)."""
    from pdf_extraction_ray.pipelines.corpus import corpus_topics
    sf = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    fast = corpus_topics(sf)
    slow = corpus_topics(sf, driver_max=0)
    pd.testing.assert_frame_equal(fast.reset_index(drop=True),
                                  slow.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_topics_empty_corpus(empty_tables_dir):
    from pdf_extraction_ray.pipelines.corpus import corpus_topics
    out = corpus_topics(empty_tables_dir)
    assert len(out) == 0
    assert list(out.columns) == ["topic_id", "n_docs", "rank", "term",
                                 "cnt"]


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_fraction_planted(tmp_path):
    """Planted cross-doc shared 8-gram runs: doc 0 and doc 1 share an
    exact 10-token block (3 shared 8-grams each); doc 2 is fully unique;
    doc 3 repeats ITS OWN gram (intra-doc repetition must NOT count as
    a cross-doc dup); short docs (<8 tokens) emit no row."""
    import duckdb

    from pdf_extraction_ray.pipelines.corpus import (
        DUP_NGRAM_SQL, docs_dup_ngram_fraction)
    block = " ".join(f"shared{i}" for i in range(10))
    texts = [
        f"aaa bbb {block}",                       # doc 0: 12 tokens
        f"{block} ccc ddd",                       # doc 1: 12 tokens
        " ".join(f"uniq{i}" for i in range(12)),  # doc 2: unique
        " ".join(f"rep{i % 8}" for i in range(16)),  # doc 3: self-repeat
        "short text only",                        # doc 4: no gram
    ]
    pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                  "text": texts,
                  "lang": ["en"] * 5, "source": ["s"] * 5,
                  "n_chars": np.array([len(t) for t in texts],
                                      dtype=np.int64)}) \
        .to_parquet(tmp_path / "documents.parquet")
    out = docs_dup_ngram_fraction(str(tmp_path))
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index("doc_id")
    assert 4 not in out.index                     # <8 tokens: no row
    # docs 0/1: 12 tokens -> 5 grams each; the 10-token shared block
    # contributes 3 identical 8-grams to both
    assert out.loc[0, "n_grams"] == 5 and out.loc[0, "n_dup"] == 3
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_dup"] == 3
    assert out.loc[0, "dup_frac_x1e6"] == 3 * 1_000_000 // 5
    assert out.loc[2, "n_dup"] == 0
    # doc 3: rep0..rep7 repeated -> every window is the SAME cyclic
    # pattern but only 8 distinct grams, none shared with other docs
    assert out.loc[3, "n_dup"] == 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    orc = con.execute(DUP_NGRAM_SQL).fetchdf().set_index("doc_id")
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  orc.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_fraction_empty(empty_tables_dir):
    from pdf_extraction_ray.pipelines.corpus import docs_dup_ngram_fraction
    out = docs_dup_ngram_fraction(empty_tables_dir)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_grams", "n_dup",
                                 "dup_frac_x1e6"]


def _qc_write(d, n_shards=1):
    """Two-class separable corpus for the quality-classifier tests:
    stopword-rich prose (all four weak voters pass -> high) vs punct
    soup (votes <= 1 -> low), disjoint vocabularies."""
    high = ("the cat and the dog are in the house with a good plan "
            "for the day and more the end here now")     # 21 toks
    low = ",,,,,,,, !!!!!!!! ???????? ;;;;;;;; ::::::::"  # 5 punct toks
    texts, langs = [], []
    for i in range(40):
        texts.append(high + f" extra{i}" if i % 2 == 0
                     else low + f" x{i}!!!!")
        langs.append("en")
    df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                       "text": texts, "lang": langs,
                       "source": ["s"] * 40,
                       "n_chars": [len(t) for t in texts]})
    df["n_chars"] = df["n_chars"].astype("int64")
    os.makedirs(d, exist_ok=True)
    if n_shards == 1:
        df.to_parquet(os.path.join(d, "documents.parquet"))
    else:
        os.makedirs(os.path.join(d, "documents.parquet"), exist_ok=True)
        for s in range(n_shards):
            df.iloc[s::n_shards].to_parquet(os.path.join(
                d, "documents.parquet", f"part-{s}.parquet"))
    return df


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_separable(tmp_path):
    """Distilling the weak labels on a separable two-class corpus:
    perfect train accuracy and confidently-separated scores."""
    from pdf_extraction_ray.pipelines.corpus import doc_quality_classifier
    d = str(tmp_path / "qc")
    _qc_write(d)
    out = doc_quality_classifier(d)
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 40
    tr = out[out["label"] < 2]
    assert set(tr["label"]) == {0, 1}          # both classes labeled
    assert (tr["label"] == tr["pred"]).all()   # perfect separation
    assert (tr.loc[tr["label"] == 1, "score_x1e6"] > 800_000).all()
    assert (tr.loc[tr["label"] == 0, "score_x1e6"] < 200_000).all()


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_sharding_invariant(tmp_path):
    """Integer-quantized gradient partials make training bit-identical
    at any block layout: 1-shard vs 5-shard corpora give the SAME
    scores."""
    from pdf_extraction_ray.pipelines.corpus import doc_quality_classifier
    d1, d5 = str(tmp_path / "s1"), str(tmp_path / "s5")
    _qc_write(d1, n_shards=1)
    _qc_write(d5, n_shards=5)
    o1 = doc_quality_classifier(d1, driver_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    o5 = doc_quality_classifier(d5, driver_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(o1, o5)


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_empty(empty_tables_dir):
    from pdf_extraction_ray.pipelines.corpus import doc_quality_classifier
    out = doc_quality_classifier(empty_tables_dir)
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "label", "score_x1e6", "pred"]


@pytest.mark.usefixtures("ray_session")
def test_dup_ngram_scale_path_equals_driver(tmp_path):
    """Forcing the gram-keyed exchange (driver_max=0) reproduces the
    driver-merge fast path exactly."""
    from pdf_extraction_ray.pipelines.corpus import docs_dup_ngram_fraction
    sf = "/root/testdata/sf0.001"
    fast = docs_dup_ngram_fraction(sf)
    fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
    slow = docs_dup_ngram_fraction(sf, driver_max=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values("doc_id").reset_index(drop=True).astype("int64"),
        slow.sort_values("doc_id").reset_index(drop=True).astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_quality_classifier_driver_path_equals_distributed(tmp_path):
    """The driver fast path and the distributed GD passes share the
    order-invariant integer gradient algebra — bit-identical scores."""
    from pdf_extraction_ray.pipelines.corpus import doc_quality_classifier
    d = str(tmp_path / "qcp")
    _qc_write(d, n_shards=3)
    fast = doc_quality_classifier(d)
    fast = fast.to_pandas() if hasattr(fast, "to_pandas") else fast
    slow = doc_quality_classifier(d, driver_max=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.sort_values("doc_id").reset_index(drop=True),
        slow.sort_values("doc_id").reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_source_vocab_jaccard_planted(tmp_path):
    """Hand-checkable vocabularies: s1={a,b,c,d}, s2={c,d,e} ->
    J = 2/5; s3 disjoint from s1 (no row); s2 ∩ s3 = {x} -> J = 1/4.
    Oracle agrees on the same table."""
    import duckdb

    from pdf_extraction_ray.pipelines.corpus import (
        SOURCE_JACCARD_SQL, docs_source_vocab_jaccard)
    rows = [
        (0, "s1", "a b c d"), (1, "s1", "a b"),
        (2, "s2", "c d e"),
        (3, "s3", "x y z"), (4, "s2", "x"),
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype("int64")
    d = str(tmp_path / "svj")
    os.makedirs(d)
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = docs_source_vocab_jaccard(d)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out)
    out = out.set_index(["source_a", "source_b"])
    # s2 vocab = {c, d, e, x}
    assert out.loc[("s1", "s2"), "inter"] == 2
    assert out.loc[("s1", "s2"), "uni"] == 6
    assert out.loc[("s1", "s2"), "jaccard_x1e6"] == 2 * 1_000_000 // 6
    assert out.loc[("s2", "s3"), "inter"] == 1
    assert out.loc[("s2", "s3"), "uni"] == 6
    assert ("s1", "s3") not in out.index     # disjoint: no row
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    orc = con.execute(SOURCE_JACCARD_SQL).fetchdf() \
        .set_index(["source_a", "source_b"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  orc.astype("int64"))


@pytest.mark.usefixtures("ray_session")
def test_source_length_emd_planted(tmp_path):
    """Hand-computable EMD: s1 docs all 5 tokens (bucket 1), s2 all 10
    (bucket 2) -> mass 1 moved distance 1 bucket = 1e6; s3 split
    50/50 between buckets 1 and 3 vs s1 (all at 1): |CDF diff| = 0.5
    on [1,2) and 0.5 on [2,3) -> EMD = 1.0 buckets."""
    import duckdb

    from pdf_extraction_ray.pipelines.corpus import (
        SOURCE_EMD_SQL, docs_source_length_emd)
    five = "a b c d e"            # 5 tokens  -> bucket 1
    ten = "a b c d e f g h i j"   # 10 tokens -> bucket 2
    fifteen = ten + " k l m n o"  # 15 tokens -> bucket 3
    rows = ([(i, "s1", five) for i in range(4)]
            + [(10 + i, "s2", ten) for i in range(4)]
            + [(20, "s3", five), (21, "s3", five),
               (22, "s3", fifteen), (23, "s3", fifteen)])
    df = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["lang"] = "en"
    df["n_chars"] = df["text"].str.len().astype("int64")
    d = str(tmp_path / "emd")
    os.makedirs(d)
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = docs_source_length_emd(d)
    out = (out.to_pandas() if hasattr(out, "to_pandas") else out) \
        .set_index(["source_a", "source_b"])
    assert out.loc[("s1", "s2"), "emd_x1e6"] == 1_000_000
    assert out.loc[("s1", "s3"), "emd_x1e6"] == 1_000_000
    assert out.loc[("s2", "s3"), "emd_x1e6"] == 1_000_000
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    orc = con.execute(SOURCE_EMD_SQL).fetchdf() \
        .set_index(["source_a", "source_b"])
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  orc.astype("int64"))
