"""Bradley-Terry preference fitting (textops.preference_bradley_terry):
planted transitive game schedule -> exact win-matrix recovery and MM
strengths identical to a local replay of Hunter (2004)."""

import os

import numpy as np
import pandas as pd
import pytest


def _write_games(d, schedule):
    """One doc pair per game: doc 2k (winner lang, stopword-rich text)
    vs doc 2k+1 (loser lang, stopword-free text)."""
    rows = []
    for k, (w, l) in enumerate(schedule):
        rows.append((2 * k, w, "the and of the to in the and"))
        rows.append((2 * k + 1, l, "cat dog bird fish tree rock"))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len().astype("int64")
    os.makedirs(d, exist_ok=True)
    df.to_parquet(os.path.join(d, "documents.parquet"))
    return df


def _mm_reference(items, wm, iters):
    k = len(items)
    N = np.zeros((k, k), dtype=np.int64)
    W = np.zeros(k, dtype=np.int64)
    for (w, l), n in wm.items():
        i, j = items.index(w), items.index(l)
        N[i, j] += n
        N[j, i] += n
        W[i] += n
    s = np.full(k, 1.0 / k)
    for _ in range(iters):
        denom = np.zeros(k)
        for i in range(k):
            mask = N[i] > 0
            denom[i] = (N[i, mask] / (s[i] + s[mask])).sum()
        s = np.where(denom > 0, W / np.maximum(denom, 1e-300), s)
        s = np.maximum(s, 1e-12)
        s /= s.sum()
    return s


@pytest.mark.usefixtures("ray_session")
def test_bt_planted_transitive_order(tmp_path):
    from pdf_extraction_ray.pipelines.textops import (
        BT_ITERS, preference_bradley_terry)
    # A beats B 9:3, B beats C 9:3, A beats C 11:1 — transitive
    schedule = ([("A", "B")] * 9 + [("B", "A")] * 3
                + [("B", "C")] * 9 + [("C", "B")] * 3
                + [("A", "C")] * 11 + [("C", "A")] * 1)
    d = str(tmp_path / "bt")
    _write_games(d, schedule)
    out = preference_bradley_terry(d).set_index("lang")
    assert out.loc["A", "wins"] == 20 and out.loc["A", "games"] == 24
    assert out.loc["B", "wins"] == 12 and out.loc["B", "games"] == 24
    assert out.loc["C", "wins"] == 4 and out.loc["C", "games"] == 24
    sA, sB, sC = (out.loc[x, "strength_x1e6"] for x in "ABC")
    assert sA > sB > sC
    # bit-identical to the reference MM on the known win matrix
    wm = {}
    for w, l in schedule:
        wm[(w, l)] = wm.get((w, l), 0) + 1
    s = _mm_reference(["A", "B", "C"], wm, BT_ITERS)
    np.testing.assert_array_equal(
        out.sort_index()["strength_x1e6"].to_numpy(),
        np.floor(s * 1e6).astype(np.int64))


@pytest.mark.usefixtures("ray_session")
def test_bt_void_and_same_lang_games(tmp_path):
    """Same-lang pairs and exact ratio ties produce NO game."""
    from pdf_extraction_ray.pipelines.textops import (
        preference_bradley_terry)
    rows = [
        (0, "A", "the and of"), (1, "A", "cat dog bird"),   # same lang
        (2, "B", "the cat of"), (3, "C", "the dog of"),     # ratio tie
        (4, "B", "the and of"), (5, "C", "cat dog bird"),   # real game
    ]
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["source"] = "s"
    df["n_chars"] = df["text"].str.len().astype("int64")
    d = str(tmp_path / "btv")
    os.makedirs(d)
    df.to_parquet(os.path.join(d, "documents.parquet"))
    out = preference_bradley_terry(d).set_index("lang")
    assert set(out.index) == {"B", "C"}
    assert out.loc["B", "wins"] == 1 and out.loc["B", "games"] == 1
    assert out.loc["C", "wins"] == 0


@pytest.mark.usefixtures("ray_session")
def test_bt_empty(tmp_path):
    from pdf_extraction_ray.pipelines.textops import (
        preference_bradley_terry)
    d = str(tmp_path / "bte")
    os.makedirs(d)
    pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                  "lang": pd.Series(dtype="object"),
                  "text": pd.Series(dtype="object"),
                  "source": pd.Series(dtype="object"),
                  "n_chars": pd.Series(dtype="int64")}) \
        .to_parquet(os.path.join(d, "documents.parquet"))
    out = preference_bradley_terry(d)
    assert len(out) == 0
    assert list(out.columns) == ["lang", "games", "wins",
                                 "strength_x1e6"]
