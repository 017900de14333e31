"""Deterministic synthetic interleaved-document corpus (FIXTURES.md §1).

Every document is a pure function of ``(seed, doc_index)`` via
``np.random.default_rng([seed, doc_index])`` — so generation order,
sharding and parallelism never change content, and any subset of the
corpus can be regenerated independently (this is what makes resume tests
and two-parallelism-level benches byte-comparable).

The corpus exercises every boundary the extraction spec cares about:
title-font thresholds, boilerplate link-density, regular / irregular /
sparse vector grids, diagonal "diagram" regions, caption proximity with
kor+eng keywords, IoU-overlapping duplicate regions, empty docs,
whitespace-only spans, and shuffled span order (reassembly must sort by
offset). ~`pathological_frac` of docs have 50-120 pages (skew tests).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import DOCS_SCHEMA

# Body vocabulary intentionally excludes caption keywords (표/table/그림/
# figure...) so captions only appear where the generator plants them.
_ENG = (
    "data stream engine batch vector layout span document page block "
    "content extraction pipeline arrow shard worker offset median font "
    "grid line region result metric value sample index quality token "
    "record schema column partition bucket manifest checkpoint resume "
    "system model output input order sequence kind media text number"
).split()
_KOR = (
    "데이터 문서 페이지 블록 내용 추출 파이프라인 화살표 조각 작업자 오프셋 "
    "중앙값 글꼴 격자 선 영역 결과 지표 값 표본 색인 품질 토큰 기록 스키마 "
    "열 분할 버킷 명세 검사점 재개 체계 모형 출력 입력 순서 수열 종류 매체"
).split()
_VOCAB = np.array(_ENG + _KOR)
_BOILER = np.array([
    "Home | About | Contact | Login",
    "Copyright 2024 All rights reserved",
    "Subscribe to newsletter | RSS | Sitemap",
    "Share on social media",
])


def _words(rng: np.random.Generator, lo: int, hi: int) -> str:
    n = int(rng.integers(lo, hi + 1))
    toks = list(rng.choice(_VOCAB, size=n))
    # sprinkle numeric / '=' / '%' tokens (data-point counter fixture,
    # gpt4_comprehensive_visual_processor.py:327-336 analog)
    if rng.random() < 0.3:
        toks.append(f"{rng.integers(0, 1000)}.{rng.integers(0, 99)}")
    if rng.random() < 0.15:
        toks.append(f"x={rng.integers(0, 100)}%")
    return " ".join(toks)


def _grid_lines(rng: np.random.Generator, bbox, n_rows: int, n_cols: int,
                jitter: float) -> list[dict]:
    """(n_rows+1) horizontal + (n_cols+1) vertical lines spanning ``bbox``,
    with optional y/x jitter to break grid regularity."""
    x0, y0, x1, y1 = bbox
    lines = []
    ys = np.linspace(y0, y1, n_rows + 1)
    xs = np.linspace(x0, x1, n_cols + 1)
    if jitter > 0.0:
        ys = ys + rng.uniform(-jitter, jitter, size=ys.shape) * (y1 - y0)
        xs = xs + rng.uniform(-jitter, jitter, size=xs.shape) * (x1 - x0)
    for y in ys:
        lines.append({"x0": float(x0), "y0": float(y), "x1": float(x1), "y1": float(y)})
    for x in xs:
        lines.append({"x0": float(x), "y0": float(y0), "x1": float(x), "y1": float(y1)})
    return lines


def _diag_lines(rng: np.random.Generator, bbox, n: int) -> list[dict]:
    x0, y0, x1, y1 = bbox
    lines = []
    for _ in range(n):
        ax, ay = rng.uniform(x0, x1), rng.uniform(y0, y1)
        bx, by = rng.uniform(x0, x1), rng.uniform(y0, y1)
        # force a genuinely diagonal segment
        if abs(bx - ax) < 0.05:
            bx = min(x1, ax + 0.1)
        if abs(by - ay) < 0.05:
            by = min(y1, ay + 0.1)
        lines.append({"x0": float(ax), "y0": float(ay), "x1": float(bx), "y1": float(by)})
    return lines


GIANT_STRIPE = 50_000   # clustered mode: giants fill the head of each stripe


def generate_doc(seed: int, i: int, pathological_frac: float = 0.01,
                 giant_frac: float = 0.0,
                 giant_clustered: bool = False) -> dict:
    """One synthetic document row (plain-python dict, DOCS_SCHEMA shape).

    ``giant_frac`` > 0 plants truly pathological 400-1200-page documents
    (~200-600x the median span count) — the one-giant-row skew tier
    (SURVEY.md §4) the skew bench drives. The draw happens only when the
    knob is on, so giant_frac=0 corpora are bit-identical to before.

    ``giant_clustered`` packs the giants CONSECUTIVELY at the head of
    each GIANT_STRIPE-doc index stripe (instead of iid draws) — the
    "book dump" corpus shape where whole input shards are giants, which
    is what the spread re-order skew control exists for."""
    rng = np.random.default_rng([seed, i])
    doc_id = f"doc-{i:08d}"

    if i % 97 == 0 and i > 0:           # empty doc
        return {"doc_id": doc_id, "spans": [], "font_size": [], "page": [],
                "link_density": [], "bbox": [], "regions": [], "n_pages": 0}

    if giant_frac > 0.0 and (
            (i % GIANT_STRIPE) < giant_frac * GIANT_STRIPE
            if giant_clustered else rng.random() < giant_frac):
        n_pages = int(rng.integers(400, 1201))
    elif rng.random() < pathological_frac:
        n_pages = int(rng.integers(50, 121))
    elif i % 89 == 0 and i > 0:         # single-span doc
        n_pages = 1
    else:
        n_pages = 1 + int(rng.poisson(1.5))

    spans, fonts, pages, links, bboxes, regions = [], [], [], [], [], []
    single_span = (i % 89 == 0 and i > 0)

    for p in range(n_pages):
        base = p * 1000
        page_no = p + 1
        boundary_page = (i % 13 == 0 and p == 0)
        body = 10.0 if boundary_page else float(rng.choice([9.5, 10.0, 10.5]))
        slot = 0

        def put(kind, text, media_ref, font, link, bb):
            nonlocal slot
            spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                          "offset": base + 10 * slot})
            fonts.append(font)
            pages.append(page_no)
            links.append(link)
            bboxes.append([float(v) for v in bb])
            slot += 1

        n_body = 1 if single_span else int(rng.integers(3, 10))
        y_step = 0.9 / max(n_body + 4, 8)

        # title span
        if not single_span:
            tfont = body * (1.2 if boundary_page else float(rng.uniform(1.3, 1.6)))
            put("text", _words(rng, 3, 7), "", tfont, 0.0,
                (0.1, 0.03, 0.9, 0.03 + y_step * 0.8))
            if boundary_page:   # just-below-threshold sibling
                put("text", _words(rng, 3, 7), "", body * 1.19, 0.0,
                    (0.1, 0.05, 0.9, 0.05 + y_step * 0.8))

        # paragraphs / markdown headers / list items
        for k in range(n_body):
            r = rng.random()
            if r < 0.05:
                text = "## " + _words(rng, 2, 5)
            elif r < 0.10:
                text = "### " + _words(rng, 2, 5)
            elif r < 0.16:
                text = ("- " if rng.random() < 0.5 else f"{k + 1}. ") + _words(rng, 3, 10)
            elif r < 0.19:
                text = "   "            # whitespace-only -> dropped
            else:
                text = _words(rng, 6, 40)
            font = body + float(np.round(rng.normal(0.0, 0.2), 1))
            y = 0.1 + y_step * k
            put("text", text, "", font, 0.0, (0.1, y, 0.9, y + y_step * 0.7))

        if single_span:
            break

        # boilerplate noise
        if rng.random() < 0.6:
            for _ in range(int(rng.integers(1, 3))):
                put("boilerplate", str(rng.choice(_BOILER)), "", body,
                    float(rng.uniform(0.6, 0.95)), (0.0, 0.96, 1.0, 1.0))
        if rng.random() < 0.3:          # high-link-density text span
            put("text", "links: " + _words(rng, 2, 5), "", body,
                float(rng.uniform(0.5, 0.9)), (0.0, 0.0, 1.0, 0.02))

        # image spans
        if rng.random() < 0.4:
            for k in range(int(rng.integers(1, 3))):
                put("image", "", f"media://{doc_id}/{page_no}-{k}", body, 0.0,
                    (0.2, 0.55, 0.8, 0.7))

        # vector regions: table-like / irregular / sparse / diagram
        ridx = 0
        if rng.random() < 0.5:
            # occasionally an oversized region (w>0.6, h>0.3) with a central
            # vertical grid line -> exercises the V4/V8 large-table splitter
            if rng.random() < 0.25:
                rb = (0.1, 0.5, 0.9, 0.85)
                n_cols = int(rng.choice([2, 4]))   # even -> center line
            else:
                rb = (0.15, 0.55, 0.85, 0.8)
                n_cols = int(rng.integers(2, 6))
            kind_roll = rng.random()
            if kind_roll < 0.6:         # regular grid -> true table
                lines = _grid_lines(rng, rb, int(rng.integers(3, 7)),
                                    n_cols, 0.0)
            elif kind_roll < 0.8:       # heavy jitter -> irregular grid
                lines = _grid_lines(rng, rb, int(rng.integers(3, 7)),
                                    int(rng.integers(2, 6)), 0.18)
            else:                       # sparse -> < 4 intersections
                lines = _grid_lines(rng, rb, 1, 0, 0.0)
            regions.append({"page": page_no, "offset": base + 900 + ridx,
                            "bbox": [float(v) for v in rb], "lines": lines})
            # caption span planted within the 5% proximity margin
            if rng.random() < 0.7:
                cap_kw = str(rng.choice(["표", "Table", "Tab.", "그림", "Figure", "Fig."]))
                cap = f"{cap_kw} {int(rng.integers(1, 9))}: {_words(rng, 2, 6)}"
                put("text", cap, "", body, 0.0, (0.2, rb[3] + 0.01, 0.8, rb[3] + 0.03))
            # IoU-overlapping duplicate candidate (greedy dedup drops it)
            if rng.random() < 0.15:
                db = (rb[0] + 0.02, rb[1] + 0.02, rb[2] + 0.02, rb[3] + 0.02)
                regions.append({"page": page_no, "offset": base + 950,
                                "bbox": [float(v) for v in db],
                                "lines": _grid_lines(rng, db, 3, 2, 0.0)})
            ridx += 1
        if rng.random() < 0.3:          # diagram region (diagonal lines)
            fb = (0.25, 0.3, 0.75, 0.5)
            regions.append({"page": page_no, "offset": base + 900 + ridx,
                            "bbox": [float(v) for v in fb],
                            "lines": _diag_lines(rng, fb, int(rng.integers(3, 7)))})

    # shuffled span order: offsets stay, positions permute (all parallel
    # columns permute together); reassembly must restore offset order
    if rng.random() < 0.2 and len(spans) > 1:
        perm = rng.permutation(len(spans))
        spans = [spans[j] for j in perm]
        fonts = [fonts[j] for j in perm]
        pages = [pages[j] for j in perm]
        links = [links[j] for j in perm]
        bboxes = [bboxes[j] for j in perm]

    return {"doc_id": doc_id, "spans": spans, "font_size": fonts,
            "page": pages, "link_density": links, "bbox": bboxes,
            "regions": regions, "n_pages": n_pages}


def generate_docs_table(seed: int, start: int, count: int,
                        pathological_frac: float = 0.01,
                        giant_frac: float = 0.0,
                        giant_clustered: bool = False) -> pa.Table:
    """Docs ``start .. start+count`` as one Arrow table (DOCS_SCHEMA)."""
    rows = [generate_doc(seed, i, pathological_frac, giant_frac,
                         giant_clustered)
            for i in range(start, start + count)]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


# bump when generator output changes: stale /tmp corpus caches from an
# older generator would otherwise poison golden-equality runs
GENERATOR_VERSION = 2


def corpus_path(name: str, seed: int, n_docs: int,
                root: str = "/tmp/pdfxr_fixtures",
                pathological_frac: float = 0.01,
                giant_frac: float = 0.0) -> str:
    # every generation parameter is part of the cache key — a stale corpus
    # generated with different knobs must never be silently reused
    # (giant_frac=0 keeps the pre-existing path spelling so caches from
    # before the skew tier stay valid)
    g = f"-g{giant_frac}" if giant_frac > 0.0 else ""
    return os.path.join(
        root,
        f"{name}-v{GENERATOR_VERSION}-s{seed}-n{n_docs}-p{pathological_frac}{g}")


def _write_shard(path: str, seed: int, start: int, count: int,
                 pathological_frac: float, giant_frac: float = 0.0,
                 giant_clustered: bool = False) -> str:
    shard = os.path.join(path, f"part-{start:08d}.parquet")
    if not os.path.exists(shard):
        tbl = generate_docs_table(seed, start, count, pathological_frac,
                                  giant_frac, giant_clustered)
        pq.write_table(tbl, shard + f".tmp{os.getpid()}")
        os.replace(shard + f".tmp{os.getpid()}", shard)
    return shard


def ensure_corpus(name: str, seed: int, n_docs: int,
                  pathological_frac: float = 0.01,
                  shard_rows: int = 1000,
                  root: str = "/tmp/pdfxr_fixtures",
                  use_ray: bool = False,
                  giant_frac: float = 0.0,
                  giant_clustered: bool = False) -> str:
    """Generate (once, cached) a corpus as a directory of parquet shards.

    Sharded so readers parallelize; content depends only on (seed, index),
    never on sharding. With ``use_ray=True`` (and an active session) the
    shards generate as parallel Ray tasks — content is identical either
    way. Returns the directory path.
    """
    path = corpus_path(name, seed, n_docs, root, pathological_frac,
                       giant_frac)
    if giant_clustered:
        path += "-clustered"
    done = os.path.join(path, "_DONE")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    starts = list(range(0, n_docs, shard_rows))
    if use_ray:
        import ray
        if ray.is_initialized():
            task = ray.remote(num_cpus=1)(_write_shard)
            ray.get([task.remote(path, seed, s, min(shard_rows, n_docs - s),
                                 pathological_frac, giant_frac,
                                 giant_clustered)
                     for s in starts])
        else:
            use_ray = False
    if not use_ray:
        for s in starts:
            _write_shard(path, seed, s, min(shard_rows, n_docs - s),
                         pathological_frac, giant_frac, giant_clustered)
    with open(done, "w") as f:
        f.write(f"{seed} {n_docs} {pathological_frac} {giant_frac} "
                f"{giant_clustered}\n")
    return path
