"""Deterministic interleaved-document corpus synthesis (FIXTURES.md §1).

Builds the primary pipeline input table

    doc_id: string
    spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>

entirely from (seed, n_docs) — no external data — with the reference
workload's shape knobs: zipf-ish span counts, per-doc media fraction, a
~1% heavy tail of 50-500-media documents (the skew stressor the salted
repartitioning must absorb), and a media size mix of small field crops vs
full pages (reference images/invoice/*.png vs rasterized PDF pages).

Written as plain parquet via pyarrow so tests need no SparkSession to build
fixtures; production input would be the same schema as an Iceberg table
(spark.read.format('iceberg')).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .render import expected_media_text

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
SPANS_TYPE = pa.list_(SPAN_STRUCT)

_TEXT_WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "spark", "group", "query", "row",
    "data", "slow", "filter", "customer", "line", "batch", "value", "stream",
]

# media profile mix: (tag, weight). err exercises per-row failure isolation.
_PROFILES = [("crop", 0.70), ("page", 0.25), ("pdf", 0.04), ("big", 0.005), ("err", 0.005)]


def _media_ref(doc_id: str, i: int, rng: np.random.Generator) -> str:
    r = rng.random()
    acc = 0.0
    tag = "crop"
    for t, w in _PROFILES:
        acc += w
        if r < acc:
            tag = t
            break
    if tag == "pdf":
        return f"pdf://{doc_id}/{i}#{int(rng.integers(2, 5))}"
    if tag == "err":
        return f"img://{doc_id}/{i}#err"
    return f"img://{doc_id}/{i}#{tag}"


def build_corpus(
    n_docs: int,
    seed: int = 42,
    heavy_frac: float = 0.01,
    with_expected: bool = False,
) -> pa.Table:
    """Synthesize the interleaved corpus; optionally also the ground-truth
    filled spans (expensive — use only at test scale)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    doc_ids: list[str] = []
    all_spans: list[list[dict]] = []
    expected: list[list[dict]] = []
    for d in range(n_docs):
        doc_id = f"doc-{seed}-{d:08d}"
        if rng.random() < heavy_frac:
            n_spans = int(rng.integers(50, 501))  # heavy tail (skew stressor)
            media_frac = 1.0
        else:
            # zipf-ish span count in [1, 40]
            n_spans = min(int(rng.zipf(1.6)), 40)
            media_frac = float(rng.random())
        spans: list[dict] = []
        for off in range(n_spans):
            if rng.random() < media_frac:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": _media_ref(doc_id, off, rng),
                        "offset": off,
                    }
                )
            else:
                words = rng.choice(_TEXT_WORDS, size=int(rng.integers(2, 12)))
                spans.append(
                    {
                        "kind": "text",
                        "text": " ".join(words.tolist()),
                        "media_ref": "",
                        "offset": off,
                    }
                )
        doc_ids.append(doc_id)
        all_spans.append(spans)
        if with_expected:
            # Pipeline contract (operators/pipeline.py): one failing media
            # span poisons its whole document — success=false and EVERY
            # media text stays empty.  The expected spans mirror that so
            # they equal the pipeline output row-for-row (the DuckDB value
            # oracle hashes them directly).
            doc_ok = all("#err" not in s["media_ref"] for s in spans)
            exp = []
            for s in spans:
                if s["kind"] == "media" and doc_ok:
                    exp.append({**s, "text": expected_media_text(s["media_ref"])})
                else:
                    exp.append(dict(s))
            expected.append(exp)

    cols: dict = {
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(all_spans, SPANS_TYPE),
    }
    if with_expected:
        cols["expected_spans"] = pa.array(expected, SPANS_TYPE)
        cols["expect_success"] = pa.array(
            [
                all("#err" not in s["media_ref"] for s in spans)
                for spans in all_spans
            ],
            pa.bool_(),
        )
    return pa.table(cols)


def write_corpus(path: str, n_docs: int, seed: int = 42, **kw) -> str:
    table = build_corpus(n_docs, seed=seed, **kw)
    pq.write_table(table, path)
    return path


def write_gt_lines(corpus_path: str, out_path: str) -> str:
    """Reading-order ROW ground truth for every renderable media page of
    a corpus parquet — the gt side of the end-to-end eval harness
    (operators/evalmetrics.py, mirroring the reference's per-image gt
    files, tools/end2end/eval_end2end.py:81-97):

        page_id, gt_id, x, y, w, h, text, ign

    Rows are built with the SAME reading-order machinery the pipeline
    emits predictions in (sorted_boxes + group_rows union bbox, joined
    texts) so the graded metric compares row to row; boxes are in the
    DESKEW-RECOVERED frame (canonical coords plus the skew-canvas pad),
    the frame ocr_page_state's row_boxes live in.  ``ign`` marks ~5% of
    rows ignored (md5-derived, deterministic) to exercise the
    reference's ignore-mask accounting.  Fixture-scale builder: at
    production scale ground truth arrives as a labeled table."""
    import hashlib

    from ..core.reading_order import group_rows, sorted_boxes
    from .render import render

    t = pq.read_table(corpus_path, columns=["spans"])
    refs: list[str] = []
    seen: set[str] = set()
    for spans in t["spans"].to_pylist():
        for s in spans:
            ref = s["media_ref"]
            if s["kind"] != "media" or "#err" in ref or ref in seen:
                continue
            seen.add(ref)
            refs.append(ref)
    rows = []
    for ref in refs:
        for p, page in enumerate(render(ref)):
            page_id = f"{ref}/p{p}"
            xywh = [(ln.x, ln.y, ln.w, ln.h) for ln in page.lines]
            order = sorted_boxes(xywh)
            for i, grp in enumerate(group_rows(xywh, order)):
                x0 = min(xywh[j][0] for j in grp)
                y0 = min(xywh[j][1] for j in grp)
                x1 = max(xywh[j][0] + xywh[j][2] for j in grp)
                y1 = max(xywh[j][1] + xywh[j][3] for j in grp)
                text = " ".join(page.lines[j].text for j in grp)
                ign = int(
                    int(
                        hashlib.md5(
                            f"{page_id}#{i}".encode()
                        ).hexdigest()[:8],
                        16,
                    )
                    % 20
                    == 0
                )
                rows.append(
                    (
                        page_id,
                        i,
                        x0 + page.pad,
                        y0 + page.pad,
                        x1 - x0,
                        y1 - y0,
                        text,
                        ign,
                    )
                )
    cols = list(zip(*rows)) if rows else [[]] * 8
    table = pa.table(
        {
            "page_id": pa.array(cols[0], pa.string()),
            "gt_id": pa.array(cols[1], pa.int64()),
            "x": pa.array(cols[2], pa.int64()),
            "y": pa.array(cols[3], pa.int64()),
            "w": pa.array(cols[4], pa.int64()),
            "h": pa.array(cols[5], pa.int64()),
            "text": pa.array(cols[6], pa.string()),
            "ign": pa.array(cols[7], pa.int64()),
        }
    )
    pq.write_table(table, out_path)
    return out_path
