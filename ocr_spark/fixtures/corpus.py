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
