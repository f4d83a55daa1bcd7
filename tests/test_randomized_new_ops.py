"""Seeded randomized cross-checks: each new round-3 operator vs an
independent brute-force python reference on small random corpora.  The
DuckDB oracle already pins full-table values at sf0.01; these attack the
same semantics from a third, structurally different implementation so a
shared Spark/SQL misconception cannot slip through.
"""

from __future__ import annotations

import numpy as np
import pytest


def _docs(spark, d, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_pareto_matches_bruteforce(spark, tmp_path, seed):
    from ocr_spark.operators.text_analysis import pareto_frontier_docs

    rng = np.random.RandomState(seed)
    n = 40
    rows = []
    pts = []
    for i in range(n):
        q = int(rng.randint(1, 6))
        ln = int(rng.randint(5, 40))
        # q distinct tokens built explicitly
        words = [f"w{j}" for j in range(q)] + ["w0"] * 3
        rows.append((i, " ".join(words), "en", "s", ln))
        pts.append((i, q, ln))
    d = str(tmp_path)
    _docs(spark, d, rows)
    want = sorted(
        i
        for i, q, ln in pts
        if not any(
            (q2 > q and l2 >= ln) or (q2 == q and l2 > ln)
            for _, q2, l2 in pts
        )
    )
    got = sorted(
        r["doc_id"] for r in pareto_frontier_docs(spark, d).collect()
    )
    assert got == want


@pytest.mark.parametrize("seed", [3, 11])
def test_pps_matches_bruteforce(spark, tmp_path, seed):
    from ocr_spark.operators.relational import (
        PPS_SAMPLE_N,
        pps_systematic_sample,
    )

    rng = np.random.RandomState(seed)
    n = 120
    ws = [int(w) for w in rng.randint(1, 200, size=n)]
    d = str(tmp_path)
    _docs(spark, d, [(i, "t", "en", "s", ws[i]) for i in range(n)])
    tw = sum(ws)
    step = max(tw // PPS_SAMPLE_N, 1)
    cum = 0
    want = {}
    for i, w in enumerate(ws):
        prev, cum = cum, cum + w
        hits = cum // step - prev // step
        if hits >= 1:
            want[i] = hits
    got = {
        r["doc_id"]: r["n_hits"]
        for r in pps_systematic_sample(spark, d).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [5, 19])
def test_theta_overlap_matches_bruteforce(spark, tmp_path, seed):
    import datetime as dt

    from ocr_spark.operators.relational import (
        KMV_HASH_A,
        KMV_HASH_M,
        KMV_K,
        theta_sketch_overlap,
    )

    rng = np.random.RandomState(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    p0 = set(int(u) for u in rng.choice(500, size=180, replace=False))
    p1 = set(int(u) for u in rng.choice(500, size=140, replace=False))
    for u in p0:
        rows.append((eid, base + dt.timedelta(days=int(rng.randint(0, 15))),
                     u, "x", 1.0, "{}")); eid += 1
    for u in p1:
        rows.append((eid, base + dt.timedelta(days=15 + int(rng.randint(0, 15))),
                     u, "x", 1.0, "{}")); eid += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    def sketch(users):
        hs = sorted({(u * KMV_HASH_A) % KMV_HASH_M for u in users})
        return hs[:KMV_K]

    def theta_of(sk, nset):
        return KMV_HASH_M if len(nset) < KMV_K else sk[KMV_K - 1]

    s0, s1 = sketch(p0), sketch(p1)
    theta = min(theta_of(s0, p0), theta_of(s1, p1))
    samp0 = {h for h in s0 if h < theta}
    samp1 = {h for h in s1 if h < theta}
    union_est = round(len(samp0 | samp1) * KMV_HASH_M / theta, 3)
    inter_est = round(len(samp0 & samp1) * KMV_HASH_M / theta, 3)
    got = theta_sketch_overlap(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["union_est"] == union_est
    assert r["inter_est"] == inter_est
    assert r["true_union"] == len(p0 | p1)
    assert r["true_inter"] == len(p0 & p1)


@pytest.mark.parametrize("seed", [2, 13])
def test_paragraph_rebuild_matches_bruteforce(spark, tmp_path, seed):
    from ocr_spark.operators.text_analysis import (
        PARA_W,
        paragraph_dedup_rebuild,
    )

    rng = np.random.RandomState(seed)
    vocab = [f"t{i}" for i in range(6)]  # tiny vocab => real collisions
    rows = []
    texts = []
    for i in range(25):
        nw = int(rng.randint(PARA_W, PARA_W * 4))
        t = " ".join(vocab[j] for j in rng.randint(0, len(vocab), size=nw))
        rows.append((i, t, "en", "s", len(t)))
        texts.append(t)
    d = str(tmp_path)
    _docs(spark, d, rows)

    seen = {}
    want = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        chunks = [
            " ".join(toks[j * PARA_W : (j + 1) * PARA_W])
            for j in range((len(toks) + PARA_W - 1) // PARA_W)
        ]
        for j, c in enumerate(chunks):
            seen.setdefault(c, (i, j))
        kept = [
            c for j, c in enumerate(chunks) if seen[c] == (i, j)
        ]
        want[i] = (len(chunks), len(kept), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup_rebuild(spark, d).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [4, 17])
def test_containment_matches_bruteforce(spark, tmp_path, seed):
    from ocr_spark.operators.dedup import (
        CONTAIN_TAU,
        SHINGLE_K,
        containment_pairs,
    )

    rng = np.random.RandomState(seed)
    vocab = [f"s{i}" for i in range(8)]
    rows, shs = [], {}
    for i in range(15):
        nw = int(rng.randint(SHINGLE_K, 20))
        t = " ".join(vocab[j] for j in rng.randint(0, len(vocab), size=nw))
        rows.append((i, t, "en", "s", len(t)))
        toks = t.split(" ")
        nsh = max(len(toks) - SHINGLE_K + 1, 1)
        shs[i] = {
            " ".join(toks[j : j + SHINGLE_K]) for j in range(nsh)
        }
    d = str(tmp_path)
    _docs(spark, d, rows)
    want = {}
    for a in shs:
        for b in shs:
            if a >= b:
                continue
            c = len(shs[a] & shs[b])
            if c == 0:
                continue
            cab = round(c / len(shs[a]), 6)
            cba = round(c / len(shs[b]), 6)
            if cab >= CONTAIN_TAU or cba >= CONTAIN_TAU:
                want[(a, b)] = (c, cab, cba)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["shared_shingles"], r["cont_a_in_b"], r["cont_b_in_a"]
        )
        for r in containment_pairs(spark, d).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [5, 19])
def test_ann_recall_eval_matches_bruteforce(spark, tmp_path, seed):
    """Third-implementation check: replay anchor assignment, probe
    selection, both top-K cuts and the recall join in plain python
    (sequential float64 folds + SQL half-away rounding, mirroring the
    engine arithmetic exactly) on a random float32 corpus."""
    import math

    from ocr_spark.operators.similarity import (
        DEFAULT_ANCHORS,
        DEFAULT_PROBE,
        QUERY_PANEL_MOD,
        TOP_K,
        ann_recall_eval,
    )

    def sqlround(x, nd):
        s = 10**nd
        return math.copysign(math.floor(abs(x) * s + 0.5), x) / s

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(x) * float(y)
        return acc

    rng = np.random.RandomState(seed)
    n, dim = 60, 8
    vecs = rng.randn(n, dim).astype(np.float32)
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]], 0) for i in range(n)],
        "vec_id long, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    xx = [dot(v, v) for v in vecs]
    anchors = list(range(DEFAULT_ANCHORS))
    def l2(i, a):
        return sqlround(xx[i] - 2.0 * dot(vecs[i], vecs[a]) + xx[a], 6)
    assign = {
        i: min(anchors, key=lambda a: (l2(i, a), a)) for i in range(n)
    }
    qids = [i for i in range(n) if i % QUERY_PANEL_MOD == 0]
    want = {}
    for q in qids:
        probes = sorted(anchors, key=lambda a: (l2(q, a), a))[:DEFAULT_PROBE]
        cos = {
            i: sqlround(
                dot(vecs[i], vecs[q])
                / (math.sqrt(xx[i]) * math.sqrt(xx[q])),
                4,
            )
            for i in range(n)
            if i != q
        }
        order = sorted(cos, key=lambda i: (-cos[i], i))
        truth = set(order[:TOP_K])
        cand = [i for i in order if assign[i] in probes]
        ivf = set(cand[:TOP_K])
        want[q] = len(truth & ivf)

    got = {r["qid"]: r for r in ann_recall_eval(spark, d).collect()}
    assert set(got) == set(qids)
    for q in qids:
        assert got[q]["n_hit"] == want[q], (q, got[q], want[q])
        assert got[q]["recall_ppm"] == want[q] * 1_000_000 // TOP_K


@pytest.mark.parametrize("n", [20, 37])
def test_triangle_count_matches_bruteforce(spark, tmp_path, n):
    """Brute-force enumeration of the fixture link graph's triangles in
    plain python vs the degree-ordered oriented wedge join."""
    from itertools import combinations

    from ocr_spark.operators.web_extract import triangle_count

    d = str(tmp_path)
    _docs(spark, d, [(i, "t", "en", "s", 1) for i in range(n)])

    edges = set()
    for i in range(n):
        for dst in ((i * 7 + 1) % n, (i * 13 + 2) % n, (i * 31 + 3) % n):
            if dst != i:
                edges.add((min(i, dst), max(i, dst)))
    adj = {i: set() for i in range(n)}
    for s, t in edges:
        adj[s].add(t)
        adj[t].add(s)
    want = {i: 0 for i in range(n)}
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            want[a] += 1
            want[b] += 1
            want[c] += 1

    got = {r["doc_id"]: r["n_triangles"]
           for r in triangle_count(spark, d).collect()}
    assert got == want
    assert sum(want.values()) % 3 == 0  # sanity: each triangle counted 3x
