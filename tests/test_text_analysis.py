"""Curation-operator tests (operators/text_analysis.py): repetition
stats on crafted repeated/clean docs, PII scrub on known strings,
contamination + stratified-sample invariants on the fixture tables, and
plan shape (broadcast for the benchmark gram set; no shuffle in the
sampling filter)."""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from ocr_spark.operators.text_analysis import (
    SAMPLE_THRESHOLDS,
    contamination_check,
    pii_scrub_df,
    repetition_stats_df,
    stratified_sample,
)


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


def test_repetition_crafted(spark):
    docs = spark.createDataFrame(
        [
            # 8x the same token: top_unigram_frac 1.0, dup5 1 - 1/4
            (1, "spam spam spam spam spam spam spam spam"),
            # all-distinct tokens: fractions minimal, keep
            (2, "a b c d e f g h i j"),
            # repeated bigram "x y" 3 times in 6 tokens
            (3, "x y x y x y"),
            # too short for 5-grams
            (4, "one two"),
        ],
        ["doc_id", "text"],
    )
    got = _rows(repetition_stats_df(docs))
    assert got[1]["top_unigram_frac"] == 1.0
    assert got[1]["dup_5gram_frac"] == round(1 - 1 / 4, 4)
    assert got[1]["keep"] == 0
    assert got[2]["top_unigram_frac"] == 0.1
    assert got[2]["dup_5gram_frac"] == 0.0
    assert got[2]["keep"] == 1
    # doc 3: bigrams = [x y, y x, x y, y x, x y] -> top 3 of 5 slots
    assert got[3]["top_bigram_frac"] == 0.6
    assert got[3]["keep"] == 0
    # doc 4: no bigram mode? it HAS one bigram; no 5-grams
    assert got[4]["n_tokens"] == 2
    assert got[4]["top_bigram_frac"] == 1.0
    assert got[4]["dup_5gram_frac"] == 0.0


def test_pii_scrub_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@test-host.org and 13912345678 at 192.168.0.1"),
            (2, "no pii here"),
            (3, "two mails x@y.com z@w.net, bad phone 12345678901"),
        ],
        ["doc_id", "text"],
    )
    got = _rows(pii_scrub_df(docs))
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ips"]) == (
        1,
        1,
        1,
    )
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ips"]) == (
        0,
        0,
        0,
    )
    # 1... with second digit 2 is not a CN mobile
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (2, 0)
    # redaction reflected in the digest: scrubbed text of doc 1
    import hashlib

    expected = hashlib.md5(
        b"mail [EMAIL] and [PHONE] at [IP]"
    ).hexdigest()
    assert got[1]["scrubbed_md5"] == expected


def test_contamination_invariants(spark, sf_dir):
    rows = contamination_check(spark, sf_dir).collect()
    assert rows, "documents table should not be empty"
    bench = [r for r in rows if r["is_benchmark"] == 1]
    assert bench, "doc_id % 100 == 0 docs must exist"
    for r in rows:
        assert 0 <= r["n_contaminated"] <= r["n_grams"]
        if r["is_benchmark"] == 1:
            # benchmark docs are never flagged against themselves
            assert r["contaminated"] == 0
        else:
            assert r["contaminated"] == int(r["n_contaminated"] > 0)


def test_contamination_plan_broadcasts_benchmark(spark, sf_dir):
    plan = _plan(contamination_check(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, (
        "benchmark gram set must broadcast; a shuffle join moves the "
        "whole exploded corpus"
    )


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    out1 = stratified_sample(spark, sf_dir)
    kept = out1.groupBy("lang").count().collect()
    totals = {
        r["lang"]: r["count"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .count()
        .collect()
    }
    rates = {"en": 0.5, "de": 0.25, "es": 0.125}
    for r in kept:
        lang, n = r["lang"], r["count"]
        if lang in rates:
            total = totals[lang]
            # binomial 4-sigma band around the target rate
            sigma = math.sqrt(total * rates[lang] * (1 - rates[lang]))
            assert abs(n - total * rates[lang]) < 4 * sigma + 1, (
                lang,
                n,
                total,
            )
    # determinism: two runs agree exactly
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(
        r["doc_id"] for r in stratified_sample(spark, sf_dir).collect()
    )
    assert ids1 == ids2
    # the gate is the documented md5-prefix rule
    for r in out1.limit(50).collect():
        bound = SAMPLE_THRESHOLDS.get(r["lang"], "g")
        assert r["sample_key"] < bound


def test_stratified_sample_no_shuffle(spark, sf_dir):
    df = stratified_sample(spark, sf_dir)
    # drop the presentation orderBy: the FILTER itself must be map-side
    gated = df.filter(F.col("doc_id") >= 0).select("doc_id", "lang")
    plan = _plan(
        spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("lang")
                )
            )
            < F.lit("8")
        )
    )
    assert "Exchange" not in plan
    assert gated.count() <= df.count() or True  # smoke: evaluable


def test_tfidf_rank_invariants(spark, sf_dir):
    from ocr_spark.operators.text_analysis import TFIDF_K, tfidf_top_terms

    rows = tfidf_top_terms(spark, sf_dir).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        ranks = [r["rank"] for r in rs]
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= TFIDF_K
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_dsir_target_scores_higher(spark, sf_dir):
    from ocr_spark.operators.text_analysis import dsir_importance_weights

    rows = dsir_importance_weights(spark, sf_dir).collect()
    assert rows
    tgt = [float(r["dsir_logweight"]) for r in rows if r["is_target"] == 1]
    raw = [float(r["dsir_logweight"]) for r in rows if r["is_target"] == 0]
    assert tgt and raw
    # the defining DSIR property: the importance weight is a likelihood
    # ratio trained ON the target, so target docs must average higher
    assert sum(tgt) / len(tgt) > sum(raw) / len(raw)
    for r in rows:
        if r["n_feats"] == 0:
            assert float(r["dsir_logweight"]) == 0.0


def test_dsir_plan_broadcasts_bucket_weights(spark, sf_dir):
    from ocr_spark.operators.text_analysis import dsir_importance_weights

    plan = _plan(dsir_importance_weights(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, (
        "the 256-row bucket-weight table must broadcast; a shuffle join "
        "would move every exploded bigram to the weight side"
    )


def test_sequence_pack_invariants(spark, sf_dir):
    from ocr_spark.operators.text_analysis import SEQ_LEN, sequence_pack

    rows = sequence_pack(spark, sf_dir).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r["doc_id"])
        expect_start = 0
        for r in rs:
            # the token stream is gapless and in doc_id order per shard
            assert r["start_tok"] == expect_start, (source, r)
            expect_start += r["n_tokens"]
            assert r["first_seq"] == r["start_tok"] // SEQ_LEN
            last = (r["start_tok"] + r["n_tokens"] - 1) // SEQ_LEN
            assert r["last_seq"] == last
            assert r["n_seqs_spanned"] == last - r["first_seq"] + 1


def test_curation_decision_gate_semantics(spark, sf_dir):
    from ocr_spark.operators.text_analysis import curation_decision

    rows = curation_decision(spark, sf_dir).collect()
    assert rows
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), "fixture must exercise both outcomes"
    for r in rows:
        gates = (r["len_ok"], r["rep_ok"], r["lang_ok"], r["stop_ok"])
        assert all(g in (0, 1) for g in gates)
        assert r["keep"] == int(all(gates))


def test_lm_perplexity_orders_common_below_rare(spark, tmp_path):
    """A document of corpus-frequent tokens must score lower perplexity
    than one of corpus-rare tokens; smoothing keeps every score finite
    and > 1."""
    from ocr_spark.operators.text_analysis import lm_perplexity

    rows = [
        (0, "the the the cat cat sat"),   # common mass
        (1, "the cat sat on the mat"),    # mostly common
        (2, "zyx qwv plk jhg"),           # rare singletons
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["doc_id"]: r for r in lm_perplexity(spark, d).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0]["ppl"] < got[2]["ppl"]
    assert got[1]["ppl"] < got[2]["ppl"]
    assert all(r["ppl"] > 1.0 for r in got.values())
    assert got[1]["n_tokens"] == 6


def test_inverted_index_delta_encoding_and_block_merge(spark, tmp_path):
    """Posting lists must be delta-encoded in ascending doc order even
    when the docs span multiple aggregation blocks (doc_ids straddling
    POSTING_BLOCK=64 boundaries), and tf must align with the gap list."""
    from ocr_spark.operators.text_analysis import inverted_index_postings

    rows = [
        (3, "zig zig zag"),        # block 0, tf(zig)=2
        (70, "zig"),               # block 1
        (200, "zag zig"),          # block 3 — out-of-order block arrival
        (64, "solo"),              # exactly at a block boundary
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {r["term"]: r for r in inverted_index_postings(spark, d).collect()}
    zig = got["zig"]
    assert (zig["df"], zig["cf"]) == (3, 4)
    # docs 3, 70, 200 -> gaps 3, 67, 130; tfs 2, 1, 1
    assert zig["doc_gaps"] == "3,67,130"
    assert zig["tfs"] == "2,1,1"
    zag = got["zag"]
    assert zag["doc_gaps"] == "3,197"
    assert got["solo"]["doc_gaps"] == "64"


def test_pmi_bigram_lift_exact_arithmetic_and_min_count(spark, tmp_path):
    """lift_ppm must be the exact integer div of 1e6*c_xy*N by the
    left/right marginals; pairs below PMI_MIN_COUNT are dropped; a
    single-token doc contributes no bigrams."""
    from ocr_spark.operators.text_analysis import (
        PMI_MIN_COUNT,
        pmi_bigram_lift,
    )

    # "a b" x5 -> c_xy=5 meets min count; "c d" x4 -> filtered out.
    rows = (
        [(i, "a b") for i in range(5)]
        + [(10 + i, "c d") for i in range(4)]
        + [(99, "lonely")]
    )
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = pmi_bigram_lift(spark, d).collect()
    assert [(r["w1"], r["w2"]) for r in out] == [("a", "b")]
    r = out[0]
    # N = 9 bigrams total; c_x("a")=5 (left marginal), c_y("b")=5.
    assert (r["c_xy"], r["c_x"], r["c_y"]) == (5, 5, 5)
    assert r["lift_ppm"] == (1_000_000 * 5 * 9) // (5 * 5)
    assert PMI_MIN_COUNT == 5


def test_rendezvous_shard_minimal_movement_invariant(spark, sf_dir):
    """HRW's defining property: growing 8 -> 9 shards, every doc either
    keeps its shard or moves to the NEW shard (s=8) — never between old
    shards — and the moved fraction is ~1/9, not ~8/9 like mod-N."""
    from ocr_spark.operators.text_analysis import rendezvous_shard

    rows = rendezvous_shard(spark, sf_dir).collect()
    assert rows
    n_moved = 0
    for r in rows:
        assert 0 <= r["shard8"] < 8 and 0 <= r["shard9"] < 9
        if r["moved"]:
            n_moved += 1
            assert r["shard9"] == 8, r  # moves only TO the new shard
        else:
            assert r["shard8"] == r["shard9"]
    frac = n_moved / len(rows)
    assert 0.02 < frac < 0.30, frac


def test_rendezvous_shard_plan_is_map_side(spark, sf_dir):
    from ocr_spark.operators.text_analysis import rendezvous_shard

    plan = (
        rendezvous_shard(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan  # check-gate only
    assert "EvalPython" not in plan


def test_vocab_coverage_exact_ppm_and_tiebreak(spark, tmp_path):
    """Coverage must be the exact integer ppm of the cumulative count;
    equal-count words rank alphabetically."""
    from ocr_spark.operators.text_analysis import vocab_coverage

    rows = [(0, "b b b a a c"), (1, "a c")]  # a:3 b:3 c:2, total 8
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = [
        (r["rnk"], r["word"], r["cnt"], r["coverage_ppm"])
        for r in vocab_coverage(spark, d).collect()
    ]
    assert out == [
        (1, "a", 3, 3 * 1_000_000 // 8),
        (2, "b", 3, 6 * 1_000_000 // 8),
        (3, "c", 2, 1_000_000),
    ]


def test_span_corruption_mask_rate_and_merging(spark, sf_dir):
    """Mask rate must land near the configured ~15% corpus-wide, spans
    must merge (n_masked <= 3 * n_spans, with strict < somewhere —
    proof that overlapping starts merged), and empty-mask docs report
    zeros."""
    from ocr_spark.operators.text_analysis import span_corruption_mask

    rows = span_corruption_mask(spark, sf_dir).collect()
    tot_tok = sum(r["n_tokens"] for r in rows)
    tot_mask = sum(r["n_masked"] for r in rows)
    assert 0.08 < tot_mask / tot_tok < 0.25, tot_mask / tot_tok
    saw_merge = False
    for r in rows:
        assert r["n_spans"] <= r["n_masked"] <= r["n_tokens"]
        if r["n_masked"] > 3 * r["n_spans"] > 0:
            # a maximal run longer than one 3-token window can only come
            # from overlapping starts merging into one span
            saw_merge = True
        if r["n_masked"] == 0:
            assert r["n_spans"] == 0 and r["first_masked_pos"] == 0
        else:
            assert 1 <= r["first_masked_pos"] <= r["n_tokens"]
    assert saw_merge


def test_bm25_ranks_matching_docs_and_saturates_tf(spark, tmp_path):
    """A doc containing all query terms outranks a doc with one; tf
    saturation: 10 repeats of one term score less than 10x a single
    occurrence; docs with no query term are absent."""
    from ocr_spark.operators.text_analysis import bm25_topk

    rows = [
        (0, "spark join filter data data data"),     # all three terms
        (1, "spark data data data data data"),       # one term once
        (2, "spark spark spark spark spark spark"),  # one term, tf=6
        (3, "data data data data data data"),        # no query term
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    out = {r["doc_id"]: r["score"] for r in bm25_topk(spark, d).collect()}
    assert 3 not in out
    assert out[0] > out[1]            # coverage beats single term
    assert out[2] < 6 * out[1] * 1.01  # tf saturation kicked in
    assert out[2] > out[1]            # but more tf still scores higher


def test_conjunctive_search_requires_all_terms(spark, tmp_path):
    from ocr_spark.operators.text_analysis import conjunctive_search

    rows = [
        (0, "spark join filter x"),      # all three -> match
        (1, "spark join y"),             # missing filter -> no
        (2, "spark spark join filter"),  # dup spark -> tf 2
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["tf_spark"], r["tf_join"], r["tf_filter"])
        for r in conjunctive_search(spark, d).collect()
    }
    assert got == {0: (1, 1, 1), 2: (2, 1, 1)}


def test_bigram_next_token_cond_ppm_sums_and_ranks(spark, sf_dir):
    """Follower ranks are contiguous per head, conditional ppm is
    non-increasing within a head, and every cond_ppm <= 1e6."""
    from ocr_spark.operators.text_analysis import (
        NEXT_TOKEN_K,
        bigram_next_token,
    )

    rows = bigram_next_token(spark, sf_dir).collect()
    assert rows
    by_head = {}
    for r in rows:
        by_head.setdefault(r["w1"], []).append(r)
    for w1, rs in by_head.items():
        rs.sort(key=lambda r: r["next_rank"])
        assert [r["next_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= NEXT_TOKEN_K
        ppms = [r["cond_ppm"] for r in rs]
        assert all(0 < p <= 1_000_000 for p in ppms)
        counts = [r["c_xy"] for r in rs]
        assert counts == sorted(counts, reverse=True)


def test_paragraph_dedup_keeps_unique_remainder(spark, tmp_path):
    """A partially-duplicated doc loses ONLY the shared paragraphs; its
    unique tail survives (whole-doc dedup would drop everything), and
    first occurrence is global (doc_id, chunk_idx) order."""
    from pyspark.sql import functions as F  # noqa: F401

    from ocr_spark.operators.text_analysis import (
        PARA_W,
        paragraph_dedup_rebuild,
    )

    boiler = " ".join(["b%d" % i for i in range(PARA_W)])
    uniq0 = " ".join(["u%d" % i for i in range(PARA_W)])
    uniq1 = " ".join(["v%d" % i for i in range(PARA_W)])
    rows = [
        (0, boiler + " " + uniq0, "en", "s", 1),   # owns the boilerplate
        (1, boiler + " " + uniq1, "en", "s", 1),   # loses it, keeps uniq1
        (2, boiler, "en", "s", 1),                 # fully duplicated -> empty
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup_rebuild(spark, d).collect()
    }
    assert got[0] == (2, 2, boiler + " " + uniq0)
    assert got[1] == (2, 1, uniq1)
    assert got[2] == (1, 0, "")


def test_paragraph_dedup_survivor_agg_is_partial(spark):
    """The survivor table's min-struct aggregate must collapse map-side
    (partial_min before the hash exchange) so a hot boilerplate chunk
    cannot flood one reducer."""
    from ocr_spark.operators.text_analysis import paragraph_dedup_rebuild

    plan = paragraph_dedup_rebuild(
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan or "partial min" in plan.lower()


def test_rrf_fusion_rules(spark, tmp_path):
    """RRF needs no score calibration: a doc ranked 1st lexically and
    absent semantically fuses with sem contribution 0; a doc present in
    both lists beats a same-rank single-list doc."""
    # Crafted corpus: doc 0 is the embedding query anchor (vec 0 is
    # excluded from sem results); docs 1..3 get distinct BM25 scores via
    # term frequency; embeddings give docs 1,2 the top cosine ranks.
    import numpy as np

    from ocr_spark.operators.text_analysis import (
        RRF_K,
        RRF_SCALE,
        hybrid_rrf_search,
    )

    d = str(tmp_path)
    docs = [
        (0, "nothing relevant here at all", "en", "s", 1),
        (1, "spark join filter spark join filter", "en", "s", 1),  # lex 1
        (2, "spark join other words here now", "en", "s", 1),      # lex 2
        (3, "spark alone word word word word", "en", "s", 1),      # lex 3
    ]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rng = np.random.RandomState(7)
    base = rng.randn(64).astype("float32")
    far = rng.randn(4, 64).astype("float32")
    vecs = [
        (0, [float(x) for x in base], 0),
        (1, [float(x) for x in base * 0.9], 0),           # sem 1
        (2, [float(x) for x in base + far[0] * 0.2], 0),  # sem 2 (closeish)
        (3, [float(x) for x in far[1]], 0),               # sem far
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    got = {r["doc_id"]: r for r in hybrid_rrf_search(spark, d).collect()}
    r1 = got[1]
    assert r1["lex_rank"] == 1 and r1["sem_rank"] == 1
    assert r1["rrf_ppb"] == 2 * (RRF_SCALE // (RRF_K + 1))
    assert got[1]["rank"] == 1  # both-lists doc wins
    # every contribution is the exact integer rule
    for r in got.values():
        want = 0
        if r["lex_rank"]:
            want += RRF_SCALE // (RRF_K + r["lex_rank"])
        if r["sem_rank"]:
            want += RRF_SCALE // (RRF_K + r["sem_rank"])
        assert r["rrf_ppb"] == want


def test_training_manifest_composes_gates(spark, sf_dir):
    """The end-to-end manifest ships exactly the keep∩survivor set, and
    packing offsets are contiguous within each source shard."""
    from ocr_spark.operators.dedup import near_dup_clusters
    from ocr_spark.operators.text_analysis import (
        curation_decision,
        training_manifest,
    )

    man = training_manifest(spark, sf_dir).collect()
    kept = {
        r["doc_id"]
        for r in curation_decision(spark, sf_dir).collect()
        if r["keep"] == 1
    }
    surv = {
        r["doc_id"]
        for r in near_dup_clusters(spark, sf_dir).collect()
        if r["is_survivor"] == 1
    }
    assert {r["doc_id"] for r in man} == kept & surv
    by_src = {}
    for r in sorted(man, key=lambda r: (r["source"], r["doc_id"])):
        prev = by_src.get(r["source"], 0)
        assert r["start_tok"] == prev  # contiguous: no gaps in the stream
        by_src[r["source"]] = r["start_tok"] + r["n_tokens"]
        assert r["first_seq"] == r["start_tok"] // 128


def test_template_mining_finds_planted_boilerplate(spark, tmp_path):
    """A paragraph planted in most docs of one source tops that source's
    template list with exact ppm coverage; occurrence count is per-DOC
    (a doc repeating the template twice counts once)."""
    from ocr_spark.operators.text_analysis import (
        PARA_W,
        source_template_paragraphs,
    )

    tmpl = " ".join(f"b{i}" for i in range(PARA_W))
    rows = []
    for i in range(8):  # 8 docs on site A, 6 carry the template (twice!)
        body = " ".join(f"u{i}w{j}" for j in range(PARA_W))
        t = (tmpl + " " + tmpl + " " + body) if i < 6 else body
        rows.append((i, t, "en", "siteA", len(t)))
    rows.append((8, "solo words only here now", "en", "siteB", 10))
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = source_template_paragraphs(spark, d).collect()
    top = [r for r in got if r["source"] == "siteA" and r["rank"] == 1][0]
    assert top["chunk"] == tmpl
    assert top["n_docs_with"] == 6
    assert top["coverage_ppm"] == 6 * 1_000_000 // 8
    assert not any(r["source"] == "siteB" for r in got)


def test_split_proportions_exact_and_stable(spark, sf_dir):
    """Per-source split sizes hit the floor-division boundary EXACTLY
    (hash splits only do so in expectation), and rerunning yields the
    identical assignment."""
    from collections import Counter

    from ocr_spark.operators.text_analysis import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        train_val_test_split,
    )

    a = train_val_test_split(spark, sf_dir).collect()
    b = train_val_test_split(spark, sf_dir).collect()
    assert [(r["doc_id"], r["split"]) for r in a] == [
        (r["doc_id"], r["split"]) for r in b
    ]
    per_src = {}
    for r in a:
        per_src.setdefault(r["source"], Counter())[r["split"]] += 1
    for src, c in per_src.items():
        n = sum(c.values())
        assert c["train"] == n * SPLIT_TRAIN_PCT // 100
        assert c["train"] + c["val"] == (
            n * (SPLIT_TRAIN_PCT + SPLIT_VAL_PCT) // 100
        )


def test_incremental_pack_append_stability(spark, sf_dir):
    """The incremental pack must equal the full re-pack restricted to
    the batch rows — offsets continue, history sequences never move."""
    from ocr_spark.operators.text_analysis import (
        PACK_BATCH_SPLIT_FRAC,
        sequence_pack,
        sequence_pack_incremental,
    )

    inc = {
        r["doc_id"]: (r["start_tok"], r["first_seq"], r["last_seq"])
        for r in sequence_pack_incremental(spark, sf_dir).collect()
    }
    full = sequence_pack(spark, sf_dir).collect()
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    split_id = n - n // PACK_BATCH_SPLIT_FRAC
    want = {
        r["doc_id"]: (r["start_tok"], r["first_seq"], r["last_seq"])
        for r in full
        if r["doc_id"] >= split_id
    }
    assert inc == want and len(inc) > 0


def test_budget_allocation_sums_exactly(spark, tmp_path):
    """Hamilton apportionment: allocations sum EXACTLY to the budget,
    each within 1 of the exact proportional share, remainders break the
    tie deterministically."""
    from ocr_spark.operators.text_analysis import (
        BUDGET_TOTAL,
        budget_allocation,
    )

    rows = [
        (0, " ".join(["a"] * 7), "en", "s1", 1),
        (1, " ".join(["a"] * 7), "en", "s2", 1),
        (2, " ".join(["a"] * 7), "en", "s3", 1),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["source"]: r["alloc"] for r in budget_allocation(spark, d).collect()}
    # 10000 over 3 equal sources: floor 3333 each + 1 leftover ->
    # equal remainders, tie to smaller name => s1 gets the extra seat
    assert sum(got.values()) == BUDGET_TOTAL
    assert got == {"s1": 3334, "s2": 3333, "s3": 3333}


def test_heaps_growth_monotone_and_exact_on_crafted_stream(spark, tmp_path):
    """Distinct-at-N counts the first-occurrence positions exactly: a
    crafted stream with known new-term positions reproduces by hand;
    the curve is monotone non-decreasing."""
    from ocr_spark.operators.text_analysis import heaps_vocab_growth

    d = str(tmp_path)
    # doc 0: 600 tokens alternating a b  -> 2 terms, both first <= 1000
    # doc 1: 600 tokens of c only        -> term c first at position 601
    # doc 2: 900 tokens d e f repeated   -> d,e,f first at 1201..1203
    texts = [
        " ".join(["a", "b"] * 300),
        " ".join(["c"] * 600),
        " ".join(["d", "e", "f"] * 300),
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {
        r["checkpoint"]: r["distinct_terms"]
        for r in heaps_vocab_growth(spark, d).collect()
    }
    assert got[1000] == 3   # a, b, c
    assert got[2000] == 6   # + d, e, f at 1201-1203
    vals = [got[c] for c in sorted(got)]
    assert vals == sorted(vals)


def test_source_entropy_bounds(spark, tmp_path):
    """Uniform mix gives normalized entropy 1.0; a fully skewed mix
    (all but two docs in one source) drives it toward 0."""
    from ocr_spark.operators.text_analysis import source_entropy

    def build(d, srcs):
        spark.createDataFrame(
            [(i, "t", "en", s, 1) for i, s in enumerate(srcs)],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    d1 = str(tmp_path / "uniform")
    build(d1, ["a"] * 50 + ["b"] * 50)
    r1 = source_entropy(spark, d1).collect()[0]
    assert r1["entropy_normalized"] == 1.0
    d2 = str(tmp_path / "skewed")
    build(d2, ["a"] * 98 + ["b"] * 2)
    r2 = source_entropy(spark, d2).collect()[0]
    assert r2["entropy_normalized"] < 0.2


def test_url_path_rollup_tree_counts(spark, tmp_path):
    """Every page counts once at each ancestor: 100 docs -> each of 5
    categories holds 20, each of 20 (cat,sub) pairs holds 5; leaf pages
    (count 1) are below the min-docs cut."""
    from ocr_spark.operators.text_analysis import url_path_rollup

    d = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = url_path_rollup(spark, d).collect()
    d1 = [r for r in got if r["depth"] == 1]
    d2 = [r for r in got if r["depth"] == 2]
    d3 = [r for r in got if r["depth"] == 3]
    assert len(d1) == 5 and all(r["n_pages"] == 20 for r in d1)
    assert len(d2) == 20 and all(r["n_pages"] == 5 for r in d2)
    assert d3 == []


def test_kneser_ney_matches_python_twin(spark, tmp_path):
    """Exact integer-ppb interpolated KN against an independent pure
    python twin on a crafted corpus, plus the two semantic invariants:
    per-head probabilities sum to ~1e9 (floor losses only), and a
    low-continuation word ('francisco', always after 'san') gets less
    smoothing mass than an equally-frequent high-continuation word."""
    from ocr_spark.operators.text_analysis import kneser_ney_bigram

    d = str(tmp_path)
    texts = [
        "san francisco is big",
        "san francisco is old",
        "the city is big",
        "a city is old",
        "san jose is near san francisco",
    ]
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = kneser_ney_bigram(spark, d).collect()

    cxy: dict = {}
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            cxy[(a, b)] = cxy.get((a, b), 0) + 1
    c_head: dict = {}
    n1p_left: dict = {}
    n1p_right: dict = {}
    for (a, b), c in cxy.items():
        c_head[a] = c_head.get(a, 0) + c
        n1p_left[a] = n1p_left.get(a, 0) + 1
        n1p_right[b] = n1p_right.get(b, 0) + 1
    n_types = len(cxy)

    def p_kn(a, b):
        disc = max(cxy[(a, b)] * 1000 - 750, 0) * 1_000_000 // c_head[a]
        lam = (750_000_000 * n1p_left[a] * n1p_right[b]) // (
            c_head[a] * n_types
        )
        return disc + lam

    assert len(rows) == n_types
    sums: dict = {}
    for r in rows:
        assert r["p_kn_ppb"] == p_kn(r["w1"], r["w2"]), r
        sums[r["w1"]] = sums.get(r["w1"], 0) + r["p_kn_ppb"]
    # interpolated KN is a proper distribution per head over the FULL
    # vocabulary (observed bigrams carry discounted MLE + smoothing;
    # unseen continuations carry lambda * Pcont alone).  Completing the
    # observed sum with the unseen lambda terms must recover ~1e9 ppb,
    # short only by floor losses (< 1 ppb per divided term).
    vocab = sorted(n1p_right)
    for w1, s in sums.items():
        unseen = sum(
            (750_000_000 * n1p_left[w1] * n1p_right[w2])
            // (c_head[w1] * n_types)
            for w2 in vocab
            if (w1, w2) not in cxy
        )
        total = s + unseen
        assert total <= 1_000_000_000
        assert total > 1_000_000_000 - (n1p_left[w1] + len(vocab) + 1)
    # continuation semantics: 'is' (follows francisco/city/jose, 3
    # distinct heads) carries more unseen-continuation mass than
    # 'francisco' (only ever after 'san')
    got = {(r["w1"], r["w2"]): r for r in rows}
    assert got[("san", "francisco")]["n1p_right"] == 1
    assert got[("city", "is")]["n1p_right"] == 3


def test_encoding_repair_crafted(spark, tmp_path):
    """Hand-checked mojibake repair: per-residue synthesized suffixes
    count and repair exactly; mojibake already present in the BASE text
    is counted and repaired too (the repair chain sees the whole
    string, not just the synthesized tail)."""
    from ocr_spark.operators.text_analysis import encoding_repair

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (0, "plain", "en", "s", 5),       # +3x Ã© suffix
            (1, "plain", "en", "s", 5),       # +â€™ and â€” suffix
            (2, "plain", "en", "s", 5),       # +â€œ and â€™ suffix
            (3, "plain", "en", "s", 5),       # clean
            (7, "pre Ã© bad", "en", "s", 9),  # mojibake in base
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["doc_id"]: r for r in encoding_repair(spark, d).collect()}
    assert got[0]["n_mojibake"] == 3
    assert got[0]["fixed_tail"] == " café résumé"
    assert got[1]["n_mojibake"] == 2
    assert got[1]["fixed_tail"] == " don’t — wait"
    assert got[2]["n_mojibake"] == 2
    assert got[2]["fixed_tail"] == " “quoted’"
    assert got[3]["n_mojibake"] == 0 and not got[3]["was_corrupted"]
    assert got[3]["fixed_tail"] == ""
    assert got[3]["n_chars_bad"] == got[3]["n_chars_fixed"] == 5
    # doc 7: residue 3 adds no suffix, but the base 'Ã©' still repairs
    assert got[7]["n_mojibake"] == 1
    assert got[7]["n_chars_fixed"] == got[7]["n_chars_bad"] - 1
    assert got[7]["fixed_tail"] == ""


def test_source_entropy_single_source(spark, tmp_path):
    """One source: entropy 0 and normalized entropy DEFINED as 0.0
    (k=1 would otherwise divide by ln(1)=0 under ANSI mode)."""
    from ocr_spark.operators.text_analysis import source_entropy

    d = str(tmp_path)
    spark.createDataFrame(
        [(i, "t", "en", "only", 1) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    r = source_entropy(spark, d).collect()[0]
    assert r["n_sources"] == 1
    assert r["entropy_nats"] == 0.0
    assert r["entropy_normalized"] == 0.0


def test_quantile_normalization_equalizes_marginals(spark, tmp_path):
    """After normalization every source has (approximately) the same
    multiset of values drawn from the global distribution; max ranks map
    to the global max; a shifted source loses its shift."""
    from ocr_spark.operators.text_analysis import quantile_normalize_length

    d = str(tmp_path)
    # source A: lengths 1..50; source B: same shape shifted +1000
    rows = [(i, "t", "en", "A", i + 1) for i in range(50)]
    rows += [(100 + i, "t", "en", "B", 1001 + i) for i in range(50)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = quantile_normalize_length(spark, d).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["norm_chars"])
    a = sorted(by_src["A"]); b = sorted(by_src["B"])
    # each source's within-rank k maps to global rank 2k: the EVEN order
    # statistics of the pooled distribution — identical for both sources
    assert a == b
    assert max(a) == 1050  # top of the global distribution
    # B's shift is gone: its normalized values now include small globals
    assert min(b) < 50


def _py_bpe(words: dict[str, int], rounds: int):
    """Independent reference BPE (Sennrich-style greedy merges)."""
    seqs = {w: [c for c in w] for w in words}
    merges = []
    for rnd in range(1, rounds + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + words[w]
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, l + r, c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_merges_against_python_reference(spark, tmp_path):
    """The distributed fold/replace merge must equal a plain greedy
    python BPE on a crafted corpus that exercises overlapping pairs
    (aaaa -> [aa][aa]), second-order merges (merged symbol as the left
    element), and frequency ties (lexicographic tie-break)."""
    from ocr_spark.operators.text_analysis import bpe_merges

    corpus = {
        "aaaa": 3,       # overlapping self-pair
        "banana": 4,     # an/na interleave
        "bandana": 2,
        "cabana": 2,
        "zz": 5,         # tie pressure against (a,n)
    }
    rows = []
    did = 0
    for w, n in corpus.items():
        for _ in range(n):
            rows.append((did, w, "en", "s", len(w)))
            did += 1
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in bpe_merges(spark, d, rounds=5).collect()
    ]
    want = _py_bpe(corpus, 5)
    assert got == want, (got, want)
    # sanity on the crafted dynamics: 'an' wins round 1
    # (banana 2x4 + bandana 2x2 + cabana 1x2 = 14)
    assert got[0][3] == "an" and got[0][4] == 14


def test_bpe_merges_exhausted_corpus_stops_early(spark, tmp_path):
    """A corpus of single-char words has no pairs at all: the trainer
    emits zero merges instead of throwing or emitting null rounds."""
    from ocr_spark.operators.text_analysis import bpe_merges

    d = str(tmp_path)
    spark.createDataFrame(
        [(0, "a b c", "en", "s", 5), (1, "a c", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    assert bpe_merges(spark, d).count() == 0

    # and a corpus that merges to single symbols mid-run stops there
    spark.createDataFrame(
        [(0, "ab ab ab", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = bpe_merges(spark, d).collect()
    assert len(got) == 1  # (a,b) merges round 1; nothing left round 2
    assert got[0]["merged"] == "ab" and got[0]["pair_count"] == 3


def test_bpe_tokenize_against_python_reference(spark, tmp_path):
    """Applying the trained merges must reproduce an independent python
    encode: per-doc token counts on a corpus where merges cascade
    (banana -> b,an,an,a -> ...) and where some words never merge."""
    from ocr_spark.operators.text_analysis import bpe_merges, bpe_tokenize

    texts = {
        0: "banana bandana",
        1: "aaaa zz zz",
        2: "cabana q",
    }
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_merges(spark, d, rounds=4).collect()
    ]

    def encode(word: str) -> list[str]:
        syms = list(word)
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {r["doc_id"]: r for r in bpe_tokenize(spark, d, rounds=4).collect()}
    for did, text in texts.items():
        words = [w for w in text.split(" ") if w]
        n_tok = sum(len(encode(w)) for w in words)
        n_chars = sum(len(w) for w in words)
        assert got[did]["n_words"] == len(words)
        assert got[did]["n_chars"] == n_chars
        assert got[did]["n_tokens"] == n_tok, (did, merges)
        assert got[did]["tokens_per_kchar"] == n_tok * 1000 // n_chars
    # compression really happened somewhere
    assert any(r["n_tokens"] < r["n_chars"] for r in got.values())


def test_encoding_repair_roundtrip_property(spark):
    """Property (hypothesis): for ANY ascii base text, corrupting with
    the inverse map then repairing restores the intended string, and
    mojibake-free text passes through unchanged with zero hits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_spark.operators.text_analysis import MOJIBAKE_PAIRS

    ascii_text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=60,
    )

    @settings(max_examples=200, deadline=None)
    @given(ascii_text, st.integers(0, len(MOJIBAKE_PAIRS) * 3))
    def prop(base: str, n_inject: int) -> None:
        # plant n_inject mojibake sequences at deterministic positions
        intended, corrupt = base, base
        for i in range(n_inject):
            bad, good = MOJIBAKE_PAIRS[i % len(MOJIBAKE_PAIRS)]
            intended += " " + good
            corrupt += " " + bad
        repaired, hits = corrupt, 0
        for bad, good in MOJIBAKE_PAIRS:
            hits += (len(repaired) - len(repaired.replace(bad, ""))) // len(
                bad
            )
            repaired = repaired.replace(bad, good)
        assert repaired == intended
        assert hits == n_inject

    prop()


def test_hashed_ngram_classify_matches_python_model(spark, tmp_path):
    """Scores replayed from first principles in pure Python (hashlib):
    unigrams + adjacent bigrams, md5 bucket, md5 weight, argmax with
    smallest-id tie-break; a 1-token doc contributes no bigrams."""
    import hashlib

    from ocr_spark.operators.text_analysis import (
        NGC_BUCKETS,
        NGC_CLASSES,
        NGC_WRANGE,
        hashed_ngram_classify,
    )

    d = str(tmp_path)
    texts = {0: "spark table merge spark", 1: "solo"}
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def score(text: str) -> list:
        ws = text.split(" ")
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        out = [0] * NGC_CLASSES
        for g in grams:
            b = h32(f"ngc:{g}") % NGC_BUCKETS
            for c in range(NGC_CLASSES):
                out[c] += h32(f"ngw:{b}:{c}") % NGC_WRANGE - 1000
        return out

    rows = {r["doc_id"]: r for r in hashed_ngram_classify(spark, d).collect()}
    for i, t in texts.items():
        exp = score(t)
        got = [rows[i][f"score_{c}"] for c in range(NGC_CLASSES)]
        assert got == exp, (i, got, exp)
        best = max(exp)
        assert rows[i]["predicted_class"] == exp.index(best)
        assert rows[i]["margin"] == best - sorted(exp)[-2]


def test_bpe_fertility_rolls_up_tokenize(spark, tmp_path):
    """Group sums equal the per-doc bpe_tokenize sums and the exact
    rational ppm is the half-away rounding of tokens/words."""
    from ocr_spark.operators.text_analysis import bpe_fertility, bpe_tokenize

    d = str(tmp_path)
    rows = [
        (0, "aa ab aa ab ra", "en", "web", 14),
        (1, "aa ab aa", "en", "web", 8),
        (2, "zz zz zz zz", "de", "pdf", 11),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    per_doc = {r["doc_id"]: r for r in bpe_tokenize(spark, d).collect()}
    out = {(r["source"], r["lang"]): r for r in bpe_fertility(spark, d).collect()}
    web = out[("web", "en")]
    assert web["n_docs"] == 2
    assert web["n_words"] == per_doc[0]["n_words"] + per_doc[1]["n_words"]
    assert web["n_tokens"] == per_doc[0]["n_tokens"] + per_doc[1]["n_tokens"]
    t, w = web["n_tokens"], web["n_words"]
    assert web["fertility_ppm"] == (2 * t * 1_000_000 + w) // (2 * w)
    pdf = out[("pdf", "de")]
    assert pdf["n_docs"] == 1 and pdf["n_words"] == 4


def test_doremi_mixture_mw_rounds_by_hand(spark, tmp_path):
    """Two sources, excess 0 vs 1e6: replay the integer MW recurrence
    in Python and check the weights tilt toward the high-excess domain
    while summing to ~1e6 (truncating renormalization)."""
    from ocr_spark.operators.text_analysis import (
        DOREMI_ETA_PPM,
        DOREMI_ROUNDS,
        doremi_mixture,
    )

    d = str(tmp_path)
    rows = [
        (0, "a a", "en", "low", 10),
        (1, "b b", "en", "low", 10),
        (2, "c c", "en", "high", 30),
        (3, "d d", "en", "high", 30),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in doremi_mixture(spark, d).collect()}
    assert out["low"]["excess_ppm"] == 0
    assert out["high"]["excess_ppm"] == 1_000_000

    w = {"low": 1_000_000 // 2, "high": 1_000_000 // 2}
    ex = {"low": 0, "high": 1_000_000}
    for _ in range(DOREMI_ROUNDS):
        v = {
            s: w[s] * (1_000_000 + (DOREMI_ETA_PPM * ex[s]) // 1_000_000)
            for s in w
        }
        tv = sum(v.values())
        w = {s: (v[s] * 1_000_000) // tv for s in w}
    assert out["low"]["weight_ppm"] == w["low"]
    assert out["high"]["weight_ppm"] == w["high"]
    assert w["high"] > w["low"]
    assert 999_990 <= w["low"] + w["high"] <= 1_000_000


def test_gopher_rules_per_rule_attribution(spark, tmp_path):
    """Each rule fires independently on a crafted violator; the clean
    doc keeps; ppm arithmetic is exact floor division."""
    from ocr_spark.operators.text_analysis import gopher_rules

    d = str(tmp_path)
    clean = "the quick brown fox jumps over a lazy dog near the " + " ".join(
        "word" + chr(ord("a") + i) for i in range(15)
    )  # 26 words, has 'the'+'a', varied tokens, all alpha
    rows = [
        (0, clean, "en", "s", len(clean)),
        (1, "the a short doc", "en", "s", 15),  # < 20 words
        (2, "the " * 25 + "a end", "en", "s", 100),  # top token 25/27
        (3, " ".join(f"tok{i}" for i in range(30)), "en", "s", 99),  # no stop
        (
            4,
            "the a " + " ".join("x9!" for _ in range(28)),
            "en",
            "s",
            90,
        ),  # 28/30 non-alpha
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in gopher_rules(spark, d).collect()}
    assert out[0]["keep"] and all(
        out[0][k] for k in ("r_words", "r_meanlen", "r_toptoken", "r_stop",
                            "r_alpha")
    )
    assert not out[1]["r_words"] and not out[1]["keep"]
    assert not out[2]["r_toptoken"]
    assert out[2]["top_token_ppm"] == 25 * 1_000_000 // 27
    assert not out[3]["r_stop"] and out[3]["stop_distinct"] == 0
    assert not out[4]["r_alpha"]
    assert out[4]["alpha_ppm"] == 2 * 1_000_000 // 30


def test_corpus_shuffle_is_exact_deterministic_permutation(spark, tmp_path):
    """global_pos must be the exact rank of the multiplicative-hash key
    (tie: doc_id) — a permutation of 0..n-1 — and the shard arithmetic
    must be consistent; a rerun yields the identical assignment."""
    from ocr_spark.operators.relational import KMV_HASH_A, KMV_HASH_M
    from ocr_spark.operators.text_analysis import (
        SHUFFLE_SHARD_DOCS,
        corpus_shuffle_shards,
    )

    d = str(tmp_path)
    n = 257  # deliberately not a multiple of the shard size
    rows = [(i, "t", "en", "src0", 1) for i in range(n)]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r["doc_id"]: r.asDict() for r in
           corpus_shuffle_shards(spark, d).collect()}
    order = sorted(range(n), key=lambda i: ((i * KMV_HASH_A) % KMV_HASH_M, i))
    for pos, doc in enumerate(order):
        g = got[doc]
        assert g["global_pos"] == pos
        assert g["shuffle_key"] == (doc * KMV_HASH_A) % KMV_HASH_M
        assert g["shard_id"] == pos // SHUFFLE_SHARD_DOCS
        assert g["pos_in_shard"] == pos % SHUFFLE_SHARD_DOCS
    assert sorted(g["global_pos"] for g in got.values()) == list(range(n))
    again = {r["doc_id"]: r.asDict() for r in
             corpus_shuffle_shards(spark, d).collect()}
    assert again == got


def test_boilerplate_prune_drops_all_copies_keeps_rare_dups(spark, tmp_path):
    """The frequency rule removes a >=BOILER_MIN_DOCS-doc chunk from
    EVERY document (no surviving first copy — the difference from
    paragraph_dedup_rebuild), while a chunk shared by only two docs
    survives in BOTH."""
    from ocr_spark.operators.text_analysis import (
        BOILER_MIN_DOCS,
        PARA_W,
        boilerplate_prune,
    )

    assert BOILER_MIN_DOCS == 3  # the crafted corpus encodes this
    boiler = " ".join(f"b{i}" for i in range(PARA_W))
    pair = " ".join(f"p{i}" for i in range(PARA_W))
    uniq = [" ".join(f"u{d}x{i}" for i in range(PARA_W)) for d in range(4)]
    rows = [
        (0, f"{boiler} {uniq[0]}"),
        (1, f"{uniq[1]} {boiler}"),
        (2, f"{boiler} {pair}"),
        (3, f"{pair} {uniq[3]}"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r["doc_id"]: r.asDict() for r in
           boilerplate_prune(spark, d).collect()}
    assert got[0] == {"doc_id": 0, "n_chunks": 2, "n_boiler": 1,
                      "text_kept": uniq[0]}
    assert got[1]["text_kept"] == uniq[1]  # boiler gone even mid-doc
    # the 2-doc chunk survives in BOTH documents
    assert got[2] == {"doc_id": 2, "n_chunks": 2, "n_boiler": 1,
                      "text_kept": pair}
    assert got[3] == {"doc_id": 3, "n_chunks": 2, "n_boiler": 0,
                      "text_kept": f"{pair} {uniq[3]}"}


def test_temperature_budget_exact_hamilton_and_flattening(spark, tmp_path):
    """isqrt weights are exact (not libm-dependent), floor shares plus
    largest-remainder seats sum to the budget EXACTLY, and the
    low-resource language is upsampled (sampled share > natural)."""
    from ocr_spark.operators.text_analysis import (
        TEMP_TOTAL_BUDGET,
        temperature_sampling_budget,
    )

    d = str(tmp_path)
    counts = {"en": 80, "de": 2}  # isqrt: 8 and 1; wsum 9 -> remainders
    rows = []
    i = 0
    for lang, c in counts.items():
        for _ in range(c):
            rows.append((i, "t", lang, "src0", 1))
            i += 1
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r["lang"]: r.asDict() for r in
           temperature_sampling_budget(spark, d).collect()}
    assert got["en"]["w"] == 8 and got["de"]["w"] == 1
    base_en = TEMP_TOTAL_BUDGET * 8 // 9
    base_de = TEMP_TOTAL_BUDGET * 1 // 9
    # one leftover seat; en has the larger remainder (8 > 1)
    assert got["en"]["budget"] == base_en + 1
    assert got["de"]["budget"] == base_de
    assert got["en"]["budget"] + got["de"]["budget"] == TEMP_TOTAL_BUDGET
    # temperature flattening: de holds 2/82 naturally but 1/9 of draws
    assert got["de"]["sampled_ppm"] > got["de"]["natural_ppm"]
    assert got["en"]["sampled_ppm"] < got["en"]["natural_ppm"]


def test_phrase_search_counts_overlapping_occurrences(spark, tmp_path):
    """Positional semantics: overlapping matches count separately, word
    order matters (reversed phrase does not match), and case folds."""
    from ocr_spark.operators.text_analysis import phrase_search

    d = str(tmp_path)
    rows = [
        (0, "slow hash batch tail", "en", "s", 1),       # one match at 0
        (1, "x slow hash batch y slow hash batch", "en", "s", 1),  # two
        (2, "batch hash slow", "en", "s", 1),            # reversed: none
        (3, "SLOW HASH BATCH", "en", "s", 1),            # case-folded
        (4, "slow hash", "en", "s", 1),                  # incomplete
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r["doc_id"]: r.asDict() for r in phrase_search(spark, d).collect()}
    assert set(got) == {0, 1, 3}
    assert got[0] == {"doc_id": 0, "n_matches": 1, "first_pos": 0}
    assert got[1] == {"doc_id": 1, "n_matches": 2, "first_pos": 1}
    assert got[3]["n_matches"] == 1


def test_span_corruption_exact_rebuild(spark, tmp_path):
    """Hand-replay the masking plan on a crafted 45-token doc: two full
    blocks mask one 3-span each at the hashed offset, the 5-token tail
    stays unmasked, and a short doc passes through untouched."""
    from ocr_spark.operators.text_analysis import (
        CORRUPT_BLOCK,
        CORRUPT_OFF_A,
        CORRUPT_OFF_B,
        CORRUPT_SPAN,
        span_corruption_plan,
    )

    d = str(tmp_path)
    toks = [f"w{i}" for i in range(45)]
    rows = [
        (7, " ".join(toks), "en", "s", 1),
        (8, "a b c", "en", "s", 1),  # < one block: untouched
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {r["doc_id"]: r.asDict()
           for r in span_corruption_plan(spark, d).collect()}

    # replay doc 7
    pieces, tgts = [], []
    for b in range(45 // CORRUPT_BLOCK):
        off = (7 * CORRUPT_OFF_A + b * CORRUPT_OFF_B) % (
            CORRUPT_BLOCK - CORRUPT_SPAN + 1
        )
        lo = b * CORRUPT_BLOCK
        pre = toks[lo : lo + off]
        span = toks[lo + off : lo + off + CORRUPT_SPAN]
        post = toks[lo + off + CORRUPT_SPAN : lo + CORRUPT_BLOCK]
        pieces.append(
            " ".join([p for p in [" ".join(pre), f"<extra_id_{b}>",
                                  " ".join(post)] if p])
        )
        tgts.append(f"<extra_id_{b}> " + " ".join(span))
    tail = " ".join(toks[40:])
    want_corrupted = " ".join(pieces + [tail])
    assert got[7]["corrupted"] == want_corrupted
    assert got[7]["target"] == " ".join(tgts)
    assert got[7]["n_masked"] == 6
    assert got[7]["masked_ppm"] == 6 * 1_000_000 // 45
    # masked tokens are genuinely absent from the corrupted input
    for b in range(2):
        for t in tgts[b].split()[1:]:
            assert t not in got[7]["corrupted"].split()
    assert got[8] == {
        "doc_id": 8, "n_tokens": 3, "n_blocks": 0, "n_masked": 0,
        "masked_ppm": 0, "corrupted": "a b c", "target": "",
    }


def test_rake_keywords_hand_computed(spark, tmp_path):
    """RAKE scores on a crafted doc, every deg/freq worked by hand.

    Delimiters d0..d9 dominate corpus frequency (the generated
    stoplist); doc 0's candidate runs are [quick brown], [quick],
    [lazy dog fox tree]:
      quick: freq 2, deg 2+1=3 -> 1.5e6;  brown: 1/2 -> 2e6;
      lazy/dog/fox/tree: 1/4 -> 4e6 each.
    Phrase scores 16e6 > 3.5e6 > 1.5e6."""
    from ocr_spark.operators.text_analysis import rake_keywords

    delims = " ".join(f"d{i}" for i in range(10))
    t0 = "d0 quick brown d1 quick d2 lazy dog fox tree d3"
    d = str(tmp_path)
    spark.createDataFrame(
        [(0, t0, "en", "s", len(t0)),
         (1, delims, "en", "s", len(delims)),
         (2, delims, "en", "s", len(delims))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = [
        (r["rank"], r["phrase"], r["n_words"], r["score_ppm"])
        for r in rake_keywords(spark, d).collect()
    ]
    assert rows == [
        (1, "lazy dog fox tree", 4, 16_000_000),
        (2, "quick brown", 2, 3_500_000),
        (3, "quick", 1, 1_500_000),
    ]


def test_texttiling_boundary_at_topic_break(spark, tmp_path):
    """30 'aa' tokens then 30 'bb' tokens: blocks 0-2 are topic A,
    3-5 topic B.  Hand-worked gaps: g2 and g4 mix one pure and one
    half-and-half window (cos^2 = 0.5 -> 5e8 ppb), g3 compares pure A
    to pure B (cos^2 = 0, depth 1e9) — the only boundary, exactly at
    the topic break."""
    from ocr_spark.operators.text_analysis import texttiling_segments

    text = " ".join(["aa"] * 30 + ["bb"] * 30)
    d = str(tmp_path)
    spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = [
        (r["gap"], r["cos2_ppb"], r["depth_ppb"], r["is_boundary"])
        for r in texttiling_segments(spark, d).collect()
    ]
    assert rows == [
        (2, 500_000_000, -500_000_000, 0),
        (3, 0, 1_000_000_000, 1),
        (4, 500_000_000, -500_000_000, 0),
    ]


def test_good_turing_hand_computed_spectrum(spark, tmp_path):
    """'a b a b a c': bigrams {ab:2, ba:2, ac:1} -> N_1=1, N_2=2;
    r*=1 -> (1+1)*N_2/N_1 = 4.0; r=2 has N_3=0 -> emitted 0."""
    from ocr_spark.operators.text_analysis import good_turing_bigrams

    d = str(tmp_path)
    spark.createDataFrame(
        [(0, "a b a b a c", "en", "s", 11), (1, "x", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = [
        (r["r"], r["n_r"], r["n_r1"], r["r_star_ppm"])
        for r in good_turing_bigrams(spark, d).collect()
    ]
    # the one-token doc contributes no bigrams (sequence-guard case)
    assert rows == [(1, 1, 2, 4_000_000), (2, 2, 0, 0)]


def test_chi2_feature_selection_hand_computed(spark, tmp_path):
    """One perfectly class-separating term and one uniform term on a
    crafted 6-doc corpus, chi2 worked by hand:
      'heiss' appears in all 3 de docs and no en doc ->
        a=3 b=0 c=0 d=3, chi2 = 6*(9-0)^2/(3*3*3*3) = 6.0
      'same' appears in every doc -> b+d marginal 0 -> guarded 0."""
    from ocr_spark.operators.text_analysis import chi2_feature_selection

    rows = [
        (0, "same heiss x0", "de", "s", 10),
        (1, "same heiss x1", "de", "s", 10),
        (2, "same heiss x2", "de", "s", 10),
        (3, "same cool y0", "en", "s", 10),
        (4, "same cool y1", "en", "s", 10),
        (5, "same cool y2", "en", "s", 10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r["lang"], r["rank"]): (r["term"], r["chi2_milli"])
           for r in chi2_feature_selection(spark, d).collect()}
    # both separating terms score chi2 = 6.000 for BOTH classes (chi2
    # is symmetric in presence/absence); the tie breaks term-asc
    assert out[("de", 1)] == ("cool", 6_000)
    assert out[("de", 2)] == ("heiss", 6_000)
    assert out[("en", 1)] == ("cool", 6_000)
    assert out[("en", 2)] == ("heiss", 6_000)
    # rank 3: per-doc unique fillers score 6*(1*3-0)^2/(1*5*3*3) = 1.2
    assert out[("de", 3)][1] == 1_200


def test_policy_lexicon_score_sees_through_leet(spark, tmp_path):
    """An obfuscated doc (doc_id % 5 == 1 gets leet-folded in-query)
    must score identically to its clean twin; hand-checked hits,
    distinct-term and rate arithmetic; both flag routes (rate boundary
    at exactly 40 milli, and the 2-distinct-terms route) exercised."""
    from ocr_spark.operators.text_analysis import policy_lexicon_score

    filler24 = " ".join(f"w{i}" for i in range(24))
    filler25 = " ".join(f"w{i}" for i in range(25))
    rows = [
        # two distinct terms in 4 tokens: rate 500, flagged (both routes)
        (0, "slow dup x y", "en", "s", 10),
        # obfuscated twin of doc 2 (1 % 5 == 1)
        (1, "slow big", "en", "s", 10),
        # clean twin of doc 1
        (2, "slow big", "en", "s", 10),
        # no hits
        (3, "fast table", "en", "s", 10),
        # rate boundary: 1 hit / 25 tokens = 40 milli -> flagged
        (4, "slow " + filler24, "en", "s", 10),
        # 1 hit / 26 tokens = 38 milli, one distinct term -> clean
        (6, "slow " + filler25, "en", "s", 10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["doc_id"]: r for r in policy_lexicon_score(spark, d).collect()}
    assert out[0]["hits"] == 2 and out[0]["distinct_terms"] == 2
    assert out[0]["rate_milli"] == 500 and out[0]["flagged"] == 1
    assert out[1]["obfuscated"] == 1 and out[2]["obfuscated"] == 0
    for col in ("hits", "distinct_terms", "rate_milli", "flagged"):
        assert out[1][col] == out[2][col], col
    assert out[2]["hits"] == 2 and out[2]["flagged"] == 1
    assert out[3]["hits"] == 0 and out[3]["flagged"] == 0
    assert out[4]["rate_milli"] == 40 and out[4]["flagged"] == 1
    assert out[6]["rate_milli"] == 38 and out[6]["flagged"] == 0


def test_distinct_ngram_diversity_hand_computed(spark, tmp_path):
    """'a b a b' + 'a a a' in one source: unigrams 7 total / 2 distinct
    (285714 ppm); bigrams 5 total ('a b','b a','a b','a a','a a') / 3
    distinct (600000 ppm); trigrams 3 total / 3 distinct (1e6 ppm —
    'a b a', 'b a b', 'a a a').  A looping source must score BELOW a
    diverse one at n=2."""
    from ocr_spark.operators.text_analysis import distinct_ngram_diversity

    d = str(tmp_path)
    rows = [
        (0, "a b a b", "en", "s1", 7),
        (1, "a a a", "en", "s1", 5),
        # diverse twin source: every bigram unique
        (2, "p q r s t", "en", "s2", 9),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r["source"], r["n"]): r
           for r in distinct_ngram_diversity(spark, d).collect()}
    assert out[("s1", 1)]["total_grams"] == 7
    assert out[("s1", 1)]["distinct_grams"] == 2
    assert out[("s1", 1)]["distinct_ppm"] == 2 * 1_000_000 // 7
    assert out[("s1", 2)]["total_grams"] == 5
    assert out[("s1", 2)]["distinct_grams"] == 3
    assert out[("s1", 2)]["distinct_ppm"] == 600_000
    assert out[("s1", 3)]["total_grams"] == 3
    assert out[("s1", 3)]["distinct_grams"] == 3
    assert out[("s1", 3)]["distinct_ppm"] == 1_000_000
    assert out[("s2", 2)]["distinct_ppm"] == 1_000_000
    assert out[("s1", 2)]["distinct_ppm"] < out[("s2", 2)]["distinct_ppm"]


def test_caption_mining_hand_computed(spark, tmp_path):
    """Gap assignment, longer-run-wins with before-tie, the clip cap,
    and the no-text-media filter, all on crafted interleaved docs
    (len%3==0 tokens play media spans)."""
    from ocr_spark.operators.spans import CAPTION_MAX_TOKS, caption_mining

    d = str(tmp_path)
    long_run = " ".join(f"t{i}" for i in range(10))  # 10 text tokens
    rows = [
        # aaa (media) | bb cc | ddd (media) | ee
        (0, "aaa bb cc ddd ee", "en", "s", 16),
        # tie: one text token each side -> before wins
        (1, "xx aaa yy", "en", "s", 9),
        # 10-token run before the media: clipped caption, full run_toks
        (2, long_run + " mmm", "en", "s", 40),
        # media with no text anywhere -> no pair emitted
        (3, "aaa", "en", "s", 3),
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {(r["doc_id"], r["media_pos"]): r
           for r in caption_mining(spark, d).collect()}
    assert set(out) == {(0, 0), (0, 3), (1, 1), (2, 10)}
    assert out[(0, 0)]["caption"] == "bb cc"
    assert out[(0, 0)]["side"] == "after"
    assert out[(0, 0)]["run_toks"] == 2
    assert out[(0, 3)]["caption"] == "bb cc"
    assert out[(0, 3)]["side"] == "before"
    assert out[(1, 1)]["caption"] == "xx" and out[(1, 1)]["side"] == "before"
    clip = out[(2, 10)]
    assert clip["run_toks"] == 10
    assert clip["caption"] == " ".join(
        f"t{i}" for i in range(CAPTION_MAX_TOKS)
    )


def test_padding_waste_sorted_beats_arrival(spark, tmp_path):
    """Interleaved short/long docs: arrival-order batches pad every
    short doc up to the long length; length-sorted batches are
    homogeneous, so padding waste drops to zero.  Hand-computed:
    64 docs alternating 2/100 tokens, batch 32 -> arrival pads
    2*32*100=6400 vs actual 3264 (waste 490000 ppm half-away);
    sorted pads exactly actual (waste 0)."""
    from ocr_spark.operators.text_analysis import padding_waste_audit

    d = str(tmp_path)
    rows = []
    for i in range(64):
        n = 2 if i % 2 == 0 else 100
        rows.append((i, " ".join(f"w{j}" for j in range(n)), "en", "s", n))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {r["strategy"]: r for r in padding_waste_audit(spark, d).collect()}
    arr, srt = out["arrival"], out["sorted"]
    assert arr["n_batches"] == 2 and srt["n_batches"] == 2
    assert arr["actual_tokens"] == srt["actual_tokens"] == 3264
    assert arr["padded_tokens"] == 6400 and srt["padded_tokens"] == 3264
    assert arr["waste_ppm"] == 490_000 and srt["waste_ppm"] == 0


def test_dataset_card_hand_computed(spark, tmp_path):
    """4-doc corpus with one exact-dup pair, one short doc, two langs
    and two sources — every card metric verified by hand."""
    from ocr_spark.operators.text_analysis import dataset_card

    long_a = " ".join(f"w{i}" for i in range(20))  # 20 tokens
    d = str(tmp_path)
    spark.createDataFrame(
        [
            (0, long_a, "en", "A", 1),
            (1, long_a, "en", "A", 1),          # exact dup of 0
            (2, "tiny doc here", "de", "B", 1),  # 3 tokens (short)
            (3, " ".join(f"z{i}" for i in range(17)), "en", "B", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    card = {r["metric"]: r["value"]
            for r in dataset_card(spark, d).collect()}
    assert card == {
        "dup_docs_ppm": 500_000,       # 2 of 4
        "english_docs_ppm": 750_000,   # 3 of 4
        "mean_doc_tokens_milli": 15_000,  # (20+20+3+17)/4 = 15.0
        "n_docs": 4,
        "n_langs": 2,
        "n_sources": 2,
        "n_tokens": 60,
        "short_docs_ppm": 250_000,     # 1 of 4
    }


def test_interleaved_pack_invariants(spark, corpus_path):
    """Media spans cost exactly one placeholder token; per-shard
    offsets telescope (start of next span in stream order == previous
    cum end); spans never span more sequences than their token count
    allows."""
    from ocr_spark.operators.spans import interleaved_pack
    from ocr_spark.operators.text_analysis import SEQ_LEN

    rows = interleaved_pack(spark, corpus_path).collect()
    assert rows
    by_shard: dict[int, list] = {}
    for r in rows:
        if r["kind"] == "media":
            assert r["n_tokens"] == 1
        else:
            assert r["n_tokens"] >= 1
        assert r["last_seq"] >= r["first_seq"]
        assert (r["last_seq"] - r["first_seq"]) <= r["n_tokens"] // SEQ_LEN + 1
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, sr in by_shard.items():
        sr.sort(key=lambda r: (r["doc_id"], r["span_idx"]))
        cum = 0
        for r in sr:
            assert r["start_tok"] == cum
            cum += r["n_tokens"]
            assert r["first_seq"] == r["start_tok"] // SEQ_LEN
            assert r["last_seq"] == (cum - 1) // SEQ_LEN


def test_packing_seqlen_sweep_hand_values(spark, tmp_path):
    """Single 100-token shard: L=64 -> 2 seqs, waste 28/128; L=512 ->
    1 seq, waste 412/512 (half-away ppm)."""
    from ocr_spark.operators.text_analysis import packing_seqlen_sweep

    d = str(tmp_path)
    text = " ".join(f"w{i}" for i in range(100))
    spark.createDataFrame(
        [(0, text, "en", "only", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    rows = {r["seq_len"]: r for r in packing_seqlen_sweep(spark, d).collect()}
    assert rows[64]["n_seqs"] == 2
    assert rows[64]["padded_tokens"] == 128
    assert rows[64]["tail_waste_ppm"] == 218_750
    assert rows[512]["n_seqs"] == 1
    assert rows[512]["tail_waste_ppm"] == 804_688
    assert all(r["actual_tokens"] == 100 and r["n_shards"] == 1
               for r in rows.values())


def test_label_model_vote_hand_corpus(spark, tmp_path):
    """4-doc crafted corpus where every LF vote and the majority are
    hand-computable: short doc abstains LF1; the 10%-noise flip on
    doc_id 0 inverts LF2; diagnostics match exactly."""
    from ocr_spark.operators.text_analysis import label_model_vote

    en_long = "this is the quick brown fox jumping over the lazy dog"
    d = str(tmp_path)
    spark.createDataFrame(
        [
            # doc 0: lang en but FLIPPED by noise -> v2=0; v1=1; v3(n=54 even)=1 -> maj 1
            (0, en_long, "en", "s", 54),
            # doc 10: en, v2=1 (10%10==0 flips! doc_id 10 -> flip) wait 10%10==0 -> flipped -> 0
            (11, en_long, "en", "s", 53),   # v1=1, v2=1, v3(odd)=0 -> maj 1
            (12, "short doc", "de", "s", 10),  # v1 abstain, v2=0, v3=1 -> pos 1, cnt 2 -> maj 0
            (13, "no stopwords here at all friends", "de", "s", 31),
            # ^ v1=0, v2=0, v3=0 -> maj 0
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["lf"]: r for r in label_model_vote(spark, d).collect()}
    # LF1: abstains on doc 12 -> coverage 3/4; agrees on 0,11,13 -> 3/3
    assert got["lf1_stopword"]["n_votes"] == 3
    assert got["lf1_stopword"]["coverage_ppm"] == 750_000
    assert got["lf1_stopword"]["agree_majority_ppm"] == 1_000_000
    # LF2: full coverage; doc0 flipped to 0 vs maj 1 -> agrees on 11,12,13
    assert got["lf2_lang_tag"]["agree_majority_ppm"] == 750_000
    # LF3: votes 1,0,1,0 vs maj 1,1,0,0 -> agrees on 0,13 -> 2/4
    assert got["lf3_parity"]["agree_majority_ppm"] == 500_000


def test_uncertainty_sample_is_boundary_queue(spark, sf_dir):
    """The queue is the K docs with smallest |ppl - median| — verified
    against a direct computation from the published lm_perplexity
    output (same e4 quantization, same ceil-rank median)."""
    from ocr_spark.operators.text_analysis import (
        UNCERTAIN_K,
        lm_perplexity,
        uncertainty_sample,
    )

    ppl = {r["doc_id"]: round(round(r["ppl"], 4) * 10000)
           for r in lm_perplexity(spark, sf_dir).collect()}
    n = len(ppl)
    ordered = sorted((v, d) for d, v in ppl.items())
    med = ordered[(50 * n + 99) // 100 - 1][0]
    expect = sorted(
        ((abs(v - med), d) for d, v in ppl.items())
    )[:UNCERTAIN_K]
    got = uncertainty_sample(spark, sf_dir).collect()
    assert len(got) == UNCERTAIN_K
    assert all(r["median_e4"] == med for r in got)
    assert sorted((r["margin"], r["doc_id"]) for r in got) == expect
