"""Physical-plan regression guards.

The 100 TB properties of this engine live in plan SHAPE, not in local
timings: one scan (not two), exactly the intended shuffles, filters
pushed into the parquet scan, small dims broadcast, no nested-loop
joins.  These tests pin those shapes via explain output so a refactor
cannot silently regress them.
"""

from __future__ import annotations

import contextlib
import io

import pyarrow.parquet as pq
import pytest

from ocr_spark.fixtures.corpus import build_corpus

SF = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "c.parquet")
    pq.write_table(build_corpus(30, seed=3), path)
    return spark.read.parquet(path).select("doc_id", "spans")


def test_flagship_single_scan_two_shuffles(corpus):
    from ocr_spark.operators.pipeline import extract_documents

    df = extract_documents(corpus, mode="exploded")
    tree = plan_of(df, "simple")  # each node printed once
    assert tree.count("Scan parquet") == 1, "exploded mode must scan once"
    assert tree.count("Exchange") == 2, (
        "exactly two shuffles: round-robin salt + doc_id regroup"
    )
    assert "MapInPandas" in tree
    assert "PushedFilters" in plan_of(df, "formatted")


def test_fused_zero_extra_shuffles(corpus):
    from ocr_spark.operators.pipeline import extract_documents

    tree = plan_of(extract_documents(corpus, mode="fused"), "simple")
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") == 1  # only the skew repartition


def test_pricing_summary_pushdown_and_partial_agg(spark):
    from ocr_spark.operators.relational import pricing_summary

    plan = plan_of(pricing_summary(spark, SF))
    assert "LessThanOrEqual(l_shipdate" in plan, "shipdate filter not pushed"
    assert "partial_sum" in plan, "map-side partial aggregation missing"
    # column pruning: only the 5 needed lineitem columns reach the scan
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema


def test_top_orders_broadcasts_customer(spark):
    from ocr_spark.operators.relational import top_orders_per_segment

    plan = plan_of(top_orders_per_segment(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_table_det_assign_no_nested_loop(spark):
    from ocr_spark.operators.table import table_det_assign

    plan = plan_of(table_det_assign(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_partial_min_before_shuffle(spark):
    from ocr_spark.operators.dedup import minhash_signatures

    plan = plan_of(minhash_signatures(spark, SF))
    assert "partial_min" in plan, (
        "minhash must combine map-side: shuffle O(docs), not O(shingles)"
    )


def test_fields_barrier_prevents_collapse(spark):
    from ocr_spark.operators.fields import extract_invoice_fields

    refs = spark.createDataFrame([("inv://p0#vat",)], "media_ref string")
    tree = plan_of(extract_invoice_fields(refs), "simple")
    # two python map stages: the OCR kernel and the identity barrier
    assert tree.count("MapInPandas") == 2
    # NO ArrowEvalPython stage: the python normalizers (get_date,
    # get_chinese_amount) ride inside the kernel stage — a pandas-UDF
    # stage feeding the barrier measured ~10x slower than either python
    # stage alone on this runtime.
    assert tree.count("ArrowEvalPython") == 0


def test_round_robin_spreads_heavy_doc(spark):
    """Skew evidence: a 200-media document's rows land on many partitions
    after the round-robin salt (the fused alternative would serialize it
    on one task)."""
    from pyspark.sql import functions as F

    spans = [
        {"kind": "media", "text": "", "media_ref": f"img://h/{i}#crop",
         "offset": i}
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [("heavy", spans)],
        "doc_id string, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>",
    )
    ex = df.select("doc_id", F.explode("spans").alias("s")).repartition(16)
    spread = (
        ex.withColumn("pid", F.spark_partition_id())
        .groupBy("doc_id")
        .agg(F.countDistinct("pid").alias("n_parts"))
        .collect()[0]["n_parts"]
    )
    assert spread == 16


def test_lsh_planes_are_literals_not_per_row_md5(spark):
    """The hyperplane components are plan-time constants; no md5 (nor hex
    conv) may appear in the embedding plans — the round-1 form evaluated
    ~N_PLANES*dim md5 calls per row through interpreted HOF lambdas."""
    from ocr_spark.operators.dedup import embedding_near_dup
    from ocr_spark.operators.similarity import lsh_topk

    for fn in (embedding_near_dup, lsh_topk):
        tree = plan_of(fn(spark, SF), "formatted").lower()
        assert "md5" not in tree
        assert "conv(" not in tree


def test_embedding_near_dup_norms_precomputed(spark):
    """Per-row norms are computed before the self-join: the pair-level
    projection must not contain sqrt (norm) work, only the dot product."""
    from ocr_spark.operators.dedup import embedding_near_dup

    tree = plan_of(embedding_near_dup(spark, SF), "simple").lower()
    # one sqrt per join side (the per-row nrm columns), none per pair:
    # the final projection computes dot/(nrm_a*nrm_b) with no sqrt call.
    # Pair-level projections are the ones carrying BOTH vec_a and vec_b;
    # per-row projections (vec_a only) legitimately compute the sqrt norm.
    proj_lines = [l for l in tree.splitlines() if "project" in l]
    pair_lines = [l for l in proj_lines if "vec_a" in l and "vec_b" in l]
    assert pair_lines
    for l in pair_lines:
        assert "sqrt" not in l


def test_embedding_candidates_shrink_with_planes(spark):
    """The VERDICT round-2 scale criterion for the vector LSH: candidate
    pair volume must shrink as n_planes grows (finer buckets) — this is
    what keeps the within-bucket self-join off the O(N^2) cliff at corpus
    scale — while extra tables add candidates back (recall knob)."""
    from ocr_spark.operators.dedup import embedding_candidates

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    counts = {
        p: embedding_candidates(emb, n_planes=p, n_tables=1).count()
        for p in (2, 5, 8)
    }
    assert counts[2] >= counts[5] >= counts[8]
    assert counts[2] > counts[8]  # strict shrink across the range
    multi = embedding_candidates(emb, n_planes=8, n_tables=3).count()
    assert multi >= counts[8]  # union over tables only adds candidates


def test_ivf_assignment_is_map_side(spark):
    """IVF (ann_ivf_topk): list assignment must be a map-side argmin over
    LITERAL anchor vectors — the corpus side is never shuffled and never
    sort-merge-joined; the only join is the broadcast of the single query
    row (its probes array).  TakeOrdered handles the final top-k without
    a global sort exchange."""
    from ocr_spark.operators.similarity import ivf_topk

    tree = plan_of(ivf_topk(spark, SF), "formatted").lower()
    assert "sortmergejoin" not in tree
    assert "hashpartitioning" not in tree  # no corpus shuffle
    assert "broadcast" in tree  # the 1-row query side
    assert "takeordered" in tree


def test_ivf_probes_shrink_candidates(spark):
    """Probing n_probe of n_anchors lists must scan a strict subset of
    the corpus (the whole point of the inverted file), and more probes
    can only widen the candidate set."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.similarity import (
        _anchor_rows,
        _l2_struct_array,
        ivf_topk,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    total = emb.count()
    anchors = _anchor_rows(SF)
    assigned = emb.withColumn(
        "list_id", F.array_min(_l2_struct_array("embedding", anchors))["aid"]
    )
    # every list non-degenerate: assignment spreads over several anchors
    n_lists = assigned.select("list_id").distinct().count()
    assert n_lists > 1
    # the probed lists hold a strict subset of the corpus
    list_sizes = {
        r["list_id"]: r["count"]
        for r in assigned.groupBy("list_id").count().collect()
    }
    assert max(list_sizes.values()) < total
    rows = ivf_topk(spark, SF).collect()
    assert len(rows) == 10 and all(r.vec_id != 0 for r in rows)
    cos = [r.cos for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert all(-1.0 <= c <= 1.0 for c in cos)
    # fewer probes -> no more candidates than more probes
    few = ivf_topk(spark, SF, n_probe=1).collect()
    assert len(few) <= len(rows)


def test_bucketed_join_no_exchange(spark):
    """Co-located join: both sides bucketed on the join key at write time
    -> SortMergeJoin with ZERO Exchange (the at-scale payoff of paying
    the ingest shuffle once).  Broadcast is disabled via merge hint so
    the plan can't dodge the question with a broadcast join."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.relational import write_bucketed

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey")
    j = (
        spark.table("b_orders")
        .hint("merge")
        .join(spark.table("b_lineitem").hint("merge"), "o_orderkey")
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.first("o_totalprice").alias("total"),
        )
    )
    tree = plan_of(j, "simple")
    assert "SortMergeJoin" in tree
    assert "Exchange" not in tree, (
        "bucketed scan must feed both the join AND the groupBy with no "
        "shuffle"
    )
    # sanity: result matches the unbucketed computation
    plain = (
        orders.join(li, "o_orderkey")
        .groupBy("o_orderkey")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.first("o_totalprice").alias("total"),
        )
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_ivf_indexed_scan_prunes_partitions(spark):
    """The persisted IVF index is PARTITIONED by list_id; a query probing
    n_probe lists must read only those list directories (partition
    pruning: the probe set appears in PartitionFilters and the scanned
    files live under exactly the probed list_id= directories), and it
    must return exactly what the scan-time ivf_topk returns at the same
    parameters."""
    import re

    from ocr_spark.operators.similarity import (
        DEFAULT_PROBE,
        _ivf_index_path,
        ivf_indexed_topk,
        ivf_topk,
    )

    df = ivf_indexed_topk(spark, SF)
    tree = plan_of(df, "formatted")
    # the probe set rides in PartitionFilters — applied at FILE LISTING
    # (FileSourceScanExec prunes partition dirs before any task runs),
    # so this line IS the only-probed-directories-read evidence
    assert re.search(r"PartitionFilters: \[.*list_id.* IN \(", tree), tree
    # and the probed slice is a strict subset of the index
    from pyspark.sql import functions as F

    idx = spark.read.parquet(_ivf_index_path(spark, SF))
    n_lists = idx.select("list_id").distinct().count()
    probed = re.search(r"list_id.* IN \(([0-9,]+)\)", tree).group(1)
    assert 0 < len(probed.split(",")) <= DEFAULT_PROBE
    assert (
        idx.filter(F.col("list_id").isin([int(x) for x in probed.split(",")]))
        .count()
        < idx.count()
    )
    assert n_lists > DEFAULT_PROBE  # pruning is non-vacuous
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in ivf_topk(spark, SF).collect()
    ]


def test_table_profile_crafted_nulls_and_types(spark):
    """Profiler counts on a crafted frame with nulls, duplicate values,
    and all four canonicalization classes."""
    import datetime

    from ocr_spark.operators.relational import table_profile

    df = spark.createDataFrame(
        [
            (1, 2.5, "a", datetime.datetime(2024, 1, 1, 0, 0, 1)),
            (1, None, "b", datetime.datetime(2024, 1, 2, 0, 0, 2)),
            (3, -1.25, None, None),
        ],
        "k long, v double, s string, t timestamp",
    )
    rows = {r["column_name"]: r for r in table_profile(df, "t").collect()}
    assert rows["k"]["n_rows"] == 3
    assert rows["k"]["n_null"] == 0 and rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_val"] == "1" and rows["k"]["max_val"] == "3"
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 2
    assert rows["v"]["min_val"] == "-125" and rows["v"]["max_val"] == "250"
    assert rows["s"]["n_null"] == 1
    assert rows["s"]["min_val"] == "a" and rows["s"]["max_val"] == "b"
    assert rows["t"]["n_null"] == 1
    assert rows["t"]["min_val"] == "1704067201"


def test_salted_join_shuffle_hash_no_broadcast(spark):
    """The salted-join demo is only honest if the salt actually reaches
    the shuffle: pin a ShuffledHashJoin on (p_partkey, salt) and the
    absence of a broadcast that would bypass the salting."""
    from ocr_spark.operators.relational import skew_salted_join

    plan = plan_of(skew_salted_join(spark, SF), "simple")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "salt" in plan


def test_asof_join_semantics_crafted(spark):
    """Hand-built as-of cases: exact-timestamp match counts, later events
    don't, equal-timestamp events resolve to max event_id, and a user
    with no prior event yields nulls."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    ev = spark.createDataFrame(
        [
            (1, ts(10), 100, "a", 1.0),
            (1, ts(10), 101, "b", 2.0),   # same ts: max event_id wins
            (1, ts(30), 102, "c", 3.0),   # after the order: ignored
            (2, ts(5), 200, "d", 4.0),
        ],
        "user_id long, ts timestamp, event_id long, "
        "event_type string, value double",
    )
    orders = spark.createDataFrame(
        [(7, 1, ts(10)), (8, 2, ts(4)), (9, 3, ts(20))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="asof_")
    ev.write.mode("overwrite").parquet(f"{d}/events.parquet")
    orders.select(
        "o_orderkey", "o_custkey", "o_orderdate"
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")

    from ocr_spark.operators.relational import asof_join_order_events

    rows = {
        r["o_orderkey"]: r for r in asof_join_order_events(spark, d).collect()
    }
    assert rows[7]["last_event_id"] == 101  # ts-equal, max event_id
    assert rows[7]["last_event_type"] == "b"
    assert rows[8]["last_event_id"] is None  # order precedes all events
    assert rows[9]["last_event_id"] is None  # user never seen


def test_source_mix_rebalance_broadcast_rates(spark):
    """The rebalance gate must broadcast the tiny rate table — the
    corpus side is never shuffled (the whole point of the two-pass
    shape)."""
    from ocr_spark.operators.text_analysis import source_mix_rebalance

    df = source_mix_rebalance(spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert 0 < len(rows)
    # higher-index sources get higher target weight -> rate24 increases
    rates = {r["source"]: r["rate24"] for r in rows}
    import re as _re

    ordered = sorted(rates, key=lambda s: int(_re.findall(r"\d+", s)[0]))
    vals = [rates[s] for s in ordered]
    assert vals == sorted(vals)


def test_scd2_intervals_chain(spark):
    """SCD-2 invariants: per key, exactly one open (current) interval,
    and each valid_to equals the next interval's valid_from."""
    from collections import defaultdict

    from ocr_spark.operators.relational import scd2_intervals

    rows = scd2_intervals(spark, SF).collect()
    by_key = defaultdict(list)
    for r in rows:
        by_key[r["o_custkey"]].append(r)
    for key, ivs in by_key.items():
        assert sum(1 for r in ivs if r["is_current"] == 1) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert ivs[-1]["valid_to"] is None


def test_knn_graph_equi_join_and_k_bound(spark):
    """kNN graph must join on list_id (no cartesian / nested loop) and
    emit at most k rows per src with ranks 1..k over rounded cosine."""
    from collections import Counter

    from ocr_spark.operators.similarity import KNN_K, knn_graph

    df = knn_graph(spark, SF)
    plan = plan_of(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows, "sf0.001 embeddings should produce neighbor rows"
    per_src = Counter(r["src"] for r in rows)
    assert max(per_src.values()) <= KNN_K
    for r in rows:
        assert 1 <= r["rank"] <= KNN_K


def test_zorder_skips_files_on_the_second_dimension(spark, tmp_path):
    """Z-ordered layout: a range filter on the SECOND key touches few
    files (each file is a small (a, b) rectangle), while the
    single-column-sorted layout must read every file (each spans the
    full b range).  This is the footer-stats skipping a scan performs
    with PushedFilters — measured here directly from the file min/max."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ocr_spark.operators.relational import write_zordered

    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("long").alias("b"),
    )
    zdir = str(tmp_path / "z")
    adir = str(tmp_path / "a")
    write_zordered(df, zdir, "a", "b", n_files=16, bits=6)
    (
        df.repartitionByRange(16, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(adir)
    )

    def files_touched(d, b_lo, b_hi):
        n_total, n_hit = 0, 0
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(d, f), columns=["b"])
            if t.num_rows == 0:
                continue
            n_total += 1
            bmin, bmax = pc.min(t["b"]).as_py(), pc.max(t["b"]).as_py()
            if bmax >= b_lo and bmin <= b_hi:
                n_hit += 1
        return n_hit, n_total

    z_hit, z_total = files_touched(zdir, 0, 15)
    a_hit, a_total = files_touched(adir, 0, 15)
    assert a_hit == a_total, "a-sorted layout cannot skip on b"
    assert z_hit * 2 <= z_total, (z_hit, z_total)


def test_asof_join_single_key_shuffle_no_join(spark):
    """The union-window as-of encoding must stay join-free: one shuffle
    on the key for the window (plus the check-gate repartition tail),
    no join operator of any kind — the property that makes it safe
    where a range join would explode."""
    from ocr_spark.operators.relational import asof_join_order_events

    plan = plan_of(asof_join_order_events(spark, SF), "simple")
    assert "Join" not in plan
    assert plan.count("Exchange") == 2, plan


def test_funnel_depth_chaining_crafted(spark, tmp_path):
    """Stage order must be enforced: a view BEFORE the first click does
    not count, a purchase between click and view does not count, and
    each depth bucket lands exactly one crafted user."""
    import datetime as dt

    from ocr_spark.operators.relational import funnel_counts

    def ts(s):
        return dt.datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user 0: never clicks -> depth 0
        (1, ts(1), 0, "view", 0.0),
        # user 1: clicks only -> depth 1
        (2, ts(1), 1, "click", 0.0),
        (3, ts(0), 1, "view", 0.0),     # view BEFORE click: ignored
        # user 2: click then view; purchase came BETWEEN click and view
        # -> not after view -> depth 2
        (4, ts(1), 2, "click", 0.0),
        (5, ts(2), 2, "purchase", 0.0),
        (6, ts(3), 2, "view", 0.0),
        # user 3: full ordered funnel -> depth 3
        (7, ts(1), 3, "click", 0.0),
        (8, ts(2), 3, "view", 0.0),
        (9, ts(3), 3, "purchase", 0.0),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{d}/events.parquet")
    got = {
        r["funnel_depth"]: r["n_users"]
        for r in funnel_counts(spark, d).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}


def test_asof_join_matches_bruteforce_property(spark, tmp_path):
    """Property check: the union-window as-of join equals the O(n*m)
    python reference on a randomized-but-seeded instance with heavy
    timestamp ties."""
    import datetime as dt
    import random

    from ocr_spark.operators.relational import asof_join_order_events

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    ev = [
        (
            i,
            base + dt.timedelta(seconds=rng.randrange(20)),  # many ties
            rng.randrange(6),
            "e",
            float(i),
        )
        for i in range(60)
    ]
    orders = [
        (
            100 + j,
            rng.randrange(8),  # some users have no events
            base + dt.timedelta(seconds=rng.randrange(20)),
        )
        for j in range(40)
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(f"{d}/events.parquet")
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate timestamp"
    ).write.parquet(f"{d}/orders.parquet")

    def brute(ok, ck, od):
        cand = [e for e in ev if e[2] == ck and e[1] <= od]
        if not cand:
            return None
        best = max(cand, key=lambda e: (e[1], e[0]))
        return best[0]

    got = {
        r["o_orderkey"]: r["last_event_id"]
        for r in asof_join_order_events(spark, d).collect()
    }
    for ok, ck, od in orders:
        assert got[ok] == brute(ok, ck, od), (ok, ck, od)


def test_kmeans_improves_over_init(spark):
    """Lloyd sanity: total within-cluster squared distance under the
    trained centroids is at most the distance under the init centroids
    (monotone non-increase), and every vector gets a cluster in [0, K)."""
    from ocr_spark.operators.similarity import (
        KMEANS_K,
        _assign_expr,
        _emb_fixedpoint,
        kmeans_clusters,
    )
    from pyspark.sql import functions as F

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", _emb_fixedpoint(F.col("embedding")).alias("xi"))
    )
    init = [
        list(r["xi"])
        for r in sorted(
            emb.filter(F.col("vec_id") < KMEANS_K).collect(),
            key=lambda r: r["vec_id"],
        )
    ]
    d_init = (
        emb.withColumn("c", _assign_expr(init))
        .agg(F.sum(F.col("c")["d"])).collect()[0][0]
    )
    out = kmeans_clusters(spark, SF).collect()
    d_final = sum(r["dist_sq_micro"] for r in out)
    assert d_final <= d_init
    assert all(0 <= r["cluster"] < KMEANS_K for r in out)


def test_zvalue_interleave_roundtrip(spark):
    """zvalue is a bijection on [0,2^bits)²: decode by de-interleaving
    the bits in python and compare; also monotone within a fixed b for
    the high bit (spot ordering sanity)."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.relational import zvalue

    bits = 5
    df = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("a"),
        (F.col("id") / 32).cast("long").alias("b"),
    )
    rows = df.select("a", "b", zvalue(F.col("a"), F.col("b"), bits).alias("z")).collect()
    assert len({r["z"] for r in rows}) == 32 * 32  # injective

    def decode(z):
        a = b = 0
        for i in range(bits):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in rows:
        assert decode(r["z"]) == (r["a"], r["b"])


def test_shipping_priority_pushdown_no_nlj(spark):
    """Q3 shape: every per-table filter must reach its parquet scan, the
    top-10 must be TakeOrdered (no global sort materialization), and no
    join may degrade to a nested loop."""
    from ocr_spark.operators.relational import shipping_priority

    df = shipping_priority(spark, SF)
    plan = plan_of(df)
    assert "EqualTo(c_mktsegment,BUILDING)" in plan.replace(" ", "").replace(
        "'", ""
    ) or "c_mktsegment" in [
        ln for ln in plan.splitlines() if "PushedFilters" in ln
    ][0], "segment filter not pushed to the customer scan"
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), "shipdate not pushed"
    assert any("o_orderdate" in ln for ln in pushed), "orderdate not pushed"
    simple = plan_of(df, "simple")
    assert "TakeOrdered" in simple
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple


def test_late_order_priority_semi_join(spark):
    """Q4 shape: EXISTS must compile to a LEFT SEMI join — each order
    emits at most once no matter how many late lineitems it has."""
    from ocr_spark.operators.relational import late_order_priority

    plan = plan_of(late_order_priority(spark, SF), "simple")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_idle_rich_customers_anti_join(spark):
    """Q22 shape: NOT EXISTS must compile to a LEFT ANTI join on the
    custkey (never a pair materialization), and the scalar threshold
    rides in as a broadcast, not a collect."""
    from ocr_spark.operators.relational import idle_rich_customers

    plan = plan_of(idle_rich_customers(spark, SF), "simple")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # the 1-row threshold join is the only nested-loop-ish node allowed,
    # and it must be a broadcast of the single aggregate row
    assert "Broadcast" in plan


def test_interval_ship_demand_no_nlj(spark):
    """The bin-rewrite must hold: lineitem collapses to per-day partials
    BEFORE any join (partial_count in the pre-join agg), the interval
    side explodes via Generate, and the join is an equi-join — a range
    predicate would show up here as a nested loop."""
    from ocr_spark.operators.relational import interval_ship_demand

    df = interval_ship_demand(spark, SF)
    simple = plan_of(df, "simple")
    assert "Generate" in simple  # the 7-day interval explode
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    assert "partial_count" in plan_of(df), (
        "lineitem must aggregate to per-day rows before the join"
    )


def test_fuzzy_name_match_equi_join(spark):
    """SymSpell blocking must make edit-distance matching a pure
    equi-join: no nested loop, no cartesian, and no levenshtein call
    anywhere in the plan (the deletion-variant equality IS the
    distance-1 predicate at a length difference of 1)."""
    from ocr_spark.operators.dedup import fuzzy_name_match

    df = fuzzy_name_match(spark, SF)
    simple = plan_of(df, "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    assert "levenshtein" not in plan_of(df).lower()


def test_hash_sample_map_side_only(spark):
    """Deterministic hash sampling must stay map-side: scan -> filter ->
    project, with the ONLY exchange being the check-gate repartition(1)
    tail — no aggregate, no join, no key shuffle."""
    from ocr_spark.operators.text_analysis import hash_sample

    simple = plan_of(hash_sample(spark, SF), "simple")
    assert simple.count("Exchange") == 1          # the check-gate tail only
    assert "SinglePartition" in simple
    assert "HashAggregate" not in simple
    assert "Join" not in simple


def test_kmv_partial_dedup_before_shuffle(spark):
    """The KMV sketch's heavy step is the (event_type, hash) distinct —
    it must partial-aggregate map-side before its shuffle, and the
    exact-twin join must broadcast the tiny aggregate (never a shuffle
    of sketch-sized data against the fact table)."""
    from ocr_spark.operators.relational import kmv_distinct_users

    df = kmv_distinct_users(spark, SF)
    simple = plan_of(df, "simple")
    # distinct = partial + final HashAggregate pair around one Exchange
    assert simple.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple


def test_bloom_probe_broadcasts_filter(spark):
    """The bloom probe must broadcast the 64-word filter (never shuffle
    the probed side against it) and contain no nested loop."""
    from ocr_spark.operators.relational import bloom_semi_prune

    simple = plan_of(bloom_semi_prune(spark, SF), "simple")
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple
    assert "bit_or" in plan_of(bloom_semi_prune(spark, SF)).lower()


def test_global_rank_window_is_per_bucket(spark):
    """The two-pass rank must never fall back to a single-partition
    global window: the window partitions by bucket, the tiny offset
    table is broadcast, and there is no nested-loop join."""
    from ocr_spark.operators.relational import global_rank_two_pass

    df = global_rank_two_pass(spark, SF)
    simple = plan_of(df, "simple")
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple
    # The authoritative check: the big-table window's spec carries the
    # bucket PARTITION column ("windowspecdefinition(bucket#.., h#..L ASC");
    # the only partition-less window allowed is the O(RANK_BUCKETS)
    # offset cumulation, whose spec orders by bucket itself.
    import re

    ext = plan_of(df, "extended")
    assert re.search(
        r"windowspecdefinition\(bucket#\d+, h#\d+L? ASC", ext
    ), ext


def test_regional_revenue_broadcasts_dim_chain(spark):
    """Q5 shape: the region->nation->supplier chain must ride broadcast
    joins (the c_nationkey = s_nationkey equality as a second condition
    on the broadcast join, never a separate shuffle), the orders date
    filter must reach the parquet scan, and no nested loop may form."""
    from ocr_spark.operators.relational import regional_revenue

    df = regional_revenue(spark, SF)
    simple = plan_of(df, "simple")
    assert simple.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    fmt = plan_of(df)
    assert "PushedFilters" in fmt and "o_orderdate" in fmt


def test_triangle_count_joins_stay_keyed(spark):
    """Degree orientation must keep the wedge enumeration on hash joins:
    no cartesian/nested-loop anywhere, and the degree table rides a
    broadcast join onto the edges."""
    from ocr_spark.operators.relational import triangle_count

    plan = plan_of(triangle_count(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_prefix_filter_no_cartesian_and_partial_df(spark):
    """Candidate generation joins prefix postings on the shingle key —
    keyed joins only, and the df table aggregates map-side first."""
    from ocr_spark.operators.dedup import prefix_filter_jaccard

    plan = plan_of(prefix_filter_jaccard(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_new_analytics_plans_stay_keyed(spark):
    """Cohort, sliding-distinct, and market-basket must all run on keyed
    hash joins/aggregates — no cartesian/nested-loop anywhere, map-side
    partial aggregation present."""
    from ocr_spark.operators.relational import (
        cohort_retention,
        market_basket_pairs,
        sliding_distinct_users,
    )

    for q in (cohort_retention, sliding_distinct_users, market_basket_pairs):
        plan = plan_of(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "partial_count" in plan or "partial_sum" in plan, q.__name__


def test_pareto_two_pass_broadcast(spark):
    """Skyline must be the collapsed-frontier two-pass: corpus side
    broadcast-joins the tiny per-q table (no corpus shuffle on q, no
    cartesian)."""
    from ocr_spark.operators.text_analysis import pareto_frontier_docs

    simple = plan_of(pareto_frontier_docs(spark, SF), "simple")
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple


def test_theta_overlap_partial_agg_and_broadcast(spark):
    """Theta sketch: the (type, period, hash) distinct partial-aggregates
    before its shuffle; the exact twin joins by broadcast."""
    from ocr_spark.operators.relational import theta_sketch_overlap

    simple = plan_of(theta_sketch_overlap(spark, SF), "simple")
    assert simple.count("HashAggregate") >= 2
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple


def test_containment_posting_equi_join(spark):
    """Containment pairs join postings on the shingle KEY — an equi-join
    (SortMerge or ShuffledHash), never a nested-loop/cartesian pair
    enumeration."""
    from ocr_spark.operators.dedup import containment_pairs

    simple = plan_of(containment_pairs(spark, SF), "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    # equi-join on the shingle key; AQE may pick broadcast at this tiny
    # SF — any HASH-KEYED strategy passes, pair enumeration never does
    assert (
        "SortMergeJoin" in simple
        or "ShuffledHashJoin" in simple
        or "BroadcastHashJoin" in simple
    )


def test_paragraph_rebuild_partial_min_survivor(spark):
    """The survivor groupBy's min-struct must partial-aggregate map-side
    (hot boilerplate collapses before the exchange)."""
    from ocr_spark.operators.text_analysis import paragraph_dedup_rebuild

    formatted = plan_of(paragraph_dedup_rebuild(spark, SF), "formatted")
    assert "partial_min" in formatted


def test_mad_broadcasts_sketch_tables(spark):
    """MAD joins the per-type median/mad tables back by BROADCAST — the
    fact table never shuffles against sketch-sized state."""
    from ocr_spark.operators.relational import mad_outliers

    simple = plan_of(mad_outliers(spark, SF), "simple")
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple


def test_split_single_window_per_source(spark):
    """The split is one rank window per source shard + a broadcast of
    per-source counts — no global sort, no second corpus shuffle."""
    from ocr_spark.operators.text_analysis import train_val_test_split

    simple = plan_of(train_val_test_split(spark, SF), "simple")
    assert "BroadcastHashJoin" in simple
    assert "CartesianProduct" not in simple


def test_pit_join_single_key_shuffle(spark):
    """The PIT join is the union-window encoding: NO join node at all —
    one shuffle on the business key and a window carry."""
    from ocr_spark.operators.relational import pit_join_events_scd2

    simple = plan_of(pit_join_events_scd2(spark, SF), "simple")
    assert "Join" not in simple
    assert "Window" in simple


def test_rank_migrations_window_per_bucket(spark):
    """Round-4 gate: the six formerly-global-window operators must rank
    through the two-pass bucketed rank — in the analyzed plan the ONLY
    unpartitioned window spec allowed is the O(n_buckets) offset
    cumulation, whose spec orders by the bucket column itself (_rb)."""
    import re

    from ocr_spark.operators.relational import (
        gini_concentration,
        ltv_deciles,
        psi_drift,
    )
    from ocr_spark.operators.text_analysis import (
        corpus_shuffle_shards,
        heaps_vocab_growth,
        quantile_normalize_length,
    )

    for fn in (
        ltv_deciles,
        gini_concentration,
        psi_drift,
        quantile_normalize_length,
        heaps_vocab_growth,
        corpus_shuffle_shards,
    ):
        ext = plan_of(fn(spark, SF), "extended")
        unpart = re.findall(
            r"windowspecdefinition\((\w+)#\d+L? (?:ASC|DESC)", ext
        )
        assert unpart and all(c == "_rb" for c in unpart), (
            fn.__name__,
            unpart,
        )


def test_topk_migrations_use_take_ordered(spark):
    """heavy_hitters / purchase_paths / vocab_coverage top-K must ride
    the distributed TakeOrderedAndProject heap (orderBy().limit()), and
    their only window may run on the ≤K survivors of that limit."""
    from ocr_spark.operators.relational import heavy_hitters, purchase_paths
    from ocr_spark.operators.text_analysis import vocab_coverage

    for fn in (heavy_hitters, purchase_paths, vocab_coverage):
        simple = plan_of(fn(spark, SF), "simple")
        assert "TakeOrderedAndProject" in simple, fn.__name__


def test_no_unannotated_global_window_sources():
    """Source-level guard for the scale-shape convention: every
    ``Window.orderBy(`` site in the package (an unpartitioned window)
    must carry a ``# tiny-window:`` annotation within the three
    preceding lines stating why its input is bounded (calendar /
    bucket-count / post-limit / per-source cardinality).  Windows over
    corpus-cardinality input must use bucketed_global_rank /
    bucketed_exclusive_cumsum instead."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "ocr_spark"
    bad = []
    for path in sorted(root.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line:
                continue
            ctx = lines[max(0, i - 3) : i + 1]
            if not any("# tiny-window:" in c for c in ctx):
                bad.append(f"{path.name}:{i + 1}")
    assert not bad, (
        "unannotated unpartitioned Window.orderBy sites "
        f"(use bucketed_global_rank or annotate # tiny-window:): {bad}"
    )


def test_bucketed_rank_matches_global_window(spark):
    """Property gate: bucketed_global_rank / bucketed_exclusive_cumsum
    are bit-equal to the naive single-partition window on a crafted
    table with heavy value ties and negative values."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ocr_spark.operators.relational import (
        bucketed_exclusive_cumsum,
        bucketed_global_rank,
    )

    rows = [(i, (i * 37) % 11 - 5, (i * 13) % 7) for i in range(257)]
    df = spark.createDataFrame(rows, "id long, v long, amt long")
    got = {
        r["id"]: r["rk"]
        for r in bucketed_global_rank(df, "v", "id").collect()
    }
    # tiny-window: 257-row crafted test table
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w)).collect()
    }
    assert got == want

    got_d = {
        r["id"]: r["rk"]
        for r in bucketed_global_rank(
            df, "v", "id", descending=True
        ).collect()
    }
    # tiny-window: 257-row crafted test table
    wd = Window.orderBy(F.desc("v"), "id")
    want_d = {
        r["id"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(wd)).collect()
    }
    assert got_d == want_d

    got_c = {
        r["id"]: r["off"]
        for r in bucketed_exclusive_cumsum(df, "id", "amt", "off").collect()
    }
    # tiny-window: 257-row crafted test table
    wc = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want_c = {
        r["id"]: r["off"]
        for r in df.select(
            "id",
            F.coalesce(F.sum("amt").over(wc), F.lit(0)).alias("off"),
        ).collect()
    }
    assert got_c == want_c

    # empty input must not throw (repo-wide invariant)
    empty = spark.createDataFrame([], "id long, v long, amt long")
    assert bucketed_global_rank(empty, "v", "id").count() == 0
    assert (
        bucketed_exclusive_cumsum(empty, "id", "amt", "off").count() == 0
    )


def test_hybrid_rrf_windows_ride_take_ordered_lists(spark):
    """Both retrieval signals feeding the RRF fusion must be bounded
    top-K lists BEFORE any rank window: the plan carries (at least) the
    BM25 TakeOrdered heap, the brute-cosine TakeOrdered heap, and the
    final fused-ranking heap — so no window ever spans the scored
    corpus."""
    from ocr_spark.operators.text_analysis import hybrid_rrf_search

    simple = plan_of(hybrid_rrf_search(spark, SF), "simple")
    assert simple.count("TakeOrderedAndProject") >= 3, simple


def test_semdedup_prune_cluster_equi_join(spark):
    """SemDeDup's prune stage must be ONE cluster-keyed equi-join (no
    cartesian / nested-loop pair generation), with a partial min
    before the pruned-by aggregation's shuffle."""
    from ocr_spark.operators.similarity import semdedup_prune

    plan = plan_of(semdedup_prune(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the self-join runs on the cluster key (hashpartitioning or a
    # broadcast of one side at fixture scale — never an all-pairs loop)
    assert "cluster" in plan
    assert "partial_min" in plan_of(semdedup_prune(spark, SF), "simple")


def test_audio_features_map_side_only(spark):
    """Audio decode + windowed features are map-side mapInPandas; the
    only exchange in the plan is the deterministic check-gate sort
    (round-robin partitioning), never a hash shuffle of PCM payloads."""
    from ocr_spark.operators.media import audio_features

    plan = plan_of(audio_features(spark, SF), "simple")
    assert plan.count("MapInPandas") == 2  # encode fixture + features
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # filter reaches the scan; only round-robin + check-gate exchanges
    fmt = plan_of(audio_features(spark, SF), "formatted")
    assert "PushedFilters: [IsNotNull(c_custkey)]" in fmt
    assert fmt.count("Exchange") <= 4  # 2 nodes x (tree + detail)


def test_caption_consistency_map_side_only(spark):
    """Caption fixture + checker are two mapInPandas stages carrying
    the (binary, string) multimodal row — no hash shuffle of payloads;
    the only exchanges are round-robin spread + the check-gate sort."""
    from ocr_spark.operators.media import caption_consistency

    plan = plan_of(caption_consistency(spark, SF), "simple")
    assert plan.count("MapInPandas") == 2  # captioned fixture + checker
    assert "hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_kneser_ney_partial_agg_and_broadcast_total(spark):
    """KN rides ONE (w1,w2) count with a map-side partial; the type
    total is a 1-row broadcast (never a shuffle), and no window
    appears anywhere in the plan."""
    from ocr_spark.operators.text_analysis import kneser_ney_bigram

    plan = plan_of(kneser_ney_bigram(spark, SF), "simple")
    assert "partial_count" in plan
    assert "BroadcastExchange" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_hits_normalization_broadcasts_max(spark):
    """Every HITS half-step's renormalizing max is a 1-row broadcast
    join; the score joins stay keyed (no nested-loop pair blowup) and
    no window appears."""
    from ocr_spark.operators.web_extract import hits_hubs_authorities

    plan = plan_of(hits_hubs_authorities(spark, SF), "simple")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


def test_anchor_text_window_is_per_target(spark):
    """The anchor-profile argmax is a per-dst aggregate (max of
    (cnt, term) struct) — no unpartitioned window, no cartesian."""
    from ocr_spark.operators.web_extract import anchor_text_aggregation

    plan = plan_of(anchor_text_aggregation(spark, SF), "simple")
    assert "Window" not in plan  # pure groupBy/agg formulation
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_encoding_repair_is_single_projection(spark):
    """Mojibake repair is one map-side projection over the scan: no
    joins, no aggregates, no UDFs — the only exchange is the
    check-gate sort."""
    from ocr_spark.operators.text_analysis import encoding_repair

    plan = plan_of(encoding_repair(spark, SF), "simple")
    assert "Join" not in plan
    assert "Aggregate" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1  # repartition(1) gate only


def test_cocitation_self_join_stays_keyed(spark):
    """Pair generation is an equi-join on the citing src (plus the
    a < b post-filter) — never a cartesian/nested-loop blowup — and
    no window appears anywhere."""
    from ocr_spark.operators.web_extract import cocitation_pairs

    plan = plan_of(cocitation_pairs(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan


def test_bitext_probe_side_broadcasts(spark):
    """Pair generation broadcasts the 64-row probe batch onto the
    target corpus — the corpus itself never shuffles for scoring; the
    only exchanges are the neighborhood-window/groupBy keys."""
    from ocr_spark.operators.similarity import bitext_mining

    plan = plan_of(bitext_mining(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # one lineage: scoring + neighborhoods are window aggs, no
    # join-back of the pair table — exactly the src + tgt scans
    assert plan.count("FileScan") == 2


def test_hashed_ngram_classify_single_shuffle(spark):
    """Scoring is map-side expression work collapsed by ONE partial-agg
    groupBy(doc_id): no joins, no windows, no weight-table exchange."""
    from ocr_spark.operators.text_analysis import hashed_ngram_classify

    plan = plan_of(hashed_ngram_classify(spark, SF), "simple")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial_sum" in plan


def test_t_closeness_grid_is_domain_bounded(spark):
    """The EMD grid builds from broadcast band/total aggregates (QI
    domain x band domain) — no corpus-cardinality join or global
    window."""
    from ocr_spark.operators.relational import t_closeness_audit

    plan = plan_of(t_closeness_audit(spark, SF), "simple")
    assert "BroadcastExchange" in plan
    assert "partial_count" in plan


def test_dp_noisy_counts_broadcast_interval_join(spark):
    """The 65-row noise table joins as a broadcast nested loop over the
    release-domain aggregate — constant work per released row."""
    from ocr_spark.operators.relational import dp_noisy_counts

    plan = plan_of(dp_noisy_counts(spark, SF), "simple")
    assert "BroadcastNestedLoopJoin" in plan
    assert "partial_count" in plan


def test_bleu_eval_single_corpus_scan_keyed_join(spark):
    """Candidate and reference n-gram counts flow through partial aggs
    and ONE keyed equi-join on (doc_id, n, gram) — no cartesian, no
    window."""
    from ocr_spark.operators.evalmetrics import bleu_eval

    plan = plan_of(bleu_eval(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial_sum" in plan or "partial_count" in plan


def test_weighted_sample_is_take_ordered(spark):
    """The sample must plan as TakeOrderedAndProject (per-partition
    heaps), never a global sort of the corpus."""
    from ocr_spark.operators.relational import weighted_sample_aes

    plan = plan_of(weighted_sample_aes(spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan


def test_ann_recall_eval_windows_partitioned_and_panel_broadcast(spark):
    """The recall eval must broadcast the bounded query panel against
    the corpus (never shuffle the corpus for scoring) and every window
    spec must lead with the qid partition key — no corpus-wide sort."""
    import re

    from ocr_spark.operators.similarity import ann_recall_eval

    df = ann_recall_eval(spark, SF)
    simple = plan_of(df, "simple")
    assert "BroadcastNestedLoopJoin" in simple or (
        "BroadcastHashJoin" in simple
    )
    ext = plan_of(df, "extended")
    specs = re.findall(r"windowspecdefinition\((\w+)#", ext)
    assert specs and all(c == "qid" for c in specs), specs


def test_triangle_count_all_equi_joins_no_window(spark):
    """Triangle counting must stay on hash equi-joins (degree-ordered
    wedge + closure) — no nested-loop/cartesian pair expansion and no
    window anywhere in the plan."""
    from ocr_spark.operators.web_extract import triangle_count

    df = triangle_count(spark, SF)
    simple = plan_of(df, "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    assert "Window" not in simple


def test_no_cartesian_product_anywhere_on_the_board(spark):
    """Board-wide plan lint: NO batch query may plan a CartesianProduct
    — every pair-expansion on the board must ride an equi-join
    (inverted index / band bucket / salt) or an explicit broadcast
    (which plans as BroadcastNestedLoopJoin, allowed for 1-row/tiny
    sides that are individually plan-pinned).  Streaming and the
    pipeline/eval queries are exercised by their own pinned tests."""
    import __spark_entry__ as entrymod

    skip_prefixes = ("stream_", "ocr_", "invoice_", "eval_", "save_")
    qs = {
        k: fn
        for k, fn in entrymod.queries().items()
        if not k.startswith(skip_prefixes)
    }
    assert len(qs) > 150
    offenders, errors = [], []
    for name, fn in sorted(qs.items()):
        try:
            tree = plan_of(fn(spark, SF), "simple")
        except Exception as exc:  # pragma: no cover - lint visibility
            errors.append(f"{name}: {type(exc).__name__}")
            continue
        if "CartesianProduct" in tree:
            offenders.append(name)
    assert not offenders, offenders
    # every query must at least BUILD its plan at sf0.001
    assert not errors, errors


def test_sixth_wave_plans_stay_keyed(spark):
    """The sixth-wave operators must all run on keyed hash joins and
    map-side partial aggregation — no CartesianProduct anywhere, and
    (except nDCG's deliberate tiny-broadcast query fan-out) no
    nested-loop join either."""
    from ocr_spark.operators.dedup import winnowing_near_dup
    from ocr_spark.operators.evalmetrics import chrf_eval, cohen_kappa
    from ocr_spark.operators.relational import (
        auc_rank_eval,
        hll_distinct_users,
        record_linkage_fs,
    )
    from ocr_spark.operators.text_analysis import (
        good_turing_bigrams,
        rake_keywords,
        texttiling_segments,
    )
    from ocr_spark.operators.web_extract import (
        degree_assortativity,
        link_prediction_jaccard,
    )

    keyed_only = (
        chrf_eval, winnowing_near_dup, hll_distinct_users, rake_keywords,
        texttiling_segments, record_linkage_fs, auc_rank_eval,
        cohen_kappa, good_turing_bigrams, link_prediction_jaccard,
        degree_assortativity,
    )
    for q in keyed_only:
        plan = plan_of(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        if q is not record_linkage_fs:  # FS scoring is pure map-side:
            # one blocked equi-join, no aggregation stage at all
            assert (
                "partial_count" in plan or "partial_sum" in plan
            ), q.__name__


def test_ndcg_query_fanout_is_broadcast(spark):
    """nDCG fans the corpus out over the tiny query set via a BROADCAST
    nested loop (queries are O(NDCG_NQ) rows) — never a shuffled
    cartesian — and both rankings are windows partitioned by query."""
    from ocr_spark.operators.similarity import ndcg_eval

    plan = plan_of(ndcg_eval(spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_rake_stoplist_is_take_ordered_not_window(spark):
    """RAKE's generated stoplist must be the distributed TakeOrdered
    (orderBy().limit(N)), not a corpus-cardinality rank window."""
    from ocr_spark.operators.text_analysis import rake_keywords

    plan = plan_of(rake_keywords(spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_winnowing_fingerprints_one_mapside_pass():
    """Winnowing's gram digest must be computed ONCE per gram inside
    whole-stage codegen, and the fingerprint stage must contain NO
    interpreted array lambdas at all — r4 pinned md5-outside-the-
    window-lambda (51 s -> 9.6 s sf0.1); r5 removed the transform()
    HOFs entirely (205 s -> 52 s at the 10x corpus): selection is a
    per-doc sliding-window min over exploded gram rows.  Source-scan:
    exactly one md5 call site, zero transform( lambdas."""
    import inspect

    from ocr_spark.operators.dedup import winnowing_near_dup

    src = inspect.getsource(winnowing_near_dup)
    code = "\n".join(
        ln for ln in src.splitlines()
        if not ln.lstrip().startswith("#")
    )
    # strip the docstring before scanning for banned constructs
    code = code.split('"""')[2]
    assert code.count("md5(") == 1
    assert "transform(" not in code
    assert "array_min" not in code
    assert 'F.min("h").over' in code


def test_market_share_plan_broadcasts_every_dim(spark):
    """Q8 shape: part, supplier-nation, and the customer region gate
    all ride broadcast hash joins; lineitem x orders is the only
    shuffle join; no CartesianProduct, and the part filter is pushed
    to the parquet scan."""
    from ocr_spark.operators.relational import market_share

    df = market_share(spark, SF)
    simple = plan_of(df, "simple")
    assert "CartesianProduct" not in simple
    assert simple.count("BroadcastHashJoin") >= 3
    fmt = plan_of(df, "formatted")
    assert "EqualTo(p_type,PROMO)" in fmt, "part filter not pushed to scan"
    assert "GreaterThanOrEqual(o_orderdate,1996-01-01" in fmt, (
        "order-date filter not pushed to scan"
    )


def test_late_sole_supplier_plan_has_no_self_join(spark):
    """The Q21 rewrite must not plan the textbook double self-join:
    lineitem is scanned ONCE, there is no CartesianProduct, and the
    quantified predicates ride two keyed aggregations (per
    supplier-order, then per order)."""
    from ocr_spark.operators.relational import late_sole_supplier

    df = late_sole_supplier(spark, SF)
    simple = plan_of(df, "simple")
    assert "CartesianProduct" not in simple
    assert simple.count("lineitem.parquet") == 1
    # two keyed aggregation levels replace EXISTS / NOT EXISTS
    assert simple.count("HashAggregate") >= 4  # 2 aggs x partial+final


def test_jl_projection_plan_is_one_narrow_map(spark):
    """JL projection is a pure map: no join, no aggregate, and the only
    exchange is the deterministic-output repartition(1) tail."""
    from ocr_spark.operators.similarity import jl_projection

    df = jl_projection(spark, SF)
    simple = plan_of(df, "simple")
    assert "Join" not in simple
    assert "HashAggregate" not in simple
    assert simple.count("Exchange") == 1


def test_single_source_parts_single_fact_scan(spark):
    """The Q20 decorrelation claim: lineitem is scanned ONCE (the
    per-part totals re-aggregate the pair table), dims ride broadcast
    joins, no CartesianProduct."""
    from ocr_spark.operators.relational import single_source_parts

    df = single_source_parts(spark, SF)
    simple = plan_of(df, "simple")
    assert simple.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in simple
    assert simple.count("BroadcastHashJoin") >= 2


def test_multi_touch_attribution_windows_stay_bounded(spark):
    """Attribution windows partition by conversion id (bounded group:
    one user's touches in one lookback window) — never an unpartitioned
    corpus window — and the lookback join is a user-keyed equi-join,
    not a nested loop."""
    from ocr_spark.operators.relational import multi_touch_attribution

    df = multi_touch_attribution(spark, SF)
    simple = plan_of(df, "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    for line in simple.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "conv_id" in line


def test_q2_q11_q18_plan_shapes(spark):
    """The decorrelation catalog's plan claims: Q2 has ZERO join-back
    (one fact aggregate + one broadcast name join), Q11's scalar total
    re-aggregates the part table (one fact scan), Q18 filters before
    any dimension join (no CartesianProduct anywhere)."""
    from ocr_spark.operators.relational import (
        large_volume_orders,
        min_cost_supplier,
        revenue_concentrated_parts,
    )

    q2 = plan_of(min_cost_supplier(spark, SF), "simple")
    assert q2.count("lineitem.parquet") == 1
    assert q2.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in q2

    q11 = plan_of(revenue_concentrated_parts(spark, SF), "simple")
    # the checkpointed part aggregate is the only upstream: the fact
    # scan happens once, at checkpoint time, not per reference
    assert q11.count("lineitem.parquet") == 0
    assert q11.count("ExistingRDD") == 2  # both consumers reuse it
    assert "CartesianProduct" not in q11

    q18 = plan_of(large_volume_orders(spark, SF), "simple")
    assert "CartesianProduct" not in q18
    # the HAVING filter sits on the aggregate, before the joins
    assert "Filter" in q18


def test_q6_filters_reach_scan_single_row_agg(spark):
    """Q6 is a pure scan: the shipdate/quantity predicates must be
    PushedFilters on the parquet scan, and the only exchange is the
    single-partition final-agg gather — no hash shuffle of data."""
    from ocr_spark.operators.relational import forecast_revenue

    plan = plan_of(forecast_revenue(spark, SF))
    scan = plan[plan.index("Scan parquet"):]
    pushed = scan[scan.index("PushedFilters"):].splitlines()[0]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    assert plan.count("Exchange (") == 1  # one node in the plan tree
    assert "SinglePartition" in plan


def test_q10_topn_is_take_ordered(spark):
    """Q10's top-20 customers must be TakeOrderedAndProject (per-
    partition heaps), never a global sort or rank window."""
    from ocr_spark.operators.relational import returned_items

    plan = plan_of(returned_items(spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_q17_broadcasts_part_and_coshuffles_on_partkey(spark):
    """Q17's decorrelation: the brand-filtered part list broadcasts
    onto the fact scan, and the rows-vs-group-average self-join rides
    partkey hash exchanges — never a nested-loop re-evaluation of the
    per-part average."""
    from ocr_spark.operators.relational import small_qty_revenue

    plan = plan_of(small_qty_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q19_or_predicates_stay_residual_on_equi_join(spark):
    """Q19's OR-of-ANDs must NOT degrade the join: the part join stays
    a broadcast HASH join on partkey (the OR rides as a residual
    filter), and the lineitem scan carries the pushed quantity
    envelope."""
    from ocr_spark.operators.relational import disjunctive_revenue

    plan = plan_of(disjunctive_revenue(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    scan = plan[plan.index("Scan parquet"):]
    pushed = scan[scan.index("PushedFilters"):].splitlines()[0]
    assert "l_quantity" in pushed


def test_q15_scalar_max_is_broadcast_not_window(spark):
    """Q15's revenue-view max must come back as a broadcast join
    against the 1-row aggregate — no rank window over suppliers and no
    second scan of lineitem."""
    from ocr_spark.operators.relational import top_supplier_revenue

    plan = plan_of(top_supplier_revenue(spark, SF))
    assert "Window" not in plan
    # lineitem was read ONCE at the revenue-view checkpoint; the query
    # plan re-reads only the materialized O(suppliers) RDD for both the
    # max and the equality join (itself a broadcast HASH join)
    assert plan.count("lineitem.parquet") == 0
    assert "ExistingRDD" in plan
    assert plan.count("supplier.parquet") == 1
    assert "BroadcastHashJoin" in plan


def test_tenth_wave_plans_stay_keyed(spark):
    """Tenth-wave operators ride keyed hash joins: the geo family's
    3x3-cell replication must plan as an equi-join on the cell key
    (never a nested loop), the co-visitation chain is window+partial
    agg, and the dup matrix / kfold / soft-dedup reuse the pinned LSH
    shapes."""
    from ocr_spark.operators.dedup import (
        cross_source_dup_matrix,
        group_kfold_split,
        soft_dedup_weights,
    )
    from ocr_spark.operators.relational import (
        geo_cell_pairs,
        geo_dbscan,
        session_covisitation,
    )
    from ocr_spark.operators.text_analysis import padding_waste_audit
    from ocr_spark.operators.web_extract import (
        crawl_frontier,
        louvain_one_level,
    )

    for q in (geo_cell_pairs, session_covisitation, padding_waste_audit,
              soft_dedup_weights, group_kfold_split,
              cross_source_dup_matrix):
        plan = plan_of(q(spark, SF))
        assert "CartesianProduct" not in plan, q.__name__
        assert "NestedLoop" not in plan, q.__name__
    for q in (geo_dbscan, crawl_frontier, louvain_one_level):
        # iterative ops: lint the SIMPLE plan (localCheckpoint tails)
        plan = plan_of(q(spark, SF), "simple")
        assert "CartesianProduct" not in plan, q.__name__
        assert "NestedLoop" not in plan, q.__name__
    # the grid join keys on the (cx, cy) cell pair
    gp = plan_of(geo_cell_pairs(spark, SF))
    assert "cx" in gp and "cy" in gp


def test_no_unannotated_global_sort_tails():
    """Source-level guard for the check-gate tail convention
    (BASELINE.md): a terminal global ``.orderBy(`` on a DataFrame
    triggers a RangePartitioner sampling pass that executes the child
    plan twice.  Check-gate tails must use
    ``repartition(1).sortWithinPartitions`` instead.  Allowed
    ``.orderBy(`` forms: Window specs (``Window.`` on the line or in
    the 3 preceding chain lines, or a frame spec in the 3 following),
    top-K heads (``.limit(`` within 3 lines → TakeOrderedAndProject),
    and sites annotated ``# global-sort: <why bounded/intended>``."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "ocr_spark"
    bad = []
    for path in sorted(root.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if ".orderBy(" not in line or "Window" in line or "``" in line:
                continue
            prev = lines[max(0, i - 3) : i]
            nxt = lines[i : i + 4]
            if any(
                "Window.partitionBy(" in c
                or "Window.orderBy(" in c
                or "= Window" in c
                for c in prev
            ):
                continue
            if any(
                ".rowsBetween(" in c or ".rangeBetween(" in c for c in nxt
            ):
                continue
            if any(".limit(" in c for c in nxt):
                continue
            if any("# global-sort:" in c for c in prev + [line]):
                continue
            bad.append(f"{path.name}:{i + 1}")
    assert not bad, (
        "terminal global .orderBy( sites (use "
        "repartition(1).sortWithinPartitions or annotate "
        f"# global-sort:): {bad}"
    )


def test_suffix_array_plans_keyed_only(spark):
    """Suffix-array ops must move only integer ranks through keyed
    shuffles: no CartesianProduct/NestedLoop anywhere, and the
    exact-span pipeline's doubling joins key on (doc_id, p)."""
    from ocr_spark.operators.dedup import (
        exact_substring_spans,
        suffix_array_ranks,
    )

    p = plan_of(exact_substring_spans(spark, SF))
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    # iterative op: lint the SIMPLE plan (localCheckpoint tails)
    ps = plan_of(suffix_array_ranks(spark, SF), "simple")
    assert "CartesianProduct" not in ps and "NestedLoop" not in ps


def test_excision_and_sprt_plans(spark):
    """exact_substring_excision: keyed joins only, no text-side
    cartesian; sequential_sign_test: one scan + calendar-bounded
    windows, no CartesianProduct."""
    from ocr_spark.operators.dedup import exact_substring_excision
    from ocr_spark.operators.relational import sequential_sign_test

    for q in (exact_substring_excision, sequential_sign_test):
        p = plan_of(q(spark, SF))
        assert "CartesianProduct" not in p, q.__name__
        assert "NestedLoop" not in p, q.__name__
