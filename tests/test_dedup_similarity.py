"""Tests for dedup / similarity kernels, including scale-shape guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vmware_graph_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash,
)
from vmware_graph_spark.operators.similarity import cosine_topk, ivf_topk


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "totally different content about spark engines"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        ["id", "text"],
    )


def test_exact_dedup_min_id_survives(docs):
    out = exact_dedup(docs, "id", "text")
    assert sorted(r.id for r in out.collect()) == [1, 2, 3]


def test_jaccard_pairs_finds_near_dup(docs):
    out = jaccard_pairs(docs, "id", "text", n=2, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b): r.jaccard for r in out}
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and 0.5 <= pairs[(1, 2)] < 1.0


def test_jaccard_max_df_prunes_hot_shingles(spark):
    # 'common' appears in every doc; max_df=2 removes it, so no pair
    # shares a shingle and the join produces nothing.
    df = spark.createDataFrame(
        [(1, "common a"), (2, "common b"), (3, "common c")], ["id", "text"]
    )
    assert jaccard_pairs(df, "id", "text", n=1, threshold=0.01, max_df=2).count() == 0


def test_minhash_signature_width(docs):
    sig = minhash_signatures(docs, "id", "text", n=2, num_hashes=8)
    row = sig.filter(F.col("id") == 1).collect()[0]
    assert len(row.sig) == 8
    # identical docs → identical signatures
    rows = {r.id: tuple(r.sig) for r in sig.collect()}
    assert rows[1] == rows[4]


def test_lsh_recovers_exact_and_near_dups(docs):
    out = minhash_lsh_pairs(docs, "id", "text", n=2, num_hashes=8, bands=4, verify_threshold=0.5)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 4) in pairs  # exact dup always collides in every band


def test_lsh_plan_has_no_full_shingle_selfjoin(docs):
    """Scale guard (VERDICT r1 #5): the verification join must be keyed
    on candidate ids — the physical plan must not contain a self-join of
    the shingle table on `shingle` alone. We assert the candidate-pair
    columns participate in every join with the shingle table."""
    out = minhash_lsh_pairs(docs, "id", "text", n=2, num_hashes=8, bands=4)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the only equi-join on 'shingle' must also involve an id key
    # (id_b), i.e. no join condition is shingle-only.
    for line in plan.splitlines():
        if "Join" in line and "shingle" in line and "band" not in line:
            assert "id_b" in line or "id_a" in line, line


def test_simhash_near_dups_close(docs):
    out = {r.id: r.simhash for r in simhash(docs, "id", "text").collect()}
    assert out[1] == out[4]
    ham_near = bin(out[1] ^ out[2]).count("1")
    ham_far = bin(out[1] ^ out[3]).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]),
            (4, [-1.0, 0.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )


def test_cosine_topk_exact(vecs):
    q = vecs.filter(F.col("vec_id") == 1)
    out = cosine_topk(q, vecs, id_col="vec_id", vec_col="embedding", k=2).collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(1, 1), (2, 2)]


def test_ivf_topk_prunes_other_buckets(vecs):
    q = vecs.filter(F.col("vec_id") == 1)
    out = ivf_topk(q, vecs, id_col="vec_id", vec_col="embedding", k=4, bucket_dims=1)
    ids = {r.neighbor_id for r in out.collect()}
    assert 4 not in ids  # negative-x bucket never probed
    assert 1 in ids and 2 in ids


def test_fuzzy_pairs_blocked_edit_distance(spark):
    from vmware_graph_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "red ring"),
            (2, "rad ring"),     # distance 1 to red ring
            (3, "blue widget"),
            (4, "blue ring"),    # distance 3 to red ring, same block
            (5, "red  ring"),    # double space: same tokens, distance 1
        ],
        ["id", "name"],
    )
    out = fuzzy_pairs(df, "id", "name", max_distance=2)
    pairs = {(r.id_a, r.id_b): r.distance for r in out.collect()}
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 5)] == 1
    assert (1, 4) not in pairs  # beyond radius
    assert (3, 4) not in pairs  # different block (widget vs ring)
    assert all(a < b for a, b in pairs)


def test_fuzzy_pairs_never_crosses_blocks(spark):
    """The candidate join is an equi-join on the blocking key — a pair
    with no shared block must be absent even at distance 0."""
    from vmware_graph_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame([(1, "alpha x"), (2, "alpha y")], ["id", "name"])
    assert fuzzy_pairs(df, "id", "name", max_distance=10).count() == 0


def test_fuzzy_pairs_banded_threshold_matches_plain_levenshtein(spark):
    """The banded levenshtein(threshold) rewrite must be row-identical
    to the plain form: beyond-threshold pairs return -1 and are dropped
    by the >= 0 guard exactly as the old <= max_distance filter dropped
    them, and surviving pairs carry their EXACT distance. Checked
    against an independently computed plain-Levenshtein reference over
    every same-block pair."""
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.dedup import fuzzy_pairs

    names = [
        (1, "silver metallic ring"),
        (2, "salver metallic ring"),   # distance 1
        (3, "silvery metallic ring"),  # distance 1 to 1, 2 to 2
        (4, "golden polished ring"),   # far from all, same block
        (5, "silver metallic rung"),   # different block (rung)
    ]
    df = spark.createDataFrame(names, ["id", "name"])
    got = {
        (r.id_a, r.id_b): r.distance
        for r in fuzzy_pairs(df, "id", "name", max_distance=2).collect()
    }
    # independent reference: plain levenshtein on every same-block pair
    t = df.select("id", "name", F.element_at(F.split("name", r"\s+"), -1).alias("blk"))
    ref_rows = (
        t.alias("a")
        .join(t.alias("b"), (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("d"),
        )
        .collect()
    )
    ref = {(r.id_a, r.id_b): r.d for r in ref_rows if r.d <= 2}
    assert got == ref
    assert (1, 2) in got and got[(1, 2)] == 1
    assert all(v >= 0 for v in got.values())  # no -1 sentinel leaks


def test_fuzzy_pairs_spreads_underparallel_probe_side(spark):
    """A single-partition input must not serialize the kernel: the plan
    carries a repartition exchange on the probe branch while the build
    side stays broadcastable (no second shuffle of the same rows)."""
    from vmware_graph_spark.operators.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [(i, f"name {i % 3}") for i in range(50)], ["id", "name"]
    ).coalesce(1)
    out = fuzzy_pairs(df, "id", "name", max_distance=2, spread=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan, plan[:2000]
    # results unaffected by the spread: same pair set as the 1-partition input implies
    assert out.count() > 0
    # opt-out (the default): no probe, no repartition — deep-lineage
    # inputs must not be physically planned twice (ADVICE r12)
    out_default = fuzzy_pairs(df, "id", "name", max_distance=2)
    plan_default = out_default._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" not in plan_default, plan_default[:2000]


def test_minhash_estimate_tracks_exact_jaccard(spark, docs):
    """Signature-only estimation: exact dups estimate 1.0; near-dups
    (8/10 shared tokens per 3-gram shift) land within 0.4 of exact; the
    unrelated doc never surfaces above the floor."""
    from vmware_graph_spark.operators.dedup import minhash_estimate_pairs

    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_estimate_pairs(
            docs, "id", "text", n=3, num_hashes=16, bands=4, min_estimate=0.0
        ).collect()
    }
    assert est[(1, 4)] == 1.0  # identical docs agree at every position
    assert (1, 3) not in est and (2, 3) not in est  # unrelated: no shared band
    if (1, 2) in est:
        exact = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in jaccard_pairs(docs, "id", "text", n=3, threshold=0.0).collect()
        }
        assert abs(est[(1, 2)] - exact[(1, 2)]) <= 0.4


def _live_plan_lines(plan: str) -> list[str]:
    """Plan lines excluding InMemoryRelation subtrees: an
    InMemoryTableScan renders its cached build plan inline (once per
    scan), but that subtree executes at most once — the scans read
    blocks. Counting nodes inside it would charge the build N times."""
    out, skip_col = [], None
    for line in plan.splitlines():
        marker = line.find("+- ")
        col = marker if marker >= 0 else 0
        if skip_col is not None:
            if marker >= 0 and col <= skip_col:
                skip_col = None
            else:
                continue
        if "InMemoryRelation" in line:
            skip_col = col
            continue
        out.append(line)
    return out


def test_minhash_estimate_plan_never_touches_shingles_for_scoring(spark, docs):
    """The scoring join must read signatures only: after the bucket
    join, no explode of shingle arrays may appear downstream. The sig
    table is pinned DISK_ONLY (operators/pin.pinned_lazy), so its
    shingle-building explode lives inside an InMemoryRelation computed
    once; outside the cache only the two band-struct explodes (one per
    self-join side) may appear."""
    from vmware_graph_spark.operators.dedup import minhash_estimate_pairs

    df = minhash_estimate_pairs(docs, "id", "text", n=3, num_hashes=8, bands=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    live = "\n".join(_live_plan_lines(plan))
    assert live.count("Generate explode") <= 2, plan
    # every shingle-building explode is under the cache barrier
    for line in _live_plan_lines(plan):
        if "Generate explode" in line:
            assert "shingle" not in line, line


def test_dedup_against_flags_exact_near_and_kept(spark):
    from vmware_graph_spark.operators.dedup import dedup_against

    ref = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog"),
            (102, "completely unrelated reference material here"),
        ],
        ["id", "text"],
    )
    new = spark.createDataFrame(
        [
            (1, "The  quick brown fox jumps over the lazy dog"),  # exact (normalized)
            (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 101
            (3, "entirely novel content with fresh wording"),     # kept
        ],
        ["id", "text"],
    )
    got = {
        r["id"]: (r["exact_dup"], r["near_dup"], r["kept"])
        for r in dedup_against(
            new, ref, "id", "text", n=3, num_hashes=16, bands=8,
            verify_threshold=0.3,
        ).collect()
    }
    assert got[1][0] is True and got[1][2] is False
    assert got[2] == (False, True, False)
    assert got[3] == (False, False, True)


def test_dedup_against_never_self_pairs_reference(spark):
    """The reference corpus must not join against itself: with two
    identical ref docs and one unrelated new doc, no candidate pair
    forms and every new row is kept."""
    from vmware_graph_spark.operators.dedup import dedup_against

    ref = spark.createDataFrame(
        [(101, "dup dup dup dup one two three"), (102, "dup dup dup dup one two three")],
        ["id", "text"],
    )
    new = spark.createDataFrame([(1, "nothing in common at all here")], ["id", "text"])
    out = dedup_against(new, ref, "id", "text", n=3, num_hashes=8, bands=4).collect()
    assert len(out) == 1 and out[0]["kept"] is True


def test_cosine_topk_arrow_matches_jvm_fold(spark):
    from vmware_graph_spark.operators.similarity import cosine_topk, cosine_topk_arrow

    vecs = [
        (i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 for j in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = df.filter("vec_id < 3")
    jvm = cosine_topk(q, df, id_col="vec_id", vec_col="embedding", k=5)
    arrow = cosine_topk_arrow(q, df, id_col="vec_id", vec_col="embedding", k=5)
    assert sorted(map(tuple, jvm.collect())) == sorted(map(tuple, arrow.collect()))


def test_cosine_topk_arrow_empty_queries(spark):
    from vmware_graph_spark.operators.similarity import cosine_topk_arrow

    df = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    out = cosine_topk_arrow(
        df.filter("vec_id < 0"), df, id_col="vec_id", vec_col="embedding", k=3
    )
    assert out.count() == 0


def test_pq_adc_recovers_cluster_structure(spark):
    from vmware_graph_spark.operators.similarity import pq_codebook, pq_encode, pq_topk

    # three well-separated clusters in 8-dim; PQ must keep neighbors
    # within-cluster despite 4-code-per-subspace compression.
    base = {0: [5.0] * 8, 1: [-5.0] * 8, 2: [5.0] * 4 + [-5.0] * 4}
    rows = [
        (c * 20 + i, [b + ((i * 7 + j) % 5) / 10.0 for j, b in enumerate(base[c])])
        for c in base
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = pq_codebook(df, "vec_id", "embedding", sublen=4, k=4, iters=4)
    codes = pq_encode(df, "vec_id", "embedding", cb)
    assert codes.count() == 60 * 2  # two subspaces per vector
    q = df.filter("vec_id IN (0, 20, 40)")
    top = pq_topk(q, codes, cb, id_col="vec_id", vec_col="embedding", k=5)
    for r in top.collect():
        assert r.neighbor_id // 20 == r.query_id // 20, r


def test_prefix_filtered_jaccard_equals_inverted_index(spark):
    """The PPJoin-style prefix filter is an algebraic rewrite: its
    output must equal the plain inverted-index join exactly, pair for
    pair, score for score."""
    from vmware_graph_spark.operators.dedup import jaccard_pairs, jaccard_pairs_prefix

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.4).collect()
    }
    pref = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_pairs_prefix(d, "doc_id", "text", n=3, threshold=0.4).collect()
    }
    assert base == pref
    assert len(base) > 0  # non-vacuous


def test_nn_descent_structure_and_recall(spark):
    """NN-Descent k-NN graph: k rows per node with deterministic
    ranking, and refinement recall@k vs exact brute-force well above
    the bucket-only baseline on the fixture embeddings."""
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.similarity import (
        cosine_topk,
        knn_graph_nn_descent,
    )
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = e.count()
    g = knn_graph_nn_descent(e, "vec_id", "embedding", dim=64, k=3, iters=2)
    rows = g.collect()
    # structure: <=k neighbors per node, no self-edges, ranks 1..k dense
    per = {}
    for r in rows:
        assert r.src != r.dst
        per.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert max(len(v) for v in per.values()) <= 3

    exact = cosine_topk(e, e, id_col="vec_id", vec_col="embedding", k=4)
    # drop self-match (rank 1 with cosine 1) to mirror the graph's no-self edges
    exact_pairs = {
        (r.query_id, r.neighbor_id)
        for r in exact.collect()
        if r.query_id != r.neighbor_id
    }

    def recall(iters):
        g2 = knn_graph_nn_descent(e, "vec_id", "embedding", dim=64, k=3, iters=iters)
        got = {(r.src, r.dst) for r in g2.collect()}
        return len(got & exact_pairs) / max(1, len(exact_pairs))

    # the fixture embeddings are i.i.d.-random (no neighborhood
    # structure for NN-Descent to exploit), so absolute recall is
    # data-limited; the property that must hold is that refinement
    # IMPROVES on the bucket-only seed, i.e. 2-hop candidates cross
    # seeding views (the transitive-closure trap this test pins).
    r0, r2 = recall(0), recall(2)
    assert r2 > r0, f"refinement did not improve: {r0} -> {r2} over {n} vectors"


def test_nn_descent_is_deterministic(spark):
    from vmware_graph_spark.operators.similarity import knn_graph_nn_descent
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = {tuple(r) for r in knn_graph_nn_descent(e, "vec_id", "embedding", dim=64, k=3).collect()}
    b = {tuple(r) for r in knn_graph_nn_descent(e, "vec_id", "embedding", dim=64, k=3).collect()}
    assert a == b


def test_knn_graph_extend_incremental_properties(spark):
    """Insertion keeps untouched adjacency verbatim, gives every new
    node ≤k ranked neighbors, and only re-ranks old nodes that gained
    a reverse edge."""
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.similarity import (
        knn_graph_extend,
        knn_graph_nn_descent,
    )
    from vmware_graph_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = e.filter(F.col("vec_id") < 450)
    batch = e.filter(F.col("vec_id") >= 450)
    g = knn_graph_nn_descent(
        corpus, "vec_id", "embedding", dim=64, k=3, iters=1, planes=6
    )
    out = knn_graph_extend(
        g, corpus, batch, "vec_id", "embedding", dim=64, k=3, planes=6
    )
    rows = out.collect()
    new_nodes = {r.src for r in rows if r.src >= 450}
    assert new_nodes == {r.vec_id for r in batch.select("vec_id").collect()}
    per = {}
    for r in rows:
        assert r.src != r.dst
        per.setdefault(r.src, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert max(len(v) for v in per.values()) <= 3
    # old nodes that got no reverse edge keep their exact base rows
    base = {(r.src, r.dst, r.cosine, r.rank) for r in g.collect()}
    got = {(r.src, r.dst, r.cosine, r.rank) for r in rows}
    rev_srcs = {r.dst for r in rows if r.src >= 450 and r.dst < 450}
    untouched_base = {t for t in base if t[0] not in rev_srcs}
    assert untouched_base <= got


def test_prepared_reference_decisions_identical_and_caller_owned(spark):
    """prepare_dedup_reference + dedup_against_prepared = the same
    per-document decisions as dedup_against (same dataflow, reference
    derived once), and the prepared artifacts are CALLER-owned: a
    batch-boundary release_pins() must not unpersist them (that is the
    whole point — the reference stays hot across batches), while
    release_dedup_reference does."""
    from vmware_graph_spark.operators.dedup import (
        dedup_against,
        dedup_against_prepared,
        prepare_dedup_reference,
        release_dedup_reference,
    )
    from vmware_graph_spark.operators.pin import release_pins

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    # expectations FIRST: dedup_against registers a registry pin whose
    # canonical plan equals the prepared shingle table, and Spark's
    # cache is PLAN-keyed — releasing that aliased pin inside the loop
    # would drop the shared entry (documented in
    # prepare_dedup_reference; the streaming sink's loop only ever
    # pins batch-plans, so the alias cannot arise there)
    batches = [docs.filter(F.col("doc_id") % 3 == m).limit(40) for m in (1, 2)]
    exp = [
        sorted(map(tuple, dedup_against(b, ref, "doc_id", "text").collect()))
        for b in batches
    ]
    release_pins()
    prepared = prepare_dedup_reference(ref, "doc_id", "text")
    try:
        for b, e in zip(batches, exp):
            got = sorted(
                map(tuple, dedup_against_prepared(b, prepared, "doc_id", "text").collect())
            )
            assert got == e
            release_pins()  # the batch boundary
            # caller-owned reference survives the boundary release
            assert prepared["shingles"].storageLevel.useDisk
            assert prepared["buckets"].storageLevel.useDisk
    finally:
        release_dedup_reference(prepared)
    assert not prepared["shingles"].storageLevel.useDisk


def test_release_pins_leaves_no_cached_relations(spark):
    """Bench-honesty contract (round 12): every persist-based pin a
    query builder creates must be registered with operators.pin, so
    release_pins() between timed invocations (bench.py/tools/qtime.py)
    restores per-invocation isolation — Spark's CacheManager matches
    cached relations by canonicalized PLAN, so an unregistered persist
    would let a later structurally-equal invocation read the previous
    invocation's blocks instead of recomputing from parquet. Covers the
    registry pins on the dedup hot path and the two formerly-raw
    persist sites (robots_filter's self-counted rules table; kcenter's
    vector table is the same pinned_lazy call path)."""
    from vmware_graph_spark.operators.crawl import robots_filter
    from vmware_graph_spark.operators.dedup import minhash_lsh_pairs
    from vmware_graph_spark.operators.pin import release_pins

    cm = spark._jsparkSession.sharedState().cacheManager()
    release_pins()
    assert cm.isEmpty(), "leftover cached relations from another test"

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    minhash_lsh_pairs(docs, "doc_id", "text").write.format("noop").mode(
        "overwrite"
    ).save()
    assert not cm.isEmpty()  # in-flight pins are cached during the run...
    assert release_pins() > 0
    assert cm.isEmpty()  # ...and fully reclaimed at the boundary

    urls = spark.createDataFrame(
        [("h", "/a"), ("h", "/b")], "host string, path string"
    )
    rules = spark.createDataFrame(
        [("h", "/a", False)], "host string, path_prefix string, allow boolean"
    )
    # rules_rows omitted -> the self-counting path persists the per-host
    # aggregate; it must register for release like every other pin
    robots_filter(urls, rules).write.format("noop").mode("overwrite").save()
    assert not cm.isEmpty()
    release_pins()
    assert cm.isEmpty()
