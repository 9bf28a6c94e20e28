"""Tests for the round-5 extension operators: retrieval (phrase /
boolean), record linkage, embedding PCA, time-series diagnostics
(CUSUM, seasonal z, OHLC), and cluster-ops tooling (compaction plan,
skew report, Bloom pruning, join-IVM, DP counts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vmware_graph_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Retrieval
# ---------------------------------------------------------------------------

def test_phrase_search_hits_actually_occur(spark):
    rows = QUERIES["phrase_search_bigram_documents"](spark, SF).collect()
    assert 0 < len(rows) <= 10
    phrase = rows[0]["bigram"]
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows:
        assert r["bigram"] == phrase
        toks = docs[r["doc_id"]].split()
        n = sum(
            1
            for i in range(len(toks) - 1)
            if f"{toks[i]} {toks[i + 1]}" == phrase
        )
        assert n == r["hits"] >= 1
    # descending hit order with doc_id tie-break
    hits = [(-r["hits"], r["doc_id"]) for r in rows]
    assert hits == sorted(hits)


def test_boolean_retrieval_semantics(spark):
    rows = QUERIES["boolean_retrieval_documents"](spark, SF).collect()
    assert rows
    t1, t2, t3 = rows[0]["t_and1"], rows[0]["t_and2"], rows[0]["t_not"]
    assert len({t1, t2, t3}) == 3
    docs = {
        r["doc_id"]: set(r["text"].split())
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {r["doc_id"] for r in rows}
    expect = {d for d, tk in docs.items() if t1 in tk and t2 in tk and t3 not in tk}
    assert got == expect


# ---------------------------------------------------------------------------
# Record linkage
# ---------------------------------------------------------------------------

def test_record_linkage_blocking_and_score(spark):
    rows = QUERIES["record_linkage_customer_supplier"](spark, SF).collect()
    assert rows
    cust = {
        r["c_custkey"]: r
        for r in spark.read.parquet(f"{SF}/customer.parquet").collect()
    }
    supp = {
        r["s_suppkey"]: r
        for r in spark.read.parquet(f"{SF}/supplier.parquet").collect()
    }
    for r in rows:
        c, s = cust[r["c_custkey"]], supp[r["s_suppkey"]]
        # blocked: pairs only ever come from the same nation block
        assert c["c_nationkey"] == s["s_nationkey"]
        cid = int(c["c_name"].rsplit("#", 1)[-1])
        sid = int(s["s_name"].rsplit("#", 1)[-1])
        score = (4.2 if cid % 100 == sid % 100 else -0.1)
        score += 2.6 if abs(round(c["c_acctbal"], 2) - round(s["s_acctbal"], 2)) < 50 else -0.3
        score += 1.7 if cid % 7 == sid % 7 else -0.2
        assert math.isclose(float(r["score"]), round(score, 1), abs_tol=1e-9)
        assert r["is_match"] == (1 if float(r["score"]) >= 8.0 else 0)
    scores = [-float(r["score"]) for r in rows]
    assert scores == sorted(scores)


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

def test_pca_eigenpair_property(spark):
    comp = QUERIES["pca_top_component_embeddings"](spark, SF).collect()
    cov = QUERIES["embedding_covariance_matrix"](spark, SF).collect()
    d = len(comp)
    v = [0.0] * d
    lam = comp[0]["eigenvalue"]
    for r in comp:
        v[r["dim"]] = r["loading"]
    c = {}
    for r in cov:
        c[(r["i"], r["j"])] = r["cov"]
        c[(r["j"], r["i"])] = r["cov"]
    # unit norm
    assert math.isclose(sum(x * x for x in v), 1.0, abs_tol=1e-4)
    # Av ~ lambda v (residual small relative to lambda)
    res = 0.0
    for i in range(d):
        av = sum(c[(i, j)] * v[j] for j in range(d))
        res += (av - lam * v[i]) ** 2
    assert math.sqrt(res) < 0.05 * abs(lam)
    # dominant: Rayleigh quotient of the found vector beats any axis vector
    for i in range(d):
        assert lam >= c[(i, i)] - 0.05 * abs(lam)


# ---------------------------------------------------------------------------
# Time-series diagnostics
# ---------------------------------------------------------------------------

def test_cusum_ends_at_zero(spark):
    rows = QUERIES["cusum_changepoint_daily_value"](spark, SF).collect()
    assert rows
    # sum of deviations from the grand mean telescopes to ~0
    assert abs(rows[-1]["cusum"]) < 1e-3
    days = [r["day"] for r in rows]
    assert days == sorted(days)


def test_seasonal_z_scores_standardized(spark):
    rows = QUERIES["seasonal_dow_anomalies"](spark, SF).collect()
    assert rows
    by_dow: dict[int, list[float]] = {}
    for r in rows:
        assert r["is_anomaly"] == (1 if abs(r["z"]) > 1.5 else 0)
        by_dow.setdefault(r["dow"], []).append(r["z"])
    # per-dow z-scores have ~zero mean and ~unit variance (population)
    for zs in by_dow.values():
        if len(zs) > 1:
            m = sum(zs) / len(zs)
            assert abs(m) < 1e-4
            assert math.isclose(
                sum((z - m) ** 2 for z in zs) / len(zs), 1.0, rel_tol=1e-3
            )


def test_ohlc_bounds(spark):
    rows = QUERIES["ohlc_daily_value_by_type"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1


# ---------------------------------------------------------------------------
# Cluster-ops tooling
# ---------------------------------------------------------------------------

def test_compaction_bins_conserve_and_fill(spark):
    rows = QUERIES["compaction_bins_plan"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    by_source: dict[str, int] = {}
    for r in rows:
        by_source[r["source"]] = by_source.get(r["source"], 0) + r["bin_chars"]
        # a bin only opens once the previous ones crossed the target:
        # every bin index is reachable, i.e. non-negative and bounded
        assert 0 <= r["bin"] <= totals[r["source"]] // 5000 + 1
    assert by_source == totals  # conservation: every char lands in a bin


def test_skew_report_consistency(spark):
    rows = {r["join_key"]: r for r in QUERIES["shuffle_skew_report"](spark, SF).collect()}
    for r in rows.values():
        assert r["p99_key_rows"] <= r["max_key_rows"]
        assert r["salt_factor"] >= 1
        assert r["skew_ratio"] >= 1.0  # max >= mean
        assert r["n_rows"] >= r["n_keys"]
    li = rows["lineitem.l_suppkey"]
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert li["n_rows"] == n


def test_bloom_prune_no_false_negatives(spark):
    r = QUERIES["bloom_prune_join_orders"](spark, SF).collect()[0]
    assert r["n_candidates"] >= r["n_true"]  # bloom never drops a member
    assert r["false_positives"] == r["n_candidates"] - r["n_true"]
    assert 0.0 <= r["fp_rate"] <= 1.0
    assert r["n_true"] <= r["n_customers"]


def test_ivm_equals_full_recompute(spark):
    got = {
        r["nation"]: (r["n_orders"], r["revenue"])
        for r in QUERIES["incremental_join_ivm_orders"](spark, SF).collect()
    }
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    nation = spark.read.parquet(f"{SF}/nation.parquet")
    full = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.round("o_totalprice", 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    )
    expect = {r["nation"]: (r["n_orders"], r["revenue"]) for r in full}
    assert got == expect


def test_dp_noise_bounded_and_seeded(spark):
    rows = QUERIES["dp_geometric_counts_by_type"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -16 <= r["noise"] <= 16
        assert r["n_noisy"] == r["n"] + r["noise"]
    # deterministic: same seed, same noise on re-run
    again = {r["event_type"]: r["noise"] for r in QUERIES[
        "dp_geometric_counts_by_type"](spark, SF).collect()}
    assert again == {r["event_type"]: r["noise"] for r in rows}


# ---------------------------------------------------------------------------
# Batch 2 (queries_ext4.py)
# ---------------------------------------------------------------------------

def test_cuped_reduces_between_user_noise(spark):
    rows = QUERIES["cuped_adjusted_ab_test"](spark, SF).collect()
    assert {r["cohort"] for r in rows} == {"A", "B"}
    thetas = {r["theta"] for r in rows}
    assert len(thetas) == 1  # theta is pooled, not per-cohort
    for r in rows:
        assert r["n_users"] > 0
        # the adjustment is a shift, not a rescale: same order of magnitude
        assert abs(r["mean_y_cuped"] - r["mean_y"]) < abs(r["mean_y"]) + 1e-6


def test_zorder_prunes_no_worse_than_natural(spark):
    rows = {r["layout"]: r for r in QUERIES["zorder_pruning_simulation"](spark, SF).collect()}
    assert rows["natural"]["n_groups"] == rows["zorder"]["n_groups"]
    # the whole point: Morton layout scans no more groups than natural
    assert rows["zorder"]["groups_scanned"] <= rows["natural"]["groups_scanned"]
    for r in rows.values():
        assert 0.0 <= r["scan_fraction"] <= 1.0


def test_golden_records_survivorship(spark):
    rows = QUERIES["golden_records_customers"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    by_key = {r["c_custkey"]: r for r in cust}
    for r in rows:
        assert r["n_members"] >= 2
        anchor = by_key[r["cluster_id"]]
        assert anchor["c_nationkey"] == r["c_nationkey"]
        assert r["canonical_name"] == anchor["c_name"]  # arg-min by key
        assert r["max_acctbal"] >= round(anchor["c_acctbal"], 2) - 0.01
    # cluster ids unique (each record belongs to exactly one cluster)
    ids = [r["cluster_id"] for r in rows]
    assert len(ids) == len(set(ids))


def test_skipgram_counts_match_python(spark):
    rows = QUERIES["skipgram_transitions_events"](spark, SF).collect()
    ev = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    from collections import Counter, defaultdict

    seqs = defaultdict(list)
    for r in ev:
        seqs[r["user_id"]].append(r["event_type"])
    c = Counter()
    for s in seqs.values():
        for i in range(len(s) - 2):
            c[(s[i], s[i + 2])] += 1
    for r in rows:
        assert c[(r["a"], r["b"])] == r["n"]


def test_conversion_latency_positive_and_ordered(spark):
    r = QUERIES["conversion_latency_percentiles"](spark, SF).collect()[0]
    assert 0 < r["n_converters"] <= r["n_viewers"]
    assert 0.0 < r["conv_rate"] <= 1.0
    assert 0.0 < r["p50_latency_s"] <= r["p90_latency_s"]


def test_calibration_bins_partition_corpus(spark):
    rows = QUERIES["score_calibration_bins"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r["frac_en"] <= 1.0
        # avg score lands inside its own bucket's [lo, hi) range
        assert r["bucket"] / 10 - 1e-6 <= r["avg_score"] <= (r["bucket"] + 1) / 10 + 1e-6


# ---------------------------------------------------------------------------
# Batch 3 (queries_ext5.py)
# ---------------------------------------------------------------------------

def test_streaming_ohlc_matches_batch(spark):
    got = {
        (r["event_type"], r["day"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in QUERIES["streaming_ohlc_daily_by_type"](spark, SF).collect()
    }
    expect = {
        (r["event_type"], r["day"]): (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in QUERIES["ohlc_daily_value_by_type"](spark, SF).collect()
    }
    assert got == expect


def test_l_diversity_flags_homogeneous_cells(spark):
    rows = QUERIES["l_diversity_audit_customers"](spark, SF).collect()
    cust = spark.read.parquet(f"{SF}/customer.parquet").collect()
    from collections import defaultdict

    cells = defaultdict(set)
    sizes = defaultdict(int)
    for c in cust:
        key = (c["c_nationkey"], int(c["c_acctbal"] // 1000))
        cells[key].add(c["c_mktsegment"])
        sizes[key] += 1
    flagged = {(r["c_nationkey"], r["bal_bucket"]) for r in rows}
    expect = {k for k, segs in cells.items() if len(segs) < 2}
    assert flagged == expect
    for r in rows:
        assert r["l_distinct"] == 1
        assert r["group_size"] == sizes[(r["c_nationkey"], r["bal_bucket"])]


def test_winsorized_mean_between_min_and_mean_bounds(spark):
    rows = QUERIES["winsorized_mean_value_by_type"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["cap_lo"] <= r["cap_hi"]
        # the winsorized mean lives inside the cap interval
        assert r["cap_lo"] - 1e-9 <= r["winsor_mean"] <= r["cap_hi"] + 1e-9


def test_bigram_lift_counts_and_ranking(spark):
    rows = QUERIES["bigram_lift_collocations"](spark, SF).collect()
    assert rows
    lifts = [-r["lift"] for r in rows]
    assert lifts == sorted(lifts)
    for r in rows:
        assert r["n_ab"] >= 3
        assert r["lift"] > 0


def test_allen_relations_partition_all_pairs(spark):
    rows = QUERIES["allen_interval_relations_users"](spark, SF).collect()
    total = sum(r["n"] for r in rows)
    iv = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .count()
        .groupBy("day")
        .count()
        .collect()
    )
    expect = sum(r["count"] * (r["count"] - 1) // 2 for r in iv)
    assert total == expect  # the 13 relations partition every pair
    names = {r["relation"] for r in rows}
    allen = {
        "equals", "precedes", "preceded_by", "meets", "met_by", "starts",
        "started_by", "finishes", "finished_by", "during", "contains",
        "overlaps", "overlapped_by",
    }
    assert names <= allen


def test_textrank_prefers_connected_tokens(spark):
    rows = QUERIES["textrank_keywords_documents"](spark, SF).collect()
    assert 0 < len(rows) <= 15
    ranks = [-r["rank_micros"] for r in rows]
    assert ranks == sorted(ranks)
    # every keyword passes the vocabulary df prune
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import Counter

    c = Counter(t for r in docs for t in r["text"].split())
    for r in rows:
        assert c[r["token"]] >= 3


# ---------------------------------------------------------------------------
# Batch 4 (queries_ext6.py)
# ---------------------------------------------------------------------------

def test_k_truss_edges_close_enough_triangles(spark):
    rows = QUERIES["k_truss_part_cooccurrence"](spark, SF).collect()
    edges = {(r["part_a"], r["part_b"]) for r in rows}
    # truss property on the SURVIVING subgraph: each edge's support,
    # recounted independently over surviving edges only (neighbor-set
    # intersection), matches the reported value
    nb = {}
    for (a, b) in edges:
        nb.setdefault(a, set()).add(b)
        nb.setdefault(b, set()).add(a)
    for r in rows:
        a, b = r["part_a"], r["part_b"]
        assert a < b
        assert len(nb[a] & nb[b]) == r["support"]


def test_ams_estimate_in_sane_band(spark):
    r = QUERIES["ams_selfjoin_size_events"](spark, SF).collect()[0]
    # exact F2 equals the true self-join size on user_id
    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "event_id")
    n_self = ev.alias("a").join(ev.alias("b"), "user_id").count()
    assert r["f2_exact"] == n_self
    # 32 estimators: std err ~ sqrt(2/32) F2 — assert a loose 3-sigma band
    assert r["rel_error"] < 0.75
    assert r["f2_estimate"] > 0


def test_reciprocal_best_match_is_one_to_one(spark):
    rows = QUERIES["reciprocal_best_match_linkage"](spark, SF).collect()
    assert rows
    cs = [r["c_custkey"] for r in rows]
    ss = [r["s_suppkey"] for r in rows]
    assert len(cs) == len(set(cs))  # at most one partner per customer
    assert len(ss) == len(set(ss))  # and per supplier


def test_ks_matches_scipy_style_recompute(spark):
    r = QUERIES["ks_statistic_value_cohorts"](spark, SF).collect()[0]
    assert 0.0 <= r["ks_stat"] <= 1.0
    assert r["n_a"] + r["n_b"] > 0
    # recompute in python over the same hash assignment
    import hashlib

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    a_vals, b_vals = [], []
    for e in ev:
        if e["value"] is None:
            continue
        h = int(hashlib.md5(f"ab:{e['user_id']}".encode()).hexdigest()[:15], 16)
        (a_vals if h % 2 == 0 else b_vals).append(round(e["value"], 2))
    assert len(a_vals) == r["n_a"] and len(b_vals) == r["n_b"]
    xs = sorted(set(a_vals) | set(b_vals))
    na, nb, best = len(a_vals), len(b_vals), 0
    ca = cb = 0
    from bisect import bisect_right

    sa, sb = sorted(a_vals), sorted(b_vals)
    for x in xs:
        ca, cb = bisect_right(sa, x), bisect_right(sb, x)
        best = max(best, abs(ca * nb - cb * na))
    assert best == r["ks_scaled"]


# ---------------------------------------------------------------------------
# Batch 5 (queries_ext7.py)
# ---------------------------------------------------------------------------

def test_vocab_coverage_monotone(spark):
    r = QUERIES["vocab_coverage_curve"](spark, SF).collect()[0]
    assert 0 < r["n_vocab"]
    assert r["n_tokens"] >= r["n_vocab"]
    covs = [r["cov_100"], r["cov_500"], r["cov_1000"], r["cov_5000"]]
    assert covs == sorted(covs)  # more vocab, more coverage
    assert all(0.0 < c <= 1.0 for c in covs)
    if r["n_vocab"] <= 5000:
        assert covs[-1] == 1.0  # full vocab covers everything


def test_merkle_root_flips_on_any_change(spark):
    rows = QUERIES["merkle_manifest_documents"](spark, SF).collect()
    roots = {r["root_hash"] for r in rows}
    assert len(roots) == 1  # one root across all sources
    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import defaultdict

    per_src = defaultdict(list)
    for d in docs:
        per_src[d["source"]].append((d["doc_id"], hashlib.md5(d["text"].encode()).hexdigest()))
    src_hash = {
        s: hashlib.md5("".join(h for _, h in sorted(v)).encode()).hexdigest()
        for s, v in per_src.items()
    }
    for r in rows:
        assert r["source_hash"] == src_hash[r["source"]]
        assert r["n_docs"] == len(per_src[r["source"]])
    root = hashlib.md5(
        "".join(src_hash[s] for s in sorted(src_hash)).encode()
    ).hexdigest()
    assert roots == {root}


def test_partition_sizing_ceilings(spark):
    rows = {r["tbl"]: r for r in QUERIES["partition_sizing_plan"](spark, SF).collect()}
    for r in rows.values():
        assert r["rec_shuffle_partitions"] >= 1
        assert r["rec_files"] >= 1
        assert r["rec_files"] <= r["rec_shuffle_partitions"]  # 128MB >= 64MB
        # ceiling arithmetic: partitions * target covers the bytes
        assert r["rec_shuffle_partitions"] * 64 * 1024 * 1024 >= r["est_bytes"]
    li = rows["lineitem"]
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert li["n_rows"] == n and li["est_bytes"] == n * 120


def test_itemset3_support_verified(spark):
    rows = QUERIES["itemset3_support_parts"](spark, SF).collect()
    li = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    from collections import defaultdict

    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    for r in rows:
        trip = {r["pa"], r["pb"], r["pc"]}
        assert r["pa"] < r["pb"] < r["pc"]
        sup = sum(1 for b in baskets.values() if trip <= b)
        assert sup == r["support"] >= 2


# ---------------------------------------------------------------------------
# Batch 6 (queries_ext8.py)
# ---------------------------------------------------------------------------

def test_lsh_precision_recall_consistent(spark):
    p = QUERIES["lsh_precision_vs_exact"](spark, SF).collect()[0]
    r = QUERIES["lsh_recall_vs_exact"](spark, SF).collect()[0]
    # same kernels, same banding: the confusion counts must agree
    assert p["n_exact"] == r["n_exact"]
    assert p["n_candidates"] == r["n_candidates"]
    assert p["n_hit"] == r["n_hit"]
    assert 0.0 <= p["precision"] <= 1.0
    assert p["n_hit"] <= min(p["n_exact"], p["n_candidates"])


def test_assortativity_in_pearson_range(spark):
    r = QUERIES["degree_assortativity_graph"](spark, SF).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_edges"] > 0


def test_ndcg_bounds_and_identity(spark):
    rows = QUERIES["ndcg_matryoshka_vs_exact"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
    # sanity: full-dim ranking against itself would be exactly 1; the
    # truncated tier should agree at least somewhat on average
    avg = sum(r["ndcg"] for r in rows) / len(rows)
    assert avg > 0.05


# ---------------------------------------------------------------------------
# Batch 7 (queries_ext9.py)
# ---------------------------------------------------------------------------

def test_harmonic_centrality_consistent_with_bfs(spark):
    rows = QUERIES["harmonic_centrality_landmarks"](spark, SF).collect()
    assert len(rows) == 5  # one per region landmark
    for r in rows:
        # harmonic <= n_reached (each term <= 1) and > 0
        assert 0 < r["harmonic"] <= r["n_reached"]


def test_markov_absorption_probabilities(spark):
    rows = {r["event_type"]: r["p_absorb"] for r in QUERIES[
        "markov_absorption_purchase"](spark, SF).collect()}
    assert set(rows) == {"click", "error", "purchase", "signup", "view"}
    for p in rows.values():
        assert 0.0 <= p <= 1.0
    # K=5 steps from a uniform-ish chain: strictly positive everywhere
    assert all(p > 0 for p in rows.values())


def test_burstiness_in_range(spark):
    rows = QUERIES["burstiness_user_gaps"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["burstiness"] <= 1.0
        assert r["n_gaps"] >= 5
        assert r["mean_gap_s"] > 0


def test_cohort_ltv_monotone_per_cohort(spark):
    rows = QUERIES["cohort_ltv_curve"](spark, SF).collect()
    assert rows
    from collections import defaultdict

    per = defaultdict(list)
    for r in rows:
        per[r["cohort_day"]].append((r["age"], r["ltv_per_user"]))
    for series in per.values():
        series.sort()
        vals = [v for _, v in series]
        assert vals == sorted(vals)  # cumulative value never decreases
        assert all(v >= 0 for v in vals)


# ---------------------------------------------------------------------------
# Batch 8 (queries_ext10.py)
# ---------------------------------------------------------------------------

def test_impute_counts_and_fill(spark):
    rows = QUERIES["impute_event_values"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import defaultdict

    nulls = defaultdict(int)
    totals = defaultdict(int)
    vals = defaultdict(list)
    for e in ev:
        totals[e["event_type"]] += 1
        if e["value"] is None:
            nulls[e["event_type"]] += 1
        else:
            vals[e["event_type"]].append(round(e["value"], 2))
    for r in rows:
        assert r["n_total"] == totals[r["event_type"]]
        assert r["n_imputed"] == nulls[r["event_type"]]
        s = sorted(vals[r["event_type"]])
        assert abs(r["fill_value"] - s[(len(s) + 1) // 2 - 1]) < 1e-9


def test_mahalanobis_topk_are_extreme(spark):
    rows = QUERIES["mahalanobis_outliers_embeddings"](spark, SF).collect()
    assert len(rows) == 10
    scores = [r["md2"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_pit_features_are_strictly_before(spark):
    rows = QUERIES["training_matrix_pit_features"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    import datetime

    by_user = {}
    for e in ev:
        by_user.setdefault(e["user_id"], []).append(e)
    by_id = {e["event_id"]: e for e in ev}
    us = lambda t: int(t.timestamp() * 1_000_000)
    for r in rows[:25]:
        lab = by_id[r["event_id"]]
        t0 = us(lab["ts"])
        hist = [e for e in by_user[r["user_id"]] if us(e["ts"]) < t0]
        assert r["f_life_cnt"] == len(hist)
        win = [e for e in hist if us(e["ts"]) >= t0 - 7 * 86400 * 1_000_000]
        assert r["f_cnt_7d"] == len(win)
        val = sum(round(e["value"], 2) for e in win if e["value"] is not None)
        assert abs(r["f_val_7d"] - round(val, 2)) < 1e-6


def test_kwic_contexts_contain_keyword(spark):
    rows = QUERIES["kwic_concordance_top_token"](spark, SF).collect()
    assert 0 < len(rows) <= 15
    kw = rows[0]["keyword"]
    docs = {
        r["doc_id"]: r["text"].split()
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in rows:
        ctx = r["context"].split()
        assert kw in ctx
        toks = docs[r["doc_id"]]
        assert toks[r["pos"]] == kw
        lo = max(r["pos"] - 2, 0)
        assert ctx == toks[lo:r["pos"] + 3]


# ---------------------------------------------------------------------------
# Batch 9 (queries_ext11.py)
# ---------------------------------------------------------------------------

def test_auc_matches_pairwise_definition(spark):
    r = QUERIES["auc_quality_vs_lang"](spark, SF).collect()[0]
    assert 0.0 <= r["auc"] <= 1.0
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert r["n_pos"] + r["n_neg"] == docs.count()
    assert r["n_pos"] == docs.filter(F.col("lang") == "en").count()
    # pairwise definition over the engine's own (score, y) projection:
    # AUC = P(score_pos > score_neg) + 0.5 P(tie)
    from vmware_graph_spark.queries_ext11 import _AUC_SQL  # noqa: F401
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    scored = con.execute(
        _AUC_SQL[: _AUC_SQL.index(", hist AS")]
        + " SELECT y, score FROM scored"
    ).fetchall()
    pos = sorted(s for y, s in scored if y == 1)
    neg = sorted(s for y, s in scored if y == 0)
    wins = ties = 0
    for p in pos:
        from bisect import bisect_left, bisect_right

        wins += bisect_left(neg, p)
        ties += bisect_right(neg, p) - bisect_left(neg, p)
    auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(r["auc"] - auc) < 1e-6


def test_quantile_normalization_equalizes_means(spark):
    rows = QUERIES["quantile_normalize_by_source"](spark, SF).collect()
    assert rows
    befores = [r["mean_before"] for r in rows]
    afters = [r["mean_after"] for r in rows]
    # normalized means cluster much tighter than raw means
    spread = lambda xs: max(xs) - min(xs)
    assert spread(afters) <= spread(befores) + 1e-9
    for r in rows:
        assert r["n"] > 0


def test_did_identity(spark):
    r = QUERIES["did_estimate_value"](spark, SF).collect()[0]
    expect = round(
        round(r["a_post"] - r["a_pre"] - (r["b_post"] - r["b_pre"]), 6), 6
    )
    assert abs(r["did"] - expect) < 2e-6


def test_seasonal_backtest_lag_alignment(spark):
    rows = QUERIES["seasonal_naive_backtest"](spark, SF).collect()
    assert rows
    daily = {r["day"]: r["actual"] for r in rows}
    import datetime

    for r in rows:
        d = datetime.date.fromisoformat(r["day"])
        prev = (d - datetime.timedelta(days=7)).isoformat()
        if prev in daily:
            assert abs(r["forecast"] - daily[prev]) < 1e-9
        assert r["ape"] >= 0


# ---------------------------------------------------------------------------
# Batch 10 (queries_ext12.py)
# ---------------------------------------------------------------------------

def test_pareto_concentration_bounds(spark):
    rows = QUERIES["pareto_8020_parts_revenue"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_for_80pct"] <= r["n_parts"]
        assert 0.0 < r["concentration"] <= 1.0


def test_degree_bins_partition_users(spark):
    rows = QUERIES["degree_distribution_log2_bins"](spark, SF).collect()
    n_users = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        b = r["log2_bin"]
        assert 2 ** b <= r["min_degree"] <= r["max_degree"] < 2 ** (b + 1)


def test_vmr_matches_python(spark):
    rows = QUERIES["overdispersion_daily_counts"](spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    from collections import Counter

    daily = Counter((e["event_type"], e["ts"].date()) for e in ev)
    for r in rows:
        cs = [c for (t, _), c in daily.items() if t == r["event_type"]]
        mean = sum(cs) / len(cs)
        var = sum((c - mean) ** 2 for c in cs) / (len(cs) - 1)
        assert abs(r["vmr"] - var / mean) < 1e-4
        assert r["overdispersed"] == (1 if var / mean > 1.5 else 0)


def test_label_margin_stats_bounds(spark):
    rows = QUERIES["label_margin_embeddings"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r["avg_margin"] <= 1.0 + 1e-9
        assert 0.0 <= r["frac_separated"] <= 1.0
        assert r["n_vecs"] > 0


# ---------------------------------------------------------------------------
# Batch 11 (queries_ext13.py)
# ---------------------------------------------------------------------------

def test_design_effect_at_least_icc_consistent(spark):
    r = QUERIES["cluster_sampling_design_effect"](spark, SF).collect()[0]
    assert -1.0 <= r["icc"] <= 1.0
    mbar = r["n_rows"] / r["n_clusters"]
    assert abs(r["deff"] - (1 + (mbar - 1) * r["icc"])) < 1e-4


def test_ttr_bounds_and_python_recompute(spark):
    rows = QUERIES["type_token_ratio_by_source"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    from collections import Counter, defaultdict

    per = defaultdict(Counter)
    for d in docs:
        per[d["source"]].update(d["text"].split())
    for r in rows:
        c = per[r["source"]]
        assert r["n_types"] == len(c)
        assert r["n_tokens"] == sum(c.values())
        hap = sum(1 for v in c.values() if v == 1)
        assert abs(r["hapax_frac"] - hap / len(c)) < 1e-6
        assert 0.0 < r["ttr"] <= 1.0


def test_peaks_are_strict_local_maxima(spark):
    rows = QUERIES["daily_peaks_value"](spark, SF).collect()
    daily = {
        r["day"]: r["tot"]
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.sum(F.round("value", 2).cast("decimal(18,2)")).alias("tot"))
        .collect()
    }
    import datetime

    for r in rows:
        d = datetime.date.fromisoformat(r["day"])
        prev = daily[(d - datetime.timedelta(days=1)).isoformat()]
        nxt = daily[(d + datetime.timedelta(days=1)).isoformat()]
        tot = daily[r["day"]]
        assert tot > prev and tot > nxt
        assert abs(r["prominence"] - float(min(tot - prev, tot - nxt))) < 1e-9


def test_effective_dim_bounds(spark):
    r = QUERIES["effective_dim_embeddings"](spark, SF).collect()[0]
    assert r["n_dims"] == 64
    assert r["total_variance"] > 0
    # participation ratio lives in [1, d]
    assert 1.0 <= r["participation_ratio"] <= 64.0
    # synthetic embeddings are near-isotropic: PR should be high
    assert r["participation_ratio"] > 32


# ---------------------------------------------------------------------------
# Batch 12 (queries_ext14.py)
# ---------------------------------------------------------------------------

def test_uplift_deciles_consistent(spark):
    rows = QUERIES["uplift_deciles"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["decile"] <= 10
        assert r["n_a"] > 0 and r["n_b"] > 0
        assert abs(r["uplift"] - round(r["mean_y_a"] - r["mean_y_b"], 6)) < 2e-6


def test_matched_pairs_att_quality(spark):
    r = QUERIES["matched_pairs_att"](spark, SF).collect()[0]
    assert r["n_matched"] > 0
    assert r["mean_covariate_gap"] >= 0
    # every treated user matches (controls exist on at least one side)
    n_a = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("user_id").distinct().count()
    )
    assert r["n_matched"] <= n_a


# ---------------------------------------------------------------------------
# Batch 13 (queries_ext15.py)
# ---------------------------------------------------------------------------

def test_gini_bounds_and_python_recompute(spark):
    rows = QUERIES["gini_revenue_by_nation"](spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    supp = spark.read.parquet(f"{SF}/supplier.parquet")
    pr = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("s_nationkey", "l_partkey")
        .agg(F.sum(F.round("l_extendedprice", 2).cast("decimal(18,2)")).alias("rev"))
        .collect()
    )
    from collections import defaultdict

    per = defaultdict(list)
    for r in pr:
        per[r["s_nationkey"]].append(float(r["rev"]))
    for r in rows:
        xs = sorted(per[r["nation"]])
        n = len(xs)
        g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (n + 1) / n
        assert abs(r["gini"] - g) < 1e-4
        assert 0.0 <= r["gini"] < 1.0


def test_acf_bounds(spark):
    rows = {r["lag"]: r for r in QUERIES["acf_daily_values"](spark, SF).collect()}
    assert set(rows) == {1, 7}
    for r in rows.values():
        assert -1.0 <= r["acf"] <= 1.0
        assert r["n_pairs"] > 0
    assert rows[1]["n_pairs"] == rows[7]["n_pairs"] + 6


def test_zipf_slope_negative_for_text(spark):
    r = QUERIES["zipf_slope_token_frequencies"](spark, SF).collect()[0]
    assert r["n_bins"] > 1
    # frequency decreases with rank: the log-log slope must be negative
    assert r["zipf_slope"] < 0
