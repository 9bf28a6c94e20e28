"""Property-based tests (SURVEY §5): invariants under generated inputs.

One Spark job per hypothesis example is too slow; each property instead
generates a BATCH of inputs per example and checks all rows in one job,
with a small example budget — wide input coverage, bounded wall time.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from vmware_graph_spark.functions.scalar import (
    IPV4_RE,
    path_last,
    path_parent,
    rlike_full,
)

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# dotted-quad-ish strings: real IPs, out-of-range octets, junk hosts
ipish = st.one_of(
    st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True),
    st.from_regex(r"[a-z][a-z0-9.-]{0,20}", fullmatch=True),
    st.sampled_from(["256.1.1.1", "01.2.3.4", "10.0.0.1 ", "", "1.2.3", "1.2.3.4.5"]),
)


@PROP
@given(st.lists(ipish, min_size=1, max_size=50))
def test_ipv4_classifier_matches_python_fullmatch(spark, addrs):
    """The engine's anchored rlike == Python re.fullmatch on the same
    pattern — the Cypher `=~` anchoring trap can never regress."""
    df = spark.createDataFrame([(a,) for a in addrs], "addr string")
    got = {
        r.addr: r.is_ip
        for r in df.select("addr", rlike_full("addr", IPV4_RE).alias("is_ip")).collect()
    }
    want = {a: re.fullmatch(IPV4_RE, a) is not None for a in addrs}
    # collect() dedups nothing but dict keys collapse duplicate addrs —
    # fullmatch is pure, so collapsing is safe.
    assert got == want


segment = st.from_regex(r"[A-Za-z0-9 _.-]{1,8}", fullmatch=True)


@PROP
@given(st.lists(st.lists(segment, min_size=2, max_size=6), min_size=1, max_size=30))
def test_path_parent_plus_leaf_reassembles(spark, seg_lists):
    """parent + '/' + leaf == path for every well-formed absolute path
    (the structural computation the reference's replace() trick gets
    wrong on repeated segments — including those generated here)."""
    paths = ["/" + "/".join(segs) for segs in seg_lists]
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    rows = df.select(
        "path",
        path_parent("path").alias("parent"),
        path_last("path").alias("leaf"),
    ).collect()
    for r in rows:
        assert r.parent + "/" + r.leaf == r.path


edge_id = st.from_regex(r"[a-z]{1,6}", fullmatch=True)


@PROP
@given(st.lists(st.tuples(edge_id, edge_id), min_size=1, max_size=40))
def test_canonical_edges_direction_invariant(spark, pairs):
    """For undirected types, asserting (a)->(b) and (b)->(a) must merge
    to the same canonical row set regardless of input direction."""
    from vmware_graph_spark.operators.merge import canonical_edges

    def edges_df(tuples):
        return spark.createDataFrame(
            [("L", a, "LINKS", "L", b) for a, b in tuples],
            "src_label string, src_key string, rel_type string, dst_label string, dst_key string",
        )

    fwd = canonical_edges(edges_df(pairs), ["LINKS"]).collect()
    rev = canonical_edges(edges_df([(b, a) for a, b in pairs]), ["LINKS"]).collect()
    assert sorted(map(tuple, fwd)) == sorted(map(tuple, rev))
