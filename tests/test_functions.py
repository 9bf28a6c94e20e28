"""Unit tests for scalar/text/vector function shims (SURVEY §2.8)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from vmware_graph_spark.functions.scalar import (
    IPV4_RE,
    concat_strict,
    path_last,
    path_parent,
    rlike_full,
    split_literal,
    try_int,
)
from vmware_graph_spark.functions.text import (
    fingerprint,
    lang_id,
    n_tokens,
    tokens,
    word_shingles,
)
from vmware_graph_spark.functions.vector import cosine, as_double_vec


def one(spark, value, expr):
    df = spark.createDataFrame([(value,)], ["x"])
    return df.select(expr.alias("y")).collect()[0][0]


def test_rlike_full_is_anchored(spark):
    # Cypher `=~` full-match: '10.0.0.1x' must NOT match the IPv4 regex
    # even though unanchored rlike finds '10.0.0.1' inside it.
    assert one(spark, "10.0.0.1", rlike_full("x", IPV4_RE)) is True
    assert one(spark, "10.0.0.1x", rlike_full("x", IPV4_RE)) is False
    assert one(spark, "a10.0.0.1", rlike_full("x", IPV4_RE)) is False
    assert one(spark, "256.1.1.1", rlike_full("x", IPV4_RE)) is False


def test_split_literal_escapes_metachars(spark):
    # '[' must split literally (datastore parse, refresh-vmware.cypher:249)
    assert one(spark, "[ds1] vm/vm.vmdk", split_literal("x", "[")) == ["", "ds1] vm/vm.vmdk"]
    assert one(spark, "a build-b", split_literal("x", " build-")) == ["a", "b"]


def test_try_int(spark):
    assert one(spark, "42", try_int("x")) == 42
    assert one(spark, "garbage", try_int("x")) is None


def test_concat_strict_null_propagates(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    assert df.select(concat_strict("x", "y").alias("z")).collect()[0][0] is None


def test_path_helpers(spark):
    p = "/DC1/Cluster1/Resources/poolA/poolB"
    assert one(spark, p, path_last("x")) == "poolB"
    assert one(spark, p, path_parent("x")) == "/DC1/Cluster1/Resources/poolA"
    # leaf repeating an interior segment must not corrupt the parent
    # (the reference's replace() approach would, SURVEY §2.10)
    p2 = "/DC/Resources/a/a"
    assert one(spark, p2, path_parent("x")) == "/DC/Resources/a"


def test_tokens_whitespace(spark):
    assert one(spark, "a\tb\nc  d", tokens("x")) == ["a", "b", "c", "d"]
    assert one(spark, " a ", n_tokens("x")) == 1


def test_word_shingles_short_doc_empty(spark):
    assert one(spark, "a b", word_shingles("x", 3)) == []
    assert one(spark, "a b c d", word_shingles("x", 3)) == ["a b c", "b c d"]


def test_fingerprint_normalizes(spark):
    a = one(spark, "Hello   World", fingerprint("x"))
    b = one(spark, "  hello\tworld ", fingerprint("x"))
    assert a == b


def test_lang_id(spark):
    assert one(spark, "the cat and the hat is a cat", lang_id("x")) == "en"
    assert one(spark, "el gato que vive por la casa", lang_id("x")) == "es"
    assert one(spark, "你好世界", lang_id("x")) == "zh"
    assert one(spark, "zzz qqq", lang_id("x")) == "unknown"


def test_cosine(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"])
    got = [r[0] for r in df.select(cosine(as_double_vec("a"), as_double_vec("b")).alias("c")).collect()]
    assert math.isclose(got[0], 0.0, abs_tol=1e-12)
    assert math.isclose(got[1], 1.0, rel_tol=1e-12)


def test_bpe_tokens_pieces(spark):
    from vmware_graph_spark.functions.text import bpe_tokens

    df = spark.createDataFrame([("Hello, world's 42 cats!",)], "t string")
    [row] = df.select(bpe_tokens("t").alias("p")).collect()
    assert row.p == ["Hello", ",", " world", "'s", " 42", " cats", "!"]


def test_stopword_ratio_bounds(spark):
    from vmware_graph_spark.functions.text import stopword_ratio

    df = spark.createDataFrame(
        [("the cat is on the mat",), ("qwerty zxcvb",), ("",)], "t string"
    )
    vals = [r.r for r in df.select(stopword_ratio("t").alias("r")).collect()]
    assert abs(vals[0] - 4 / 6) < 1e-9
    assert vals[1] == 0.0
    assert vals[2] == 0.0  # empty text guard, no division by zero


def test_rolling_fingerprint_order_sensitive(spark):
    from vmware_graph_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame([("a b c", "c b a")], "x string, y string")
    [row] = df.select(
        rolling_fingerprint("x").alias("fx"), rolling_fingerprint("y").alias("fy")
    ).collect()
    assert row.fx != row.fy  # order matters, unlike fingerprint()
    assert 0 <= row.fx < 2147483647


def test_register_views_enables_pure_sql(spark):
    from vmware_graph_spark.sources.tables import register_views

    views = register_views(spark, "/root/testdata/sf0.001", prefix="t_")
    assert len(views) == 10
    n = spark.sql(
        "SELECT count(*) AS n FROM t_customer c JOIN t_nation n ON c.c_nationkey = n.n_nationkey"
    ).collect()[0]["n"]
    assert n == spark.sql("SELECT count(*) FROM t_customer").collect()[0][0] > 0


def test_redact_pii_scrubs_and_counts(spark):
    from vmware_graph_spark.functions.text import (
        EMAIL_RE,
        IPV4_IN_TEXT_RE,
        count_pattern,
        redact_pii,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@corp.example and host 10.0.0.1 end"),
            (2, "no pii here"),
            (3, "two ips 192.168.1.9 8.8.8.8 one mail x@y.zz"),
        ],
        ["id", "t"],
    )
    out = df.select(
        "id",
        redact_pii(F.col("t")).alias("red"),
        count_pattern(F.col("t"), EMAIL_RE).alias("ne"),
        count_pattern(F.col("t"), IPV4_IN_TEXT_RE).alias("ni"),
    ).collect()
    rows = {r.id: r for r in out}
    assert rows[1].red == "mail [EMAIL] and host [IP] end"
    assert (rows[1].ne, rows[1].ni) == (1, 1)
    assert rows[2].red == "no pii here" and rows[2].ne == 0 and rows[2].ni == 0
    assert rows[3].red == "two ips [IP] [IP] one mail [EMAIL]"
    assert (rows[3].ne, rows[3].ni) == (1, 2)


# -- operators.rank: distributed exact global rank -------------------------


def test_exact_global_rank_matches_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import exact_global_rank

    df = spark.range(0, 500).select(
        (F.col("id") % 37).cast("double").alias("v"), F.col("id").alias("tid")
    )
    got = {
        (r.tid, r.rank)
        for r in exact_global_rank(df, ["v", "tid"], buckets=8).collect()
    }
    want = {
        (r.tid, r.rank)
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy("v", "tid"))
        ).collect()
    }
    assert got == want


def test_exact_global_rank_no_single_partition_window(spark):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import exact_global_rank

    df = spark.range(0, 1000).select(
        (F.col("id") % 11).cast("double").alias("v"), F.col("id").alias("tid")
    )
    out = exact_global_rank(df, ["v", "tid"], buckets=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    # the data-sized window is range-bucket-partitioned; the only
    # SinglePartition exchange feeds the <=buckets-row offset prefix sum
    plan = buf.getvalue()
    assert "Window" in plan
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" in line:
            assert "__range_bucket" in line


def test_ntile_from_rank_matches_sql_ntile(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import ntile_from_rank

    for n_rows, tiles in [(100, 8), (101, 8), (7, 8), (8, 3), (1, 4)]:
        df = spark.range(1, n_rows + 1).select(F.col("id").alias("r"))
        got = {
            (r.r, r.t)
            for r in df.select("r", ntile_from_rank(F.col("r"), n_rows, tiles).alias("t")).collect()
        }
        want = {
            (r.r, r.t)
            for r in df.withColumn("t", F.ntile(tiles).over(Window.orderBy("r"))).collect()
        }
        assert got == want, (n_rows, tiles)


def test_bucketed_carry_matches_global_windows(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import bucketed_carry

    # sparse tags: only every 7th row carries values, several buckets
    # in a row end up tag-free so the boundary carry must hand values
    # across more than one bucket
    df = spark.range(0, 500).select(
        (F.col("id") % 41).cast("double").alias("v"),
        F.col("id").alias("tid"),
        F.when(F.col("id") % 7 == 0, F.col("id")).alias("tag_id"),
        F.when(F.col("id") % 7 == 0, (F.col("id") * 2).cast("double")).alias("tag_x"),
    )
    got = {
        (r.tid, r.prev_tag_id, r.prev_tag_x, r.next_tag_id, r.next_tag_x)
        for r in bucketed_carry(
            df, ["v", "tid"], ["tag_id", "tag_x"], buckets=16
        ).collect()
    }
    wb = Window.orderBy("v", "tid").rowsBetween(Window.unboundedPreceding, -1)
    wf = Window.orderBy("v", "tid").rowsBetween(1, Window.unboundedFollowing)
    want = {
        (r.tid, r.prev_tag_id, r.prev_tag_x, r.next_tag_id, r.next_tag_x)
        for r in df.select(
            "tid",
            F.last("tag_id", ignorenulls=True).over(wb).alias("prev_tag_id"),
            F.last("tag_x", ignorenulls=True).over(wb).alias("prev_tag_x"),
            F.first("tag_id", ignorenulls=True).over(wf).alias("next_tag_id"),
            F.first("tag_x", ignorenulls=True).over(wf).alias("next_tag_x"),
        ).collect()
    }
    assert got == want


def test_bucketed_carry_data_windows_are_bucket_partitioned(spark):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import bucketed_carry

    df = spark.range(0, 1000).select(
        (F.col("id") % 13).cast("double").alias("v"),
        F.col("id").alias("tid"),
        F.when(F.col("id") % 5 == 0, F.col("id")).alias("tag_id"),
    )
    out = bucketed_carry(df, ["v", "tid"], ["tag_id"], buckets=8)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the data-sized carry windows partition by range bucket; only the
    # <=buckets-row boundary prefix may be unpartitioned
    import re

    specs = re.findall(r"(?:last|first)\(tag_id[^\n]*windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    bucketed = [s for s in specs if "__range_bucket" in s]
    assert bucketed, specs


def test_bucketed_carry_edges_allnull_constkey_empty(spark):
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import bucketed_carry

    # all-null tags: every carry is null
    df = spark.range(0, 50).select(
        F.col("id").cast("double").alias("v"),
        F.col("id").alias("tid"),
        F.lit(None).cast("bigint").alias("tag"),
    )
    out = bucketed_carry(df, ["v", "tid"], ["tag"], buckets=8).collect()
    assert len(out) == 50
    assert all(r.prev_tag is None and r.next_tag is None for r in out)

    # constant order key (degenerate single bucket): pure within-bucket
    df2 = spark.range(0, 20).select(
        F.lit(1.0).alias("v"),
        F.col("id").alias("tid"),
        F.when(F.col("id") == 5, F.col("id")).alias("tag"),
    )
    got = {
        r.tid: (r.prev_tag, r.next_tag)
        for r in bucketed_carry(df2, ["v", "tid"], ["tag"], buckets=8).collect()
    }
    assert got[4] == (None, 5) and got[6] == (5, None) and got[5] == (None, None)

    # empty input: empty output, schema intact
    df3 = spark.createDataFrame([], "v double, tid long, tag long")
    out3 = bucketed_carry(df3, ["v", "tid"], ["tag"], buckets=8)
    assert out3.collect() == []
    assert {"prev_tag", "next_tag"}.issubset(set(out3.columns))


def test_bucketed_prefix_sum_matches_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vmware_graph_spark.operators.rank import bucketed_prefix_sum

    df = spark.range(0, 300).select(
        (F.col("id") * 37 % 301).alias("k"),  # permutation → total order
        (F.col("id") % 13 + 1).alias("v"),
    )
    got = {
        (r.k, r.cum)
        for r in bucketed_prefix_sum(df, ["k"], "v", buckets=8).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        (r.k, r.cum)
        for r in df.withColumn(
            "cum", F.coalesce(F.sum("v").over(w), F.lit(0))
        ).collect()
    }
    assert got == want
