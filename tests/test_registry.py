"""Registry integrity: fast structural checks on the driver contract
(no SparkSession needed — these run in milliseconds and catch contract
drift before the oracle gate does)."""

from __future__ import annotations

import re

from vmware_graph_spark.queries import ORACLE, QUERIES


def test_every_oracle_key_has_a_query():
    assert set(ORACLE) <= set(QUERIES), set(ORACLE) - set(QUERIES)


def test_rows_only_queries_are_the_documented_three():
    # Anything without an oracle must be one of the engine-specific-by-
    # design trio (each of which has a hash-verified deterministic twin
    # elsewhere in the registry). Growing this set silently would erode
    # the correctness gate.
    rows_only = set(QUERIES) - set(ORACLE)
    assert rows_only == {
        "approx_distinct_users_per_type",
        "approx_percentile_value",
        "pagerank_customer_nation",
    }, rows_only


def test_query_names_are_snake_case_and_documented():
    for name, fn in QUERIES.items():
        assert re.fullmatch(r"[a-z][a-z0-9_]+", name), name
        assert fn.__doc__ and len(fn.__doc__.strip()) > 20, name


def test_oracle_sql_is_nonempty_ansi():
    for name, sql in ORACLE.items():
        assert sql.strip().upper().startswith(("SELECT", "WITH")), name
        assert "spark" not in sql.lower(), name  # pure ANSI/DuckDB side


def test_cli_rejects_bad_args(capsys):
    """__main__.main is the advertised entry point; malformed argv must
    exit 2 with usage on stderr, not start a SparkSession."""
    from vmware_graph_spark.__main__ import main

    assert main([]) == 2
    assert main(["refresh", "only-one-arg"]) == 2
    assert main(["not-a-command", "a", "b"]) == 2
    assert "refresh WORKBOOK_DIR SNAPSHOT_DIR" in capsys.readouterr().err


def test_registry_served_in_plain_registration_order():
    """ADVICE r3: the entry point must expose queries()/oracle_sql() in
    plain registration order — no reordering or curation — so external
    sampling (the driver gate) is unbiased. Breadth certification lives
    in tools/breadth_suite.py instead, whose representatives must all
    exist and be oracle-paired."""
    import __spark_entry__ as m

    served = list(m.queries())
    assert served == list(QUERIES)
    assert list(m.oracle_sql()) == [n for n in QUERIES if n in m.oracle_sql()]

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "breadth_suite",
        os.path.join(os.path.dirname(__file__), "..", "tools", "breadth_suite.py"),
    )
    bs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bs)
    oracles = m.oracle_sql()
    for name in bs.FAMILY_REPRESENTATIVES:
        assert name in QUERIES, name
        assert name in oracles, name


def test_cli_query_and_list_subcommands(capsys):
    """The query/explain/list CLI resolves registry names, rejects
    unknowns with suggestions, and list filters by substring —
    arg-parsing only (no SparkSession started on the failure paths)."""
    from vmware_graph_spark.__main__ import main

    assert main(["list", "lang_mismatch"]) == 0
    out = capsys.readouterr().out
    assert "lang_mismatch_audit_by_source" in out

    assert main(["query", "no_such_query_zzz"]) == 2
    assert main(["query"]) == 2
    assert main(["query", "q1_pricing_summary", "sf", "extra"]) == 2
    assert main(["query", "q1_pricing_summary", "--limit", "nope"]) == 2
