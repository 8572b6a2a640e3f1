"""CLI command surface: index -> search (single + bulk) -> version,
driven through the argparse entry point exactly as a user would
(reference cli.py:22-434 command surface)."""

from __future__ import annotations

import json

import pytest

from duckdb_hybrid_doc_search_spark import cli


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli") / "idx")
    rc = cli.main(["index", "fixtures/docs", "--db", out])
    assert rc == 0
    return out


def test_cli_search_json(cli_index, capsys):
    rc = cli.main([
        "search", "--db", cli_index, "-q", "deep nested", "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"], "expected at least one hit"
    first = out["results"][0]
    assert {"file_path", "score", "content"} <= set(first)


def test_cli_search_bulk_two_queries(cli_index, capsys):
    rc = cli.main([
        "search", "--db", cli_index,
        "-q", "deep nested", "-q", "front matter",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["batches"]) == 2
    assert out["batches"][0]["query"] == "deep nested"


def test_cli_search_top_k_bound_rejected(cli_index):
    with pytest.raises(SystemExit):
        cli.main(["search", "--db", cli_index, "-q", "x", "--top-k", "101"])


def test_cli_version(capsys):
    rc = cli.main(["version"])
    assert rc == 0
    assert capsys.readouterr().out.strip()


def test_cli_serve_http_without_mcp_exits_2(cli_index):
    """streamable-http still needs the external package; stdio does NOT —
    it falls back to the built-in transport (tests/test_mcp_protocol.py
    drives that over a real subprocess round-trip)."""
    import importlib.util

    if importlib.util.find_spec("mcp") is not None:
        pytest.skip("mcp installed; fallback unreachable")
    rc = cli.main(["serve", "--db", cli_index,
                   "--transport", "streamable-http"])
    assert rc == 2


def test_cli_query_list_and_run(capsys, sf_dir):
    rc = cli.main(["query", "--list"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert any(ln.startswith("tpch_q1_pricing_summary\toracle") for ln in lines)
    assert len(lines) > 100

    rc = cli.main(["query", "tpch_q6_forecast_revenue", "--sf-dir", sf_dir])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "revenue" in row


def test_cli_query_unknown_name(capsys):
    rc = cli.main(["query", "definitely_not_registered"])
    assert rc == 2
    assert "unknown query" in capsys.readouterr().err
