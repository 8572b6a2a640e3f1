"""MCP stdio protocol round-trip over a REAL subprocess (SURVEY §2 S9).

Implements the 3-message client side of the public MCP spec directly —
initialize → notifications/initialized → tools/list → tools/call —
against ``cli serve --transport stdio`` running the built-in transport
(mcp_stdio.py), with no ``mcp`` package on either side. This is the
protocol-level evidence the FastMCP import-gate alone could not provide:
a client that speaks newline-delimited JSON-RPC 2.0 over the spawned
server's stdin/stdout gets spec-shaped responses and real search results
(reference server.py:66-103 behavior).

Plus fast in-process transport-edge tests over StringIO.
"""

from __future__ import annotations

import io
import json
import os
import subprocess
import sys

import pytest

from duckdb_hybrid_doc_search_spark import cli
from duckdb_hybrid_doc_search_spark.mcp_stdio import (SEARCH_TOOL_SCHEMA,
                                                      serve_stdio)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mcp_index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mcp") / "idx")
    rc = cli.main(["index", "fixtures/docs", "--db", out])
    assert rc == 0
    return out


def _rpc(method: str, req_id: int | None = None, **params) -> str:
    msg: dict = {"jsonrpc": "2.0", "method": method}
    if req_id is not None:
        msg["id"] = req_id
    if params:
        msg["params"] = params
    return json.dumps(msg) + "\n"


def test_mcp_stdio_subprocess_round_trip(mcp_index):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.Popen(
        [sys.executable, "-m", "duckdb_hybrid_doc_search_spark.cli",
         "serve", "--db", mcp_index, "--transport", "stdio"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, cwd=REPO, env=env,
    )
    try:
        # the server reads sequentially, so the whole conversation can be
        # written up front — responses arrive in request order
        proc.stdin.write(_rpc(
            "initialize", 1,
            protocolVersion="2025-03-26",
            capabilities={},
            clientInfo={"name": "pytest-client", "version": "0"},
        ))
        proc.stdin.write(_rpc("notifications/initialized"))
        proc.stdin.write(_rpc("tools/list", 2))
        proc.stdin.write(_rpc("tools/call", 3, name="search_documents",
                              arguments={"query": "deep nested",
                                         "top_k": 3}))
        proc.stdin.flush()
        proc.stdin.close()

        responses = []
        for line in proc.stdout:
            line = line.strip()
            if not line.startswith("{"):
                continue  # tolerate stray non-JSON stdout noise
            try:
                responses.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        rc = proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert rc == 0
    by_id = {r.get("id"): r for r in responses}
    assert set(by_id) == {1, 2, 3}, f"got: {responses}"

    init = by_id[1]["result"]
    assert init["protocolVersion"] == "2025-03-26"
    assert "tools" in init["capabilities"]
    assert init["serverInfo"]["name"] == "hybrid-doc-search"

    tools = by_id[2]["result"]["tools"]
    assert len(tools) == 1
    assert tools[0]["name"] == "search_documents"
    assert tools[0]["inputSchema"]["required"] == ["query"]

    call = by_id[3]["result"]
    assert call["isError"] is False
    assert call["content"][0]["type"] == "text"
    results = call["structuredContent"]["results"]
    assert 1 <= len(results) <= 3
    # reference result shape (server.py:86-95 / searcher.py)
    for r in results:
        for key in ("file_path", "content", "score", "header_path"):
            assert key in r
    # content block mirrors the structured result
    assert json.loads(call["content"][0]["text"])["results"] == results


# ---- in-process transport edges (no Spark, no subprocess) -------------


def _drive(lines: list[str], tool=None):
    fin = io.StringIO("".join(line + "\n" for line in lines))
    fout = io.StringIO()
    rc = serve_stdio(
        "search_documents", "d", SEARCH_TOOL_SCHEMA,
        tool or (lambda query, top_k=5: {"results": [{"q": query}]}),
        stdin=fin, stdout=fout,
    )
    out = [json.loads(x) for x in fout.getvalue().splitlines() if x]
    return rc, out


def test_parse_error_and_unknown_method():
    rc, out = _drive([
        "this is not json",
        json.dumps({"jsonrpc": "2.0", "id": 7, "method": "nope"}),
        json.dumps({"jsonrpc": "2.0", "method": "notifications/unknown"}),
    ])
    assert rc == 0
    assert out[0]["error"]["code"] == -32700
    assert out[1] == {"jsonrpc": "2.0", "id": 7,
                      "error": {"code": -32601,
                                "message": "method not found: 'nope'"}}
    assert len(out) == 2  # unknown notification: silently ignored


def test_unknown_tool_and_bad_args_are_invalid_params():
    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                    "params": {"name": "other", "arguments": {}}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"bogus": 1}}}),
    ])
    assert out[0]["error"]["code"] == -32602
    assert out[1]["error"]["code"] == -32602


def test_tool_exception_is_isError_result_not_protocol_error():
    def boom(query, top_k=5):
        raise ValueError("engine exploded")

    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"query": "x"}}}),
    ], tool=boom)
    res = out[0]["result"]
    assert res["isError"] is True
    assert "engine exploded" in res["content"][0]["text"]


def test_ping_and_version_negotiation_fallback():
    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {}}),  # no client protocolVersion
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "ping"}),
    ])
    assert out[0]["result"]["protocolVersion"]  # server offers its own
    assert out[1]["result"] == {}


def test_unsupported_client_version_gets_server_version():
    # negotiation rule: echo the client's version ONLY when supported;
    # an arbitrary string must come back as a version we actually speak
    from duckdb_hybrid_doc_search_spark.mcp_stdio import (
        PROTOCOL_VERSION, SUPPORTED_VERSIONS)

    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize",
                    "params": {"protocolVersion": "9999-01-01"}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "initialize",
                    "params": {"protocolVersion": "2024-11-05"}}),
    ])
    assert out[0]["result"]["protocolVersion"] == PROTOCOL_VERSION
    assert out[1]["result"]["protocolVersion"] == "2024-11-05"
    assert "2024-11-05" in SUPPORTED_VERSIONS


def test_tool_body_typeerror_is_isError_not_invalid_params():
    # a TypeError raised INSIDE the tool (after args validated against
    # the schema) is a tool failure, not a -32602 protocol error
    def inner_type_bug(query, top_k=5):
        return {"n": len(None)}  # TypeError from the tool body

    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"query": "x"}}}),
    ], tool=inner_type_bug)
    res = out[0]["result"]
    assert res["isError"] is True
    assert "TypeError" in res["content"][0]["text"]


def test_wrong_arg_type_is_invalid_params():
    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "id": 1, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"query": 42}}}),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"query": "x",
                                             "top_k": "five"}}}),
    ])
    assert out[0]["error"]["code"] == -32602
    assert out[1]["error"]["code"] == -32602


def test_request_methods_as_notifications_get_no_response():
    # JSON-RPC 2.0 forbids responding to a notification — even with
    # id:null; ping/tools/list/tools/call without an id must be dropped
    rc, out = _drive([
        json.dumps({"jsonrpc": "2.0", "method": "ping"}),
        json.dumps({"jsonrpc": "2.0", "method": "tools/list"}),
        json.dumps({"jsonrpc": "2.0", "method": "tools/call",
                    "params": {"name": "search_documents",
                               "arguments": {"query": "x"}}}),
        json.dumps({"jsonrpc": "2.0", "method": "initialize",
                    "params": {"protocolVersion": "2025-03-26"}}),
        json.dumps({"jsonrpc": "2.0", "id": 9, "method": "ping"}),
    ])
    assert rc == 0
    assert len(out) == 1 and out[0]["id"] == 9  # only the real request
