"""Minimal MCP stdio server (JSON-RPC 2.0, newline-delimited).

Implements the subset of the Model Context Protocol needed to expose one
search tool over the stdio transport when the official ``mcp`` package is
not installed: ``initialize``, the ``notifications/initialized``
notification, ``ping``, ``tools/list`` and ``tools/call``. Message shapes
follow the public MCP specification (https://modelcontextprotocol.io,
revision 2025-03-26): the stdio transport is newline-delimited JSON-RPC
2.0 on stdin/stdout, ``tools/call`` returns ``content`` blocks plus
``structuredContent``, and protocol errors use standard JSON-RPC codes.

Reference parity: reference server.py:66-103 runs FastMCP over the same
transport; this module makes ``serve --transport stdio`` genuinely work
in environments without the ``mcp`` dependency (the handler logic itself
lives in server.make_search_tool either way).
"""

from __future__ import annotations

import json
import sys
from typing import Any, Callable, TextIO

PROTOCOL_VERSION = "2025-03-26"

# JSON-RPC 2.0 error codes (spec §5.1)
PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602
INTERNAL_ERROR = -32603


def _write(out: TextIO, msg: dict[str, Any]) -> None:
    # newline-delimited framing: messages MUST NOT contain embedded
    # newlines (MCP stdio transport requirement)
    out.write(json.dumps(msg, ensure_ascii=False, separators=(",", ":")))
    out.write("\n")
    out.flush()


def _result(out: TextIO, req_id: Any, result: dict[str, Any]) -> None:
    _write(out, {"jsonrpc": "2.0", "id": req_id, "result": result})


def _error(out: TextIO, req_id: Any, code: int, message: str) -> None:
    _write(out, {"jsonrpc": "2.0", "id": req_id,
                 "error": {"code": code, "message": message}})


def serve_stdio(
    tool_name: str,
    tool_description: str,
    input_schema: dict[str, Any],
    tool_fn: Callable[..., dict[str, Any]],
    stdin: TextIO | None = None,
    stdout: TextIO | None = None,
    server_name: str = "hybrid-doc-search",
    server_version: str = "0.1.0",
) -> int:
    """Serve one tool over MCP stdio until EOF. Returns 0 on clean EOF.

    ``tool_fn`` is called with the request's ``arguments`` as kwargs and
    must return a JSON-serializable dict (the tool's structured result).
    """
    fin = stdin if stdin is not None else sys.stdin
    fout = stdout if stdout is not None else sys.stdout

    for line in fin:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
        except json.JSONDecodeError:
            _error(fout, None, PARSE_ERROR, "parse error")
            continue
        if not isinstance(msg, dict) or msg.get("jsonrpc") != "2.0":
            _error(fout, msg.get("id") if isinstance(msg, dict) else None,
                   INVALID_REQUEST, "invalid request")
            continue
        method = msg.get("method")
        req_id = msg.get("id")
        params = msg.get("params") or {}

        if method == "initialize":
            client_pv = params.get("protocolVersion")
            # echo the client's version when it's one we can speak,
            # else offer ours (MCP version-negotiation rule)
            pv = client_pv if isinstance(client_pv, str) else PROTOCOL_VERSION
            _result(fout, req_id, {
                "protocolVersion": pv,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": server_name,
                               "version": server_version},
            })
        elif method == "notifications/initialized":
            continue  # notification: no response
        elif method == "ping":
            _result(fout, req_id, {})
        elif method == "tools/list":
            _result(fout, req_id, {
                "tools": [{
                    "name": tool_name,
                    "description": tool_description,
                    "inputSchema": input_schema,
                }],
            })
        elif method == "tools/call":
            name = params.get("name")
            if name != tool_name:
                _error(fout, req_id, INVALID_PARAMS,
                       f"unknown tool: {name!r}")
                continue
            args = params.get("arguments") or {}
            try:
                out = tool_fn(**args)
            except TypeError as exc:  # bad/missing arguments
                _error(fout, req_id, INVALID_PARAMS, str(exc))
                continue
            except Exception as exc:  # tool errors are results, not
                # protocol errors (MCP spec: isError content block)
                _result(fout, req_id, {
                    "content": [{"type": "text",
                                 "text": f"{type(exc).__name__}: {exc}"}],
                    "isError": True,
                })
                continue
            _result(fout, req_id, {
                "content": [{"type": "text",
                             "text": json.dumps(out, ensure_ascii=False)}],
                "structuredContent": out,
                "isError": False,
            })
        elif req_id is not None:
            _error(fout, req_id, METHOD_NOT_FOUND,
                   f"method not found: {method!r}")
        # unknown notifications (no id) are silently ignored per JSON-RPC

    return 0


SEARCH_TOOL_SCHEMA: dict[str, Any] = {
    "type": "object",
    "properties": {
        "query": {"type": "string", "description": "Search query"},
        "top_k": {"type": "integer", "default": 5, "minimum": 1,
                  "maximum": 100,
                  "description": "Number of results to return"},
    },
    "required": ["query"],
}
