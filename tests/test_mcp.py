"""MCP stdio transport tests: the JSON-RPC framing over the 9 tools
(reference: cmd/mie/mcp.go). Engine semantics are covered by
tests/test_client.py; these pin the protocol surface — handshake, tool
listing, call dispatch, error shapes, and the newline-delimited loop.
"""

from __future__ import annotations

import io
import json

import pytest

from mie_spark.api import MieClient
from mie_spark.api.mcp import TOOL_REGISTRY, McpStdioServer


@pytest.fixture()
def server(spark):
    return McpStdioServer(MieClient(spark, path=None, embedding_dim=4))


def _call(server, method, params=None, rid=1):
    return server.handle(
        {"jsonrpc": "2.0", "id": rid, "method": method, "params": params or {}}
    )


def _tool_payload(resp):
    assert resp["result"]["isError"] is False, resp
    return json.loads(resp["result"]["content"][0]["text"])


def test_initialize_and_list(server):
    init = _call(server, "initialize")
    assert init["result"]["serverInfo"]["name"] == "mie-spark"
    listed = _call(server, "tools/list")
    names = {t["name"] for t in listed["result"]["tools"]}
    assert names == set(TOOL_REGISTRY) and len(names) == 9


def test_store_query_status_roundtrip(server):
    stored = _tool_payload(
        _call(
            server,
            "tools/call",
            {
                "name": "mie_store",
                "arguments": {
                    "type": "fact",
                    "content": "MCP transport works",
                    "category": "general",
                },
            },
        )
    )
    assert stored["id"].startswith("fact:")
    queried = _tool_payload(
        _call(
            server,
            "tools/call",
            {
                "name": "mie_query",
                "arguments": {"query": "MCP transport", "mode": "exact"},
            },
        )
    )
    assert queried["count"] == 1
    assert queried["results"][0]["id"] == stored["id"]
    st = _tool_payload(_call(server, "tools/call", {"name": "mie_status"}))
    assert st["healthy"] is True and st["engine"] == "spark"


def test_unknown_tool_is_mcp_error(server):
    resp = _call(server, "tools/call", {"name": "mie_nonsense"})
    assert resp["result"]["isError"] is True
    assert "unknown tool" in resp["result"]["content"][0]["text"]


def test_unknown_method_is_jsonrpc_error(server):
    resp = _call(server, "no/such/method")
    assert resp["error"]["code"] == -32601


def test_notifications_get_no_response(server):
    assert (
        server.handle({"jsonrpc": "2.0", "method": "notifications/initialized"})
        is None
    )
    # even failing or unknown requests stay silent when they carry no id
    assert (
        server.handle(
            {
                "jsonrpc": "2.0",
                "method": "tools/call",
                "params": {"name": "mie_nonsense"},
            }
        )
        is None
    )
    assert server.handle({"jsonrpc": "2.0", "method": "no/such"}) is None


def test_serve_loop_framing(server):
    stdin = io.StringIO(
        "\n".join(
            [
                json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
                "this is not json",
                json.dumps({"jsonrpc": "2.0", "id": 2, "method": "ping"}),
            ]
        )
        + "\n"
    )
    stdout = io.StringIO()
    server.serve(stdin, stdout)
    lines = [json.loads(ln) for ln in stdout.getvalue().splitlines()]
    assert lines[0]["id"] == 1 and "result" in lines[0]
    assert lines[1]["error"]["code"] == -32700
    assert lines[2]["id"] == 2 and lines[2]["result"] == {}
