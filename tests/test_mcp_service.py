"""MCP tool-server surface: handshake, tool list, SQL tools, guards."""

from __future__ import annotations

import io
import json

import pytest

from jde_to_datalake_spark.plans.mcp_service import McpEngineServer


@pytest.fixture()
def server(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS people")
    srv = McpEngineServer(spark, str(tmp_path / "people_tbl"))
    yield srv
    spark.sql("DROP TABLE IF EXISTS people")


def _call(server, name, **arguments):
    return server.handle(
        {
            "jsonrpc": "2.0",
            "id": 1,
            "method": "tools/call",
            "params": {"name": name, "arguments": arguments},
        }
    )


def test_initialize_handshake(server):
    resp = server.handle({"jsonrpc": "2.0", "id": 0, "method": "initialize"})
    assert resp["result"]["protocolVersion"]
    assert "tools" in resp["result"]["capabilities"]
    assert server.handle({"method": "notifications/initialized"}) is None


def test_tools_list(server):
    resp = server.handle({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
    names = {t["name"] for t in resp["result"]["tools"]}
    assert names == {"add_data", "read_data"}
    for t in resp["result"]["tools"]:
        assert t["inputSchema"]["type"] == "object"


def test_insert_then_select_roundtrip(server):
    r1 = _call(
        server,
        "add_data",
        query=(
            "INSERT INTO people VALUES "
            "(1, 'Alice Smith', 25, 'Developer'), "
            "(2, 'John Doe', 30, 'Engineer')"
        ),
    )
    assert not r1["result"].get("isError")
    r2 = _call(
        server, "read_data", query="SELECT name, age FROM people WHERE age > 26"
    )
    rows = json.loads(r2["result"]["content"][0]["text"])
    assert rows == [["John Doe", 30]]
    # default query reads the whole table
    r3 = _call(server, "read_data")
    assert len(json.loads(r3["result"]["content"][0]["text"])) == 2


def test_statement_guards(server):
    r = _call(server, "add_data", query="SELECT * FROM people")
    assert r["result"]["isError"]
    r = _call(server, "read_data", query="DROP TABLE people")
    assert r["result"]["isError"]
    r = _call(server, "read_data", query="SELECT 1; SELECT 2")
    assert r["result"]["isError"]
    # the write guard names the TARGET, not just the verb
    r = _call(
        server,
        "add_data",
        query="INSERT OVERWRITE DIRECTORY '/tmp/x' USING csv SELECT 1",
    )
    assert r["result"]["isError"]
    r = _call(server, "add_data", query="INSERT INTO other_table VALUES (1)")
    assert r["result"]["isError"]
    # tool errors are results (isError), protocol errors are JSON-RPC errors
    r = _call(server, "nope")
    assert "error" in r


def test_semicolon_inside_literal_is_allowed(server):
    r = _call(
        server,
        "add_data",
        query="INSERT INTO people VALUES (7, 'Smith; Alice', 25, 'Dev')",
    )
    assert not r["result"].get("isError"), r
    rows = json.loads(
        _call(server, "read_data", query="SELECT name FROM people WHERE id = 7")[
            "result"
        ]["content"][0]["text"]
    )
    assert rows == [["Smith; Alice"]]


def test_non_object_messages_get_invalid_request(server):
    for bad in ([1, 2], 42, "hi"):
        r = server.handle(bad)
        assert r["error"]["code"] == -32600
    r = server.handle(
        {"jsonrpc": "2.0", "id": 1, "method": "tools/call", "params": [1]}
    )
    assert r["error"]["code"] == -32602


def test_unknown_method_is_jsonrpc_error(server):
    r = server.handle({"jsonrpc": "2.0", "id": 9, "method": "resources/list"})
    assert r["error"]["code"] == -32601


def test_stdio_loop(server):
    lines = [
        json.dumps({"jsonrpc": "2.0", "id": 0, "method": "initialize"}),
        json.dumps({"method": "notifications/initialized"}),
        "not json",
        json.dumps(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {
                    "name": "add_data",
                    "arguments": {
                        "query": "INSERT INTO people VALUES (3, 'Eve', 41, 'Baker')"
                    },
                },
            }
        ),
        json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
    ]
    out = io.StringIO()
    server.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
    resps = [json.loads(x) for x in out.getvalue().strip().split("\n")]
    # notification produced no response; parse error produced one
    assert len(resps) == 4
    assert resps[0]["result"]["serverInfo"]["name"]
    assert resps[1]["error"]["code"] == -32700
    assert not resps[2]["result"].get("isError")
    assert {t["name"] for t in resps[3]["result"]["tools"]} == {
        "add_data",
        "read_data",
    }


def test_escaped_quote_does_not_flip_quote_state(server):
    """A backslash-escaped quote inside a literal must not invert the
    scanner's state: the chained statement after it is rejected HERE,
    not left to Spark's parser (round-3 advisor finding)."""
    r = _call(
        server, "read_data",
        query="SELECT 'a\\'b' AS x FROM people; DROP TABLE people",
    )
    assert r["result"]["isError"]
    assert "multiple SQL statements" in r["result"]["content"][0]["text"]
    # the escaped quote alone is fine
    r = _call(server, "read_data", query="SELECT 'a\\'b;c' AS x FROM people")
    assert not r["result"].get("isError"), r
    # double-quoted literals and backtick identifiers scan too
    r = _call(server, "read_data", query='SELECT ";" AS x FROM `people`')
    assert not r["result"].get("isError"), r
    r = _call(server, "read_data", query='SELECT ";" FROM people; SELECT 1')
    assert r["result"]["isError"]


def test_read_data_scoped_to_bound_table(server, spark):
    """read_data may only touch the advertised table: any other
    registered table/view in the shared session is out of scope
    (round-3 advisor finding)."""
    spark.range(3).createOrReplaceTempView("secrets")
    try:
        r = _call(server, "read_data", query="SELECT * FROM secrets")
        assert r["result"]["isError"]
        assert "people" in r["result"]["content"][0]["text"]
        # joins and subqueries smuggle relations too
        r = _call(
            server, "read_data",
            query="SELECT * FROM people p JOIN secrets s ON p.id = s.id",
        )
        assert r["result"]["isError"]
        r = _call(
            server, "read_data",
            query="SELECT (SELECT COUNT(*) FROM secrets) FROM people",
        )
        assert r["result"]["isError"]
        # the bound table itself still works, including self-joins
        r = _call(
            server, "read_data",
            query="SELECT COUNT(*) FROM people a JOIN people b ON a.id = b.id",
        )
        assert not r["result"].get("isError"), r
    finally:
        spark.catalog.dropTempView("secrets")
