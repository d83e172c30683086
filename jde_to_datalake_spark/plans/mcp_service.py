"""Minimal MCP (Model Context Protocol) tool server over the engine.

Re-expresses the reference's MCP demo server — backend/mcp/servrer.py:1-126,
a FastMCP 'sqlite-demo' exposing two SQL tools (``add_data`` = INSERT,
``read_data`` = SELECT) against a sqlite ``people`` table — Spark-first:
the same tool surface runs against a Spark SQL table, so tool-calling
agents (the reference's backend/mcp/client.py loop) get distributed
query execution instead of a single sqlite file.

The ``mcp``/FastMCP package is not available in this container, so the
protocol layer here is a dependency-free JSON-RPC 2.0 handler
implementing the MCP core methods — ``initialize``, ``tools/list``,
``tools/call`` (plus the ``notifications/initialized`` no-op) — with a
thin stdio line loop on top. The handler is transport-agnostic and
tested in-process; the wire format follows the published MCP spec
(JSON-RPC 2.0, tools advertised with JSON-Schema inputSchema, results
as ``content: [{type: "text", ...}]``).

Guards (the engine is multi-tenant where sqlite was not):
- ``add_data`` accepts a single INSERT statement only;
- ``read_data`` accepts a single SELECT statement only;
- results are capped at ``max_rows`` (driver-side collect guard, same
  convention as sources/excel.py and plans/query_service.py).
"""

from __future__ import annotations

import json
import sys
from typing import Any

from pyspark.sql import SparkSession

PROTOCOL_VERSION = "2024-11-05"
SERVER_INFO = {"name": "jde-to-datalake-spark", "version": "1.0"}

_TOOLS = [
    {
        "name": "add_data",
        "description": (
            "Add new data to the people table using a SQL INSERT query, "
            "e.g. INSERT INTO people (name, age, profession) "
            "VALUES ('Alice Smith', 25, 'Developer')"
        ),
        "inputSchema": {
            "type": "object",
            "properties": {"query": {"type": "string"}},
            "required": ["query"],
        },
    },
    {
        "name": "read_data",
        "description": (
            "Read data from the people table using a SQL SELECT query "
            "(defaults to SELECT * FROM people)"
        ),
        "inputSchema": {
            "type": "object",
            "properties": {"query": {"type": "string"}},
            "required": [],
        },
    },
]


def _single_statement(sql: str) -> str:
    """Reject statement chaining; semicolons inside quoted regions are
    fine.

    The scan tracks all three Spark SQL quoting forms — single-quoted
    and double-quoted string literals (in which a backslash escapes
    the next character, so ``'a\\'b'`` does NOT end the literal) and
    backtick-quoted identifiers (no backslash escapes; `````` is a
    doubled backtick, which the toggle handles naturally). The round-3
    advisor showed the old single-quote-only toggle inverted its state
    on escaped quotes, making the guard depend on Spark's parser to
    reject the chained statement instead of rejecting it here.
    """
    stmt = sql.strip().rstrip(";").strip()
    quote: str | None = None  # None | "'" | '"' | '`'
    i = 0
    while i < len(stmt):
        ch = stmt[i]
        if quote in ("'", '"'):
            if ch == "\\":  # escaped char inside a string literal
                i += 2
                continue
            if ch == quote:
                quote = None
        elif quote == "`":
            if ch == "`":
                quote = None
        elif ch in ("'", '"', "`"):
            quote = ch
        elif ch == ";":
            raise ValueError("multiple SQL statements are not allowed")
        i += 1
    return stmt


class McpEngineServer:
    """MCP tool server bound to one SparkSession.

    ``table_location`` backs the ``people`` table as an external
    parquet table so INSERTs are real SQL writes (the engine analog of
    the reference's ``CREATE TABLE IF NOT EXISTS people`` at
    servrer.py:10-17) without touching the global warehouse dir.
    """

    def __init__(
        self,
        spark: SparkSession,
        table_location: str,
        table: str = "people",
        max_rows: int = 1000,
    ) -> None:
        self.spark = spark
        self.table = table
        self.max_rows = max_rows
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} "
            "(id BIGINT, name STRING, age INT, profession STRING) "
            f"USING parquet LOCATION '{table_location}'"
        )

    # -- tool implementations -------------------------------------------
    def _add_data(self, query: str) -> str:
        import re

        stmt = _single_statement(query)
        # the guard names the TARGET, not just the verb: INSERT
        # OVERWRITE, INSERT ... DIRECTORY, or inserts into other tables
        # are all outside this tool's advertised contract
        if not re.match(
            rf"insert\s+into\s+`?{re.escape(self.table)}`?\b",
            stmt,
            re.IGNORECASE,
        ):
            raise ValueError(
                f"add_data accepts a single INSERT INTO {self.table} statement"
            )
        self.spark.sql(stmt)
        return "true"

    def _referenced_relations(self, stmt: str) -> set[str]:
        """Relation names the statement references, from the PARSED
        (unresolved) logical plan — subqueries and joins included,
        comments/strings already stripped by the real parser."""
        import re

        try:
            plan = (
                self.spark._jsparkSession.sessionState()
                .sqlParser().parsePlan(stmt).toString()
            )
        except Exception as e:
            raise ValueError(f"invalid SQL: {e}") from None
        return set(re.findall(r"'UnresolvedRelation \[([^\]]+)\]", plan))

    def _read_data(self, query: str | None) -> str:
        stmt = _single_statement(query or f"SELECT * FROM {self.table}")
        if not stmt.lower().startswith("select"):
            raise ValueError("read_data accepts a single SELECT statement")
        # scope guard: the tool advertises ONE table; the shared
        # SparkSession is multi-tenant, so any other registered
        # table/view reachable by name is outside the contract
        # (round-3 advisor finding). CTE self-references parse as
        # relations too, so WITH aliases other than the bound table
        # are rejected — conservative by design.
        for rel in self._referenced_relations(stmt):
            parts = [p.strip().lower() for p in rel.split(",")]
            if parts[-1] != self.table.lower() or len(parts) > 1:
                raise ValueError(
                    f"read_data may only reference the {self.table} table "
                    f"(got {'.'.join(parts)})"
                )
        rows = self.spark.sql(stmt).limit(self.max_rows).collect()
        return json.dumps([list(r) for r in rows], default=str)

    # -- JSON-RPC / MCP handler -----------------------------------------
    def handle(self, msg: Any) -> dict[str, Any] | None:
        """One request in, one response out (None for notifications)."""
        if not isinstance(msg, dict):  # batch arrays / bare scalars
            return {
                "jsonrpc": "2.0",
                "id": None,
                "error": {"code": -32600, "message": "invalid request"},
            }
        method = msg.get("method")
        mid = msg.get("id")
        if method == "notifications/initialized":
            return None

        def ok(result: Any) -> dict[str, Any]:
            return {"jsonrpc": "2.0", "id": mid, "result": result}

        def err(code: int, message: str) -> dict[str, Any]:
            return {
                "jsonrpc": "2.0",
                "id": mid,
                "error": {"code": code, "message": message},
            }

        if method == "initialize":
            return ok(
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                }
            )
        if method == "tools/list":
            return ok({"tools": _TOOLS})
        if method == "tools/call":
            params = msg.get("params")
            if not isinstance(params, dict):
                return err(-32602, "params must be an object")
            name = params.get("name")
            args = params.get("arguments")
            if not isinstance(args, dict):
                args = {}
            try:
                if name == "add_data":
                    text = self._add_data(args["query"])
                elif name == "read_data":
                    text = self._read_data(args.get("query"))
                else:
                    return err(-32602, f"unknown tool: {name}")
            except Exception as e:  # tool errors are results, not protocol errors
                return ok(
                    {
                        "content": [{"type": "text", "text": str(e)}],
                        "isError": True,
                    }
                )
            return ok({"content": [{"type": "text", "text": text}]})
        return err(-32601, f"method not found: {method}")

    # -- stdio transport -------------------------------------------------
    def serve_stdio(self, stdin=None, stdout=None) -> None:
        """Newline-delimited JSON-RPC loop (MCP stdio transport)."""
        stdin = stdin if stdin is not None else sys.stdin
        stdout = stdout if stdout is not None else sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                resp: dict[str, Any] | None = {
                    "jsonrpc": "2.0",
                    "id": None,
                    "error": {"code": -32700, "message": "parse error"},
                }
            else:
                resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()
