"""Loopback ClickHouse HTTP fixture: a FUNCTIONAL endpoint speaking the
public HTTP wire format (query in the URL, JSONEachRow / TabSeparated
bodies) over stdlib http.server — used to drive the jar-free CH wire
paths end-to-end with zero network, by tests/test_ch_http.py and by the
corpus's ``s23_es_to_ch_pipeline`` (which round-trips rows through the
live sink AND the distributed range read against one in-memory table).

Implements just enough of the HTTP interface for the engine's own
request shapes (the ones :class:`sources.ch_http.ClickHouseHttpSource`
emits):

- ``CREATE DATABASE`` / ``CREATE TABLE IF NOT EXISTS`` (the first
  CREATE defines the live schema, parsed from the one-col-per-line DDL
  ddl.create_typed_table_sql emits);
- ``EXISTS TABLE`` → 1/0; ``DESCRIBE TABLE`` → JSONEachRow rows;
- ``ALTER TABLE ADD COLUMN IF NOT EXISTS`` grows the live schema;
- ``INSERT ... FORMAT JSONEachRow`` with an NDJSON body — optional
  strict-column rejection (code 500 like a real server) and
  ``insert_deduplication_token`` honoring (replayed tokens drop);
- ``SELECT *`` with JDBC-style range predicates, watermark conditions,
  LIMIT/OFFSET; ``SELECT COUNT(*)``; ``SELECT max(...)``;
- ``SELECT name FROM system.tables`` and ``GET /ping``.

NOT a reference-code port: the reference has no test server at all;
this exists so the protocol the reference drives against a real
ClickHouse (clickhouse/clickhouse_to_bytehouse.py:303-316) is exercised
over an actual socket."""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(
    log,
    inserted,
    rows_ref=None,
    strict_columns=False,
    seen_tokens=None,
    start_empty=False,
    schema=None,
    table_names=("t1", "t2"),
    chaos=None,
):
    """Build the request handler over an in-memory table.

    ``rows_ref``: the live row store served by SELECT (pass the SAME
    list as ``inserted`` for write-then-read round trips). ``schema``:
    initial DESCRIBE rows [{"name","type"}]; ``start_empty`` = sink
    mode — no table exists until CREATE TABLE arrives. ``log`` records
    every (sql, body, params) for transcript goldens."""
    rows_ref = [] if rows_ref is None else rows_ref
    # mutable live schema: CREATE defines it, ALTER ADD COLUMN grows it
    # (strict mode rejects INSERT rows carrying unknown columns)
    known = [] if start_empty else [dict(r) for r in (schema or [])]
    created = {"flag": not start_empty}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _reply(self, text, code=200):
            data = text.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/ping":
                self._reply("Ok.\n")
            else:
                self._reply("not found", code=404)

        def _apply_insert(self, sql, body, params):
            """Apply one INSERT (rows + dedup token bookkeeping).
            Returns an error string (500 body) or None on success —
            shared by the normal path and the chaos applied-then-
            dropped path."""
            rows = [
                json.loads(ln) for ln in body.splitlines() if ln.strip()
            ]
            if strict_columns:
                names = {c["name"] for c in known}
                bad = {k for r in rows for k in r} - names
                if bad:
                    return (
                        "Code: 16. DB::Exception: No such column "
                        f"{sorted(bad)[0]} in table"
                    )
            token = params.get("insert_deduplication_token")
            if token is not None and seen_tokens is not None:
                if token in seen_tokens:
                    return None  # dedup: drop replay
                seen_tokens.add(token)
            inserted.extend(rows)
            return None

        def do_POST(self):
            q = urllib.parse.urlsplit(self.path).query
            params = dict(urllib.parse.parse_qsl(q))
            sql = params.get("query", "")
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode("utf-8") if n else ""
            log.append({"sql": sql, "body": body, "params": params})
            if chaos is not None:
                act = chaos.decide()
                if act == "reset":
                    if sql.startswith("INSERT INTO"):
                        # the HARSH insert failure: the server APPLIES
                        # the batch, then the response is lost — the
                        # client must retry with the same dedup token
                        # and the replay must drop (exactly-once)
                        self._apply_insert(sql, body, params)
                    self.connection.close()
                    return
                if act == "slow":
                    chaos.maybe_sleep()
            if sql.startswith("CREATE DATABASE"):
                return self._reply("")
            if sql.startswith("CREATE TABLE"):
                # IF NOT EXISTS: only the first CREATE defines the
                # schema (ddl.create_typed_table_sql's one-col-per-
                # line shape)
                if not created["flag"]:
                    body_part = sql.split("(\n", 1)[1].split("\n)", 1)[0]
                    for line in body_part.splitlines():
                        m = re.search(r"`(\w+)` (.+?),?$", line.strip())
                        if m:
                            known.append(
                                {"name": m.group(1), "type": m.group(2)}
                            )
                    created["flag"] = True
                return self._reply("")
            if sql.startswith("EXISTS TABLE"):
                return self._reply("1\n" if created["flag"] else "0\n")
            if not created["flag"]:
                return self._reply(
                    "Code: 60. DB::Exception: Unknown table", code=500
                )
            if sql.startswith("ALTER TABLE"):
                m = re.search(r"ADD COLUMN IF NOT EXISTS `(\w+)` (.+)$", sql)
                if m and m.group(1) not in {c["name"] for c in known}:
                    known.append({"name": m.group(1), "type": m.group(2)})
                return self._reply("")
            if sql.startswith("INSERT INTO"):
                err = self._apply_insert(sql, body, params)
                if err:
                    return self._reply(err, code=500)
                return self._reply("")
            if sql.startswith("DESCRIBE TABLE"):
                return self._reply(
                    "\n".join(json.dumps(r) for r in known) + "\n"
                )
            if "COUNT(*)" in sql:
                return self._reply(f"{len(rows_ref)}\n")
            if sql.startswith("SELECT max("):
                rows = list(rows_ref)
                m = re.search(r"`created_at` > '([^']+)'", sql)
                if m:
                    rows = [r for r in rows if r["created_at"] > m.group(1)]
                mx = max((r["created_at"] for r in rows), default=None)
                return self._reply(f"{mx}\n" if mx else "\\N\n")
            if sql.startswith("SELECT name FROM system.tables"):
                return self._reply(
                    "".join(json.dumps({"name": t}) + "\n" for t in table_names)
                )
            if sql.startswith("SELECT * FROM"):
                rows = list(rows_ref)
                # JDBC-style range predicates: first partition is
                # `< hi OR IS NULL`, middles `>= lo AND < hi`,
                # last a bare `>= lo`
                m = re.search(r"\(`(\w+)` < (\d+) OR `\1` IS NULL\)", sql)
                if m:
                    col, hi = m.group(1), int(m.group(2))
                    rows = [
                        r for r in rows
                        if r.get(col) is None or r[col] < hi
                    ]
                elif re.search(r"`(\w+)` >= (\d+) AND `\1` < (\d+)", sql):
                    m = re.search(r"`(\w+)` >= (\d+) AND `\1` < (\d+)", sql)
                    col, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
                    rows = [
                        r for r in rows
                        if r.get(col) is not None and lo <= r[col] < hi
                    ]
                elif re.search(r"`(\w+)` >= (\d+)", sql):
                    m = re.search(r"`(\w+)` >= (\d+)", sql)
                    col, lo = m.group(1), int(m.group(2))
                    rows = [
                        r for r in rows
                        if r.get(col) is not None and r[col] >= lo
                    ]
                m = re.search(r"`created_at` > '([^']+)'", sql)
                if m:
                    rows = [r for r in rows if r["created_at"] > m.group(1)]
                m = re.search(r"LIMIT (\d+) OFFSET (\d+)", sql)
                if m:
                    lim, off = int(m.group(1)), int(m.group(2))
                    rows = rows[off : off + lim]
                return self._reply(
                    "".join(json.dumps(r) + "\n" for r in rows)
                )
            return self._reply(f"unhandled: {sql}", code=500)

    return Handler


def serve_clickhouse(
    log=None,
    inserted=None,
    rows_ref=None,
    strict_columns=False,
    seen_tokens=None,
    start_empty=False,
    schema=None,
    table_names=("t1", "t2"),
    chaos=None,
):
    """Start a loopback fixture. Returns ``(server, host_url, log,
    inserted)`` — caller shuts the server down."""
    log = [] if log is None else log
    inserted = [] if inserted is None else inserted
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(
            log, inserted, rows_ref, strict_columns, seen_tokens,
            start_empty, schema, table_names, chaos=chaos,
        ),
    )
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}", log, inserted
