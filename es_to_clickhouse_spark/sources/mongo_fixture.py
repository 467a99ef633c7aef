"""Loopback MongoDB fixture: a FUNCTIONAL OP_MSG endpoint (raw TCP,
real BSON framing via the engine's own bounded codec) — used to drive
the jar-free Mongo wire paths end-to-end with zero network, by
tests/test_mongo_wire.py and by the corpus's ``s24_mongo_to_ch_pipeline``
(which round-trips rows through the live keyset sync and the ClickHouse
sink fixture).

Implements just enough of the command surface the engine emits:

- ``find`` with the keyset shape (``_id $gt`` filter, ascending sort,
  ``limit``) — fresh cursor per page, id 0 (no getMore state);
- ``listCollections`` → the configured collection names;
- ``fail_after=N``: drop the connection after N served commands (the
  mid-scan transport-failure contract tests pin).

NOT a reference-code port: the reference has no test server at all;
this exists so the protocol the reference drives against a real mongod
(mongodb/mongodb_to_bytehouse.py:524-531) is exercised over an actual
socket."""

from __future__ import annotations

import socketserver
import threading

from es_to_clickhouse_spark.sources.mongo_wire import (
    op_msg,
    parse_op_msg,
    read_frame,
)


class FakeMongod(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, docs, log, fail_after=None,
                 collections=("events", "orders", "system.views"),
                 chaos=None, fail_catalog_calls=()):
        self.docs, self.log, self.fail_after = docs, log, fail_after
        self.collections = collections
        self.chaos = chaos  # sources.chaos_fixture.Chaos or None
        #: 1-based listCollections call numbers to kill (connection
        #: drop before replying) — deterministic daemon-liveness tests
        self.fail_catalog_calls = set(fail_catalog_calls)
        self._catalog_calls = 0

        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                served = 0
                while True:
                    try:
                        frame = read_frame(self.request)
                    except OSError:
                        return
                    rid, _, cmd = parse_op_msg(frame)
                    outer.log.append(cmd)
                    if outer.fail_after is not None and served >= outer.fail_after:
                        self.request.close()  # mid-scan connection drop
                        return
                    if outer.chaos is not None:
                        act = outer.chaos.decide()
                        if act == "reset":
                            self.request.close()  # mid-scan drop
                            return
                        if act == "slow":
                            outer.chaos.maybe_sleep()
                    served += 1
                    if "listCollections" in cmd:
                        outer._catalog_calls += 1
                        if outer._catalog_calls in outer.fail_catalog_calls:
                            self.request.close()  # transient catalog blip
                            return
                        reply = {
                            "cursor": {
                                "firstBatch": [
                                    {"name": c} for c in outer.collections
                                ],
                                "id": 0,
                                "ns": f"{cmd.get('$db')}.$cmd.listCollections",
                            },
                            "ok": 1,
                        }
                        self.request.sendall(op_msg(1000 + rid, reply, rid))
                        continue
                    desc = cmd.get("sort", {}).get("_id", 1) == -1
                    rows = sorted(
                        outer.docs, key=lambda d: d["_id"], reverse=desc
                    )
                    bounds = cmd.get("filter", {}).get("_id", {})
                    gt, lte = bounds.get("$gt"), bounds.get("$lte")
                    if gt is not None:
                        # Type-bracketed like real Mongo: a comparand of
                        # a different BSON type matches NOTHING (e.g. an
                        # int $gt against string _ids) — the failure
                        # mode the tagged watermark exists to prevent.
                        rows = [
                            d for d in rows
                            if type(d["_id"]) is type(gt) and d["_id"] > gt
                        ]
                    if lte is not None:
                        rows = [
                            d for d in rows
                            if type(d["_id"]) is type(lte) and d["_id"] <= lte
                        ]
                    rows = rows[: cmd.get("limit", 101)]
                    reply = {
                        "cursor": {
                            "firstBatch": rows,
                            "id": 0,
                            "ns": f"{cmd.get('$db')}.{cmd.get('find')}",
                        },
                        "ok": 1,
                    }
                    self.request.sendall(op_msg(1000 + rid, reply, rid))

        super().__init__(("127.0.0.1", 0), Handler)


def serve_collection(docs, log=None, fail_after=None,
                     collections=("events", "orders", "system.views"),
                     chaos=None, fail_catalog_calls=()):
    """Start a loopback fake mongod serving ``docs``. Returns
    ``(server, port, log)`` — caller shuts the server down."""
    log = [] if log is None else log
    srv = FakeMongod(docs, log, fail_after, collections, chaos=chaos,
                     fail_catalog_calls=fail_catalog_calls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], log
