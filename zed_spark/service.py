"""Minimal query service — the reference's lake-service entry point
(reference: service/core.go:169-191 route table; POST /query runs a
compiled query and streams results).

stdlib-only (http.server): POST /query with a zed-language body (or
{"query": ..., "sf_dir": ...} JSON) → ndjson rows. GET /pools lists
lake pools when the server is given a lake root; branch endpoints
(GET /pools/<p>/branches, POST /pools/<p>/{branch,merge,revert})
mirror service/core.go's branch routes, and GET /events is the SSE
commit feed (service/core.go:173). This is a thin driver-side shim —
execution stays fully distributed in Spark; the HTTP layer only
streams the collected result, like the reference. Not a production
server — API-parity surface.
"""

from __future__ import annotations

import json
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession


class QueryService:
    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str | None = None,
        lake_root: str | None = None,
        tables: dict | None = None,
        max_rows: int = 10_000,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.lake_root = lake_root
        self.tables = tables or {}
        # result cap: an unbounded collect() would let one
        # `from lineitem` OOM the driver; clients page with
        # {"limit": N} up to this ceiling
        self.max_rows = max_rows
        self._server: ThreadingHTTPServer | None = None

    def _run_query(
        self, text: str, sf_dir: str | None, limit: int | None = None
    ) -> tuple[list[dict], bool]:
        """Returns (rows, truncated). Source resolution is restricted
        to registered tables / sf_dir tables (allow_paths=False): a
        network client must never be able to read arbitrary host
        files via `from /some/path`."""
        from zed_spark.session import ZedSession

        cap = min(limit, self.max_rows) if limit else self.max_rows
        z = ZedSession(self.spark)
        df = z.query(
            text,
            sf_dir=sf_dir or self.sf_dir,
            tables=self.tables,
            allow_paths=False,
            lake=self.lake_root,
        ).df
        rows = [row.asDict(recursive=True) for row in df.limit(cap + 1).collect()]
        return rows[:cap], len(rows) > cap

    def _pools(self) -> list[str]:
        if not self.lake_root:
            return []
        from zed_spark.sources.lake import Lake

        return Lake(self.spark, self.lake_root).pools()

    def _pool(self, name: str):
        if not self.lake_root:
            raise ValueError("service has no lake root")
        from zed_spark.sources.lake import Lake

        return Lake(self.spark, self.lake_root).pool(name)

    def start(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving in a daemon thread; returns the bound port."""
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet
                pass

            def _send(self, code: int, payload: bytes, ctype: str = "application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                if self.path == "/pools":
                    self._send(200, json.dumps(svc._pools()).encode())
                elif self.path == "/status":
                    self._send(200, b'{"ok": true}')
                elif self.path == "/events":
                    self._serve_events()
                elif self.path.startswith("/pools/") and self.path.endswith("/branches"):
                    name = self.path[len("/pools/"):-len("/branches")]
                    try:
                        rows = [
                            r.asDict() for r in svc._pool(name).meta_branches().collect()
                        ]
                        self._send(200, json.dumps(rows).encode())
                    except Exception as exc:
                        self._send(400, json.dumps({"error": str(exc)[:300]}).encode())
                else:
                    self._send(404, b'{"error": "not found"}')

            def _serve_events(self):
                """SSE commit feed (service/core.go:173): every lake
                commit in this process streams as an event."""
                from zed_spark.sources import lake as lake_mod

                q: queue.Queue = queue.Queue()
                lake_mod.subscribe_commits(q.put)
                try:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    while True:
                        try:
                            ev = q.get(timeout=0.5)
                        except queue.Empty:
                            self.wfile.write(b": keepalive\n\n")
                            self.wfile.flush()
                            continue
                        payload = (
                            f"event: {ev.get('type', 'commit')}\n"
                            f"data: {json.dumps(ev)}\n\n"
                        )
                        self.wfile.write(payload.encode())
                        self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError, OSError):
                    pass
                finally:
                    lake_mod.unsubscribe_commits(q.put)

            def _branch_op(self, name: str, op: str, body: dict):
                pool = svc._pool(name)
                if op == "branch":
                    pool.create_branch(body["name"], body.get("from", "main"))
                    return {"ok": True}
                if op == "merge":
                    c = pool.merge(
                        body["source"],
                        body.get("into", "main"),
                        body.get("author", ""),
                        body.get("message", ""),
                    )
                    return {"commit": c}
                if op == "revert":
                    c = pool.revert(
                        body["commit"], body.get("branch", "main"), body.get("author", "")
                    )
                    return {"commit": c}
                raise ValueError(f"unknown pool op {op!r}")

            def do_POST(self):
                if self.path.startswith("/pools/"):
                    parts = self.path[len("/pools/"):].split("/")
                    if len(parts) == 2 and parts[1] in ("branch", "merge", "revert"):
                        n = int(self.headers.get("Content-Length", 0))
                        try:
                            body = json.loads(self.rfile.read(n) or b"{}")
                            out = self._branch_op(parts[0], parts[1], body)
                            self._send(200, json.dumps(out).encode())
                        except Exception as exc:
                            self._send(
                                400, json.dumps({"error": str(exc)[:300]}).encode()
                            )
                        return
                if self.path != "/query":
                    self._send(404, b'{"error": "not found"}')
                    return
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n).decode("utf-8", errors="replace")
                try:
                    parsed = json.loads(body)
                    text = parsed["query"]
                    sf_dir = parsed.get("sf_dir")
                    limit = parsed.get("limit")
                except (json.JSONDecodeError, TypeError, KeyError):
                    text, sf_dir, limit = body, None, None
                try:
                    rows, truncated = svc._run_query(text, sf_dir, limit)
                except SyntaxError as exc:
                    self._send(400, json.dumps({"error": f"parse: {exc}"}).encode())
                    return
                except Exception as exc:  # compile/execute errors → 400
                    self._send(400, json.dumps({"error": str(exc)[:500]}).encode())
                    return
                out = "\n".join(json.dumps(r, default=str) for r in rows).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.send_header("Content-Length", str(len(out)))
                self.send_header("X-Truncated", "true" if truncated else "false")
                self.end_headers()
                self.wfile.write(out)

        self._server = ThreadingHTTPServer((host, port), Handler)
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self._server.server_port

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server = None
