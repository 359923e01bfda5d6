"""HTTP control plane (reference R14: `healthHandler`, main.go:327-364,
and the Prometheus /metrics endpoint, main.go:88).

Serves the same three endpoints over stdlib http.server:
  /health, /ready  -> HealthStatus JSON (pkg/model/model.go:69-76 shape):
                      probes the streaming query's liveness the way the
                      reference pings Pulsar (TopicPartitions) and ES
                      (Info()).
  /metrics         -> Prometheus text exposition of the listener's
                      counters (pkg/metrics/metrics.go:9-41 parity:
                      received / decode_errors / batches).

Runs on a daemon thread next to the driver — the control path never
touches executors, mirroring the reference's separate HTTP goroutine
(main.go:298-302).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from go_pulsar_elasticsearch_spark.streaming.listener import MetricsListener


def _prometheus_text(listener: MetricsListener) -> str:
    lines = []
    for name, value, help_ in (
        ("gpe_received_total", listener.received,
         "Records received (ref: pulsar_es_received)"),
        ("gpe_decode_errors_total", listener.decode_errors,
         "Records that failed decode (ref: pulsar_es_errors)"),
        ("gpe_batches_total", len(listener.progress_events),
         "Micro-batches processed"),
    ):
        lines.append(f"# HELP {name} {help_}")
        lines.append(f"# TYPE {name} counter")
        lines.append(f"{name} {value}")
    return "\n".join(lines) + "\n"


def serve_health(listener: MetricsListener, query=None, port: int = 0):
    """Start the control-plane server; returns (server, thread, port).
    port=0 picks a free port (tests); the reference uses :8080."""

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path in ("/health", "/ready"):
                body = json.dumps(listener.health(query)).encode()
                status = 200 if listener.last_error is None else 503
                ctype = "application/json"
            elif self.path == "/metrics":
                body = _prometheus_text(listener).encode()
                status, ctype = 200, "text/plain; version=0.0.4"
            else:
                body, status, ctype = b"not found", 404, "text/plain"
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return server, thread, server.server_address[1]


def install_shutdown_handler(queries: list, server=None) -> "callable":
    """R16 (`main.go:306-325`): SIGINT/SIGTERM -> stop streaming queries
    (checkpoint guarantees clean resume) and shut the HTTP server down.
    Returns the handler (also invokable directly, as tests do)."""
    import signal

    def handler(signum=None, frame=None):
        for q in queries:
            try:
                if q.isActive:
                    q.stop()
            except Exception:
                pass
        if server is not None:
            threading.Thread(target=server.shutdown, daemon=True).start()

    for sig in (signal.SIGINT, signal.SIGTERM):
        try:
            signal.signal(sig, handler)
        except ValueError:
            pass  # not on the main thread (tests) — direct invocation only
    return handler
