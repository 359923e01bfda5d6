"""In-process mock Pulsar broker implementing the DELIVERY-LOOP
semantics the reference's consumer relies on (pulsar.go:91-105) — the
consume-side twin of sources/es_mock_cluster.py:

- shared-subscription receive with per-message delivery counts;
- ``nack``: the message becomes redeliverable after
  ``NackRedeliveryDelay`` (pulsar.go:96, .env INSERT_RETRY_DELAY) —
  unless it has already been delivered ``MaxDeliveries`` times
  (pulsar.go:98, .env RETRIES), in which case the broker publishes it
  to the DLQ topic (pulsar.go:99, .env DATA_DLQ_TOPIC) EXACTLY ONCE
  and retires it from the subscription;
- ``ack``: retires the message;
- ``redeliver_unacked``: the ack-timeout / consumer-crash path — every
  in-flight message becomes immediately available again (delivery
  counts intact), which is why the downstream sink must be idempotent
  (doc-id keyed, es.go:186).

Time is VIRTUAL (``advance()``): tests drive redelivery delays
deterministically instead of sleeping.  All bookkeeping is
metadata-sized (message ids + counters); payloads live once per topic.

This is a test double for semantics certification: the production path
swaps in the real pulsar-spark connector, whose broker enforces the
same contract server-side.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class Message:
    msg_id: int
    payload: bytes
    publish_time: float
    properties: dict = field(default_factory=dict)


@dataclass
class _DeliveryState:
    delivery_count: int = 0
    available_at: float = 0.0   # virtual time when receivable again
    in_flight: bool = False
    done: bool = False          # acked or routed to DLQ


class MockPulsarBroker:
    def __init__(
        self,
        nack_redelivery_delay_s: float = 10.0,
        max_deliveries: int = 3,
        dlq_topic: str = "public/default/data.dlq",
    ):
        self.nack_redelivery_delay_s = nack_redelivery_delay_s
        self.max_deliveries = max_deliveries
        self.dlq_topic = dlq_topic
        self.now = 0.0
        self._lock = threading.Lock()
        self._topics: dict[str, list[Message]] = {}
        self._by_id: dict[str, dict[int, Message]] = {}
        # (topic, subscription) -> msg_id -> per-message delivery state
        self._subs: dict[tuple[str, str], dict[int, _DeliveryState]] = {}
        # how many of the topic's messages each subscription has state
        # for — keeps _states() incremental, so ack/nack stay O(1)
        self._sub_seen: dict[tuple[str, str], int] = {}
        self._next_id = 0

    # ------------------------------------------------------------ produce

    def publish(self, topic: str, payload: bytes,
                properties: dict | None = None) -> int:
        with self._lock:
            self._next_id += 1
            mid = self._next_id
            msg = Message(mid, payload, self.now, dict(properties or {}))
            self._topics.setdefault(topic, []).append(msg)
            self._by_id.setdefault(topic, {})[mid] = msg
            return mid

    # ------------------------------------------------------------ consume

    def _states(self, topic: str, subscription: str) -> dict:
        key = (topic, subscription)
        states = self._subs.setdefault(key, {})
        msgs = self._topics.get(topic, ())
        seen = self._sub_seen.get(key, 0)
        for m in msgs[seen:]:  # incremental: new messages only
            states[m.msg_id] = _DeliveryState()
        self._sub_seen[key] = len(msgs)
        return states

    def receive(self, topic: str, subscription: str,
                max_messages: int = 100) -> list[Message]:
        """Deliver up to ``max_messages`` receivable messages (not done,
        not in flight, redelivery delay elapsed), bumping each one's
        delivery count — the broker-side half of a Shared-subscription
        consumer's receive channel (pulsar.go:102 MessageChannel)."""
        with self._lock:
            states = self._states(topic, subscription)
            out: list[Message] = []
            for m in self._topics.get(topic, ()):
                if len(out) >= max_messages:
                    break
                st = states[m.msg_id]
                if st.done or st.in_flight or st.available_at > self.now:
                    continue
                st.in_flight = True
                st.delivery_count += 1
                out.append(m)
            return out

    def ack(self, topic: str, subscription: str, msg_id: int) -> None:
        with self._lock:
            st = self._states(topic, subscription)[msg_id]
            st.in_flight = False
            st.done = True

    def nack(self, topic: str, subscription: str, msg_id: int) -> None:
        """Negative ack: schedule redelivery after the delay — or, when
        the message has exhausted MaxDeliveries, publish it to the DLQ
        topic exactly once and retire it (pulsar.go:97-100)."""
        with self._lock:
            states = self._states(topic, subscription)
            st = states[msg_id]
            st.in_flight = False
            if st.done:
                return
            if st.delivery_count >= self.max_deliveries:
                msg = self._by_id[topic][msg_id]
                st.done = True
                self._next_id += 1
                dlq_msg = Message(
                    self._next_id,
                    msg.payload,
                    self.now,
                    {
                        **msg.properties,
                        "REAL_TOPIC": topic,
                        "ORIGIN_MESSAGE_ID": str(msg_id),
                        "DELIVERY_COUNT": str(st.delivery_count),
                    },
                )
                self._topics.setdefault(self.dlq_topic, []).append(dlq_msg)
                self._by_id.setdefault(self.dlq_topic, {})[
                    dlq_msg.msg_id
                ] = dlq_msg
            else:
                st.available_at = self.now + self.nack_redelivery_delay_s

    def _free_locked(self, st: _DeliveryState) -> bool:
        """Make one in-flight message immediately receivable again
        (caller holds the lock).  The single definition of redelivery-
        on-crash semantics for both the blanket and targeted paths."""
        if not st.in_flight or st.done:
            return False
        st.in_flight = False
        st.available_at = self.now
        return True

    def redeliver_unacked(self, topic: str, subscription: str) -> int:
        """Consumer crash / ack-timeout: every in-flight message becomes
        immediately receivable again.  Returns how many."""
        with self._lock:
            return sum(
                self._free_locked(st)
                for st in self._states(topic, subscription).values()
            )

    def in_flight_ids(self, topic: str, subscription: str) -> list[int]:
        """Message ids currently held by a consumer (delivered, neither
        acked nor nacked) — what a restart must reconcile."""
        with self._lock:
            return [
                mid
                for mid, st in self._states(topic, subscription).items()
                if st.in_flight and not st.done
            ]

    def redeliver(self, topic: str, subscription: str,
                  msg_ids: list[int]) -> int:
        """Targeted crash recovery: make exactly ``msg_ids`` receivable
        again (ids a restarted consumer knows it will NOT replay).
        Unlike redeliver_unacked this never frees messages another
        replay path still owns.  Returns how many were freed."""
        with self._lock:
            states = self._states(topic, subscription)
            return sum(
                self._free_locked(states[mid])
                for mid in msg_ids
                if mid in states
            )

    # ------------------------------------------------------------- clock

    def advance(self, seconds: float) -> None:
        with self._lock:
            self.now += seconds

    # ---------------------------------------------------------- inspect

    def pending(self, topic: str, subscription: str) -> int:
        """Messages not yet acked/DLQ-routed (in flight or waiting)."""
        with self._lock:
            return sum(
                0 if st.done else 1
                for st in self._states(topic, subscription).values()
            )

    def waiting(self, topic: str, subscription: str) -> int:
        """Messages neither done nor in flight — receivable now or after
        a redelivery delay.  A streaming reader advances the virtual
        clock only when this is non-zero: pending-but-in-flight means
        another micro-batch holds them, not that time must pass."""
        with self._lock:
            return sum(
                1
                for st in self._states(topic, subscription).values()
                if not st.done and not st.in_flight
            )

    def delivery_count(self, topic: str, subscription: str,
                       msg_id: int) -> int:
        with self._lock:
            return self._states(topic, subscription)[msg_id].delivery_count

    def topic_messages(self, topic: str) -> list[Message]:
        with self._lock:
            return list(self._topics.get(topic, ()))


# --------------------------------------------------------------------------
# HTTP wire layer — a real Pulsar broker is a NETWORK service, and the
# streaming engine runs its Python source reader in a separate worker
# process (python_streaming_source_runner), so the consume channel must
# cross a process boundary exactly like production.  Same topology as
# es_mock_cluster: ephemeral localhost port, daemon thread.
# --------------------------------------------------------------------------


def make_broker_server(broker: MockPulsarBroker):
    """Serve ``broker`` over HTTP; returns (server, url).  Endpoints:
    POST /receive {topic, subscription, max_messages} -> {messages:
    [{msg_id, payload (hex), properties}]}; GET /waiting, /pending,
    /in_flight (?topic=&subscription=); POST /advance {} (one
    redelivery delay); POST /ack, /nack, /redeliver {topic,
    subscription, msg_ids: [...]} — the PRODUCER-SIDE channel end, so
    an engine-owned sink can reconcile deliveries over the same wire
    the reader consumes on (no broker object crosses into the
    StreamingQuery).  Caller must server.shutdown()."""
    import json as _json
    import threading as _threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _reply(self, payload: dict, status: int = 200) -> None:
            body = _json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", "0"))
            return _json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            u = urlparse(self.path)
            qs = {k: v[0] for k, v in parse_qs(u.query).items()}
            if u.path == "/pending":
                self._reply({
                    "n": broker.pending(qs["topic"], qs["subscription"])})
            elif u.path == "/waiting":
                self._reply({
                    "n": broker.waiting(qs["topic"], qs["subscription"])})
            elif u.path == "/in_flight":
                self._reply({
                    "msg_ids": broker.in_flight_ids(
                        qs["topic"], qs["subscription"]
                    )})
            else:
                self._reply({"error": "unknown " + u.path}, 404)

        def do_POST(self):
            body = self._body()
            if self.path == "/receive":
                msgs = broker.receive(
                    body["topic"],
                    body["subscription"],
                    int(body.get("max_messages", 100)),
                )
                self._reply({
                    "messages": [
                        {
                            "msg_id": m.msg_id,
                            "payload": m.payload.hex(),
                            "properties": m.properties,
                        }
                        for m in msgs
                    ]
                })
            elif self.path == "/advance":
                broker.advance(broker.nack_redelivery_delay_s)
                self._reply({"now": broker.now})
            elif self.path == "/ack":
                for mid in body["msg_ids"]:
                    broker.ack(body["topic"], body["subscription"], mid)
                self._reply({"n": len(body["msg_ids"])})
            elif self.path == "/nack":
                for mid in body["msg_ids"]:
                    broker.nack(body["topic"], body["subscription"], mid)
                self._reply({"n": len(body["msg_ids"])})
            elif self.path == "/redeliver":
                n = broker.redeliver(
                    body["topic"], body["subscription"], body["msg_ids"]
                )
                self._reply({"n": n})
            else:
                self._reply({"error": "unknown " + self.path}, 404)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
