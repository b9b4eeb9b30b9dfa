"""Transport seam for event ingest (streaming/ops.py::event_stream_source):
every transport lands in the SAME EVENT_SCHEMA contract, so downstream
operators are transport-agnostic. The rate and socket transports run for
real here; kafka asserts the fail-fast (connector absent in this env)."""

from __future__ import annotations

import json
import socketserver
import threading
import time

import pytest


def _drain(spark, q, seconds: float = 10.0, want: int = 1):
    """Wait until the memory sink has >= want rows (or timeout)."""
    deadline = time.time() + seconds
    while time.time() < deadline:
        q.processAllAvailable()
        n = spark.sql(f"SELECT count(*) c FROM {q.name}").head()["c"]
        if n >= want:
            return n
        time.sleep(0.3)
    return spark.sql(f"SELECT count(*) c FROM {q.name}").head()["c"]


@pytest.mark.slow
def test_rate_transport_lands_in_event_contract(spark):
    from pharmacodi_spark.streaming.ops import EVENT_SCHEMA, event_stream_source

    src = event_stream_source(spark, kind="rate", rows_per_second=50,
                              num_partitions=2)
    assert src.isStreaming
    assert [f.name for f in src.schema.fields] == [
        f.name for f in EVENT_SCHEMA.fields
    ]
    q = (
        src.writeStream.format("memory")
        .queryName("rate_events")
        .outputMode("append")
        .start()
    )
    try:
        n = _drain(spark, q, seconds=15.0, want=10)
        assert n >= 10
        rows = spark.sql(
            "SELECT * FROM rate_events ORDER BY event_id LIMIT 8"
        ).collect()
        for r in rows:
            assert r["event_type"] in ("view", "click", "purchase", "refund")
            assert r["user_id"] == r["event_id"] % 100
            assert json.loads(r["props"])["seq"] == r["event_id"]
    finally:
        q.stop()


@pytest.mark.slow
def test_socket_transport_parses_event_json(spark):
    from pharmacodi_spark.streaming.ops import event_stream_source

    events = [
        {"event_id": i, "ts": "2026-01-01 00:00:%02d" % i, "user_id": i % 3,
         "event_type": "view", "value": float(i), "props": "{}"}
        for i in range(5)
    ]

    class H(socketserver.BaseRequestHandler):
        def handle(self):
            payload = "".join(json.dumps(e) + "\n" for e in events)
            # keep the connection open briefly so the source can read
            self.request.sendall(payload.encode())
            time.sleep(8)

    with socketserver.TCPServer(("localhost", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        src = event_stream_source(spark, kind="socket", socket_port=port)
        q = (
            src.writeStream.format("memory")
            .queryName("sock_events")
            .outputMode("append")
            .start()
        )
        try:
            n = _drain(spark, q, seconds=15.0, want=5)
            assert n >= 5
            got = {
                r["event_id"]: (r["user_id"], r["value"])
                for r in spark.sql("SELECT * FROM sock_events").collect()
            }
            assert got[4] == (1, 4.0)
        finally:
            q.stop()
            srv.shutdown()


def test_kafka_transport_fails_fast_without_connector(spark):
    from pharmacodi_spark.streaming.ops import event_stream_source

    # Eager path: without the connector jar, readStream...load() raises
    # inside event_stream_source, which must wrap it in the RuntimeError
    # whose message names the exact package to add. Deferred path: some
    # Spark versions postpone source resolution to stream start — then the
    # failure must be Spark's own resolution error naming kafka, not some
    # unrelated exception (the old `(RuntimeError, Exception)` tuple
    # accepted anything).
    try:
        df = event_stream_source(
            spark, kind="kafka",
            kafka_bootstrap="localhost:9092", kafka_topic="events",
        )
    except RuntimeError as ex:
        assert "spark-sql-kafka" in str(ex)
        return
    # deferred-resolution branch
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises(PySparkException) as ei:
        q = df.writeStream.format("memory").queryName("kafka_events").start()
        try:
            q.awaitTermination(10)
        finally:
            q.stop()
    assert "kafka" in str(ei.value).lower()


def test_unknown_and_missing_args_fail_fast(spark):
    from pharmacodi_spark.streaming.ops import event_stream_source

    with pytest.raises(ValueError):
        event_stream_source(spark, kind="carrier-pigeon")
    with pytest.raises(ValueError):
        event_stream_source(spark, kind="files")
    with pytest.raises(ValueError):
        event_stream_source(spark, kind="socket")
    with pytest.raises(ValueError):
        event_stream_source(spark, kind="kafka")
