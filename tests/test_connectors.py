"""Connector tests: generator source fills a stream; blackhole sink
drains one; jdbc wiring validates options up to the jar boundary."""

from __future__ import annotations

import time

import pytest

from hstream_spark.sources.connectors import ConnectorError, build_sink, jdbc_sink
from hstream_spark.streaming.runtime import HStreamEngine


@pytest.fixture()
def engine(spark, tmp_path):
    eng = HStreamEngine(spark, str(tmp_path / "data"))
    yield eng
    eng.shutdown()


def test_generator_source_fills_stream(engine):
    engine.execute("CREATE STREAM gen_out;")
    info = engine.execute(
        "CREATE SOURCE CONNECTOR g1 FROM gen_out WITH (\"type\" = 'generator', "
        "\"rows_per_second\" = 50);"
    )
    assert info.handle is not None
    deadline = time.time() + 30
    rows = 0
    while time.time() < deadline:
        info.handle.processAllAvailable()
        try:
            rows = engine.execute("SELECT id, value FROM gen_out;").count()
        except Exception:
            rows = 0
        if rows > 0:
            break
        time.sleep(0.5)
    assert rows > 0
    engine.execute("PAUSE CONNECTOR g1;")
    assert engine.connectors["g1"].handle is None


def test_blackhole_sink_runs(engine):
    engine.execute("CREATE STREAM src (a INTEGER);")
    engine.execute("INSERT INTO src (a) VALUES (1);")
    info = engine.execute(
        "CREATE SINK CONNECTOR bh TO src WITH (\"type\" = 'blackhole');"
    )
    assert info.handle is not None
    info.handle.processAllAvailable()  # drains without error
    assert info.handle.isActive


def test_unknown_sink_type_rejected():
    with pytest.raises(ConnectorError, match="unknown sink"):
        build_sink("kafkaesque", {})


def test_jdbc_sink_requires_options():
    with pytest.raises(ConnectorError, match="url and table"):
        jdbc_sink({})
