"""Structured Streaming: AvailableNow replay must equal the batch twin."""

from __future__ import annotations

import tempfile

from leader_graph_spark.plans import REGISTRY
from leader_graph_spark.streaming.jobs import run_available_now, tumbling_counts_stream


def test_stream_tumbling_equals_batch(spark, sf_smoke):
    sdf = tumbling_counts_stream(spark, sf_smoke, window="1 hour", watermark="1 hour")
    with tempfile.TemporaryDirectory() as ckpt:
        streamed = run_available_now(sdf, name="tumbling_test", checkpoint=ckpt)
        batch = REGISTRY["events_tumbling_hourly"].spark(spark, sf_smoke)
        s = {tuple(r) for r in streamed.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert s == b
        assert len(s) > 0
