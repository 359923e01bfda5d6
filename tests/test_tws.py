"""transformWithStateInPandas (Spark 4 arbitrary-state API): peak
tracking accumulates across micro-batches through typed ValueState."""

from __future__ import annotations

import pytest

# transformWithStateInPandas runs a state-server protocol over protobuf;
# without the python protobuf package the driver worker crashes.  Same
# gating policy as the pulsar/avro jar adapters: the operator module is
# importable everywhere, the runtime path activates when the optional
# dependency exists.
pytest.importorskip("google.protobuf")


def test_peak_tracker_across_batches(spark, tmp_path):
    from go_pulsar_elasticsearch_spark.streaming.tws import user_peak_tracker

    src = str(tmp_path / "src")
    for batch in (
        [(1, 10.0), (1, 5.0), (2, 1.0)],
        [(1, 12.0), (1, 3.0), (2, 0.5)],
    ):
        spark.createDataFrame(batch, "user_id long, value double").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        user_peak_tracker(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("tws_out").collect()
    latest = {}
    for r in rows:  # update mode re-emits per batch; last one wins
        latest[r["user_id"]] = r
    assert latest[1]["peak_value"] == pytest.approx(12.0)
    assert latest[1]["n_events"] == 4
    # batch2: 12.0 sets the peak, then 3.0 -> one event since peak
    assert latest[1]["events_since_peak"] == 1
    assert latest[2]["peak_value"] == pytest.approx(1.0)
    assert latest[2]["n_events"] == 2
    assert latest[2]["events_since_peak"] == 1
