"""Debezium envelope adapter -> changelog contract -> CDC semantic
core.  Covers op mapping (c/r/u/d), delete-uses-before-image,
compaction-tombstone/garbage drop, binlog-position tie-break inside
one millisecond, replay idempotence through live_view, and the
streaming path through CDCStreamPipeline.apply_microbatch."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from mysql_clickhouse_sync_spark.operators.cdc import (
    cdc_apply,
    live_view,
    stamp_changelog,
)
from mysql_clickhouse_sync_spark.sources.debezium import (
    debezium_file_stream,
    parse_debezium,
)

ROW_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("email", StringType(), True),
        StructField("name", StringType(), True),
    ]
)


def _env(op, row, ts_ms, pos, before=None):
    return json.dumps(
        {
            "payload": {
                "before": before if op == "d" else None,
                "after": None if op == "d" else row,
                "source": {
                    "ts_ms": ts_ms,
                    "file": "binlog.000001",
                    "pos": pos,
                    "db": "shop",
                    "table": "users",
                },
                "op": op,
                "ts_ms": ts_ms,
            }
        }
    )


EVENTS = [
    _env("r", {"id": 1, "email": "a@x", "name": "Alice"}, 1000, 10),
    _env("c", {"id": 2, "email": "b@x", "name": "Bob"}, 1000, 20),
    # two updates to id=1 inside the SAME millisecond: binlog pos must
    # break the tie (the reference's wall-clock stamp cannot)
    _env("u", {"id": 1, "email": "a@x", "name": "Alice-v2"}, 2000, 30),
    _env("u", {"id": 1, "email": "a@x", "name": "Alice-v3"}, 2000, 40),
    _env("d", None, 3000, 50,
         before={"id": 2, "email": "b@x", "name": "Bob"}),
]
GARBAGE = [
    "",                      # kafka compaction tombstone
    "not json at all",
    json.dumps({"payload": None}),
]


def _raw(spark, lines):
    return spark.createDataFrame([Row(value=ln) for ln in lines],
                                 "value string")


def test_op_mapping_and_images(spark):
    out = parse_debezium(_raw(spark, EVENTS), ROW_SCHEMA).collect()
    ops = [r["op"] for r in out]
    assert ops == ["I", "I", "U", "U", "D"]
    # delete carries the BEFORE image
    d = out[-1]
    assert (d["id"], d["name"]) == (2, "Bob")
    # seq is strictly increasing across the binlog order
    seqs = [r["seq"] for r in out]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_garbage_and_tombstones_dropped(spark):
    out = parse_debezium(_raw(spark, EVENTS + GARBAGE), ROW_SCHEMA)
    assert out.count() == len(EVENTS)


def test_live_state_and_same_ms_tiebreak(spark):
    changes = stamp_changelog(
        parse_debezium(_raw(spark, EVENTS), ROW_SCHEMA),
        op_col="op", seq_col="seq",
    )
    base = changes.limit(0)
    live = live_view(cdc_apply(base, changes), ["id"])
    rows = {r["id"]: r["name"] for r in live.collect()}
    # id=2 deleted; id=1 resolved to the LAST same-ms update by pos
    assert rows == {1: "Alice-v3"}


def test_replay_idempotence(spark):
    """At-least-once delivery: applying the same envelope batch twice
    yields the identical live state (README.md:493-497 parity)."""
    changes = stamp_changelog(
        parse_debezium(_raw(spark, EVENTS), ROW_SCHEMA),
        op_col="op", seq_col="seq",
    )
    base = changes.limit(0)
    once = live_view(cdc_apply(base, changes), ["id"])
    twice = live_view(cdc_apply(cdc_apply(base, changes), changes), ["id"])
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path / "tables"), str(tmp_path / "debezium")


def test_streaming_debezium_into_pipeline(spark, dirs):
    """End-to-end: Debezium JSON files -> adapted readStream ->
    foreachBatch append -> live view, same answer as batch."""
    from mysql_clickhouse_sync_spark.streaming import CDCStreamPipeline

    base_dir, changelog_dir = dirs
    os.makedirs(changelog_dir)
    with open(os.path.join(changelog_dir, "part1.json"), "w") as f:
        f.write("\n".join(EVENTS + GARBAGE))

    changelog_schema = StructType(
        [StructField("op", StringType(), False),
         StructField("seq", LongType(), False)]
        + list(ROW_SCHEMA.fields)
    )
    p = CDCStreamPipeline(
        spark, "users", ["id"], changelog_schema, base_dir
    )
    stream = debezium_file_stream(spark, changelog_dir, ROW_SCHEMA)
    q = (
        stream.writeStream.foreachBatch(p.apply_microbatch)
        .option("checkpointLocation", p.checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {r["id"]: r["name"] for r in p.live().collect()} == {
        1: "Alice-v3"
    }


def _multi_env(table, op, row, ts_ms, pos, before=None):
    e = json.loads(_env(op, row, ts_ms, pos, before))
    e["payload"]["source"]["table"] = table
    return json.dumps(e)


def test_multi_table_debezium_routes_and_skips(spark, dirs):
    """One Debezium stream carrying two replicated tables plus one
    unregistered table: rows route to per-table CDC dirs, the
    unregistered table is skipped (P5), live views resolve per
    table."""
    from mysql_clickhouse_sync_spark.sources.debezium import (
        parse_debezium_multi,
    )
    from mysql_clickhouse_sync_spark.streaming import MultiTableCDCStream

    base_dir, changelog_dir = dirs
    events = [
        _multi_env("users", "c",
                   {"id": 1, "email": "a@x", "name": "Alice"}, 1000, 1),
        _multi_env("users", "u",
                   {"id": 1, "email": "a@x", "name": "Alice2"}, 2000, 2),
        _multi_env("items", "c", {"sku": 7, "qty": 3}, 1000, 3),
        _multi_env("items", "d", None, 3000, 4,
                   before={"sku": 7, "qty": 3}),
        _multi_env("audit_log", "c", {"id": 9}, 1000, 5),  # not replicated
    ]
    os.makedirs(changelog_dir)
    with open(os.path.join(changelog_dir, "part1.json"), "w") as f:
        f.write("\n".join(events))

    items_schema = StructType(
        [StructField("sku", LongType(), False),
         StructField("qty", LongType(), True)]
    )
    mux = MultiTableCDCStream(
        spark,
        schemas={"users": ROW_SCHEMA, "items": items_schema},
        pks={"users": ["id"], "items": ["sku"]},
        base_dir=base_dir,
    )
    raw = (
        spark.readStream.option("maxFilesPerTrigger", 4)
        .text(changelog_dir)
    )
    q = (
        parse_debezium_multi(raw)
        .writeStream.foreachBatch(mux.apply_microbatch)
        .option("checkpointLocation", os.path.join(base_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert {r["id"]: r["name"] for r in mux.live("users").collect()} == {
        1: "Alice2"
    }
    assert mux.live("items").count() == 0  # deleted
    assert mux.skipped_events == 1


def test_kafka_reader_options_mapping():
    """KafkaConfig -> Spark Kafka-source options, mirroring the
    reference's binlog-reader construction
    (/root/reference/src/cdc_replicator.py:99-145): topic selection,
    first-start offsets (checkpoint wins afterwards), data-loss
    policy, microbatch cap."""
    from mysql_clickhouse_sync_spark.config import KafkaConfig
    from mysql_clickhouse_sync_spark.sources.debezium import (
        kafka_reader_options,
    )

    cfg = KafkaConfig(
        bootstrap_servers="k1:9092,k2:9092",
        topic="dbserver1.inventory.orders",
        starting_offsets="latest",
        fail_on_data_loss=True,
        max_offsets_per_trigger=50_000,
    )
    opts = kafka_reader_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"
    assert opts["subscribe"] == "dbserver1.inventory.orders"
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    # Consumer-group identity must use Spark's source-level option
    # `groupIdPrefix`; a `kafka.group.id.prefix` passthrough reaches
    # the consumer as an unknown config and is silently dropped.
    assert opts["groupIdPrefix"] == "mysql-clickhouse-sync"
    assert "kafka.group.id.prefix" not in opts
    # unbounded microbatches -> option omitted entirely
    assert "maxOffsetsPerTrigger" not in kafka_reader_options(
        KafkaConfig(bootstrap_servers="k:9092", topic="t")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kafka_reader_options(KafkaConfig(topic="t"))
    with _pytest.raises(ValueError):
        kafka_reader_options(KafkaConfig(bootstrap_servers="k:9092"))


def test_kafka_config_from_env(monkeypatch):
    from mysql_clickhouse_sync_spark.config import KafkaConfig

    monkeypatch.setenv("KAFKA_BOOTSTRAP_SERVERS", "broker:9092")
    monkeypatch.setenv("KAFKA_TOPIC", "cdc.orders")
    monkeypatch.setenv("KAFKA_STARTING_OFFSETS", "latest")
    monkeypatch.setenv("KAFKA_FAIL_ON_DATA_LOSS", "yes")
    monkeypatch.setenv("KAFKA_MAX_OFFSETS_PER_TRIGGER", "1234")
    cfg = KafkaConfig.from_env()
    assert cfg.bootstrap_servers == "broker:9092"
    assert cfg.topic == "cdc.orders"
    assert cfg.starting_offsets == "latest"
    assert cfg.fail_on_data_loss is True
    assert cfg.max_offsets_per_trigger == 1234


def test_transport_equivalence_value_column_contract(spark):
    """Both transports feed parse_debezium the SAME one-string-column
    relation (`value` — the Kafka reader CASTs value AS STRING, the
    file reader scans text lines), so the changelog output is
    transport-agnostic.  The broker is absent in the harness; this
    pins the contract seam read_kafka_changelog plugs into."""
    got = parse_debezium(_raw(spark, EVENTS + GARBAGE), ROW_SCHEMA)
    rows = {(r.op, r.seq, r.id, r.name) for r in got.collect()}
    assert len(rows) == len(EVENTS)
    # same-ms updates keep distinct seq via binlog pos (resume/total
    # order parity with the reference position file)
    seqs = sorted(s for (_, s, i, _) in rows if i == 1)
    assert len(seqs) == len(set(seqs)) == 3


def test_multi_table_only_tables_filter(spark):
    """only_tables parity with the reference's binlog filter
    (/root/reference/src/cdc_replicator.py:128-129): rows from
    unreplicated tables are dropped, replicated ones survive with
    payload intact."""
    import json as _json

    from pyspark.sql import functions as F

    from mysql_clickhouse_sync_spark.sources.debezium import (
        parse_debezium_multi,
    )

    def env_for(table, rid, pos):
        return _json.dumps(
            {
                "payload": {
                    "before": None,
                    "after": {"id": rid},
                    "source": {
                        "ts_ms": 1000,
                        "file": "binlog.000001",
                        "pos": pos,
                        "db": "shop",
                        "table": table,
                    },
                    "op": "c",
                    "ts_ms": 1000,
                }
            }
        )

    raw = _raw(
        spark, [env_for("orders", 1, 1), env_for("skipme", 2, 2)]
    )
    out = parse_debezium_multi(raw).filter(F.col("table").isin(["orders"]))
    rows = out.collect()
    assert [r.table for r in rows] == ["orders"]
