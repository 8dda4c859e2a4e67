"""Custom stateful streaming operator: per-user running aggregates via
applyInPandasWithState (the arbitrary-stateful-processing API — what you
reach for when watermarked windows can't express the semantics, e.g.
running totals that never expire, custom eviction, cross-batch counters).

Source: the `events` table streamed straight from the testdata directory
(pathGlobFilter isolates one parquet). The ts encoding is PROBED from the
footer per round — current testdata is µs TIMESTAMP_NTZ (relabelled to
TIMESTAMP under pinned UTC, the live branch); ns-as-long files take the
legacy nanosAsLong + div-1000 branch. Both mirror the batch loader
(sources/tables.load_table), and a stream==batch ts parity test guards
against the two sites drifting.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # TIMESTAMP(NANOS) as long
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail the events table as a file stream with the SAME timestamp
    normalization as the batch loader (sources/tables.load_table):
    testdata encoding has changed between rounds (ns-as-long vs µs NTZ),
    so the encoding is probed from the footer, never assumed — a ns
    conversion applied to µs data silently lands in 1970."""
    from ..sources.tables import _nano_ts_columns

    if "ts" in _nano_ts_columns(f"{sf_dir}/events.parquet"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_RAW_SCHEMA)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # µs (TIMESTAMP_NTZ) encoding: declare NTZ and relabel to TIMESTAMP
    # under pinned UTC — a pure type relabel, same as the batch loader
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ntz_schema = T.StructType(
        [
            T.StructField(
                f.name,
                T.TimestampNTZType() if f.name == "ts" else f.dataType,
                True,
            )
            for f in EVENTS_RAW_SCHEMA.fields
        ]
    )
    raw = (
        spark.readStream.schema(ntz_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    # emit the raw running total: rounding for display/oracle parity is
    # applied downstream with F.round (HALF_UP, matching DuckDB ROUND) —
    # Python's round() is banker's rounding and diverges on exact
    # 4-decimal ties (see queries/streaming_q.py)
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Cross-batch per-user counters kept in managed state — state lives
    per group on the executors; each micro-batch updates and emits the
    group's current totals."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
