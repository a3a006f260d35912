"""Custom stateful streaming operator: cross-batch streaming dedup.

`applyInPandasWithState` keyed by content fingerprint: the first document
with a given fingerprint passes through; later arrivals (same batch or any
later micro-batch) are suppressed and counted in state. This is the
streaming form of exact dedup — the state store holds one row per distinct
fingerprint, so memory is bounded by distinct content, not stream length.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (LongType, StringType, StructField, StructType)

OUTPUT_SCHEMA = StructType([
    StructField("fp", StringType()),
    StructField("doc_id", LongType()),
    StructField("dup_count", LongType()),
])
STATE_SCHEMA = StructType([
    StructField("first_doc", LongType()),
    StructField("seen", LongType()),
])


def _dedup_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    first_doc, seen = state.get if state.exists else (None, 0)
    new_rows = []
    for pdf in pdfs:
        for doc_id in sorted(int(d) for d in pdf["doc_id"]):
            if first_doc is None:
                first_doc = doc_id
                new_rows.append(doc_id)
            seen += 1
    state.update((first_doc, seen))
    if new_rows:
        yield pd.DataFrame({"fp": [key[0]] * len(new_rows),
                            "doc_id": new_rows,
                            "dup_count": [seen] * len(new_rows)})


def stream_dedup(spark: SparkSession, in_dir: str, out_dir: str,
                 checkpoint_dir: str) -> None:
    """readStream documents → keep only first-seen text fingerprints."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2)
              .parquet(in_dir))
    keyed = stream.select(F.md5(F.encode("text", "UTF-8")).alias("fp"), "doc_id")
    out = keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    (out.writeStream
     .outputMode("append")
     .format("parquet")
     .option("path", out_dir)
     .option("checkpointLocation", checkpoint_dir)
     .trigger(availableNow=True)
     .start()
     .awaitTermination())
