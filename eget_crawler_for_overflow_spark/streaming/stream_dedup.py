"""Stateful streaming URL-seen set: first-wins dedup across micro-batches.

The batch engine's seen set (operators/seen.py) re-expressed for a live
fetch stream: incoming pages are keyed by ``shard = pmod(xxhash64(url),
n_shards)`` — the same hash-sharding as the batch bucketed table — and
each shard group keeps its seen-hash set in Structured Streaming state
via ``applyInPandasWithState``. A page row is emitted iff its url_hash
was never seen in any earlier micro-batch (or earlier in this one):
exactly the reference queue_manager's first-wins admission
(/root/reference/services/crawler/queue_manager.py:47-52) with
exactly-once state via the streaming checkpoint.

Scale posture: state is per-shard and hash-sharded, so it spreads across
executors like the batch table; at the 10^10-URL design point the state
payload becomes the per-shard Bloom bitmap (~4 MB) + spill table rather
than the raw hash list stored here (sandbox-sized corpora keep the exact
set — it doubles as the correctness oracle for the bloom variant).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BinaryType())])


def dedup_stream(pages_stream: DataFrame, n_shards: int = 8) -> DataFrame:
    """Append-mode stream of first-occurrence pages (url, warc_ts,
    url_hash). State: one sorted int64 hash array per shard."""
    keyed = pages_stream.select(
        "url", "warc_ts", F.xxhash64("url").alias("url_hash")
    ).withColumn("shard", F.pmod(F.col("url_hash"), F.lit(n_shards)))

    out_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("url_hash", T.LongType()),
        ]
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            seen = set(np.frombuffer(state.get[0], dtype=np.int64).tolist())
        else:
            seen = set()
        for pdf in pdfs:
            keep = []
            for h in pdf["url_hash"]:
                h = int(h)
                if h in seen:
                    keep.append(False)
                else:
                    seen.add(h)
                    keep.append(True)
            out = pdf.loc[keep, ["url", "warc_ts", "url_hash"]]
            if len(out):
                yield out
        state.update(
            (np.array(sorted(seen), dtype=np.int64).tobytes(),)
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
