"""URL-seen set: hash-sharded exact table + per-shard Bloom filters.

Reference semantics: an exact in-memory ``Set[str]`` membership test with
first-wins admission (queue_manager.py:27,47,52). At 10^10 URLs that set is
~1 TB of strings, so the engine splits identity from storage:

* identity = ``xxhash64(canonical_url)`` (JVM built-in, SURVEY.md §2.3 T2);
* exact membership = LEFT ANTI JOIN against a table hash-sharded by
  ``pmod(url_hash, n_shards)`` — on Iceberg both sides bucket by the same
  key, so the join is storage-partitioned (no shuffle of ``seen``);
* fast path = one Bloom filter per shard (~13 bits/URL, fpp ≈ 1e-3).
  Candidates whose shard filter says "definitely new" skip the anti-join
  entirely; "maybe seen" candidates fall through to the exact join. The
  filters are a pure scan/shuffle-reduction device — correctness always
  comes from the anti-join (SURVEY.md §4.3.2). A cuckoo filter would slot
  in here when deletions/rotation are needed; Bloom suffices for an
  append-only seen set.

In the sandbox the shard bitmaps live in a driver dict broadcast to tasks;
on a cluster they are files beside the Iceberg table, loaded per-task by
shard id (each task touches exactly one shard's filter).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("host", T.StringType()),
    ]
)

_BLOOM_K = 7
_BITS_PER_KEY = 13


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return x ^ (x >> np.uint64(31))


class BloomShard:
    __slots__ = ("m", "bits")

    def __init__(self, expected_n: int):
        self.m = max(1 << 13, int(expected_n) * _BITS_PER_KEY)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def _idx(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        h1 = _splitmix64(h)
        h2 = _splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
        m = np.uint64(self.m)
        return np.stack(
            [((h1 + np.uint64(j) * h2) % m) for j in range(_BLOOM_K)]
        )  # (k, n)

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        idx = self._idx(hashes).ravel()
        np.bitwise_or.at(self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        idx = self._idx(hashes)  # (k, n)
        byte = self.bits[idx >> 3]
        bit = (byte >> (idx & 7).astype(np.uint8)) & 1
        return bit.all(axis=0)


class SeenSet:
    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 32,
        use_bloom: bool = True,
        expected_per_shard: int = 1 << 16,
    ):
        self.spark = spark
        self.n_shards = n_shards
        self.use_bloom = use_bloom
        self.df: DataFrame = spark.createDataFrame([], SEEN_SCHEMA)
        self.blooms: list[BloomShard] | None = (
            [BloomShard(expected_per_shard) for _ in range(n_shards)]
            if use_bloom
            else None
        )
        self.count = 0

    # -- update ---------------------------------------------------------
    def add(self, admitted: DataFrame, hashes: list[int] | None = None) -> None:
        """Merge newly admitted rows (url_hash, url, host). ``hashes`` is
        the same generation's hash list if the caller already collected it
        (admission is budget-bounded, so this is driver-safe per wave; the
        cluster-scale variant rebuilds shard filters distributively)."""
        delta = admitted.select("url_hash", "url", "host")
        # repartition by the raw join key: HashPartitioning(url_hash, n)
        # satisfies the anti-join's ClusteredDistribution, so the seen side
        # is never re-shuffled per generation (the Iceberg analog is
        # bucket(url_hash) + storage-partitioned join)
        self.df = (
            self.df.unionByName(delta)
            .repartition(self.n_shards, F.col("url_hash"))
            .localCheckpoint(eager=True)
        )
        if self.blooms is not None:
            if hashes is None:
                hashes = [r["url_hash"] for r in delta.select("url_hash").collect()]
            arr = np.array(hashes, dtype=np.int64).view(np.uint64)
            shard = (arr % np.uint64(self.n_shards)).astype(np.int64)
            for s in range(self.n_shards):
                self.blooms[s].add(arr[shard == s])
            self.count += len(hashes)

    # -- membership -------------------------------------------------------
    def filter_unseen(self, cand: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Rows of ``cand`` whose url_hash is NOT in the seen set.

        Bloom prefilter splits candidates into definitely-new (bypass the
        join) and maybe-seen (exact anti-join); the union is exact."""
        if self.blooms is None or self.count == 0:
            if self.count == 0 and self.blooms is not None:
                return cand  # nothing seen yet
            # no distinct(): anti-join semantics ignore right-side dups,
            # and the distinct would cost an extra full shuffle of seen
            return cand.join(self.df.select(hash_col), on=hash_col, how="left_anti")

        blooms = self.blooms
        n_shards = self.n_shards

        maybe_schema = T.StructType(
            list(cand.schema.fields) + [T.StructField("__maybe_seen", T.BooleanType())]
        )

        def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
                shard = (h % np.uint64(n_shards)).astype(np.int64)
                res = np.zeros(len(pdf), dtype=bool)
                for s in np.unique(shard):
                    m = shard == s
                    res[m] = blooms[s].maybe_contains(h[m])
                pdf = pdf.copy()
                pdf["__maybe_seen"] = res
                yield pdf

        marked = cand.mapInPandas(mark, maybe_schema)
        marked = marked.localCheckpoint(eager=True)  # evaluate bloom once
        fresh = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        maybe = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        checked = maybe.join(self.df.select(hash_col), on=hash_col, how="left_anti")
        return fresh.unionByName(checked)
