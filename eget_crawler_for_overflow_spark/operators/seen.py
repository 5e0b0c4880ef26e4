"""URL-seen set: append-only bucketed table + distributively-built
per-shard Bloom filters.

Reference semantics: an exact in-memory ``Set[str]`` membership test with
first-wins admission (queue_manager.py:27,47,52). At 10^10 URLs that set is
~1 TB of strings, so the engine splits identity from storage:

* identity = ``xxhash64(canonical_url)`` (JVM built-in, SURVEY.md §2.3 T2);
* exact membership = LEFT ANTI JOIN against a **bucketed table**
  (``bucketBy(n_shards, url_hash)``). Each generation's delta is APPENDED
  (one O(delta) write — the accumulated set is never rewritten or
  re-shuffled), and the anti-join needs no exchange on the seen side: the
  bucketed scan already satisfies HashPartitioning(url_hash, n_shards).
  This is the vanilla-Spark analog of Iceberg ``bucket(url_hash)`` +
  storage-partitioned joins; swapping in Iceberg changes only the writer.
* fast path = one Bloom filter per shard (~13 bits/URL, fpp ≈ 1e-3).
  Candidates whose shard filter says "definitely new" skip the anti-join
  entirely; "maybe seen" candidates fall through to the exact join. The
  filters are a pure scan/shuffle-reduction device — correctness always
  comes from the anti-join (SURVEY.md §4.3.2).

Bloom maintenance is fully distributive: a ``mapInPandas`` pass over the
delta emits one (shard, bitmap, n) row per shard per partition (the delta
is pre-partitioned by shard id, so ~n_shards bitmaps of ~100 KB total —
never URL rows), the driver OR-merges them and re-broadcasts the merged
bitmaps (torrent distribution, one copy per executor). The driver therefore
handles O(n_shards × bitmap_bytes) per generation regardless of wave size.
At the 10^10-URL design point (~15 GB of filters, BASELINE.md) the same
build pass writes per-shard filter files next to the table instead, and
membership tasks load exactly their shard's file; the broadcast variant
here is the right mechanism up to ~100 MB of filters.
"""

from __future__ import annotations

import threading
import uuid
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


def _bloom_m(expected_n: int) -> int:
    return max(1 << 13, int(expected_n) * _BITS_PER_KEY)


def _bloom_idx(hashes: np.ndarray, m: int) -> np.ndarray:
    h = hashes.astype(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    mm = np.uint64(m)
    return np.stack([((h1 + np.uint64(j) * h2) % mm) for j in range(_BLOOM_K)])


def _bloom_set(bits: np.ndarray, hashes: np.ndarray, m: int) -> None:
    if len(hashes) == 0:
        return
    idx = _bloom_idx(hashes, m).ravel()
    np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))


def _bloom_test(bits: np.ndarray, hashes: np.ndarray, m: int) -> np.ndarray:
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    idx = _bloom_idx(hashes, m)
    byte = bits[idx >> 3]
    bit = (byte >> (idx & 7).astype(np.uint8)) & 1
    return bit.all(axis=0)


class BloomShard:
    """Single-shard Bloom filter (unit-test surface; the engine operates on
    the stacked per-shard bitmap array directly)."""

    __slots__ = ("m", "bits")

    def __init__(self, expected_n: int):
        self.m = _bloom_m(expected_n)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    def add(self, hashes: np.ndarray) -> None:
        _bloom_set(self.bits, hashes, self.m)

    def maybe_contains(self, hashes: np.ndarray) -> np.ndarray:
        return _bloom_test(self.bits, hashes, self.m)


_DELTA_SCHEMA = "shard int, bitmap binary, n long"


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
        self.m = _bloom_m(expected_per_shard)
        self.table = f"eget_seen_{uuid.uuid4().hex[:12]}"
        self._created = False
        # stacked per-shard bitmaps: row s = shard s's filter
        self.bits: np.ndarray | None = (
            np.zeros((n_shards, (self.m + 7) // 8), dtype=np.uint8)
            if use_bloom
            else None
        )
        self._bc = None  # current broadcast of self.bits
        self.count = 0
        self._thread: threading.Thread | None = None
        self._thread_err: BaseException | None = None

    # -- async update pipeline --------------------------------------------
    # The generation loop overlaps seen maintenance (bucketed append +
    # bitmap build: two O(delta) jobs) with the fetch/extract/expand phase
    # of the SAME generation — nothing in between reads the seen set.
    # Spark job submission is thread-safe; barrier() re-raises any failure
    # before the next membership check.

    def add_async(self, admitted: DataFrame) -> None:
        self.barrier()

        def run() -> None:
            try:
                self.add(admitted)
            except BaseException as e:  # surfaced at barrier()
                self._thread_err = e

        try:
            from pyspark.util import inheritable_thread_target

            target = inheritable_thread_target(self.spark)(run)
        except ImportError:
            target = run
        self._thread = threading.Thread(target=target, daemon=True)
        self._thread.start()

    def barrier(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._thread_err is not None:
            err, self._thread_err = self._thread_err, None
            raise err

    # -- storage ----------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        self.barrier()
        if not self._created:
            return self.spark.createDataFrame([], SEEN_SCHEMA)
        return self.spark.table(self.table).select("url_hash", "url", "host")

    def drop(self) -> None:
        """Release catalog state (the crawl's working set; resumable crawls
        rebuild it from the per-generation admitted checkpoint tables)."""
        try:
            self.barrier()
        except BaseException:
            pass  # the crawl already surfaced (or swallowed) this
        if self._created:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
            self._created = False
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None

    # -- update -----------------------------------------------------------
    def add(self, admitted: DataFrame) -> None:
        """Merge newly admitted rows (url_hash, url, host): one O(delta)
        bucketed append + one O(delta) distributive bitmap build. No row
        ever reaches the driver."""
        delta = admitted.select("url_hash", "url", "host")
        # repartition(n, url_hash) uses the same murmur3-pmod placement as
        # bucketBy, so every task writes exactly one bucket file per append
        writer = (
            delta.repartition(self.n_shards, F.col("url_hash"))
            .write.bucketBy(self.n_shards, "url_hash")
            .sortBy("url_hash")
        )
        writer.mode("append" if self._created else "overwrite").saveAsTable(
            self.table
        )
        self._created = True

        if self.bits is not None:
            n_shards, m = self.n_shards, self.m
            nbytes = (m + 7) // 8

            def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                acc: dict[int, np.ndarray] = {}
                counts: dict[int, int] = {}
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    h = pdf["url_hash"].to_numpy(dtype=np.int64).view(np.uint64)
                    shard = (h % np.uint64(n_shards)).astype(np.int64)
                    for s in np.unique(shard):
                        bm = acc.get(int(s))
                        if bm is None:
                            bm = acc[int(s)] = np.zeros(nbytes, dtype=np.uint8)
                        sel = h[shard == s]
                        _bloom_set(bm, sel, m)
                        counts[int(s)] = counts.get(int(s), 0) + len(sel)
                if acc:
                    yield pd.DataFrame(
                        {
                            "shard": list(acc),
                            "bitmap": [acc[s].tobytes() for s in acc],
                            "n": [counts[s] for s in acc],
                        }
                    )

            rows = (
                delta.select("url_hash")
                .repartition(self.n_shards, F.pmod(F.col("url_hash"), F.lit(self.n_shards)))
                .mapInPandas(build, _DELTA_SCHEMA)
                .collect()
            )  # ≈ n_shards rows × ~100 KB bitmaps — bounded, never URL rows
            for r in rows:
                self.bits[r["shard"]] |= np.frombuffer(r["bitmap"], dtype=np.uint8)
                self.count += r["n"]
            if self._bc is not None:
                self._bc.unpersist()
            self._bc = self.spark.sparkContext.broadcast(self.bits)
        else:
            self.count += delta.count()

    # -- membership ---------------------------------------------------------
    def filter_unseen(self, cand: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Rows of ``cand`` whose url_hash is NOT in the seen set.

        Bloom prefilter splits candidates into definitely-new (bypass the
        join) and maybe-seen (exact anti-join); the union is exact. The
        anti-join's right side is the bucketed table scan — no exchange on
        the accumulated set."""
        self.barrier()
        if not self._created or self.count == 0:
            if not self._created and self.count == 0:
                return cand  # nothing seen yet
            # no distinct(): anti-join semantics ignore right-side dups
            return cand.join(self.df.select(hash_col), on=hash_col, how="left_anti")

        if self.bits is None or self._bc is None:
            return cand.join(self.df.select(hash_col), on=hash_col, how="left_anti")

        bc = self._bc
        n_shards, m = self.n_shards, self.m

        maybe_schema = T.StructType(
            list(cand.schema.fields) + [T.StructField("__maybe_seen", T.BooleanType())]
        )

        def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bits = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
                shard = (h % np.uint64(n_shards)).astype(np.int64)
                res = np.zeros(len(pdf), dtype=bool)
                for s in np.unique(shard):
                    msk = shard == s
                    res[msk] = _bloom_test(bits[s], h[msk], m)
                pdf = pdf.copy()
                pdf["__maybe_seen"] = res
                yield pdf

        marked = cand.mapInPandas(mark, maybe_schema)
        # no checkpoint: the two union branches re-run the (cheap, pure-
        # numpy) bloom mark instead of paying a wave-sized materialization
        # barrier per generation; cand is always a checkpointed parent, so
        # both branches see identical data
        fresh = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        maybe = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        checked = maybe.join(self.df.select(hash_col), on=hash_col, how="left_anti")
        return fresh.unionByName(checked)
