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

Two bloom storage mechanisms (``bloom_storage=``), same bits either way:

* ``broadcast`` (default): driver OR-merges the per-shard delta rows and
  broadcasts the stacked bitmaps — zero extra shuffle on the membership
  path; right up to ~100 MB of filters.
* ``files``: the 10^10-URL design point (~15 GB of filters, BASELINE.md).
  The same build pass writes the per-shard bitmap deltas as parquet
  partitioned by shard id; membership hash-partitions the wave by shard
  and each task loads only its own shard's files. The driver never holds
  a bitmap. Costs one wave-sized shuffle per generation — forced at the
  design point, where broadcast is physically impossible.

``test_seen_bloom.py`` proves bitmap equality between the two mechanisms
and crawl-output equality through the full engine.
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


def _bloom_fs(bloom_dir: str):
    """(pyarrow FileSystem, base path) for the bloom dir — handles DFS
    URIs (s3://, hdfs://, ...) as well as local paths, so file-mode bloom
    reads work wherever the Spark writer could put the files."""
    from pyarrow import fs as pafs

    if "://" in bloom_dir:
        return pafs.FileSystem.from_uri(bloom_dir)
    return pafs.LocalFileSystem(), bloom_dir


def _list_bloom_files(bloom_dir: str, shard: int | None = None):
    """Sorted parquet file paths under the bloom dir (one shard's
    partition, or all of it). Missing dirs list as empty, never raise."""
    from pyarrow import fs as pafs

    fsys, base = _bloom_fs(bloom_dir)
    sel = pafs.FileSelector(
        f"{base}/shard={shard}" if shard is not None else base,
        recursive=shard is None,
        allow_not_found=True,
    )
    files = sorted(
        i.path
        for i in fsys.get_file_info(sel)
        if i.type == pafs.FileType.File and i.path.endswith(".parquet")
    )
    return fsys, files


def _delete_bloom_dir(bloom_dir: str) -> None:
    try:
        fsys, base = _bloom_fs(bloom_dir)
        fsys.delete_dir(base)
    except Exception:
        pass  # best-effort cleanup of a temp artifact


class SeenSet:
    def __init__(
        self,
        spark: SparkSession,
        n_shards: int = 32,
        use_bloom: bool = True,
        expected_per_shard: int = 1 << 16,
        bloom_storage: str = "broadcast",
        bloom_dir: str | None = None,
        compact_every: int | None = None,
    ):
        """``bloom_storage``:

        * ``"broadcast"`` (default) — per-shard bitmaps are OR-merged on
          the driver and broadcast; right up to ~100 MB of filters.
        * ``"files"`` — the design-point mechanism for the 10^10-URL tier
          (~15 GB of filters, BASELINE.md): the build pass WRITES each
          generation's per-shard bitmap deltas as parquet partitioned by
          shard id, and membership tasks load exactly their own shard's
          files (the candidate wave is hash-partitioned by shard first).
          The driver never holds a bitmap. ``bloom_dir`` must be visible
          to every executor (a DFS path on a real cluster; defaults to a
          local temp dir here).

        ``compact_every``: after this many appends, rewrite the bucketed
        table (and, in files mode, the bloom delta files) into one file
        per bucket — the vanilla-Spark analog of Iceberg's
        ``rewrite_data_files``. Bounds the file count of a long crawl at
        n_shards × (compact_every + 1) instead of n_shards × generations.
        ``None`` = never compact (sandbox default; a 64-generation crawl
        accumulates ≤ 64 × n_shards small files, which is harmless here).
        """
        if bloom_storage not in ("broadcast", "files"):
            raise ValueError(f"unknown bloom_storage: {bloom_storage!r}")
        self.spark = spark
        self.n_shards = n_shards
        self.use_bloom = use_bloom
        self.bloom_storage = bloom_storage
        self.m = _bloom_m(expected_per_shard)
        self.table = f"eget_seen_{uuid.uuid4().hex[:12]}"
        self._created = False
        import os as _os
        import tempfile as _tempfile

        self.bloom_dir = bloom_dir or _os.path.join(
            _tempfile.gettempdir(), f"{self.table}_bloom"
        )
        self._bloom_written = False
        # cached post-append file listing (files mode): the next append's
        # "before" snapshot, so count maintenance lists the dir once per
        # append instead of twice — O(shards) steady-state metadata ops,
        # not O(total accumulated files) twice per append
        self._bloom_files: list[str] | None = None
        # stacked per-shard bitmaps: row s = shard s's filter
        # (broadcast mode only; files mode never materializes them here)
        self.bits: np.ndarray | None = (
            np.zeros((n_shards, (self.m + 7) // 8), dtype=np.uint8)
            if use_bloom and bloom_storage == "broadcast"
            else None
        )
        self._bc = None  # current broadcast of self.bits
        self.count = 0
        self.compact_every = compact_every
        self._appends = 0  # appends since the last compaction
        self._compactions = 0
        self._base_table = self.table
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
        except BaseException as e:
            # don't let teardown mask a real write failure silently
            # (harmless for results — correctness never depends on the
            # final generation's seen-append — but it must be visible)
            import warnings

            warnings.warn(
                f"seen-set final append failed during drop(): {e!r}",
                stacklevel=2,
            )
        if self._created:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.table}")
            self._created = False
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None
        if self._bloom_written:
            _delete_bloom_dir(self.bloom_dir)
            self._bloom_written = False

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

        if self.use_bloom:
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

            deltas = (
                delta.select("url_hash")
                .repartition(self.n_shards, F.pmod(F.col("url_hash"), F.lit(self.n_shards)))
                .mapInPandas(build, _DELTA_SCHEMA)
            )
            if self.bloom_storage == "files":
                # design-point path: bitmap deltas land NEXT TO the table,
                # partitioned by shard id; no bitmap ever reaches the
                # driver. Membership tasks (_filter_unseen_files) load
                # exactly their shard's files.
                before = self._bloom_files
                if before is None:
                    _, before = (
                        _list_bloom_files(self.bloom_dir)
                        if self._bloom_written
                        else (None, [])
                    )
                deltas.write.partitionBy("shard").mode("append").parquet(
                    self.bloom_dir
                )
                self._bloom_written = True
                # every admitted url appears in exactly one delta row's n
                # (admission is first-wins + unseen), so count maintenance
                # reads only the files THIS append just wrote (≤ n_shards
                # tiny rows — ADVICE r3: not a rescan of every delta file
                # written so far, whose cumulative cost is O(gens×shards))
                import pyarrow.parquet as pq

                seen_before = set(before)
                fsys, after = _list_bloom_files(self.bloom_dir)
                for f in after:
                    if f in seen_before:
                        continue
                    t = pq.read_table(f, columns=["n"], filesystem=fsys)
                    self.count += sum(t.column("n").to_pylist())
                self._bloom_files = after
            else:
                rows = deltas.collect()
                # ≈ n_shards rows × ~100 KB bitmaps — bounded, never URL rows
                for r in rows:
                    self.bits[r["shard"]] |= np.frombuffer(r["bitmap"], dtype=np.uint8)
                    self.count += r["n"]
                if self._bc is not None:
                    self._bc.unpersist()
                self._bc = self.spark.sparkContext.broadcast(self.bits)
        else:
            self.count += delta.count()

        self._appends += 1
        if self.compact_every is not None and self._appends >= self.compact_every:
            self._compact()

    def _compact(self) -> None:
        """Rewrite the accumulated set into one file per bucket (Iceberg
        ``rewrite_data_files`` analog). Runs on the async add thread, so
        it overlaps the crawl's fetch/extract phase like any other seen
        maintenance; the next ``filter_unseen`` barriers on it. Bucketing
        is preserved, so the anti-join scan stays exchange-free."""
        self._compactions += 1
        new_table = f"{self._base_table}_c{self._compactions}"
        # read the table's files as PLAIN parquet: reading through the
        # catalog keeps the bucketing metadata and the planner then elides
        # the repartition exchange as redundant — tasks end up holding
        # mixed buckets and the writer splits them back into many files
        # (measured: 10 files instead of n_shards)
        loc = (
            self.spark.sql(f"DESC FORMATTED {self.table}")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        (
            self.spark.read.parquet(loc)
            .select("url_hash", "url", "host")
            .repartition(self.n_shards, F.col("url_hash"))
            .write.bucketBy(self.n_shards, "url_hash")
            .sortBy("url_hash")
            .mode("overwrite")
            .saveAsTable(new_table)
        )
        # swap the pointer FIRST: if the drop of the old table fails, the
        # stale OLD table leaks (best-effort warned below) but the live
        # pointer — and drop()'s eventual cleanup — always tracks the
        # table that actually holds the data
        old_table, self.table = self.table, new_table
        try:
            self.spark.sql(f"DROP TABLE IF EXISTS {old_table}")
        except Exception as e:  # pragma: no cover - warehouse hiccup
            import warnings

            warnings.warn(
                f"compaction could not drop old seen table {old_table}: {e!r}",
                stacklevel=2,
            )
        if self._bloom_written:
            # merge each shard's bitmap delta files into one row
            nbytes = (self.m + 7) // 8

            def merge(pdf: pd.DataFrame) -> pd.DataFrame:
                bm = np.zeros(nbytes, dtype=np.uint8)
                for buf in pdf["bitmap"]:
                    bm |= np.frombuffer(buf, dtype=np.uint8)
                return pd.DataFrame(
                    {
                        "shard": [int(pdf["shard"].iloc[0])],
                        "bitmap": [bm.tobytes()],
                        "n": [int(pdf["n"].sum())],
                    }
                )

            new_dir = f"{self.bloom_dir}_c{self._compactions}"
            (
                self.spark.read.parquet(self.bloom_dir)
                .groupBy("shard")
                .applyInPandas(merge, _DELTA_SCHEMA)
                .write.partitionBy("shard")
                .mode("overwrite")
                .parquet(new_dir)
            )
            _delete_bloom_dir(self.bloom_dir)
            self.bloom_dir = new_dir
            self._bloom_files = None  # dir rewritten; next append re-lists
        self._appends = 0

    # -- membership ---------------------------------------------------------
    def filter_unseen(self, cand: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Rows of ``cand`` whose url_hash is NOT in the seen set.

        Bloom prefilter splits candidates into definitely-new (bypass the
        join) and maybe-seen (exact anti-join); the union is exact. The
        anti-join's right side is the bucketed table scan — no exchange on
        the accumulated set.

        CONTRACT: ``cand``'s lineage must be DETERMINISTIC (or already
        materialized — the crawl loop always passes a localCheckpoint'ed
        frame). The two union branches re-execute ``cand`` independently
        (no checkpoint here, by design: the bloom mark is cheap pure-numpy
        and a wave-sized materialization barrier per generation is not);
        a nondeterministic input could send a row down both or neither
        branch."""
        self.barrier()
        if not self._created or self.count == 0:
            if not self._created and self.count == 0:
                return cand  # nothing seen yet
            # no distinct(): anti-join semantics ignore right-side dups
            return cand.join(self.df.select(hash_col), on=hash_col, how="left_anti")

        if self.bits is None or self._bc is None:
            if (
                self.use_bloom
                and self.bloom_storage == "files"
                and self._bloom_written
            ):
                return self._filter_unseen_files(cand, hash_col)
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
                # shallow column-add (no deep copy of the url/html
                # payload columns — they can dominate memory bandwidth)
                yield pdf.assign(__maybe_seen=res)

        marked = cand.mapInPandas(mark, maybe_schema)
        # no checkpoint: the two union branches re-run the (cheap, pure-
        # numpy) bloom mark instead of paying a wave-sized materialization
        # barrier per generation; cand is always a checkpointed parent, so
        # both branches see identical data
        fresh = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        maybe = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        checked = maybe.join(self.df.select(hash_col), on=hash_col, how="left_anti")
        return fresh.unionByName(checked)

    def _filter_unseen_files(self, cand: DataFrame, hash_col: str) -> DataFrame:
        """File-backed bloom membership (the 10^10-URL design point): the
        wave is hash-partitioned into n_shards tasks keyed by shard id, so
        each task loads and OR-merges ONLY its own shard's bitmap delta
        files (parquet under ``bloom_dir/shard=<s>/``) — one ~100 KB-scale
        read per shard per wave, independent of total filter size. The
        shuffle this adds is wave-sized (the broadcast variant has none);
        at the design point that trade is forced: ~15 GB of filters cannot
        be broadcast. Exactness is unchanged — "maybe seen" still goes
        through the bucketed anti-join."""
        n_shards, m = self.n_shards, self.m
        bloom_dir = self.bloom_dir
        nbytes = (m + 7) // 8

        # fail-safe: a zero bitmap marks everything "definitely new" and
        # BYPASSES the exact join — the one direction a bloom must never
        # be wrong in. If the driver cannot see a single delta file under
        # bloom_dir (wrong/unreachable path), don't trust empty bitmaps:
        # warn and fall back to the plain exact anti-join.
        _, any_files = _list_bloom_files(bloom_dir)
        if not any_files:
            import warnings

            warnings.warn(
                f"bloom files unreadable under {bloom_dir!r}; falling back "
                "to the exact anti-join for this wave",
                stacklevel=2,
            )
            return cand.join(self.df.select(hash_col), on=hash_col, how="left_anti")

        # ADVICE r3: enumerate the per-shard file manifest ON THE DRIVER and
        # close over it — an executor that cannot read the dir (mis-mounted
        # DFS, driver-local temp path on a real cluster) must FAIL LOUDLY,
        # not list zero files, build an all-zero bitmap, and silently
        # re-admit seen URLs. bits_for below raises on any manifest file it
        # cannot read; a shard absent from the manifest is genuinely empty
        # (the driver saw the dir — no URL has hashed to it yet).
        import re as _re

        shard_manifest: dict[int, list[str]] = {}
        for p in any_files:
            mt = _re.search(r"/shard=(\d+)/", p)
            if mt:
                shard_manifest.setdefault(int(mt.group(1)), []).append(p)

        maybe_schema = T.StructType(
            list(cand.schema.fields) + [T.StructField("__maybe_seen", T.BooleanType())]
        )

        def mark(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow.parquet as pq

            loaded: dict[int, np.ndarray] = {}

            def bits_for(s: int) -> np.ndarray:
                bm = loaded.get(s)
                if bm is None:
                    bm = np.zeros(nbytes, dtype=np.uint8)
                    fsys, _ = _bloom_fs(bloom_dir)
                    for f in shard_manifest.get(s, ()):
                        # manifest file unreadable here => this executor
                        # cannot see the filter storage — raise (a silent
                        # empty bitmap would bypass the exact anti-join)
                        t = pq.read_table(f, columns=["bitmap"], filesystem=fsys)
                        for buf in t.column("bitmap").to_pylist():
                            bm |= np.frombuffer(buf, dtype=np.uint8)
                    loaded[s] = bm
                return bm

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                h = pdf[hash_col].to_numpy(dtype=np.int64).view(np.uint64)
                shard = (h % np.uint64(n_shards)).astype(np.int64)
                res = np.zeros(len(pdf), dtype=bool)
                for s in np.unique(shard):
                    msk = shard == s
                    res[msk] = _bloom_test(bits_for(int(s)), h[msk], m)
                # shallow column-add (no deep copy of the url/html
                # payload columns — they can dominate memory bandwidth)
                yield pdf.assign(__maybe_seen=res)

        # route each row to its shard's task (same pmod placement the
        # build pass used, so ~1 shard file-set load per task)
        cand2 = cand.repartition(
            self.n_shards, F.pmod(F.col(hash_col), F.lit(self.n_shards))
        )
        marked = cand2.mapInPandas(mark, maybe_schema)
        fresh = marked.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
        maybe = marked.filter(F.col("__maybe_seen")).drop("__maybe_seen")
        checked = maybe.join(self.df.select(hash_col), on=hash_col, how="left_anti")
        return fresh.unionByName(checked)

    def merged_file_bits(self) -> np.ndarray:
        """Driver-side OR-merge of every written bitmap delta file —
        TEST/AUDIT surface only (the engine path never does this)."""
        self.barrier()
        import pyarrow.parquet as pq

        nbytes = (self.m + 7) // 8
        out = np.zeros((self.n_shards, nbytes), dtype=np.uint8)
        for s in range(self.n_shards):
            fsys, files = _list_bloom_files(self.bloom_dir, s)
            for f in files:
                t = pq.read_table(f, columns=["bitmap"], filesystem=fsys)
                for buf in t.column("bitmap").to_pylist():
                    out[s] |= np.frombuffer(buf, dtype=np.uint8)
        return out
