"""Batch URL-frontier crawl engine: the driver-side generation (BFS wave)
loop that replaces the reference's asyncio queue loop
(/root/reference/services/crawler/crawler_service.py:97-175).

Semantics preserved (SURVEY.md §3.1):

* admission predicate per URL: not-seen ∧ depth ≤ max_depth ∧ budget left
  (queue_manager.py:47-49), first-wins on duplicates;
* deterministic canonical order: the reference's *admission* (FIFO put)
  order, which for wave processing is ``(generation, parent_seq,
  link_pos)`` — the reference's result order is async-completion order and
  nondeterministic, so the admission order is the testable contract
  (SURVEY.md §2.6 W1);
* "fetch" = equi-join frontier ⋈ pages on url (J3); misses are recorded
  with status='missing' (the reference's failed scrape, crawler_service
  .py:77-80);
* link expansion skipped at depth == max_depth (crawler_service.py:61) —
  saves the UDF cost, Catalyst can't do this for us;
* robots checked before admission (J4 broadcast join + pandas UDF);
* politeness: logical crawl-delay windows with salted per-host slots,
  deferring overflow to later generations (politeness.py).

Scale posture: every per-generation step is a DataFrame op — anti-join
(Bloom-prefiltered, hash-sharded), TakeOrdered budget top-k, two-pass
range-partitioned sequence assignment, salted windows. The only driver
state is counters and the generation loop itself; per-generation tables
are checkpointed (parquet commit protocol standing in for Iceberg
snapshots) so a crawl resumes from the last committed generation.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extract import make_extract_bundle_udf
from ..functions.robots import crawl_delay_udf, robots_allowed_udf
from ..functions.urls import host_of_url
from ..sources.checkpoint import CheckpointManager
from .ordering import assign_seq_counted, top_k
from .politeness import salted_fetch_schedule, salted_host_budget_cap
from .seen import SeenSet

# test/debug sink for EGET_CAPTURE_FETCH_PLAN=1 (one entry per generation
# that ran a fetch join); cleared by the caller, never in the hot path
FETCH_PLAN_CAPTURE: list[str] = []
RESUME_PLAN_CAPTURE: list[str] = []

CAND_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("parent_seq", T.LongType()),
        T.StructField("link_pos", T.IntegerType()),
    ]
)


@dataclass
class CrawlConfig:
    max_depth: int = 3  # reference default (crawler_request.py:20)
    max_pages: int | None = 100  # reference default (crawler_request.py:21)
    same_domain: bool = True
    exclude: tuple[str, ...] = ()
    include: tuple[str, ...] = ()
    respect_robots: bool = False
    host_budget: int | None = None  # per-generation per-host admission cap
    # Fetch-join strategy: below this frontier-wave size, the wave is
    # broadcast against the pages scan (hits) + anti-joined (misses), so the
    # big table is never shuffled. Above it — or on a real cluster — the
    # Iceberg answer is bucket(url) on both sides (storage-partitioned
    # join); the plain shuffle join is the fallback here.
    broadcast_fetch_threshold: int = 2_000_000
    crawl_delay_window: float | None = None  # logical seconds per generation
    # Salt for the politeness schedule's (host, salt) slot partitioning:
    # "xxhash64" (default, JVM-fast) or "md5" (first-byte of md5(url) —
    # bit-identical in ANSI SQL, so a DuckDB oracle can replay the full
    # deferral loop; see oracles.py _bfs_priority_politeness_sql). Both
    # are deterministic per-url; only the salt-group assignment differs.
    politeness_salt: str = "xxhash64"
    # Priority frontier (north-rule W2): admission order key becomes
    # (depth*w_depth + host_seen_count*w_host, parent_seq, link_pos).
    # Both 0.0 (default) == exact reference FIFO parity.
    priority_depth_weight: float = 0.0
    priority_host_weight: float = 0.0
    n_salts: int = 8
    n_shards: int = 32
    use_bloom: bool = True
    # "broadcast" (default, filters ≤ ~100 MB) or "files" (the 10^10-URL
    # design point: per-shard bitmap files loaded task-side — seen.py)
    bloom_storage: str = "broadcast"
    # Rewrite the seen table to 1 file/bucket every K generations
    # (Iceberg rewrite_data_files analog); None = never (sandbox scale).
    # Decision rule: the seen set accumulates n_shards files per
    # generation, and every membership anti-join opens all of them — so
    # compact when expected generations × n_shards outgrows a healthy
    # open-file count per task (~a few hundred files per bucket). Concretely:
    # crawls ≤ 64 generations → None (≤ 64 files/bucket is harmless);
    # unbounded drains / the 10^10-URL design point (hundreds-thousands of
    # generations) → set K so K+1 bounds files/bucket, e.g. K=4-16.
    # Compaction runs on the async maintenance thread (overlaps
    # fetch/extract) and rewrites O(accumulated) bytes every K generations
    # — amortized cost O(seen/K) per generation, the standard LSM trade.
    seen_compact_every: int | None = None
    # Small-wave admission fast path: when a wave's RAW candidate count
    # (known before admission runs) is at most this, the sequence
    # assigner skips range partitioning — the sampling job and the
    # per-partition count job are pure overhead for a wave that fits one
    # partition — and sorts locally inside the pinned pass instead
    # (identical output; ordering.assign_seq_counted single_partition).
    # This bounds the per-generation fixed cost on small/early waves; big
    # drain waves keep the scalable two-pass shape. 0 disables.
    # Default sizing: the bound is on RAW candidate EDGES (pre-dedup,
    # pre-seen — typically 5-10x the post-filter wave), and what actually
    # lands in the one partition is the post-filter wave: ≤1M admitted
    # rows ≈ 100-300 MB, a normal Spark partition and a sub-second local
    # sort. Raised from 65,536 in round 6: the range path's hidden
    # sampling job re-executes the admission pipeline, so the fast path
    # won the interleaved sf0.1 A/B on EVERY wave size this sandbox can
    # produce (19.0 s best vs 22.0 s best at the old default, identical
    # output). Design-point drain waves (10^8+ edges) still exceed this
    # and keep the two-pass range shape.
    seq_single_partition_max: int = 1_048_576
    max_generations: int = 64

    def __post_init__(self) -> None:
        # fail loud on typos: a silently-ignored salt mode would run a
        # DIFFERENT deterministic deferral schedule than the caller's
        # oracle/replay expects (same policy as SeenSet's bloom_storage)
        if self.politeness_salt not in ("xxhash64", "md5"):
            raise ValueError(
                f"unknown politeness_salt: {self.politeness_salt!r} "
                "(expected 'xxhash64' or 'md5')"
            )


@dataclass
class CrawlResult:
    admitted: DataFrame  # url, url_hash, host, depth, parent_url, enqueue_seq, generation
    extracted: DataFrame  # + status, markdown, title, ..., links
    metrics: DataFrame  # crawl_id, generation, name, value
    generations: int = 0
    stats: dict = field(default_factory=dict)


def _empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str],
    cfg: CrawlConfig | None = None,
    robots: DataFrame | None = None,  # (host, rules_text)
    checkpoint_dir: str | None = None,
    resume: bool = False,
    crawl_id: str = "crawl",
) -> CrawlResult:
    cfg = cfg or CrawlConfig()
    seen = SeenSet(
        spark,
        n_shards=cfg.n_shards,
        use_bloom=cfg.use_bloom,
        bloom_storage=cfg.bloom_storage,
        compact_every=cfg.seen_compact_every,
    )
    try:
        return _run_crawl(
            spark, pages, seeds, cfg, robots, checkpoint_dir, resume, crawl_id, seen
        )
    finally:
        # the bucketed working table is crawl-local; resumable crawls
        # rebuild it from the per-generation admitted checkpoint tables
        seen.drop()


def _run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: list[str],
    cfg: CrawlConfig,
    robots: DataFrame | None,
    checkpoint_dir: str | None,
    resume: bool,
    crawl_id: str,
    seen: SeenSet,
) -> CrawlResult:
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    if ckpt is not None and not resume:
        # a fresh crawl invalidates any prior chain in this directory —
        # stale committed generations would pollute read_all and hijack a
        # later resume with a higher-generation snapshot
        ckpt.reset()
    seed_host = host_of_url(seeds[0]) if cfg.same_domain else None
    # one parse per page: content + links share the tree (extract.py)
    bundle_udf = make_extract_bundle_udf(
        base_domain=seed_host,
        exclude=list(cfg.exclude),
        include=list(cfg.include),
        same_domain=cfg.same_domain,
    )

    admitted_gens: list[DataFrame] = []
    extracted_gens: list[DataFrame] = []
    metrics_rows: list[tuple] = []

    use_priority = (
        cfg.priority_depth_weight != 0.0 or cfg.priority_host_weight != 0.0
    )
    # Priority frontier (W2): per-host admitted counts, maintained
    # INCREMENTALLY — one O(wave)+O(hosts-touched) grouped agg per
    # generation, pinned by localCheckpoint. The naive alternative
    # (seen.df.groupBy("host").count() each wave) rescans the whole
    # accumulated seen table every generation and broadcasts one row per
    # distinct host — a growing cost at the 10^10-URL design point
    # (~10^7-10^8 hosts). This table's size is bounded by hosts *touched*,
    # its per-generation update cost by the wave, independent of seen size
    # (structural test: test_engine.py priority-path seen-access parity).
    host_counts: DataFrame | None = None
    hc_thread: threading.Thread | None = None
    hc_err: BaseException | None = None

    def bump_host_counts(admitted_g: DataFrame) -> None:
        nonlocal host_counts
        delta = admitted_g.groupBy("host").agg(F.count("*").alias("__host_seen"))
        if host_counts is not None:
            delta = (
                host_counts.unionByName(delta)
                .groupBy("host")
                .agg(F.sum("__host_seen").alias("__host_seen"))
            )
        host_counts = delta.localCheckpoint(eager=True)

    def hc_barrier() -> None:
        # join the in-flight counts merge and surface any failure BEFORE
        # the next read of host_counts (mirrors SeenSet.barrier)
        nonlocal hc_thread, hc_err
        if hc_thread is not None:
            hc_thread.join()
            hc_thread = None
        if hc_err is not None:
            err, hc_err = hc_err, None
            raise err

    def bump_host_counts_async(admitted_g: DataFrame) -> None:
        # the merged-counts checkpoint is an O(wave)+O(hosts-touched) job,
        # but it sat on the admission critical path — ~0.5-1 s of job
        # latency per generation that FIFO doesn't pay (measured: priority
        # 34.3 s vs FIFO 28.5 s at the sf0.1 bench config with the sync
        # bump). Nothing reads host_counts until the NEXT generation's
        # admission join, so run it on a maintenance thread overlapped
        # with this generation's fetch/extract/expand, exactly like
        # SeenSet.add_async. admitted_g is already pinned (assign_seq
        # localCheckpoint), so the thread re-runs only the narrow
        # offset-add pass, not the sort.
        nonlocal hc_thread, hc_err
        hc_barrier()

        def run() -> None:
            nonlocal hc_err
            try:
                bump_host_counts(admitted_g)
            except BaseException as e:  # surfaced at hc_barrier()
                hc_err = e

        try:
            from pyspark.util import inheritable_thread_target

            target = inheritable_thread_target(spark)(run)
        except ImportError:
            target = run
        hc_thread = threading.Thread(target=target, daemon=True)
        hc_thread.start()

    cand = spark.createDataFrame(
        [(u, 0, None, -1, j) for j, u in enumerate(seeds)], CAND_SCHEMA
    )
    n_cand = len(seeds)
    deferred: DataFrame | None = None
    n_deferred = 0
    next_seq = 0
    admitted_count = 0
    n_generations = 0  # generations that produced an extracted frame
    g0 = 0

    # ---- resume from last committed generation -------------------------
    if ckpt is not None and resume:
        last = ckpt.last_committed()
        if last is not None:
            state = ckpt.state(last)
            next_seq = state["next_seq"]
            admitted_count = state["admitted_count"]
            # Prometheus-style metric rows survive the restart too
            metrics_rows = [tuple(m) for m in state.get("metrics", [])]
            g0 = last + 1
            cand = (
                ckpt.read(spark, last, "next_candidates")
                if ckpt.has_table(last, "next_candidates")
                else _empty(spark, CAND_SCHEMA)
            )
            n_cand = cand.count()
            if ckpt.has_table(last, "deferred"):
                deferred = ckpt.read(spark, last, "deferred")
                n_deferred = deferred.count()
            # State rebuild as ONE multi-root scan over every committed
            # generation (same shape as the final assembly, VERDICT r5
            # watch #1): a design-point resume lands after hundreds-to-
            # thousands of generations, and a per-generation read + N-ary
            # union would pay an N-deep lineage at startup. The gen lists
            # get the single-scan frame — with a checkpoint the final
            # assembly re-reads read_all anyway, so they only serve the
            # has-rows gates and the checkpoint-less in-memory path.
            n_generations = sum(
                1 for gg in range(last + 1) if ckpt.has_table(gg, "extracted")
            )
            prior_admitted = ckpt.read_all(spark, "admitted")
            prior_extracted = ckpt.read_all(spark, "extracted")
            if os.environ.get("EGET_CAPTURE_RESUME_PLAN") == "1":
                # debug/test hook: record the rebuild-scan plans the ENGINE
                # emits on resume (plan tests assert one multi-root scan,
                # never an N-ary union, on the real code path)
                from ..plans.explain import plan_text

                for f in (prior_admitted, prior_extracted):
                    if f is not None:
                        RESUME_PLAN_CAPTURE.append(plan_text(f, mode="simple"))
            if prior_admitted is not None:
                admitted_gens.append(prior_admitted)
                # seen set = exactly the committed admitted rows; one bulk
                # rebuild (bucketed write + distributive bloom build)
                # replaces the old per-generation seen-table checkpoint
                seen.add(prior_admitted)
                if use_priority:
                    bump_host_counts(prior_admitted)
            if prior_extracted is not None:
                extracted_gens.append(prior_extracted)

    robots_b = F.broadcast(robots) if robots is not None else None
    trace = os.environ.get("EGET_CRAWL_TIMING") == "1"

    def _t(label: str, t0: float) -> float:
        now = time.time()
        if trace:
            print(f"    [gen {g}] {label}: {now - t0:.2f}s", flush=True)
        return now

    for g in range(g0, cfg.max_generations):
        have_cand = n_cand > 0
        have_deferred = deferred is not None and n_deferred > 0
        if not have_cand and not have_deferred:
            break

        # ---------------- admission pipeline (F1/F2/F3/W1/W3) ----------
        t0 = time.time()
        admitted_g = None
        n_adm = 0
        if have_cand:
            # A2 queue stats: candidates entering admission this wave (the
            # batch analog of the reference's queued gauge,
            # queue_manager.py get_stats)
            metrics_rows.append((crawl_id, g, "queued", float(n_cand)))
            # F8 invalid-URL guard: the reference validates every URL before
            # enqueue (pydantic HttpUrl on seeds, urlparse on links) — and
            # Spark 4's parse_url THROWS on malformed input, so an un-guarded
            # bad seed would kill the whole job. try_parse_url + scheme check
            # drops invalid rows instead (first probed via submit_crawl.py
            # with a 'not a url' seed).
            c = cand.filter(
                F.col("url").isNotNull() & F.col("url").rlike(r"^https?://")
            )
            c = c.filter(F.col("depth") <= F.lit(cfg.max_depth))
            c = c.withColumn(
                "host",
                F.coalesce(F.try_parse_url(F.col("url"), F.lit("HOST")), F.lit("")),
            ).filter(F.col("host") != "")
            if cfg.respect_robots and robots_b is not None:
                # seeds bypass robots: the reference seeds via add_url
                # directly (crawler_service.py:117); robots gate only
                # extracted links (link_extractor.py:119-120)
                c = c.join(robots_b, on="host", how="left")
                c = c.filter(
                    (F.col("depth") == 0)
                    | robots_allowed_udf(F.col("url"), F.col("rules_text"))
                )
                c = c.drop("rules_text")
            # first-wins inside the wave (queue_manager.py:47 under lock):
            # min-struct aggregation, NOT a row_number window — a hash agg
            # gets map-side partial aggregation, so the many duplicate
            # edges into a popular url collapse BEFORE the shuffle (a
            # window must shuffle every candidate row first). The struct
            # leads with (parent_seq, link_pos) — unique per row — so the
            # min is exactly the window's first row.
            other_cols = [f.name for f in c.schema.fields if f.name != "url"]
            c = (
                c.groupBy("url")
                .agg(
                    F.min(
                        F.struct(
                            "parent_seq",
                            "link_pos",
                            *[x for x in other_cols if x not in ("parent_seq", "link_pos")],
                        )
                    ).alias("__m")
                )
                .select("url", *[F.col(f"__m.{x}").alias(x) for x in other_cols])
            )
            c = c.withColumn("url_hash", F.xxhash64(F.col("url")))
            c = seen.filter_unseen(c)
            if cfg.host_budget is not None:
                # salted two-phase cap: phase-1 ranks within (host, salt)
                # so no task sorts the mega-host's full candidate set;
                # phase-2 re-ranks the ≤ n_salts×budget survivors per host
                # (config-bounded partition). Exact vs the single-window
                # rank — politeness.py salted_host_budget_cap.
                c = salted_host_budget_cap(
                    c,
                    ["parent_seq", "link_pos"],
                    cfg.host_budget,
                    n_salts=cfg.n_salts,
                )
            order_cols = ["parent_seq", "link_pos"]
            if use_priority:
                # plain equi-join on host: both sides shuffle by host —
                # O(wave + hosts touched), never a rescan of the seen set
                # and never a broadcast of ALL hosts. At sandbox scale AQE
                # auto-broadcasts the tiny counts side; at 10^8 hosts it
                # stays a shuffle join with AQE skew-split as the mega-host
                # backstop.
                hc_barrier()  # join the overlapped counts merge, if any
                if host_counts is not None:
                    c = c.join(host_counts, on="host", how="left")
                else:
                    c = c.withColumn("__host_seen", F.lit(None).cast("long"))
                c = c.withColumn(
                    "priority",
                    F.col("depth") * F.lit(cfg.priority_depth_weight)
                    + F.coalesce(F.col("__host_seen"), F.lit(0))
                    * F.lit(cfg.priority_host_weight),
                ).drop("__host_seen")
                order_cols = ["priority", "parent_seq", "link_pos"]
            remaining = None
            if cfg.max_pages is not None:
                # clamp at 0: a resume with a SMALLER max_pages than the
                # checkpoint already admitted must truncate to nothing,
                # never drive n_adm/next_seq negative
                remaining = max(0, cfg.max_pages - admitted_count)
                if remaining == 0:
                    c = _empty(spark, c.schema)
                elif remaining <= 10_000:
                    # small-budget fast path: TakeOrdered truncates the
                    # wave to ≤ remaining rows BEFORE the seq assigner's
                    # sort+pin (a wave can exceed the budget many-fold —
                    # e.g. a huge seed list with a tiny max_pages); its
                    # p×k single-point merge is harmless at this k
                    c = top_k(c, order_cols, remaining)
            t0 = _t("admission-plan", t0)
            # Budget truncation rides the sequence assigner (W3): seqs are
            # assigned to the WHOLE wave by the range-partitioned two-pass
            # sort, then `enqueue_seq < start + remaining` keeps exactly
            # the top-`remaining` in admission order — the same rows
            # orderBy+limit would keep, but as a distributed narrow filter.
            # TakeOrderedAndProject (ordering.top_k, still the right
            # primitive for small per-query top-k) funnels min(k, rows)
            # per partition through ONE merge point — at the design point
            # a 10^9-page budget would collect ~p×10^9 rows; this shape
            # never does. The per-partition count pass inside assign_seq
            # doubles as the admitted-count metric — no row ever reaches
            # the driver.
            seq_df, n_all = assign_seq_counted(
                c,
                order_cols,
                start=next_seq,
                # n_cand bounds the post-filter wave from above; when the
                # small-budget top_k actually truncated (remaining ≤ 10k),
                # `remaining` is the tighter bound
                single_partition=(
                    min(
                        n_cand,
                        remaining
                        if remaining is not None and remaining <= 10_000
                        else n_cand,
                    )
                    <= cfg.seq_single_partition_max
                ),
            )
            if remaining is not None and n_all > remaining:
                seq_df = seq_df.filter(
                    F.col("enqueue_seq") < F.lit(next_seq + remaining)
                )
                n_adm = remaining
            else:
                n_adm = n_all
            admitted_g = seq_df.withColumn("generation", F.lit(g))
            t0 = _t("assign_seq", t0)
            if use_priority:
                admitted_g = admitted_g.drop("priority")
            # no extra checkpoint: assign_seq already pinned its sorted
            # parent (ordering.py localCheckpoint), so every downstream
            # consumer (seen add, fetch join, final union, commit) re-runs
            # only the cheap deterministic offset-add pandas pass — one
            # materialization job per generation instead of two
            t0 = _t("admitted-plan", t0)
            next_seq += n_adm
            admitted_count += n_adm
            metrics_rows.append((crawl_id, g, "admitted", float(n_adm)))
            if n_adm > 0:
                # bucketed O(delta) append + distributive bloom-delta build,
                # overlapped with this generation's fetch/extract/expand
                # (nothing below reads the seen set; the next generation's
                # filter_unseen barriers first)
                seen.add_async(admitted_g)
                t0 = _t("seen-add-async", t0)
                if use_priority:
                    # incremental counts update: O(wave) agg + merge with
                    # the (hosts-touched)-sized running table, overlapped
                    # with this generation's fetch/extract (next read is
                    # gen g+1's admission join, behind hc_barrier)
                    bump_host_counts_async(admitted_g)
                    t0 = _t("host-counts-async", t0)
                admitted_gens.append(admitted_g)
                # admitted_hosts / extracted / missing metric rows are
                # computed once post-loop (single grouped agg over the
                # checkpointed unions) instead of one job per generation

        # ---------------- fetch set (J3) + politeness -------------------
        n_adm_g = n_adm if admitted_g is not None else 0
        fetchable = admitted_g if (admitted_g is not None and n_adm > 0) else None
        if have_deferred:
            d = deferred
            fetchable = d if fetchable is None else fetchable.unionByName(d)
        n_fetchable = n_adm_g + (n_deferred if have_deferred else 0)
        deferred = None
        n_deferred = 0
        if fetchable is None or n_fetchable == 0:
            cand = _empty(spark, CAND_SCHEMA)
            n_cand = 0  # nothing admitted and nothing deferred → loop ends
            if ckpt is not None:
                tables = {"next_candidates": cand}
                if admitted_g is not None and n_adm > 0:
                    tables["admitted"] = admitted_g
                ckpt.commit(
                    g,
                    tables,
                    {
                        "next_seq": next_seq,
                        "admitted_count": admitted_count,
                        "metrics": metrics_rows,
                    },
                )
            continue

        if cfg.crawl_delay_window is not None and robots_b is not None:
            fj = fetchable.join(robots_b, on="host", how="left")
            fj = fj.withColumn("crawl_delay", crawl_delay_udf(F.col("rules_text")))
            # drop rules_text BEFORE the schedule + pin (r7, VERDICT r6
            # watch #1): nothing below reads it, and carrying a per-host
            # robots body copied onto every URL through the wave-sized
            # localCheckpoint was the largest remaining per-generation
            # materialization in the politeness regime
            fj = fj.drop("rules_text")
            salt_expr = None
            if cfg.politeness_salt == "md5":
                salt_expr = F.pmod(
                    F.conv(F.substring(F.md5(F.col("url")), 1, 2), 16, 10).cast(
                        "long"
                    ),
                    F.lit(cfg.n_salts),
                )
            fj = salted_fetch_schedule(
                fj,
                order_cols=["depth", "enqueue_seq"],
                n_salts=cfg.n_salts,
                salt_expr=salt_expr,
            )
            fj = fj.localCheckpoint(eager=True)
            eligible = fj.filter(
                F.col("fetch_time") < F.lit(cfg.crawl_delay_window)
            ).drop("crawl_delay", "fetch_time")
            deferred = fj.filter(
                F.col("fetch_time") >= F.lit(cfg.crawl_delay_window)
            ).drop("crawl_delay", "fetch_time")
            n_deferred = deferred.count()
            if n_deferred == 0:
                deferred = None
            else:
                metrics_rows.append((crawl_id, g, "deferred", float(n_deferred)))
        else:
            eligible = fetchable

        # fetch = equi-join against the pages table. A naive LEFT join
        # cannot broadcast the (preserved) frontier side, so Spark would
        # shuffle the whole pages table EVERY generation — measured ~15s/gen
        # at sf0.1. Instead: broadcast the wave into an inner join (pages
        # is only scanned, never shuffled), and recover fetch-misses with
        # an anti-join against the url column (auto-broadcast at this
        # scale; bucketed SPJ on a cluster).
        def _extract_select(src: DataFrame) -> DataFrame:
            expand = F.col("depth") < F.lit(cfg.max_depth)
            return (
                src.withColumn(
                    "e",
                    F.when(
                        F.col("html").isNotNull(),
                        bundle_udf(F.col("html"), F.col("url")),
                    ),
                )
                .withColumn(
                    "links",
                    F.when(expand, F.col("e.links")).otherwise(
                        F.array().cast("array<string>")
                    ),
                )
                .withColumn("links", F.coalesce(F.col("links"), F.array()))
                .withColumn(
                    "status",
                    F.when(
                        F.col("html").isNotNull(), F.lit("extracted")
                    ).otherwise(F.lit("missing")),
                )
                .withColumn("fetch_generation", F.lit(g))
                .select(
                    "url",
                    "url_hash",
                    "host",
                    "depth",
                    "parent_url",
                    "enqueue_seq",
                    "generation",
                    "fetch_generation",
                    "status",
                    F.col("e.markdown").alias("markdown"),
                    F.col("e.title").alias("title"),
                    F.col("e.description").alias("description"),
                    F.col("e.language").alias("language"),
                    F.col("e.metadata").alias("metadata"),
                    F.col("e.open_graph").alias("open_graph"),
                    F.col("e.twitter_card").alias("twitter_card"),
                    F.col("e.meta_data").alias("meta_data"),
                    F.col("e.json_ld").alias("json_ld"),
                    "links",
                )
            )

        ext = None
        if n_fetchable <= cfg.broadcast_fetch_threshold:
            hits = pages.select("url", "html").join(
                F.broadcast(eligible), on="url", how="inner"
            )
            # the inner join inherits the pages SCAN's partitioning (one
            # per input split — 128 at sf0.1), so a 20k-row wave smears
            # ~150 rows per task and the extract pass pays 128 Arrow/
            # Python-worker round-trips. Coalesce (no shuffle) to core
            # count before pinning: same scan parallelism, 4× fewer
            # extract tasks. Harmless for big waves (rows/partition stays
            # bounded by wave/cores).
            if os.environ.get("EGET_HITS_COALESCE", "1") != "0":
                hits = hits.coalesce(
                    max(2, spark.sparkContext.defaultParallelism)
                )
            if os.environ.get("EGET_CAPTURE_FETCH_PLAN") == "1":
                from ..plans.explain import plan_text

                FETCH_PLAN_CAPTURE.append(plan_text(hits))
            if os.environ.get("EGET_HITS_PIN", "0") == "1":
                # pre-r6 shape (diagnosis only): pin the raw hits (url,
                # html) first, then extract+pin — TWO wave-sized
                # materializations per generation, one of them the full
                # HTML payload
                hits = hits.localCheckpoint(eager=True)
                t0 = _t("fetch-hits", t0)
                missed = eligible.join(
                    F.broadcast(hits.select("url")), on="url", how="left_anti"
                ).withColumn("html", F.lit(None).cast("binary"))
                ext = _extract_select(
                    hits.unionByName(missed)
                ).localCheckpoint(eager=True)
                t0 = _t("extract", t0)
            else:
                # r6 shape: extract STRAIGHT off the broadcast join and pin
                # only the extraction output — the wave's raw HTML is never
                # materialized (it exists only inside the Arrow batches of
                # this one pass), and pages is still scanned exactly once
                # per generation. Fetch-misses are recovered from the
                # PINNED extraction output (urls only) instead of a pinned
                # hits frame, with the reference miss envelope (null
                # bundle, empty links, status='missing') built as literals
                # — identical output to the pre-r6 shape (engine A/B test).
                ext_h = _extract_select(hits).localCheckpoint(eager=True)
                t0 = _t("fetch-extract", t0)
                missed = eligible.join(
                    F.broadcast(ext_h.select("url")), on="url", how="left_anti"
                )
                _null_e = {
                    "markdown": "string",
                    "title": "string",
                    "description": "string",
                    "language": "string",
                    "metadata": "map<string,string>",
                    "open_graph": "map<string,string>",
                    "twitter_card": "map<string,string>",
                    "meta_data": "map<string,string>",
                    "json_ld": "array<string>",
                }
                ext_m = missed.select(
                    "url",
                    "url_hash",
                    "host",
                    "depth",
                    "parent_url",
                    "enqueue_seq",
                    "generation",
                    F.lit(g).alias("fetch_generation"),
                    F.lit("missing").alias("status"),
                    *[
                        F.lit(None).cast(t).alias(c)
                        for c, t in _null_e.items()
                    ],
                    F.array().cast("array<string>").alias("links"),
                )
                # no pin: ext_m is a cheap broadcast anti-join over pinned
                # parents; consumers re-run it narrowly
                ext = ext_h.unionByName(ext_m)
        else:
            fetched = eligible.join(
                pages.select("url", "html"), on="url", how="left"
            )
            if os.environ.get("EGET_CAPTURE_FETCH_PLAN") == "1":
                # debug/test hook: record the physical plan the ENGINE
                # emits for this generation's fetch join (plan tests assert
                # the bucketed no-exchange shape on the real code path, not
                # a hand-rebuilt join)
                from ..plans.explain import plan_text

                FETCH_PLAN_CAPTURE.append(plan_text(fetched))
            ext = _extract_select(fetched).localCheckpoint(eager=True)
            t0 = _t("extract", t0)
        extracted_gens.append(ext)
        n_generations += 1

        # ---------------- expand links → next wave ----------------------
        cand = (
            ext.filter(F.size("links") > 0)
            .select(
                F.col("url").alias("parent_url"),
                F.col("enqueue_seq").alias("parent_seq"),
                (F.col("depth") + 1).alias("depth"),
                F.posexplode("links").alias("link_pos", "url"),
            )
            .select("url", "depth", "parent_url", "parent_seq", "link_pos")
        )
        # No localCheckpoint here (r4): cand's lineage is a deterministic
        # posexplode over the ALREADY-pinned ext, so every consumer (the
        # count below, the admission pipeline, a checkpoint commit) re-runs
        # only the cheap narrow explode instead of paying a wave-sized
        # materialization write+read per generation — measured 5-8% off the
        # sf0.1 crawl headline, byte-identical output (interleaved A/B,
        # 3 pairs). filter_unseen's determinism contract is satisfied by
        # the pinned parent. Set EGET_CAND_CHECKPOINT=1 to restore the old
        # behavior when diagnosing lineage issues.
        if os.environ.get("EGET_CAND_CHECKPOINT", "0") == "1":
            cand = cand.localCheckpoint(eager=True)
        n_cand = cand.count()
        t0 = _t("expand-links", t0)

        if ckpt is not None:
            tables = {
                "next_candidates": cand,
                "extracted": ext,
            }
            if admitted_g is not None:
                tables["admitted"] = admitted_g
            if deferred is not None:
                tables["deferred"] = deferred
            ckpt.commit(
                g,
                tables,
                {
                    "next_seq": next_seq,
                    "admitted_count": admitted_count,
                    "metrics": metrics_rows,
                },
            )

    # F-gate: the loop exits with work left only when max_generations ran
    # out (e.g. a long politeness-deferred tail). The reference's asyncio
    # loop cannot hit this (it drains the queue); a batch engine must not
    # drop the tail silently (VERDICT r1 §wrong-5).
    n_left = n_cand + (n_deferred if deferred is not None else 0)
    if n_left > 0:
        import warnings

        warnings.warn(
            f"crawl '{crawl_id}' stopped at max_generations="
            f"{cfg.max_generations} with {n_left} PRE-ADMISSION candidates "
            "still pending (some may be already-seen/invalid/over-depth — "
            "the count is taken before the dedup/depth filters run)",
            stacklevel=2,
        )
        metrics_rows.append(
            (crawl_id, cfg.max_generations, "truncated", float(n_left))
        )

    # surface any failure from the last generation's overlapped counts
    # merge (its result is never read again, but a died maintenance
    # thread must not vanish silently)
    hc_barrier()
    # Final assembly (VERDICT r4 watch #1): with a checkpoint dir the
    # committed per-generation tables already hold every admitted/extracted
    # row, so read them back as ONE partitioned scan instead of unioning N
    # localCheckpointed frames — at the 10^10-URL design point a crawl runs
    # hundreds-to-thousands of generations and an N-ary union lineage (plus
    # N live checkpoint RDD chains) is the wrong shape. The in-memory union
    # remains the checkpoint-less path (identical output, tested).
    admitted = extracted = None
    if ckpt is not None:
        admitted = ckpt.read_all(spark, "admitted")
        extracted = ckpt.read_all(spark, "extracted")
    if admitted is None:
        admitted = (
            _union_all(admitted_gens)
            if admitted_gens
            else _empty(
                spark,
                T.StructType(
                    list(CAND_SCHEMA.fields)
                    + [
                        T.StructField("host", T.StringType()),
                        T.StructField("url_hash", T.LongType()),
                        T.StructField("enqueue_seq", T.LongType()),
                        T.StructField("generation", T.IntegerType()),
                    ]
                ),
            )
        )
    if extracted is None:
        extracted = _union_all(extracted_gens) if extracted_gens else None

    # per-generation host/outcome metrics in ONE grouped agg each (the
    # driver sees ≤ generations×statuses scalar rows, never URL rows);
    # LAZY since r7: the aggs scan every admitted/extracted row, and a
    # caller that never reads ``metrics`` (the bench's crawl loop, any
    # pure-crawl invocation) paid ~1.5-2 s per run for rows it discarded.
    # Content and (generation, name) ordering are identical to the old
    # eager collect-and-append construction; consumers that do read
    # metrics pay the same two aggs on first action.
    metrics_schema = "crawl_id string, generation int, name string, value double"
    metrics = spark.createDataFrame(
        sorted(metrics_rows, key=lambda m: (m[1], m[2]))
        or [(crawl_id, -1, "admitted", 0.0)],
        metrics_schema,
    )
    if admitted_gens:
        hosts_m = (
            admitted.groupBy("generation")
            .agg(F.countDistinct("host").alias("h"))
            .select(
                F.lit(crawl_id).alias("crawl_id"),
                F.col("generation").cast("int").alias("generation"),
                F.lit("admitted_hosts").alias("name"),
                F.col("h").cast("double").alias("value"),
            )
        )
        metrics = metrics.unionByName(hosts_m)
    if extracted is not None:
        from pyspark.sql import Window

        status = extracted.groupBy("fetch_generation", "status").count()
        status_m = status.select(
            F.lit(crawl_id).alias("crawl_id"),
            F.col("fetch_generation").cast("int").alias("generation"),
            F.col("status").alias("name"),
            F.col("count").cast("double").alias("value"),
        )
        # A2: cumulative processed pages through each generation (the
        # reference's completed counter) — a running sum over ≤
        # max_generations scalar rows (single tiny window partition)
        completed_m = (
            status.groupBy("fetch_generation")
            .agg(F.sum("count").alias("done"))
            .select(
                F.lit(crawl_id).alias("crawl_id"),
                F.col("fetch_generation").cast("int").alias("generation"),
                F.lit("completed").alias("name"),
                F.sum("done")
                .over(Window.orderBy("fetch_generation"))
                .cast("double")
                .alias("value"),
            )
        )
        metrics = metrics.unionByName(status_m).unionByName(completed_m)
    metrics = metrics.orderBy("generation", "name")
    return CrawlResult(
        admitted=admitted,
        extracted=extracted,
        metrics=metrics,
        generations=n_generations,
        stats={"admitted": admitted_count, "next_seq": next_seq},
    )


def _union_all(dfs: list[DataFrame]) -> DataFrame:
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
