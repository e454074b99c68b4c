"""The crawl engine: PySpark-native URL frontier + fetch scheduler.

One crawl round is one Spark job pipeline over snapshot tables:

    frontier ──(refill token buckets)── host_state
       │ join on host_id
       ▼
    salted top-k per host (operators.topk — politeness priority queue)
       │
    fetch UDF ── parse+extract UDF (one parse: spans, links, title)
       │
    explode links ── canonicalize ── robots filter
       │
    bloom prefilter + exact anti-join vs seen (operators.seen)
       │
    write snapshots: docs+, fetch_log+, seen+, frontier', host_state',
                     bloom', manifest (metrics + per-partition lineage)

Storage goes through the :mod:`scalpel_ts_spark.plans.storage` seam:
the sandbox uses ``ParquetSnapshotStorage`` (every table versioned by
round under ``workdir/<table>/r<N>``, manifest as JSON), a cluster uses
``IcebergSnapshotStorage`` (``writeTo(...).overwritePartitions()`` on
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

from scalpel_ts_spark.functions.url import canonicalize_url, url_hash
from scalpel_ts_spark.operators.extract import crawl_extract_udf
from scalpel_ts_spark.operators.seen import build_bloom, new_urls, update_bloom
from scalpel_ts_spark.operators.topk import topk_per_group
from scalpel_ts_spark.plans.storage import ParquetSnapshotStorage, SnapshotStorage
from scalpel_ts_spark.sources.synthetic import (
    fetch_robots_rules,
    fetch_udf,
    host_id_col,
    page_id_col,
    seq_col,
)

TABLES = (
    "frontier", "seen", "host_state", "docs", "fetch_log", "bloom", "robots"
)


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
        write_docs: bool = True,
        compact_every: int = 8,
        storage: SnapshotStorage | None = None,
        fetch_stage=None,
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
        """
        self.spark = spark
        self.workdir = workdir
        self.n_hosts = n_hosts
        self.cap = cap
        self.refill = refill
        self.salt_buckets = salt_buckets
        self.use_bloom = use_bloom
        self.bloom_buckets = bloom_buckets
        self.write_docs = write_docs
        self.compact_every = compact_every
        self.storage = storage or ParquetSnapshotStorage(spark, workdir)
        self.fetch_stage = fetch_stage
        self.round = 0
        self._frontier_rows: int | None = None
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
            "compact_every": self.compact_every,
        }

    # --- snapshot IO (thin delegates onto the storage seam) ---------------

    def _write(self, df: DataFrame, table: str, rnd: int):
        self.storage.write(df, table, rnd)

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
        )
        self._write(frontier, "frontier", 0)
        self._write(frontier.select("url", "url_hash"), "seen", 0)
        self._write(
            self.spark.createDataFrame([], "host_id long, tokens int"),
            "host_state",
            0,
        )
        self._write(
            self.spark.createDataFrame(
                [], "host_id long, disallow_mod int, disallow_rem int"
            ),
            "robots",
            0,
        )
        if self.use_bloom:
            self._write(
                build_bloom(frontier, n_buckets=self.bloom_buckets), "bloom", 0
            )
        self.round = 0
        self._frontier_rows = None  # re-count on the next round: a
        # re-initialized engine must not size tasks from a stale crawl
        self.manifest["rounds"] = []
        self.manifest["seen_full_rounds"] = [0]
        self._save_manifest()

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        workdir: str,
        storage: SnapshotStorage | None = None,
    ) -> "CrawlEngine":
        """Reopen an engine from its latest committed snapshot."""
        storage = storage or ParquetSnapshotStorage(spark, workdir)
        manifest = storage.load_manifest()
        cfg = manifest["config"]
        eng = cls(spark, workdir, storage=storage, **{k: cfg[k] for k in cfg})
        eng.manifest = manifest
        eng.round = len(manifest["rounds"])
        return eng

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
        new_state = refreshed.unionByName(idle)

        # 2. politeness-budgeted selection: salted top-k per host by
        #    (priority, seq) with k = the host's token balance.
        #    host_state is per-HOST (millions of rows at most) while
        #    the frontier is per-URL (10^10 design point) — broadcast
        #    the small side so the frontier is not shuffled for this
        #    join
        budgeted = frontier.join(F.broadcast(new_state), "host_id")
        candidates = topk_per_group(
            budgeted,
            group_cols=["host_id"],
            order_cols=[F.col("priority"), F.col("seq")],
            k=F.col("tokens"),
            salt_buckets=self.salt_buckets,
            prune_k=self.cap,
        ).drop("tokens")

        # 3. fetch + single-parse extraction (spans, links, title).
        # Explicit repartition first: AQE sizes partitions by shuffle
        # BYTES, but fetch/parse cost is per ROW (and the UDF's output
        # is ~10x its input) — without this the whole Python stage can
        # coalesce onto a handful of tasks.  Keyed by (host, url) so a
        # production async-HTTP fetcher still sees host-batched rows.
        # Task count adapts to the round's expected fetch volume
        # (~2k rows per task): a 5k-URL warm-up round should not spawn
        # 64 Python workers, and a 10^10-URL frontier still caps at
        # 2x cores.  The frontier row count is tracked arithmetically
        # (rows' = rows - fetched + new); the first round after
        # init/resume pays one parquet-metadata count.
        if self._frontier_rows is None:
            self._frontier_rows = frontier.count()
        max_par = self.spark.sparkContext.defaultParallelism * 2
        expected = min(self._frontier_rows, self.cap * self.n_hosts)
        par = max(1, min(max_par, -(-expected // 2048)))
        fetch_err_obs = None
        if self.fetch_stage is not None:
            # no pre-repartition: a grouped fetch stage (http_fetch_
            # stage's applyInPandas) shuffles by host itself — a prior
            # (host, url) exchange would just be shuffled again
            with_html = self.fetch_stage(candidates)
            if "fetch_error" in with_html.columns:
                # failed fetches are NOT fetched: they are excluded
                # here, never enter docs/fetch_log/seen, do not spend
                # host tokens, and — because the frontier anti-join
                # below removes only fetched url_hashes — stay in the
                # frontier for retry next round
                fetch_err_obs = Observation()
                with_html = with_html.observe(
                    fetch_err_obs,
                    F.count(
                        F.when(F.col("fetch_error").isNotNull(), 1)
                    ).alias("errors"),
                ).filter(F.col("fetch_error").isNull())
        else:
            with_html = candidates.repartition(
                par, "host_id", "url_hash"
            ).withColumn("html", fetch_udf(self.n_hosts)(F.col("url")))
        fetched = (
            with_html.withColumn(
                "ex", crawl_extract_udf()(F.col("url"), F.col("html"))
            )
            .select(*candidates.columns, "ex")
            .persist()
        )
        # one job: materialize fetch+extract AND collect per-partition
        # lineage; n_fetched derives from the lineage rows
        lineage = [
            {"partition": row["pid"], "rows": row["rows"]}
            for row in fetched.groupBy(
                F.spark_partition_id().alias("pid")
            ).agg(F.count("*").alias("rows")).collect()
        ]
        n_fetched = sum(p["rows"] for p in lineage)
        _mark("fetch_extract")
        if n_fetched == 0:
            fetched.unpersist()
            return {
                "round": r + 1,
                "fetched": 0,
                "stopped": True,
                "fetch_errors": (
                    int(fetch_err_obs.get["errors"])
                    if fetch_err_obs is not None
                    else 0
                ),
            }

        # 4. link discovery -> canonical candidate URLs.  Robots rules
        #    come from the per-host cache table: rules are "fetched"
        #    only for hosts seen for the first time (cache misses are
        #    a per-round metric), then broadcast-joined onto the
        #    candidates — hosts are few relative to URLs, so the rule
        #    side always broadcasts.
        # persisted: the regex-heavy canonicalize + host-extract pass
        # over every discovered link feeds BOTH the new-host robots
        # lookup and the discovery filter — without the persist it
        # runs twice
        candidates_raw = (
            fetched.select(F.explode("ex.links").alias("raw_url"))
            .select(canonicalize_url(F.col("raw_url")).alias("url"))
            .withColumn("host_id", host_id_col(F.col("url")))
            .filter(F.col("host_id").isNotNull())
            .persist()
        )
        robots_prev = self._read("robots", r)
        new_hosts = (
            candidates_raw.select("host_id")
            .distinct()
            .join(robots_prev.select("host_id"), "host_id", "left_anti")
        )
        # one job on the (tiny) DELTA of new rules — counting the full
        # cache twice per round paid two jobs for the same number
        new_rules = fetch_robots_rules(new_hosts).persist()
        n_robots_fetched = new_rules.count()
        robots = robots_prev.unionByName(new_rules)
        _mark("robots")
        discovered = (
            candidates_raw.join(F.broadcast(robots), "host_id")
            .filter(
                page_id_col(F.col("url")) % F.col("disallow_mod")
                != F.col("disallow_rem")
            )
            .drop("disallow_mod", "disallow_rem")
            .dropDuplicates(["url"])
            .select(
                "url",
                "host_id",
                F.lit(r + 1).alias("priority"),
                seq_col(F.col("url")).alias("seq"),
                url_hash(F.col("url")).alias("url_hash"),
            )
        )

        # 5. seen-set dedup: bloom prefilter + exact anti-join
        seen = self._seen_union(r)
        blooms = self._read("bloom", r) if self.use_bloom else None
        bloom_caches: list = []
        fresh = new_urls(
            discovered,
            seen,
            blooms,
            n_buckets=self.bloom_buckets,
            persisted_out=bloom_caches,
        ).persist()
        # the new-URL count rides the seen write as an Observation
        # instead of paying a separate count job; fresh stays persisted
        # because three sinks consume it (seen, frontier, bloom)
        n_new_obs = Observation()
        seen_delta = fresh.observe(
            n_new_obs, F.count(F.lit(1)).alias("n_new")
        ).select("url", "url_hash")

        # 6. next frontier = pending - fetched + fresh.  The fetched
        #    set is bounded by the round budget (≪ frontier), so the
        #    anti-join broadcasts it instead of shuffling the frontier
        next_frontier = frontier.join(
            F.broadcast(fetched.select("url_hash")), "url_hash", "left_anti"
        ).unionByName(fresh)

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
        #    new_rules) are already persisted+materialized, so the
        #    writes are submitted CONCURRENTLY from driver threads —
        #    Spark schedules them as parallel jobs, collapsing commit
        #    latency from the sum of seven jobs to roughly the slowest
        #    one.  (On a cluster this is the standard multi-sink
        #    pattern; atomicity stays at round granularity because the
        #    manifest is written only after every future completes.)
        nxt = r + 1
        writes = []
        if self.write_docs:
            writes.append(
                (
                    fetched.select(
                        "url",
                        F.lit(nxt).alias("round"),
                        F.col("ex.title").alias("title"),
                        F.col("ex.spans").alias("spans"),
                    ),
                    "docs",
                )
            )
        writes.append(
            (
                fetched.select(
                    F.lit(r).alias("round"),
                    "priority",
                    "seq",
                    "url",
                    "host_id",
                    F.size("ex.links").alias("n_links"),
                ),
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
            seen_write = (seen_delta, "seen")
        # the seen write runs FIRST, alone: it pulls `fresh` through its
        # persist (and fires the n_new observation), so the concurrent
        # writes below read cached blocks — on a multi-executor cluster,
        # racing cold consumers would each recompute the dedup plan
        # (caches are per-executor), tripling the most expensive stage
        self._write(*seen_write, nxt)
        writes.append((next_frontier, "frontier"))
        # per-host tables are tiny (one row per host): single-file
        # snapshots keep resume reads from opening dozens of stub files
        writes.append((host_state_next.repartition(1), "host_state"))
        writes.append((robots.repartition(1), "robots"))
        if self.use_bloom:
            # incremental: OR this round's new hashes into the previous
            # bitmaps partition-locally — never rescans seen history
            writes.append(
                (
                    update_bloom(
                        blooms, fresh.select("url_hash"),
                        n_buckets=self.bloom_buckets,
                    ),
                    "bloom",
                )
            )
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            futures = [
                pool.submit(self._write, df, table, nxt)
                for df, table in writes
            ]
            for fut in futures:
                fut.result()
        if compacted:
            # record the full snapshot only AFTER its write succeeded —
            # marking it earlier would let a failed-then-retried round
            # treat a mere delta as the entire seen set
            self.manifest.setdefault("seen_full_rounds", [0]).append(nxt)
        n_new = int(n_new_obs.get["n_new"])
        self._frontier_rows = self._frontier_rows - n_fetched + n_new
        for cached in bloom_caches:
            cached.unpersist()
        candidates_raw.unpersist()
        new_rules.unpersist()
        fetched.unpersist()
        fresh.unpersist()
        _mark("commit")

        metrics = {
            "round": nxt,
            "fetched": n_fetched,
            "discovered_new": n_new,
            "fetch_errors": (
                int(fetch_err_obs.get["errors"])
                if fetch_err_obs is not None
                else 0
            ),
            "robots_cache_misses": n_robots_fetched,
            "wall_sec": round(time.time() - t0, 3),
            "sections": sections,
            "lineage": lineage,
        }
        self.manifest["rounds"].append(metrics)
        self.round = nxt
        self._save_manifest()
        return metrics

    def run(self, rounds: int):
        out = []
        for _ in range(rounds):
            m = self.run_round()
            if m.get("stopped"):
                break
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
