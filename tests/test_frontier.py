"""Crawl determinism gates (SURVEY.md §5.2 item 2):

1. the Spark engine's ordered fetch log and final URL-seen set equal
   the single-process reference simulator's under the same seed list
   and politeness budget;
2. a run resumed from a mid-crawl snapshot produces an identical tail;
3. the bloom prefilter changes nothing (it is a prefilter, the exact
   anti-join is the authority).
"""

import pytest

from scalpel_ts_spark.plans.frontier import CrawlEngine
from scalpel_ts_spark.plans.simulator import simulate_crawl
from scalpel_ts_spark.sources.synthetic import make_url

SEEDS = [make_url(1, 0), make_url(2, 5), make_url(7, 11)]
ROUNDS = 4
N_HOSTS = 20


def _sim():
    return simulate_crawl(SEEDS, ROUNDS, cap=8, refill=4, n_hosts=N_HOSTS)


def _engine_log(eng):
    rows = eng.fetch_log().collect()
    return sorted((r.round, r.priority, r.seq, r.url) for r in rows)


def _sim_log(sim):
    return sorted(
        (e["round"], e["priority"], e["seq"], e["url"]) for e in sim.fetch_log
    )


@pytest.fixture(scope="module")
def sim_state():
    return _sim()


def test_spark_crawl_matches_simulator(spark, tmp_path_factory, sim_state):
    wd = str(tmp_path_factory.mktemp("crawl"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False
    )
    eng.init(SEEDS)
    eng.run(ROUNDS)
    assert _engine_log(eng) == _sim_log(sim_state)
    got_seen = {r.url for r in eng.seen().collect()}
    assert got_seen == sim_state.seen


def test_resume_produces_identical_tail(spark, tmp_path_factory, sim_state):
    wd = str(tmp_path_factory.mktemp("crawl_resume"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False
    )
    eng.init(SEEDS)
    eng.run(2)
    # simulate a crash: reopen from the manifest and continue
    eng2 = CrawlEngine.resume(spark, wd)
    assert eng2.round == 2
    eng2.run(ROUNDS - 2)
    assert _engine_log(eng2) == _sim_log(sim_state)
    assert {r.url for r in eng2.seen().collect()} == sim_state.seen


def test_bloom_prefilter_is_transparent(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("crawl_nobloom"))
    eng = CrawlEngine(
        spark,
        wd,
        n_hosts=N_HOSTS,
        cap=8,
        refill=4,
        use_bloom=False,
        write_docs=False,
    )
    eng.init(SEEDS)
    eng.run(ROUNDS)
    sim = _sim()
    assert _engine_log(eng) == _sim_log(sim)
    assert {r.url for r in eng.seen().collect()} == sim.seen


def test_narrow_probe_matches_simulator(spark, tmp_path_factory, sim_state):
    # wide is the engine default (measured faster on this box — see
    # frontier.py narrow_probe rationale); the narrow shape is the
    # network-shuffle deploy knob and must stay equal to the
    # executable spec too
    wd = str(tmp_path_factory.mktemp("crawl_narrow"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        narrow_probe=True, write_docs=False,
    )
    eng.init(SEEDS)
    eng.run(ROUNDS)
    assert _engine_log(eng) == _sim_log(sim_state)
    assert {r.url for r in eng.seen().collect()} == sim_state.seen


def test_probe_variants_match_wide(spark):
    # hash-only cogroup + string re-attach (both re-attach paths) and
    # JVM pre-aggregate dedup == the wide fused probe.
    # Rows are a pure function of url_hash — the engine-wide premise
    # (equal hash => identical row) the narrow dedup relies on.
    import pyspark.sql.functions as F

    from scalpel_ts_spark.operators.seen import build_bloom, new_urls

    key = (F.col("id") % 900)  # duplicate hashes on purpose
    cand = spark.range(0, 3000).select(
        F.concat(F.lit("http://h"), (key % 7).cast("string"),
                 F.lit(".test/p/"), key.cast("string")).alias("url"),
        (key % 7).alias("host_id"),
        key.alias("url_hash"),
    )
    seen = spark.range(0, 300).select(F.col("id").alias("url_hash"))
    blooms = build_bloom(seen, n_buckets=8)
    wide = new_urls(
        cand, seen, blooms, n_buckets=8, dedup=True
    ).collect()
    expected = sorted((r.url, r.host_id, r.url_hash) for r in wide)
    variants = [
        {"narrow": True, "broadcast_new": True},
        {"narrow": True, "broadcast_new": False},
        {"preagg": True},
    ]
    for kw in variants:
        got = new_urls(
            cand, seen, blooms, n_buckets=8, dedup=True, **kw
        ).collect()
        assert sorted(
            (r.url, r.host_id, r.url_hash) for r in got
        ) == expected, kw


def test_bloom_buckets_autoscale_with_budget(spark, tmp_path_factory):
    # round-4 verdict #3: bucket count must track expected discovery
    # volume (8 links x cap x n_hosts), constructor value is a floor
    wd = str(tmp_path_factory.mktemp("crawl_scalebb"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        bloom_target_rows_per_bucket=5, write_docs=False,
    )
    # ceil(8*8*20 / 5) = 256 buckets, well above the 32 floor
    assert eng.bloom_buckets == 256
    eng.init(SEEDS)
    eng.run(ROUNDS)
    assert _engine_log(eng) == _sim_log(_sim())
    # and the 10^10 design point derives >= 512 from the default target
    big = CrawlEngine(
        spark, str(tmp_path_factory.mktemp("crawl_bb10")),
        n_hosts=2_000_000, cap=50, write_docs=False,
    )
    assert big.bloom_buckets >= 512


def test_bloom_bucket_overflow_guard(spark):
    # a config mismatch (huge candidate volume into one task's pandas
    # heap) must raise, not OOM (round-4 verdict #3)
    import pyspark.sql.functions as F

    from scalpel_ts_spark.operators.seen import bloom_prefilter, build_bloom

    seen = spark.range(0, 10).select(F.col("id").alias("url_hash"))
    blooms = build_bloom(seen, n_buckets=1)
    cand = spark.range(0, 5000).select(F.col("id").alias("url_hash"))
    with pytest.raises(Exception, match="bloom bucket overflow"):
        bloom_prefilter(
            cand, blooms, n_buckets=1, max_rows_per_bucket=1000
        ).count()


def test_robots_cache_fetches_each_host_once(spark, tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("crawl_robots"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False
    )
    eng.init(SEEDS)
    metrics = eng.run(3)
    misses = [m["robots_cache_misses"] for m in metrics]
    assert misses[0] > 0
    # cache property: total fetches == rows in the final rules table
    # (a host's robots.txt is never fetched twice)
    rules = spark.read.parquet(f"{wd}/robots/r{eng.round}")
    assert rules.count() == sum(misses)
    assert rules.select("host_id").distinct().count() == rules.count()


def test_non_default_bloom_buckets_match_simulator(
    spark, tmp_path_factory, sim_state
):
    # regression: new_urls must probe with the SAME bucket count the
    # bitmaps were built with, or already-seen URLs re-enter the
    # frontier as bloom false negatives (ADVICE r1)
    wd = str(tmp_path_factory.mktemp("crawl_bb7"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        bloom_buckets=7, write_docs=False,
    )
    eng.init(SEEDS)
    eng.run(ROUNDS)
    assert _engine_log(eng) == _sim_log(sim_state)
    assert {r.url for r in eng.seen().collect()} == sim_state.seen


def test_seen_compaction_bounds_delta_chain(spark, tmp_path_factory, sim_state):
    # compaction on (every 2 rounds): results identical, and the seen
    # read is bounded to <= compact_every snapshots regardless of
    # crawl length
    wd = str(tmp_path_factory.mktemp("crawl_compact"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        compact_every=2, write_docs=False,
    )
    eng.init(SEEDS)
    eng.run(2)
    # resume across a compaction boundary too
    eng2 = CrawlEngine.resume(spark, wd)
    assert eng2.compact_every == 2
    eng2.run(ROUNDS - 2)
    assert _engine_log(eng2) == _sim_log(sim_state)
    assert {r.url for r in eng2.seen().collect()} == sim_state.seen
    fulls = eng2.manifest["seen_full_rounds"]
    assert fulls == [0, 2, 4]
    # the union read spans only rounds since the last full snapshot
    base = max(r for r in fulls if r <= eng2.round)
    assert eng2.round - base < 2


def test_bloom_resizes_as_seen_grows(spark, tmp_path_factory, sim_state):
    # bitmaps are sized from the seed count at init and RE-SIZED +
    # rebuilt as the seen set outgrows them — from the snapshot+delta
    # union on ordinary rounds, from the full snapshot on compaction
    # rounds (a fixed bitmap saturates: at 4M seen keys the old fixed
    # 2^17 bits ran ~1 bit/key, FP ~100%, bloom bypassed nothing).
    # bits_per_key is cranked so this small crawl crosses the 2^17
    # floor the way a 4M-URL crawl does at the default 10 bits/key:
    # seen is 19 after round 1 (union-path resize), 95 after the
    # compacting round 2 (snapshot-path rebuild).
    wd = str(tmp_path_factory.mktemp("crawl_bloomresize"))
    # bloom_presize_keys=0 pins seed-only init sizing (the default
    # derives the discovery budget, which would presize past the
    # growth this test exists to exercise)
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        compact_every=2, bloom_bits_per_key=100_000, write_docs=False,
        bloom_presize_keys=0,
    )
    eng.init(SEEDS)
    assert eng._bloom_bits == 1 << 17  # 3 seeds: floor geometry
    eng.run(1)  # non-compaction round: union-path resize
    assert eng._bloom_bits > 1 << 17
    eng.run(1)  # round 2 compacts: snapshot-path rebuild
    grown = eng._bloom_bits
    assert grown > 1 << 17
    assert eng.manifest["bloom_bits"] == grown
    # on-disk bitmaps carry the new geometry (probe derives size from
    # stored bytes, so this is the size the next round actually tests)
    sizes = {
        len(r.bits) * 8 for r in eng._read("bloom", 2).collect()
    }
    assert sizes == {grown}
    # resize is transparent: resumed tail still equals the simulator,
    # and resume restores the sizing state
    eng2 = CrawlEngine.resume(spark, wd)
    assert eng2._bloom_bits == grown
    assert eng2._seen_rows == eng._seen_rows > 0
    eng2.run(ROUNDS - 2)
    assert _engine_log(eng2) == _sim_log(sim_state)
    assert {r.url for r in eng2.seen().collect()} == sim_state.seen


def test_bloom_bucket_count_pinned_on_resume(spark, tmp_path_factory):
    # the probe's bucketing MUST match the count the on-disk bitmaps
    # were built with: a bucket with no bloom row reads "definitely
    # new" (bypassing the exact anti-join), which is only correct
    # under the build-time bucketing.  A pre-autoscale manifest that
    # lacks bloom_target_rows_per_bucket would resume at today's
    # default and the constructor could re-derive MORE buckets than
    # the bitmaps have — resume must pin the stored count instead.
    import json
    import os

    wd = str(tmp_path_factory.mktemp("crawl_bucketpin"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False
    )
    eng.init(SEEDS)
    eng.run(2)
    # rewrite the manifest as the pre-autoscale code would have left
    # it: a small stored bucket count, no autoscale knob, and a config
    # whose re-derivation exceeds the stored count
    mpath = os.path.join(wd, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["config"]["bloom_buckets"] = 4
    manifest["config"]["bloom_target_rows_per_bucket"] = 1  # re-derives 1280
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    eng2 = CrawlEngine.resume(spark, wd)
    assert eng2.bloom_buckets == 4


def test_bloom_bucket_count_grows_at_rebuild(spark, tmp_path_factory, sim_state):
    # long-crawl path: when the seen set outgrows what the current
    # bucket count can hold at <= bloom_max_bucket_bytes per bitmap,
    # the BUCKET COUNT doubles at the next rebuild (fresh build keyed
    # by the new count) instead of per-bucket bitmaps growing without
    # bound.  bits_per_key is cranked so this small crawl hits the
    # bound the way a 10^10-URL crawl would at 10 bits/key; the bound
    # itself clamps to the 2^17-bit bitmap floor (16 KiB).
    wd = str(tmp_path_factory.mktemp("crawl_bucketgrow"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4,
        bloom_buckets=2, bloom_bits_per_key=100_000,
        bloom_max_bucket_bytes=1,  # clamps to the 16 KiB floor
        write_docs=False,
    )
    eng.init(SEEDS)
    assert eng.bloom_buckets == 2
    eng.run(1)  # seen grows past what 2 floor-sized buckets hold
    grown = eng.bloom_buckets
    assert grown > 2
    assert eng.manifest["config"]["bloom_buckets"] == grown
    # on-disk bitmaps were rebuilt at the new bucketing
    assert eng._read("bloom", 1).count() <= grown
    # growth is transparent: the remaining rounds (probing at the new
    # count, in-process AND resumed) still equal the simulator
    eng.run(1)
    eng2 = CrawlEngine.resume(spark, wd)
    assert eng2.bloom_buckets == eng.bloom_buckets
    eng2.run(ROUNDS - 2)
    assert _engine_log(eng2) == _sim_log(sim_state)
    assert {r.url for r in eng2.seen().collect()} == sim_state.seen


def _synthetic_http(url):
    # FetchFn over the same deterministic web as the default fetcher
    from scalpel_ts_spark.sources.synthetic import html_for_url

    return (200, "text/html; charset=utf-8",
            html_for_url(url, N_HOSTS).encode("utf-8"))


def test_pluggable_http_fetch_stage_matches_simulator(
    spark, tmp_path_factory, sim_state
):
    # the production seam: swap the synthetic fetch UDF for the
    # per-host HTTP fetch stage (decode rule included); with a FetchFn
    # over the same synthetic web the crawl must be identical
    from functools import partial

    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    wd = str(tmp_path_factory.mktemp("crawl_http"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=_synthetic_http),
    )
    eng.init(SEEDS)
    eng.run(ROUNDS)
    assert _engine_log(eng) == _sim_log(sim_state)
    assert {r.url for r in eng.seen().collect()} == sim_state.seen


def _flaky_http(url):
    # page 0 of host h1 always fails; everything else succeeds
    from scalpel_ts_spark.sources.synthetic import html_for_url

    if url == make_url(1, 0):
        raise OSError("connection reset")
    return (200, "text/html; charset=utf-8",
            html_for_url(url, N_HOSTS).encode("utf-8"))


def test_fetch_errors_stay_in_frontier_for_retry(spark, tmp_path_factory):
    from functools import partial

    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    wd = str(tmp_path_factory.mktemp("crawl_flaky"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=_flaky_http),
    )
    eng.init(SEEDS)  # SEEDS includes make_url(1, 0)
    m1 = eng.run_round()
    assert m1["fetch_errors"] == 1
    # the failed URL was neither logged as fetched nor dropped: it is
    # still in the next frontier for retry
    logged = {r.url for r in eng.fetch_log().collect()}
    assert make_url(1, 0) not in logged
    frontier = {
        r.url for r in spark.read.parquet(f"{wd}/frontier/r1").collect()
    }
    assert make_url(1, 0) in frontier


def test_permanently_failing_url_dropped_after_retry_cap(
    spark, tmp_path_factory
):
    from functools import partial

    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    wd = str(tmp_path_factory.mktemp("crawl_permfail"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=_flaky_http),
        max_fetch_retries=2,
    )
    eng.init(SEEDS)
    bad = make_url(1, 0)
    fails_by_round = []
    for _ in range(3):
        eng.run_round()
        rows = spark.read.parquet(f"{wd}/frontier/r{eng.round}").collect()
        row = {r.url: r.fails for r in rows}.get(bad)
        fails_by_round.append(row)
    # retried with an incrementing counter, then dropped past the cap
    assert fails_by_round == [1, 2, None]
    assert bad not in {r.url for r in eng.fetch_log().collect()}
    # the rest of the crawl was unaffected
    assert eng.manifest["rounds"][-1]["fetched"] > 0


def _http_404(url):
    from io import BytesIO
    from urllib.error import HTTPError

    from scalpel_ts_spark.sources.synthetic import html_for_url

    if url == make_url(1, 0):
        # custom error page WITH a link: the URL must leave the
        # frontier, but the error body is not content — its link must
        # never be discovered
        body = (
            '<html><body><a href="http://h5.test/p/99999">x</a>'
            "gone</body></html>"
        )
        raise HTTPError(
            url, 404, "Not Found", None, BytesIO(body.encode())
        )
    return (200, "text/html; charset=utf-8",
            html_for_url(url, N_HOSTS).encode("utf-8"))


def test_4xx_is_a_result_not_a_fetch_failure(spark, tmp_path_factory):
    # ADVICE r2 (high): 404/403/410 are responses — the URL is fetched
    # (status recorded, leaves the frontier, enters the log) instead of
    # being re-selected forever and starving its host's budget
    from functools import partial

    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    wd = str(tmp_path_factory.mktemp("crawl_404"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=_http_404),
    )
    eng.init(SEEDS)
    m = eng.run_round()
    assert m["fetch_errors"] == 0
    log = eng.fetch_log().collect()
    by_url = {r.url: r for r in log}
    assert make_url(1, 0) in by_url
    # the status column makes 4xx visible (and filterable) downstream
    assert by_url[make_url(1, 0)].status == 404
    assert all(r.status == 200 for u, r in by_url.items()
               if u != make_url(1, 0))
    frontier = {
        r.url for r in spark.read.parquet(f"{wd}/frontier/r1").collect()
    }
    assert make_url(1, 0) not in frontier
    # the 404 body is NOT content: its link was never discovered, and
    # it contributed nothing to the corpus
    assert make_url(5, 99999) not in frontier
    assert by_url[make_url(1, 0)].n_links == 1  # parsed, logged...
    seen = {r.url for r in eng.seen().collect()}
    assert make_url(5, 99999) not in seen  # ...but not followed


def _all_error_fetch(url):
    raise OSError("network down")


def test_all_error_rounds_retry_then_stop(spark, tmp_path_factory):
    # ADVICE r2 (medium): an all-error round is NOT 'frontier
    # exhausted' — it retries (bounded), only a clean empty round or
    # max consecutive failures stop the crawl
    from functools import partial

    from scalpel_ts_spark.sources.fetch import http_fetch_stage

    wd = str(tmp_path_factory.mktemp("crawl_outage"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=_all_error_fetch),
        max_fetch_retries=3,
    )
    eng.init(SEEDS)
    m1, m2, m3 = eng.run_round(), eng.run_round(), eng.run_round()
    assert [m["fetch_errors"] for m in (m1, m2, m3)] == [3, 3, 3]
    assert [m["stopped"] for m in (m1, m2, m3)] == [False, False, True]
    # nothing was committed during the outage: resume-safe
    assert eng.round == 0


def test_fetched_antijoin_broadcast_is_conditional(spark):
    # VERDICT r2 'what's wrong' #1: no FORCED broadcast when the round
    # budget exceeds the threshold (AQE may still pick one at runtime
    # from observed sizes — the hint is what must be conditional)
    from pyspark.sql import functions as F

    from scalpel_ts_spark.plans.frontier import frontier_anti_join

    frontier = spark.range(100).select(F.col("id").alias("url_hash"))
    fetched = spark.range(10).select(F.col("id").alias("url_hash"))
    under = frontier_anti_join(
        frontier, fetched, expected_rows=10, broadcast_max=1000
    )
    over = frontier_anti_join(
        frontier, fetched, expected_rows=10_000, broadcast_max=1000
    )
    under_plan = under._jdf.queryExecution().analyzed().toString()
    over_plan = over._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in under_plan
    assert "ResolvedHint" not in over_plan
    # both shapes produce identical results
    assert sorted(r.url_hash for r in under.collect()) == sorted(
        r.url_hash for r in over.collect()
    )


def _robots_web_fetch(url):
    """Synthetic web + REAL robots.txt bodies: hosts 1,3,4+ declare a
    textual prefix rule, host 2's robots 404s (allow all), host 0's
    robots server is down (disallow all).  Host 0 is the synthetic
    web's HOT host (~20% of cross-links), so disallowed targets onto
    it are guaranteed to be discovered."""
    from io import BytesIO
    from urllib.error import HTTPError

    from scalpel_ts_spark.sources.synthetic import html_for_url

    if url.endswith("/robots.txt"):
        host = int(url.split("//h")[1].split(".")[0])
        if host == 2:
            raise HTTPError(url, 404, "nf", None, BytesIO(b""))
        if host == 0:
            raise OSError("robots server down")
        return (200, "text/plain", b"User-agent: *\nDisallow: /p/1")
    return (200, "text/html; charset=utf-8",
            html_for_url(url, N_HOSTS).encode("utf-8"))


def test_http_robots_stage_end_to_end(spark, tmp_path_factory):
    """Production robots path through the engine: real robots bodies
    cached per host, RFC 9309 cogrouped filtering of discovered links,
    4xx=allow-all / 5xx=disallow-all classes, resume with stages."""
    from functools import partial

    from scalpel_ts_spark.functions.robots import http_robots_stage
    from scalpel_ts_spark.sources.fetch import http_fetch_stage
    from scalpel_ts_spark.sources.synthetic import (
        make_url,
        out_link_ids,
        parse_url_ids,
    )

    wd = str(tmp_path_factory.mktemp("crawl_http_robots"))
    stages = dict(
        fetch_stage=partial(http_fetch_stage, fetch_fn=_robots_web_fetch),
        robots_stage=http_robots_stage(_robots_web_fetch),
    )
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        **stages,
    )
    # host 0 (robots server down) and make_url(7, 11) (matches the
    # textual Disallow: /p/1 prefix) are seeded directly: the pre-fetch
    # vet (RFC 9309 — robots BEFORE a host's first contact; round-3
    # ADVICE) must fetch robots for the seed hosts and deny both, so
    # NEITHER is ever fetched, and links DISCOVERED onto host 0 are
    # dropped as disallow-all
    seeds = SEEDS + [make_url(0, 1)]
    eng.init(seeds)
    m1 = eng.run_round()
    assert m1["robots_denied"] == 2  # make_url(7, 11) + make_url(0, 1)
    # the denied seeds left the frontier: never re-selected
    frontier = {
        r.url for r in spark.read.parquet(f"{wd}/frontier/r1").collect()
    }
    assert make_url(0, 1) not in frontier
    assert make_url(7, 11) not in frontier
    eng.run(1)
    # resume re-supplies the stages (callables cannot live in the
    # manifest) and continues on the robots cache
    eng2 = CrawlEngine.resume(spark, wd, **stages)
    eng2.run(1)

    log_urls = {r.url for r in eng2.fetch_log().collect()}
    seen = {r.url for r in eng2.seen().collect()} - set(seeds)
    # recompute every out-link of every fetched page: which targets
    # SHOULD the robots rules have blocked?
    targets = set()
    for u in log_urls:
        h, p = parse_url_ids(u)
        targets |= {
            make_url(th, tp) for th, tp in out_link_ids(h, p, N_HOSTS)
        }
    rule_blocked = {
        u for u in targets
        if parse_url_ids(u)[0] not in (2, 0)
        and str(parse_url_ids(u)[1]).startswith("1")
    }
    host0 = {u for u in targets if parse_url_ids(u)[0] == 0}
    assert rule_blocked and host0  # the scenario exercised both classes
    # Disallow: /p/1 prefix enforced on rule hosts; 5xx host fully
    # disallowed — blocked targets never entered the (discovered) seen
    assert not (rule_blocked & seen)
    assert not (host0 & seen)
    # 404-robots host is fully allowed: /p/1* pages DO get discovered
    host2_blockedish = {
        u for u in (targets & seen)
        if parse_url_ids(u)[0] == 2
        and str(parse_url_ids(u)[1]).startswith("1")
    }
    assert host2_blockedish
    # with the pre-fetch vet NOTHING fetched violates robots — seeds
    # included (the round-2 contract carved seeds out; round-4 closes it)
    assert not log_urls & (rule_blocked | host0)
    assert make_url(7, 11) not in log_urls
    assert not {u for u in log_urls if parse_url_ids(u)[0] == 0}
    # robots cache: one row per encountered host; the unreachable host
    # carries its bounded-retry counter (re-fetched once per round)
    rules = spark.read.parquet(f"{wd}/robots/r{eng2.round}")
    assert rules.columns == ["host_id", "robots_txt", "url", "fetch_fails"]
    assert rules.count() == rules.select("host_id").distinct().count()
    by_host = {r.host_id: r for r in rules.collect()}
    assert by_host[0].fetch_fails == 3  # prefetch + 2 discovery retries
    assert all(
        r.fetch_fails == 0 for h, r in by_host.items() if h != 0
    )


def _flaky_robots_fetch(flag_path, url):
    """Host 1's robots server is down until ``flag_path`` exists;
    every other host serves an allow-all robots.  Pages are the
    synthetic web."""
    import os

    from scalpel_ts_spark.sources.synthetic import html_for_url

    if url.endswith("/robots.txt"):
        host = int(url.split("//h")[1].split(".")[0])
        if host == 1 and not os.path.exists(flag_path):
            raise OSError("robots server down")
        return (200, "text/plain", b"User-agent: *\nAllow: /")
    return (200, "text/html; charset=utf-8",
            html_for_url(url, N_HOSTS).encode("utf-8"))


def test_unreachable_robots_refetch_recovers(spark, tmp_path_factory):
    """Round-3 ADVICE: a transient 5xx must not blank a host forever.
    The DISALLOW_ALL sentinel carries a fetch_fails counter; the host
    is re-fetched each round (bounded by max_fetch_retries) and a
    successful fetch replaces the sentinel with the real body."""
    from functools import partial

    from scalpel_ts_spark.functions.robots import (
        DISALLOW_ALL,
        http_robots_stage,
    )
    from scalpel_ts_spark.sources.fetch import http_fetch_stage
    from scalpel_ts_spark.sources.synthetic import make_url

    wd = str(tmp_path_factory.mktemp("crawl_robots_recover"))
    flag = str(tmp_path_factory.mktemp("robots_flag") / "up")
    fetch_fn = partial(_flaky_robots_fetch, flag)
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
        fetch_stage=partial(http_fetch_stage, fetch_fn=fetch_fn),
        robots_stage=http_robots_stage(fetch_fn),
    )
    eng.init([make_url(1, 0), make_url(2, 5)])

    def host1_row(rnd):
        rows = {
            r.host_id: r
            for r in spark.read.parquet(f"{wd}/robots/r{rnd}").collect()
        }
        return rows.get(1)

    m1 = eng.run_round()
    # pre-vet fetched host 1's robots, got the outage sentinel, denied
    # the seed; host 2 crawled normally
    assert m1["robots_denied"] == 1
    r1 = host1_row(1)
    assert r1.robots_txt == DISALLOW_ALL and r1.fetch_fails == 1
    eng.run_round()
    r2 = host1_row(2)
    assert r2.robots_txt == DISALLOW_ALL and r2.fetch_fails == 2
    # server comes back: the next round's bounded re-fetch replaces
    # the sentinel with the real body and resets the counter
    open(flag, "w").close()
    eng.run_round()
    r3 = host1_row(3)
    assert r3.robots_txt == "User-agent: *\nAllow: /"
    assert r3.fetch_fails == 0


def test_seq_of_rejects_malformed_seed():
    import pytest as _pytest

    from scalpel_ts_spark.sources.synthetic import seq_of

    assert seq_of(make_url(3, 7)) == 3 * 1_000_000_000 + 7
    with _pytest.raises(ValueError, match="malformed synthetic URL"):
        seq_of("http://h3.test/page/7")  # wrong path shape


def test_crawl_invariants_oracle_matches_simulator():
    """The driver's crawl_invariants oracle row pins constant VALUES
    (__spark_entry__._CRAWL_INVARIANTS_SQL) derived from the executable
    spec.  Re-derive them from plans/simulator.py here so a change to
    the crawl policy (or a typo in the pinned constants) fails pytest
    instead of surfacing only in the driver's correctness loop."""
    import duckdb

    import __spark_entry__ as E

    sim = simulate_crawl(
        [make_url(h, 0) for h in range(6)], 3, cap=4, refill=2, n_hosts=8
    )
    per = {}
    urls = []
    for e in sim.fetch_log:
        r = e["round"]
        per.setdefault(r, {}).setdefault(e["host_id"], 0)
        per[r][e["host_id"]] += 1
        urls.append(e["url"])
    dup_total = len(urls) - len(set(urls))
    derived = sorted(
        (
            r,
            sum(hosts.values()),
            len(hosts),
            max(hosts.values()),
            dup_total,
        )
        for r, hosts in per.items()
    )
    pinned = sorted(
        tuple(row)
        for row in duckdb.connect()
        .execute(E.oracle_sql()["crawl_invariants"])
        .fetchall()
    )
    assert derived == pinned


def test_bloom_presized_for_discovery_budget_avoids_rebuild(
    spark, tmp_path_factory
):
    # default init sizing covers seeds + the a-priori per-round
    # discovery budget (8 links/page x cap x n_hosts), so a short
    # crawl growing well past its seed count triggers NO mid-crawl
    # full-seen-scan rebuild (the r6 bench crawl paid two inside four
    # rounds under seed-only sizing); the per-bucket byte bound still
    # clamps the geometry.
    from scalpel_ts_spark.operators.seen import bloom_bits_for

    wd = str(tmp_path_factory.mktemp("crawl_bloompresize"))
    eng = CrawlEngine(
        spark, wd, n_hosts=N_HOSTS, cap=8, refill=4, write_docs=False,
    )
    eng.init(SEEDS)
    sized = eng._bloom_bits
    assert sized >= bloom_bits_for(
        4 * (len(SEEDS) + 8 * 8 * N_HOSTS),
        eng.bloom_buckets,
        eng.bloom_bits_per_key,
    )
    eng.run(2)
    assert eng._seen_rows > 4 * len(SEEDS)  # grew well past the seeds
    assert eng._bloom_bits == sized  # ...with no resize/rebuild
    assert eng.bloom_buckets == eng.manifest["config"]["bloom_buckets"]
