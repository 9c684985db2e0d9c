import numpy as np
import pytest
from pyspark.sql import functions as F

from eoreader_spark.operators import dedup, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # append exact + near duplicates with known ids
    rows = base.select("doc_id", "text", "lang", "source", "n_chars").limit(5).collect()
    extra = []
    for r in rows:
        extra.append((10000 + r.doc_id, r.text, r.lang, r.source, r.n_chars))  # exact dup
        toks = r.text.split()
        toks[len(toks) // 2] = "PERTURBED"
        extra.append((20000 + r.doc_id, " ".join(toks), r.lang, r.source, r.n_chars))  # near dup
    extra_df = spark.createDataFrame(extra, base.schema)
    return base.unionByName(extra_df).persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs).filter(F.col("n_copies") > 1).collect()
    dup_keeps = {r.keep_id for r in out}
    assert dup_keeps == {0, 1, 2, 3, 4}
    assert all(r.n_copies == 2 for r in out)


def test_ngram_jaccard_finds_near_dups(spark, docs):
    pairs = dedup.ngram_jaccard(docs, n=3, threshold=0.3).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    for i in range(5):
        assert (i, 10000 + i) in got  # exact dup -> jaccard 1.0
        assert (i, 20000 + i) in got  # one-token perturbation
    j = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    for i in range(5):
        assert j[(i, 10000 + i)] == 1.0
        assert 0.3 <= j[(i, 20000 + i)] < 1.0


def test_minhash_lsh_recall_and_precision(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=64, bands=16, shingle=3, threshold=0.4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(5):
        assert (i, 10000 + i) in got
        assert (i, 20000 + i) in got
    # sanity: vastly fewer pairs than n^2
    assert len(got) < 200


def test_minhash_estimates_jaccard(spark, docs):
    # signature agreement should approximate true jaccard for the near dups
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in
             dedup.minhash_lsh_pairs(docs, threshold=0.2).collect()}
    true = {(r.id_a, r.id_b): r.jaccard for r in
            dedup.ngram_jaccard(docs, n=3, threshold=0.2).collect()}
    for k in [(i, 20000 + i) for i in range(5)]:
        if k in pairs and k in true:
            assert abs(pairs[k] - true[k]) < 0.35


def test_simhash_near_dups(spark, docs):
    sigs = dedup.simhash_signatures(docs).collect()
    by_id = {r.id: r.simhash for r in sigs}
    for i in range(5):
        assert by_id[i] == by_id[10000 + i]  # identical text -> identical simhash
        ham = bin((by_id[i] ^ by_id[20000 + i]) & ((1 << 64) - 1)).count("1")
        assert ham <= 16  # one-token change moves few bits
    out = {(r.id_a, r.id_b) for r in dedup.simhash_near_dups(docs, max_hamming=3).collect()}
    for i in range(5):
        assert (i, 10000 + i) in out


def test_embedding_near_dups_and_determinism(spark, emb):
    dup = emb.selectExpr("vec_id + 100000 as vec_id", "embedding", "label").limit(3)
    e = emb.unionByName(dup)
    out1 = {(r.id_a, r.id_b) for r in dedup.embedding_near_dups(e, threshold=0.999).collect()}
    out2 = {(r.id_a, r.id_b) for r in dedup.embedding_near_dups(e.repartition(7), threshold=0.999).collect()}
    assert out1 == out2
    for r in emb.limit(3).collect():
        assert (r.vec_id, r.vec_id + 100000) in out1


def test_cosine_topk_exact_and_ivf_recall(spark, emb):
    queries = emb.limit(8).selectExpr("vec_id as query_id", "embedding as qvec")
    exact = similarity.cosine_topk(queries, emb, k=5)
    ex = {(r.query_id, r.rank): r.vec_id for r in exact.collect()}
    # rank 1 must be the query itself (cosine 1.0)
    for q in {k[0] for k in ex}:
        assert ex[(q, 1)] == q
    cents, indexed = similarity.ivf_build(emb, n_centroids=8)
    indexed = indexed.persist()
    ann = similarity.ivf_topk(queries, indexed, cents, k=5, n_probe=4)
    an = {}
    for r in ann.collect():
        an.setdefault(r.query_id, set()).add(r.vec_id)
    exact_sets = {}
    for (q, _), v in ex.items():
        exact_sets.setdefault(q, set()).add(v)
    recalls = [len(an.get(q, set()) & s) / len(s) for q, s in exact_sets.items()]
    assert np.mean(recalls) >= 0.8  # n_probe=4 of 8 lists


def test_text_analyzers(spark, docs):
    out = text.analyze(docs.limit(50)).collect()
    for r in out:
        assert r.n_tokens == len(r.text.split())
        assert r.n_subwords >= r.n_tokens
        assert 0.0 <= r.quality <= 1.0
        assert r.lang_pred in {"en", "es", "fr", "de", "unk"}
    # fingerprint: order-sensitive
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fp for r in df.select("doc_id", text.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[3] and fps[1] != fps[2]
    # md5x15 mode: same order-sensitivity, and the fold replays in pure
    # python from md5 (the engine-shared hash the gate oracle uses)
    fpm = {
        r.doc_id: r.fp
        for r in df.select(
            "doc_id", text.fingerprint("text", hash_algo="md5x15").alias("fp")
        ).collect()
    }
    assert fpm[1] == fpm[3] and fpm[1] != fpm[2]
    import hashlib

    M = 72057594037927931
    acc = 0
    for tok in "alpha beta gamma".split():
        th = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % M
        acc = (acc * 31 + th) % M
    assert fpm[1] == acc


def test_simhash_pigeonhole_recall_beyond_3(spark):
    """Pairs at hamming 4-8 with flipped bits spread one-per-16-bit-chunk
    must still be found (the fixed banding uses max_hamming+1 chunks)."""
    base = 0x0123456789ABCDEF
    # flip 8 bits, one in each old 16-bit chunk and beyond: 0,9,17,25,33,41,49,57
    flipped = base
    for b in (0, 9, 17, 25, 33, 41, 49, 57):
        flipped ^= 1 << b

    def to_i64(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    sigs = spark.createDataFrame(
        [(1, to_i64(base)), (2, to_i64(flipped))], "id long, simhash long"
    )
    # drive the banding logic directly via a monkeypatched signature source
    import eoreader_spark.operators.dedup as dd

    orig = dd.simhash_signatures
    dd.simhash_signatures = lambda df, t, i, algo="blake2b": sigs
    try:
        out = {(r.id_a, r.id_b): r.hamming for r in
               dd.simhash_near_dups(sigs, max_hamming=8).collect()}
    finally:
        dd.simhash_signatures = orig
    assert out == {(1, 2): 8}


def test_ngram_hot_shingle_cap_bounds_fanout(spark):
    """A stop-shingle shared by every doc must leave the inverted index under
    max_df (bounded per-key fanout) while unique-content Jaccard stays exact
    over the reduced gram universe."""
    stop = "lorem ipsum dolor"  # one hot trigram in all docs
    rows = []
    for i in range(40):
        body = f"unique{i} content{i} tail{i} more{i}"
        rows.append((i, f"{stop} {body}", "en", "t", 10))
    # one true near-dup pair sharing their unique grams
    rows.append((100, f"{stop} shared alpha beta gamma delta", "en", "t", 10))
    rows.append((101, f"{stop} shared alpha beta gamma delta", "en", "t", 10))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars int")

    stats = dedup.hot_gram_stats(docs, n=3, max_df=10).first()
    assert stats.n_hot >= 1 and stats.postings_dropped >= 42

    capped = dedup.ngram_jaccard(docs, n=3, threshold=0.5, max_df=10)
    got = {(r.id_a, r.id_b): r.jaccard for r in capped.collect()}
    # the dup pair survives on its unique grams (jaccard 1.0 post-cap)...
    assert got[(100, 101)] == 1.0
    # ...and the stop-shingle no longer pairs every doc with every other: the
    # only surviving pair is the true dup
    assert set(got) == {(100, 101)}

    # fanout bound: no gram in the capped inverted index exceeds max_df
    toks = dedup._doc_grams(docs, 3, "text", "doc_id")
    inv = toks.select(F.explode("gs").alias("g"))
    dfc = inv.groupBy("g").count()
    hot_df = dfc.filter(F.col("count") > 10)
    assert hot_df.count() >= 1  # corpus genuinely has a hot gram
    # capped result must equal the uncapped result computed on docs with the
    # hot grams manually removed (exactness over the reduced universe)
    hot_grams = {r.g for r in hot_df.collect()}
    # python oracle: per-doc gram sets minus hot grams
    sets = {}
    for r in rows:
        ts = r[1].split()
        gs = {"\x1f".join(ts[i:i+3]) for i in range(len(ts) - 2)} - hot_grams
        sets[r[0]] = gs
    want = {}
    ids = sorted(sets)
    for i_, a in enumerate(ids):
        for b in ids[i_+1:]:
            if not sets[a] or not sets[b]:
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= 0.5:
                want[(a, b)] = round(j, 6)
    assert got == want


def test_winnow_guarantee_and_density(spark):
    """The winnowing guarantee: any shared substring of length >= w + k - 1
    yields at least one shared fingerprint; density stays near 2/(w+1)."""
    import random

    random.seed(11)
    shared = "the quick brown fox jumps over the lazy dog"  # len 43 >= 8
    mk = lambda: "".join(random.choice("ghijklmnop ") for _ in range(80))
    rows = [
        (1, mk() + shared + mk()),
        (2, mk() + shared + mk()),
        (3, mk()),  # no planted overlap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fh)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    # expected density ~ 2/(w+1) = 0.4 of the ~200 grams per doc
    n_grams = len(rows[0][1]) - 4
    assert 0.15 * n_grams <= len(by_doc[1]) <= 0.6 * n_grams


def test_winnow_pairs_finds_near_dups(spark, docs):
    """Planted near-dups (one token perturbed) must pair with their source
    via shared winnowed prints; the hot-print cap keeps per-key fanout
    bounded."""
    pairs = dedup.winnow_pairs(docs, min_shared=3, max_df=0.5).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    base_ids = [r.doc_id for r in docs.filter("doc_id < 5").select("doc_id").collect()]
    for b in base_ids:
        assert (b, 10000 + b) in got, f"exact dup {b} not paired"
        assert (b, 20000 + b) in got, f"near dup {b} not paired"
    # hot-print cap: a print present in EVERY doc is dropped before the
    # self-join (no quadratic candidate blowup on one key)
    hot_docs = spark.createDataFrame(
        [(i, "zzzz common-prefix-shared-by-all " + "x" * i) for i in range(20)],
        "doc_id long, text string",
    )
    fps = dedup.winnow_fingerprints(hot_docs, k=5, w=4)
    n_prints = fps.select("fh").distinct().count()
    capped = dedup.winnow_pairs(hot_docs, min_shared=1, max_df=0.3)
    uncapped = dedup.winnow_pairs(hot_docs, min_shared=1, max_df=None)
    assert capped.count() < uncapped.count() == 20 * 19 // 2
    assert n_prints > 0


def test_winnow_pairs_absolute_cap_semantics(spark):
    """Round 6 (sf1-leg finding): an int max_df is an ABSOLUTE df cap —
    the per-key fanout bound must not scale with corpus size the way the
    old fractional default did.  A print in 6 of 20 docs survives
    max_df=6, dies at max_df=5, and the float form still means fraction."""
    # per-doc filler tokens are letter-coded (qaa, qbb, ...) so no two docs
    # share ANY 5-char window outside the planted shared run
    rows = [(i, f"q{chr(97 + i)}{chr(97 + i)} " * 8
             + ("shared-run-of-text " if i < 6 else ""))
            for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    at6 = dedup.winnow_pairs(docs, min_shared=1, max_df=6)
    at5 = dedup.winnow_pairs(docs, min_shared=1, max_df=5)
    assert at6.count() == 6 * 5 // 2  # the shared-run pairs survive
    assert at5.count() == 0           # absolute cap kills df-6 prints
    # float fraction: 6/20 = 0.3 -> cap floor(20*0.3)=6 keeps them
    assert dedup.winnow_pairs(docs, min_shared=1, max_df=0.3).count() == 15
    assert dedup.winnow_pairs(docs, min_shared=1, max_df=0.25).count() == 0


def test_gen_documents_deterministic_with_planted_dups(spark):
    """datagen.gen_documents: partition-invariant bytes, and every planted
    near-dup (i%10==5 copies i-5 with a 1-word edit) is recoverable by
    winnowing at the selective k=12 setting the sf1 bench uses."""
    from eoreader_spark import datagen

    a = {r.doc_id: r.text for r in datagen.gen_documents(spark, 300).collect()}
    b = {r.doc_id: r.text
         for r in datagen.gen_documents(spark, 300, partitions=7).collect()}
    assert a == b and len(a) == 300
    docs = datagen.gen_documents(spark, 300)
    got = {(r.id_a, r.id_b)
           for r in dedup.winnow_pairs(docs, k=12, w=8, min_shared=2).collect()}
    want = {(i - 5, i) for i in range(15, 300, 10)}
    assert want <= got


def test_connected_components_known_graph(spark):
    """Chain + triangle + isolated pair resolve to min-id components, at any
    partitioning (chain diameter > 1 exercises multi-round propagation)."""
    edges = (
        [(i, i + 1) for i in range(10, 15)]  # chain 10..15 -> component 10
        + [(30, 31), (31, 32), (30, 32)]     # triangle -> 30
        + [(50, 51)]                          # pair -> 50
    )
    for parts in (1, 7):
        df = spark.createDataFrame(edges, "id_a long, id_b long").repartition(parts)
        got = {r.id: r.component for r in dedup.connected_components(df).collect()}
        assert got == (
            {i: 10 for i in range(10, 16)}
            | {i: 30 for i in (30, 31, 32)}
            | {50: 50, 51: 50}
        )


def test_connected_components_canonicalizes_winnow_pairs(spark, docs):
    """End-to-end dedup: winnow pairs -> components; every planted dup trio
    (base, exact, near) lands in one component keyed by the base id."""
    pairs = dedup.winnow_pairs(docs, min_shared=3, max_df=0.5)
    comp = {r.id: r.component for r in dedup.connected_components(pairs).collect()}
    for b in range(5):
        assert comp.get(10000 + b) == comp.get(20000 + b) == comp.get(b, b)


def test_connected_components_nonconvergence_is_loud(spark):
    """A graph whose diameter exceeds max_iter must raise, not silently
    return mid-propagation labels (round-4 ADVICE)."""
    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iter=2)


def test_numpy_refine_matches_hof_path(spark):
    """Production numpy matmul refine (exact=False) == bit-stable JVM fold
    (exact=True) after the 6dp round, ranks included (round-4 VERDICT #5)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    ).limit(400)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    a = similarity.cosine_topk(queries, emb, k=5, exact=True)
    b = similarity.cosine_topk(queries, emb, k=5, exact=False)
    ka = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in a.collect()}
    kb = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in b.collect()}
    assert ka == kb


def test_cosine_zero_norm_vectors_parity(spark):
    """Zero-norm embeddings (padding rows, failed encoders) get cosine 0.0
    on BOTH paths — the JVM fold must not emit NULL (which sorts differently
    under the rank window) while numpy clamps to 0.0 (round-4 ADVICE)."""
    corpus = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 1.0, 0.0]), (11, [0.0, 0.0, 0.0])],
        "query_id long, qvec array<double>",
    )
    for exact in (True, False):
        got = {
            (r.query_id, r.vec_id): r.cosine
            for r in similarity.cosine_topk(
                queries, corpus, k=3, exact=exact
            ).collect()
        }
        assert got[(10, 0)] == 0.0          # zero corpus vector
        assert got[(11, 1)] == 0.0          # zero query vector
        assert got[(11, 0)] == 0.0          # both zero
        assert None not in got.values()
    a = similarity.cosine_topk(queries, corpus, k=3, exact=True)
    b = similarity.cosine_topk(queries, corpus, k=3, exact=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ngram_absolute_cap_bounds_candidates_independent_of_corpus_size(spark):
    """Round-7 VERDICT #2 regression: with an ABSOLUTE int max_df, the
    candidate (pair-row) count contributed by hot shingles must NOT grow
    with corpus size — the fractional cap regression this pins out made the
    sf1 leg O((f*n)^2).  Also pins the defaults: ngram_jaccard and
    winnow_pairs agree on absolute-512-by-default."""
    import inspect

    assert inspect.signature(dedup.ngram_jaccard).parameters["max_df"].default == 512
    assert inspect.signature(dedup.winnow_pairs).parameters["max_df"].default == 512

    def corpus(n):
        rows = [
            (i, f"lorem ipsum dolor sit unique{i} content{i} tail{i}", "en", "t", 10)
            for i in range(n)
        ]
        rows.append((9000, "lorem ipsum dolor sit shared alpha beta gamma", "en", "t", 10))
        rows.append((9001, "lorem ipsum dolor sit shared alpha beta gamma", "en", "t", 10))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        )

    def candidate_pairs(docs, cap):
        # pair rows the gram self-join would emit AFTER the cap:
        # sum over surviving grams of df*(df-1)/2
        toks = dedup._doc_grams(docs, 3, "text", "doc_id")
        inv = toks.select("id", F.explode("gs").alias("g"))
        dfc = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
        kept = dfc.filter(F.col("df") <= cap)
        row = kept.agg(
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("pairs"),
            F.max("df").alias("maxdf"),
        ).first()
        return int(row.pairs or 0), int(row.maxdf or 0)

    results = {}
    for n in (60, 240):
        docs = corpus(n)
        pairs, maxdf = candidate_pairs(docs, cap=10)
        assert maxdf <= 10
        got = {
            (r.id_a, r.id_b)
            for r in dedup.ngram_jaccard(docs, n=3, threshold=0.5, max_df=10).collect()
        }
        assert got == {(9000, 9001)}, f"n={n}: {got}"
        results[n] = pairs
    # the bound: candidate work from the capped index is IDENTICAL at 4x
    # the corpus (only the planted-dup shared grams survive under the cap)
    assert results[60] == results[240]


def test_gen_embeddings_deterministic_with_planted_dups(spark):
    """Round-7 sf1-lane generator: same ids -> same vectors regardless of
    partitioning, and the id%50==1 rows are near-duplicates of id-1
    (cosine > 0.999) so bucketing operators have structure at any scale."""
    from eoreader_spark import datagen

    a = {r.vec_id: np.asarray(r.embedding) for r in datagen.gen_embeddings(spark, 120).collect()}
    b = {r.vec_id: np.asarray(r.embedding)
         for r in datagen.gen_embeddings(spark, 120, partitions=7).collect()}
    assert set(a) == set(range(120))
    for k in a:
        assert np.array_equal(a[k], b[k])
    for i in (1, 51, 101):
        u, v = a[i].astype(np.float64), a[i - 1].astype(np.float64)
        cos = float(u @ v / (np.linalg.norm(u) * np.linalg.norm(v)))
        assert cos > 0.999, (i, cos)
    # non-dup neighbours are not near-duplicates
    u, v = a[2].astype(np.float64), a[3].astype(np.float64)
    assert abs(u @ v / (np.linalg.norm(u) * np.linalg.norm(v))) < 0.9
