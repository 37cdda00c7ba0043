import numpy as np
from pyspark.sql import functions as F

from grappolo_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from grappolo_spark.functions.multimodal import (
    extract_features,
    frame_sample_plan,
    synthesize_media,
)
from grappolo_spark.functions.similarity import cosine_topk, lsh_cosine_topk
from grappolo_spark.functions.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

DOCS = [
    (0, "the cat sat on the mat and the dog ran", "en"),
    (1, "the cat sat on the mat and the dog ran", "en"),  # exact dup of 0
    (2, "the cat sat on the mat and the dog walked away", "en"),  # near dup
    (3, "der hund ist nicht auf der matte und das haus", "de"),
    (4, "completely different words about spark engines", "en"),
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    assert out.count() == 4  # 0 and 1 collapse
    dup = out.filter("dup_count = 2").collect()[0]
    assert dup.keep_id == 0


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 2) in pairs  # near dup above threshold
    assert all(j <= 1.0 for j in pairs.values())


def test_minhash_agrees_with_exact_jaccard(spark):
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(_docs(spark), threshold=0.9).collect()
    }
    est = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            _docs(spark), num_hashes=32, bands=8, threshold=0.9
        ).collect()
    }
    assert exact == est == {(0, 1)}


def test_simhash_identical_docs_same_hash(spark):
    out = {r.id: r.simhash for r in simhash_buckets(_docs(spark)).collect()}
    assert out[0] == out[1]
    assert out[0] != out[4]


def test_text_functions(spark):
    d = _docs(spark)
    toks = {r.doc_id: r.n_tokens for r in token_count(d).collect()}
    assert toks[0] == 10
    q = {r.doc_id: r.quality for r in quality_score(d).collect()}
    assert all(0 <= v <= 1 for v in q.values())
    langs = {r.doc_id: r.lang_pred for r in language_id(d).collect()}
    assert langs[0] == "en" and langs[3] == "de"
    fp = {r.doc_id: r.fingerprint for r in fingerprint(d).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[2]


def test_cosine_topk_vs_numpy(spark):
    rng = np.random.RandomState(3)
    vecs = rng.rand(20, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = cosine_topk(df, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append(r.neighbor_id)
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    np.fill_diagonal(sims, -2)
    for qid in range(20):
        expect = list(np.argsort(-np.round(sims[qid], 6), kind="stable")[:3])
        assert got[qid] == [int(x) for x in expect], qid


def test_lsh_topk_subset_of_brute_force_scores(spark):
    rng = np.random.RandomState(4)
    vecs = rng.rand(30, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    approx = lsh_cosine_topk(df, k=3, num_planes=4)
    # sanity: every reported neighbor pair has a valid cosine in [-1, 1]
    rows = approx.collect()
    assert rows and all(-1.0 <= r.cosine <= 1.0 for r in rows)


def test_multimodal_plumbing(spark):
    media = synthesize_media(spark, n=12)
    feats = extract_features(media, dim=8)
    rows = feats.collect()
    assert len(rows) == 12
    assert all(len(r.feature) == 8 for r in rows)
    # deterministic: same payload -> same feature
    again = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)
    plan = frame_sample_plan(media, every_ms=250)
    assert plan.groupBy("media_id").count().collect()[0]["count"] == 4  # 1000ms/250


def test_ngram_jaccard_hot_shingle_cap(spark):
    # one shingle shared by ALL docs would create a quadratic candidate
    # bucket; with the document-frequency cap the bucket disappears and
    # only true duplicates (similar through RARE shingles) still pair up
    docs = [
        (i, f"common filler phrase every doc unique{i} token{i} word{i} t{i}")
        for i in range(40)
    ]
    docs.append((100, docs[0][1]))  # exact duplicate of doc 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, threshold=0.3, max_shingle_df=5)
    rows = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    assert rows.get((0, 100)) == 1.0
    assert set(rows) == {(0, 100)}  # candidate set stayed linear
