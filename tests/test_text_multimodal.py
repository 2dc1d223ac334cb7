import pytest
from pyspark.sql import functions as F

from hadoopxmlextractor_spark.operators import multimodal as M
from hadoopxmlextractor_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The cat and the dog of the house."),
        (2, "Der Hund und die Katze und der Vogel."),
        (3, "Le chat et le chien et les oiseaux."),
        (4, "xyzzy plugh"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_token_counts(spark, docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", T.token_count("text").alias("n")).collect()}
    assert got == {1: 8, 2: 8, 3: 8, 4: 2, 5: 0}


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world 42!")], "id long, text string")
    # hello , world 42 ! → 5 pieces
    assert df.select(T.bpe_ish_token_count("text").alias("n")).first()["n"] == 5


def test_language_id(spark, docs):
    got = {
        r.doc_id: r.lang
        for r in docs.select("doc_id", T.language_id("text").alias("lang")).collect()
    }
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"
    assert got[4] == "unknown" and got[5] == "unknown"


def test_quality_features(spark, docs):
    feats = T.quality_features("text")
    row = (
        docs.filter("doc_id = 1")
        .select(*[v.alias(k) for k, v in feats.items()])
        .first()
    )
    assert row["n_tokens"] == 8
    assert row["n_chars"] == 33
    assert 0 < row["punct_ratio"] < 0.1  # one period
    assert row["stopword_ratio"] > 0.3  # 'the' ×3, 'and', 'of' in 8 tokens
    assert row["mean_token_len"] == pytest.approx((33 - 7) / 8, abs=1e-4)


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    fps = [r.fp for r in df.select(T.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_winnowing_fingerprints_detect_overlap(spark):
    shared = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        [(1, shared + "alpha beta gamma"), (2, shared + "delta epsilon"), (3, "totally different words here " * 5)],
        "id long, text string",
    )
    rows = df.select("id", T.winnowing_fingerprints("text").alias("fp")).collect()
    fp = {r.id: set(r.fp) for r in rows}
    overlap_12 = len(fp[1] & fp[2]) / len(fp[1] | fp[2])
    overlap_13 = len(fp[1] & fp[3]) / len(fp[1] | fp[3])
    assert overlap_12 > 0.5 > overlap_13
    assert overlap_13 == 0


def test_multimodal_feature_pipeline(spark, docs):
    media = M.fake_media_from_documents(
        docs.select("doc_id", "text", F.lit("src").alias("source"))
    )
    assert media.schema["content"].dataType.typeName() == "binary"
    feats = M.extract_media_features(media, decode="fake")
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows[1].feature) == M.N_FEATURE_BINS
    assert abs(sum(rows[1].feature) - 1.0) < 1e-5  # normalized histogram
    assert rows[5].n_bytes == 0 and sum(rows[5].feature) == 0.0  # empty doc


def test_multimodal_real_decode_is_stubbed(spark, docs):
    media = M.fake_media_from_documents(
        docs.select("doc_id", "text", F.lit("src").alias("source"))
    )
    with pytest.raises(NotImplementedError):
        M.extract_media_features(media, decode="real")


def test_frame_sampling_shapes(spark):
    blob = bytes(range(256)) * 40  # 10240 bytes → 3 frames at 4096
    df = spark.createDataFrame(
        [(1, "image", blob, ("s", len(blob), "fake/raw"))],
        M.MEDIA_SCHEMA,
    )
    frames = M.sample_frames(df, every_n_bytes=4096).collect()
    assert [r.frame_idx for r in frames] == [0, 1, 2]
    assert len(frames[0].frame) == 4096 and len(frames[2].frame) == 10240 - 2 * 4096


def test_resize_media_bounds_and_determinism(spark, docs):
    media = M.fake_media_from_documents(docs)
    small = M.resize_media(media, target_bytes=64)
    rows = {r["media_id"]: r["content"] for r in small.collect()}
    orig = {r["media_id"]: r["content"] for r in media.collect()}
    for mid, blob in rows.items():
        assert len(blob) <= 64
        if len(orig[mid]) <= 64:
            assert blob == orig[mid]  # never upsample
        else:
            # stride sampling preserves first and last byte
            assert blob[0] == orig[mid][0] and blob[-1] == orig[mid][-1]
    again = {r["media_id"]: r["content"] for r in M.resize_media(media, target_bytes=64).collect()}
    assert rows == again


def test_resize_media_real_decode_is_stubbed(spark, docs):
    import pytest

    media = M.fake_media_from_documents(docs)
    with pytest.raises(NotImplementedError):
        M.resize_media(media, decode="real").collect()


def test_repetition_counts_planted(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "a b a b a b"), (4, "")],
        "id long, text string",
    )
    rows = {
        r.id: r
        for r in df.select("id", T.repetition_counts("text").alias("r"))
        .select("id", "r.*")
        .collect()
    }
    assert rows[1].n_tokens == 4 and rows[1].n_distinct == 1
    assert rows[1].top_token_cnt == 4 and rows[1].top_bigram_cnt == 3  # "a a" ×3
    assert rows[2].top_token_cnt == 1 and rows[2].top_bigram_cnt == 1
    assert rows[3].n_distinct == 2 and rows[3].top_bigram_cnt == 3  # "a b" ×3
    assert rows[4].n_tokens == 0 and rows[4].top_bigram_cnt == 0


def test_pii_redaction_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk thanks"),
            (2, "ssn 123-45-6789 and server 10.0.255.1 here"),
            (3, "call +1 415-555-0199 today"),
            (4, "clean text with numbers 42 and 7"),
        ],
        "id long, text string",
    )
    red = {r.id: r.red for r in df.select("id", T.redact_pii("text").alias("red")).collect()}
    assert red[1] == "mail me at [PII] thanks"
    assert red[2] == "ssn [PII] and server [PII] here"
    assert red[3] == "call [PII] today"
    assert red[4] == "clean text with numbers 42 and 7"

    counts = (
        df.select("id", *[v.alias(k) for k, v in T.pii_counts("text").items()])
        .collect()
    )
    by_id = {r.id: r for r in counts}
    assert by_id[1].n_email == 1 and by_id[2].n_ssn == 1
    assert by_id[2].n_ipv4 == 1 and by_id[3].n_phone == 1
    assert sum([by_id[4].n_email, by_id[4].n_ssn, by_id[4].n_ipv4, by_id[4].n_phone]) == 0


def test_repetition_counts_random_cross_check(spark):
    import random
    from collections import Counter

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd", "e", "ff f", ""]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "id long, text string")
    got = {
        r.id: (r.n_tokens, r.n_distinct, r.top_token_cnt, r.top_bigram_cnt)
        for r in df.select("id", T.repetition_counts("text").alias("r"))
        .select("id", "r.*")
        .collect()
    }
    for i, t in enumerate(texts):
        toks = t.split()
        tc, bc = Counter(toks), Counter(zip(toks, toks[1:]))
        assert got[i] == (
            len(toks),
            len(tc),
            max(tc.values()) if tc else 0,
            max(bc.values()) if bc else 0,
        ), f"doc {i}: {t!r}"
