"""Text-analysis function semantics, including scripts the corpus lacks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_cluster_hash_spark.functions import text as tx


@pytest.fixture(scope="module")
def lang_samples(spark):
    rows = [
        ("en", "the cat sat on the mat and it was happy"),
        ("es", "el perro corre en la casa de la abuela y los gatos"),
        ("fr", "le chien est dans la maison et les chats du village"),
        ("de", "der hund ist nicht in das haus und die katze"),
        ("zh", "这是一个中文句子用来测试语言识别"),
        ("ja", "これはにほんごのぶんしょうです"),
        ("ko", "이것은 한국어 문장입니다"),
        ("ru", "это русское предложение для проверки"),
        ("ar", "هذه جملة عربية للاختبار"),
        ("el", "αυτή είναι μια ελληνική πρόταση"),
        ("und", "zzz qqq xxx yyy www"),
    ]
    return spark.createDataFrame(rows, "expected string, text string")


def test_language_id_scripts_and_stopwords(lang_samples):
    out = lang_samples.select(
        "expected", tx.language_id_col(F.col("text")).alias("got")
    ).collect()
    for r in out:
        assert r["got"] == r["expected"], (r["expected"], r["got"])


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world, it's 42 degrees!",), ("",), ("one",)], "text string"
    )
    rows = df.select(
        tx.ws_token_count(F.col("text")).alias("ws"),
        tx.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()
    # "hello world, it's 42 degrees!" -> ws: 5 tokens
    # bpe-ish: hello|world|,|it|'|s|42|degrees|! = 9
    assert (rows[0]["ws"], rows[0]["bpe"]) == (5, 9)
    assert (rows[1]["ws"], rows[1]["bpe"]) == (0, 0)
    assert (rows[2]["ws"], rows[2]["bpe"]) == (1, 1)


def test_quality_score_ranges(spark, sf_medium):
    from duckdb_cluster_hash_spark.sources import load_table

    docs = load_table(spark, sf_medium, "documents")
    feats = tx.quality_features(docs, "text")
    scored = feats.select(tx.quality_score_col().alias("q"))
    bad = scored.where((F.col("q") < 0) | (F.col("q") > 1)).count()
    assert bad == 0


def test_quality_features_known_text(spark):
    df = spark.createDataFrame(
        [("the the the the the",)], "text string"
    )
    r = tx.quality_features(df, "text").head()
    assert r["n_tokens"] == 5
    assert r["repetition_ratio"] == 0.8  # 5 tokens, 1 distinct
    assert r["stop_ratio"] == 1.0
    assert r["punct_ratio"] == 0.0


def test_rolling_hash_deterministic_and_prefix_sensitive(spark):
    df = spark.createDataFrame(
        [("abc",), ("abd",), ("abc",), ("",)], "text string"
    )
    rows = df.select(tx.rolling_hash_col(F.col("text")).alias("h")).collect()
    assert rows[0]["h"] == rows[2]["h"]
    assert rows[0]["h"] != rows[1]["h"]
    assert rows[3]["h"] == 0
    # reference value: ((0*31+97)*31+98)*31+99 = 97*961 + 98*31 + 99
    assert rows[0]["h"] == 97 * 31 * 31 + 98 * 31 + 99


def test_media_pipeline_roundtrip(spark, sf_medium):
    from duckdb_cluster_hash_spark.operators import multimodal as mm
    from duckdb_cluster_hash_spark.sources import load_table

    docs = load_table(spark, sf_medium, "documents").limit(50)
    meta = mm.media_metadata(mm.attach_fake_media(docs))
    rows = meta.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["width"] == 16 + r["doc_id"] % 64
        assert r["height"] == 16 + (r["doc_id"] * 7) % 48
        assert r["byte_len"] >= 16
        assert r["aspect_milli"] == r["width"] * 1000 // r["height"]


def test_frame_sampling(spark):
    from duckdb_cluster_hash_spark.operators import multimodal as mm

    df = spark.createDataFrame([(9, "some payload text")], "doc_id long, text string")
    media = mm.attach_fake_media(df)
    frames = mm.sample_frames(media, every_k=2).collect()
    # doc_id 9 -> n_frames = 1 + 9 % 8 = 2 -> sampled idx {0}
    assert [f["frame_idx"] for f in frames] == [0]


def test_decode_image_is_stubbed():
    from duckdb_cluster_hash_spark.operators import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_media_byte_features_values_and_edges(spark):
    from duckdb_cluster_hash_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(1, "abca"), (2, "")], "doc_id long, text string"
    )
    feats = {
        r["doc_id"]: r.asDict()
        for r in mm.media_byte_features(mm.attach_fake_media(df)).collect()
    }
    a = feats[1]
    assert a["payload_len"] == 4
    assert a["distinct_bytes"] == 3  # a, b, c
    assert a["byte_sum"] == ord("a") * 2 + ord("b") + ord("c")
    assert (a["byte_min"], a["byte_max"]) == (ord("a"), ord("c"))
    empty = feats[2]
    assert empty["payload_len"] == 0
    assert (empty["distinct_bytes"], empty["byte_sum"]) == (0, 0)
    assert (empty["byte_min"], empty["byte_max"]) == (-1, -1)


def test_repetition_stats_values(spark):
    from duckdb_cluster_hash_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x y"), (3, "solo")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "doc_id", "text").collect()}
    # doc 1: tokens [a,a,a,b] -> top share 3/4; 2-grams [a a, a a, a b] -> 1 dup of 3
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_distinct"] == 2
    assert rows[1]["top_token_bp"] == 7500
    assert rows[1]["dup_2gram_bp"] == 3333
    # doc 2: no repetition at all
    assert rows[2]["top_token_bp"] == 5000 and rows[2]["dup_2gram_bp"] == 0
    # doc 3: single word -> whole-text fallback gram, zero dup
    assert rows[3]["n_tokens"] == 1 and rows[3]["dup_2gram_bp"] == 0


def test_tfidf_top_terms_ranking(spark):
    from duckdb_cluster_hash_spark.functions.text import tfidf_top_terms

    # 'rare' appears only in src A (df=1), 'common' in every doc (df=4)
    df = spark.createDataFrame(
        [
            (1, "A", "common rare rare"),
            (2, "A", "common filler"),
            (3, "B", "common other"),
            (4, "B", "common other"),
        ],
        "doc_id long, source string, text string",
    )
    top = tfidf_top_terms(df, "doc_id", "text", "source", 1).collect()
    by_grp = {r["grp"]: r for r in top}
    assert by_grp["A"]["term"] == "rare"  # tf=2, df=1 -> score 8
    assert by_grp["A"]["score"] == 8
    assert by_grp["B"]["term"] == "other"  # tf=2, df=2 -> score 4 beats common (2*4//4=2)
