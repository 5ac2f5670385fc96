"""Text analysis tests: lang-id, quality features, fingerprint."""

import pytest
from pyspark.sql import functions as F

from hbase_gis_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_features,
    token_count,
)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat of the mat and the dog is here"),
            (2, "le chat et la porte les des choses"),
            (3, "der hund und die das ist gut"),
            (4, "el perro los gatos las es una cosa"),
            (5, "zzz qqq www"),
            (6, "the le THE le le"),  # fr=3 beats en=1 (case-sensitive)
        ],
        "doc_id int, text string",
    )


def test_lang_id_markers(df):
    got = {r.doc_id: r.l for r in df.select("doc_id", lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und", 6: "fr"}


def test_lang_id_tie_precedence(spark):
    # en and fr tie at 1 marker each -> en wins by precedence order
    d = spark.createDataFrame([(1, "the le")], "doc_id int, text string")
    assert d.select(lang_id("text")).first()[0] == "en"


def test_token_count(spark):
    d = spark.createDataFrame([(1, "  a  b   c  ")], "doc_id int, text string")
    assert d.select(token_count("text")).first()[0] == 3


def test_quality_features_values(spark):
    d = spark.createDataFrame([(1, "aa bb aa")], "doc_id int, text string")
    r = quality_features(d).first()
    assert r.n_tokens == 3
    assert abs(r.ttr - 2.0 / 3.0) < 1e-15
    # 8 chars - 2 separators = 6 letters / 3 tokens = 2.0 mean length
    assert abs(r.mean_token_len - 2.0) < 1e-15
    assert r.stopword_ratio == 0.0


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, " HELLO  WORLD  ")],
        "doc_id int, text string",
    )
    fps = [r.f for r in d.select(fingerprint("text").alias("f")).collect()]
    assert fps[0] == fps[1] == fps[2]
