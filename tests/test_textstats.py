"""Text-analysis operators (language-ID, quality, token counting)."""

import pytest

from named_entity_algorithm_project_spark.operators.textstats import (
    profile_documents,
)


@pytest.fixture(scope="module")
def profiled(spark):
    rows = [
        (0, "The cat sat on the mat and the dog is here to stay today."),
        (1, "Der Hund ist gross und die Katze ist klein, das stimmt."),
        (2, "Le chat et la souris jouent dans les jardins des villes."),
        (3, "!!! ??? ### $$$ %%% ^^^ &&&"),
        (4, "SHOUTING VERY LOUDLY ABOUT EVERYTHING ALWAYS"),
        (5, ""),
        (6, "word " * 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in profile_documents(df).collect()}


def test_lang_id(profiled):
    assert profiled[0]["lang_pred"] == "en"
    assert profiled[1]["lang_pred"] == "de"
    assert profiled[2]["lang_pred"] == "fr"
    assert profiled[3]["lang_pred"] == "und"


def test_quality_scores(profiled):
    assert profiled[0]["quality"] == 1.0
    assert profiled[3]["quality"] < 0.5  # punctuation soup
    assert profiled[4]["quality"] < 1.0  # all caps
    assert profiled[5]["quality"] < 0.5  # empty


def test_token_counts(profiled):
    assert profiled[0]["n_tokens"] == 14
    assert profiled[5]["n_tokens"] == 0
    assert profiled[6]["n_tokens"] == 50
    # subtoken proxy splits punctuation off
    assert profiled[3]["n_subtokens"] >= 7


def test_fingerprint_normalization(spark):
    rows = [(0, "Hello   World"), (1, "hello world"), (2, "HELLO\n\nWORLD")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = [r["fingerprint"] for r in profile_documents(df).collect()]
    assert fps[0] == fps[1] == fps[2]
