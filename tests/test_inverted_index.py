"""Golden + property tests for the inverted index (SURVEY.md §5 port strategy).

The 3-document micro-corpus and expected excerpts come from FIXTURES.md §3
(mirroring the reference's checker/test_in_small + test_out_small goldens).
"""

import pytest
from pyspark.sql import functions as F

from mapreduce_model_spark.operators.inverted_index import (
    format_output,
    invert,
    normalize_token,
    word_doc_pairs,
)
from tests.pymodel import inverted_index as py_invert
from tests.pymodel import letter_file_rows

MICRO_CORPUS = {
    1: "The bright sun shines in the blue sky as birds are singing today.",
    2: "This calm morning, the sky is blue, and gentle clouds float by.",
    3: "In the peaceful evening, the stars shine brightly in the quiet sky.",
}


@pytest.fixture(scope="module")
def micro_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in MICRO_CORPUS.items()], "doc_id: int, text: string"
    )


def test_normalize_token_semantics(spark):
    """main.cc:75 then 33-42: lower first, then strip non-letters."""
    rows = spark.createDataFrame(
        [("Don't",), ("end.",), ("2024",), ("The",), ("bl!ue",), ("---",)],
        "token: string",
    ).select(normalize_token(F.col("token")).alias("w")).collect()
    assert [r.w for r in rows] == ["dont", "end", "", "the", "blue", ""]


def test_word_doc_pairs_distinct(spark, micro_docs):
    """'the' appears 3x in doc 3 but yields one (the, 3) pair (main.cc:62-63)."""
    pairs = {(r.word, r.doc_id) for r in word_doc_pairs(micro_docs).collect()}
    assert ("the", 3) in pairs
    assert len([p for p in pairs if p[0] == "the"]) == 3  # docs 1,2,3
    model = py_invert(MICRO_CORPUS)
    expected = {(w, d) for w, ids in model.items() for d in ids}
    assert pairs == expected


def test_invert_golden_micro(spark, micro_docs):
    """Full golden check vs FIXTURES.md §3 / reference test_out_small."""
    result = invert(micro_docs).collect()
    got = {r.word: list(r.docs) for r in result}
    model = py_invert(MICRO_CORPUS)
    assert got == model
    # Spot-check the cited golden lines.
    assert got["the"] == [1, 2, 3]
    assert got["blue"] == [1, 2]
    assert got["sky"] == [1, 2, 3]
    assert got["today"] == [1]  # 'today.' stripped
    assert got["and"] == [2]
    assert "2024" not in got

    # Per-letter row order: n_docs DESC then word ASC (main.cc:148-156).
    for letter in sorted({r.letter for r in result}):
        rows = [(r.word, list(r.docs)) for r in result if r.letter == letter]
        assert rows == letter_file_rows(model, letter)


def test_format_output_lines(spark, micro_docs):
    lines = {r.line for r in format_output(invert(micro_docs)).collect()}
    assert "the:[1 2 3]" in lines
    assert "blue:[1 2]" in lines
    assert "calm:[2]" in lines


def test_invert_on_sf0001_documents(spark, sf_dir):
    """Index the synthetic documents table; verify the set-semantics property:
    (word, doc) in output <=> word occurs (normalized) in doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = invert(docs)
    n = idx.count()
    assert n > 0
    # Every letter is a single lowercase a-z char.
    bad = idx.filter(~F.col("letter").rlike("^[a-z]$")).count()
    assert bad == 0
    # Sample property-check 5 docs against the pure-python model.
    sample = {r.doc_id: r.text for r in docs.limit(5).collect()}
    model = py_invert(sample)
    got_pairs = {
        (r.word, r.doc_id)
        for r in word_doc_pairs(docs.limit(5)).collect()
    }
    expected = {(w, d) for w, ids in model.items() for d in ids}
    assert got_pairs == expected
