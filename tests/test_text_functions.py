"""Unit tests for the text kernels: the lemmatizer's irregular-noun
exception map + suffix rules (SURVEY §2.1 R13; reference app.py:54-56),
their DuckDB mirror, and the TF-IDF mini-corpus parity check
(reference app.py:156-166)."""

from __future__ import annotations

import duckdb
import pytest

from social_media_big_data_analyzer_spark.functions.lemmatize import (
    IRREGULAR_NOUNS,
    SQL_LEMMA_CASE,
    lemma_word,
)


@pytest.mark.parametrize(
    ("word", "lemma"),
    [
        ("geese", "goose"),
        ("feet", "foot"),
        ("children", "child"),
        ("mice", "mouse"),
        ("women", "woman"),
        ("oxen", "ox"),
        ("wolves", "wolf"),
        ("criteria", "criterion"),
        # regular words must still route through the suffix rules
        ("stories", "story"),
        ("classes", "class"),
        ("running", "runn"),
        ("asked", "ask"),
        ("markets", "market"),
        ("glass", "glass"),
        ("data", "data"),
    ],
)
def test_lemma_word(word: str, lemma: str) -> None:
    assert lemma_word(word) == lemma


def test_every_irregular_hits_exception_map() -> None:
    for plural, singular in IRREGULAR_NOUNS.items():
        assert lemma_word(plural) == singular


def test_sql_lemma_case_mirrors_python_kernel() -> None:
    """The generated DuckDB CASE must agree with lemma_word on every
    irregular AND on suffix-rule words — one source of truth."""
    words = sorted(IRREGULAR_NOUNS) + [
        "stories",
        "classes",
        "running",
        "asked",
        "markets",
        "glass",
        "data",
        "use",
        "uses",
        "used",
        "ties",
        "goes",
    ]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT w, {SQL_LEMMA_CASE} FROM (SELECT unnest(?) AS w)", [words]
    ).fetchall()
    for w, sql_lemma in rows:
        assert sql_lemma == lemma_word(w), f"divergence on {w!r}"
