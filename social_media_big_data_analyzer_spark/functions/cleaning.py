"""Text-cleaning pipeline as pure Column expressions (SURVEY §2.1 R5-R14).

Mirrors the reference's ``clean_text`` (reference app.py:47-57): lowercase,
strip URLs, strip @mentions, strip non-alpha, whitespace-tokenize, drop
stopwords and tokens shorter than 3 chars. Lemmatization (app.py:54-56) is
the one Python step and lives in :mod:`.lemmatize`.

Everything here is JVM-side (regexp_replace / split / filter inside
whole-stage codegen) — no Python in the hot path, which is the difference
between this and a row-at-a-time UDF port of the reference at 100 TB.

The stopword list is the standard NLTK English list (public; nltk_data
corpora/stopwords/english), embedded so the Spark expressions and the
DuckDB oracle SQL share one source of truth.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# NLTK English stopwords (public list, 179 entries).
STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren",
    "weren't", "won", "won't", "wouldn", "wouldn't",
)

URL_RE = r"http\S+|www\S+|https\S+"
MENTION_RE = r"@\w+"
NON_ALPHA_RE = r"[^a-zA-Z\s]"
MIN_TOKEN_LEN = 3


def cleaned_text(col: Column) -> Column:
    """lowercase -> strip urls -> strip mentions -> strip non-alpha (R5-R9)."""
    t = F.lower(col)
    t = F.regexp_replace(t, URL_RE, "")
    t = F.regexp_replace(t, MENTION_RE, "")
    return F.regexp_replace(t, NON_ALPHA_RE, "")


def clean_tokens(col: Column) -> Column:
    """Full pipeline to an array of kept tokens (R5-R12).

    Splitting on ``\\s+`` can emit empty leading tokens; the length filter
    removes them, matching Python's ``str.split()``.
    """
    toks = F.split(cleaned_text(col), r"\s+")
    return F.filter(
        toks,
        lambda w: (F.length(w) >= MIN_TOKEN_LEN) & ~w.isin(*STOPWORDS),
    )


def split_tokens(col: Column) -> Column:
    """Cleaned text split on whitespace, BEFORE the keep-filter."""
    return F.split(cleaned_text(col), r"\s+")


def token_keep(w: Column) -> Column:
    """The clean_tokens keep-predicate for an already-exploded token.

    ``explode(split_tokens(c))`` + ``filter(token_keep(w))`` produces the
    same row multiset as ``explode(clean_tokens(c))``, but the predicate
    runs as a whole-stage-codegen Filter (InSet over the stoplist)
    instead of an interpreted per-element ArrayFilter lambda — measured
    ~1.2x on the tokenize+count stage at sf0.1. Use it wherever tokens
    are exploded anyway; keep :func:`clean_tokens` where the ARRAY is
    the needed value (word_count, detokenize).
    """
    return (F.length(w) >= MIN_TOKEN_LEN) & ~w.isin(*STOPWORDS)


def detokenize(tokens: Column) -> Column:
    """Rejoin kept tokens with single spaces (R14)."""
    return F.array_join(tokens, " ")


def sql_stoplist() -> str:
    """The stopword list as a SQL literal list, for DuckDB oracles."""
    return "[" + ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS) + "]"


def sql_clean_tokens(col: str) -> str:
    """DuckDB expression computing exactly :func:`clean_tokens`."""
    return (
        "list_filter(string_split_regex(regexp_replace(regexp_replace("
        f"regexp_replace(lower({col}), 'http\\S+|www\\S+|https\\S+', '', 'g'), "
        "'@\\w+', '', 'g'), '[^a-zA-Z\\s]', '', 'g'), '\\s+'), "
        f"w -> len(w) >= {MIN_TOKEN_LEN} AND NOT list_contains({sql_stoplist()}, w))"
    )
