"""Rule-based lemmatizer as a Pandas UDF (SURVEY §2.1 R13, §2.2 C38).

The reference lemmatizes with NLTK WordNet (reference app.py:54-56) inside
a per-row Python loop. NLTK is not available in this container, so the
kernel is a deterministic lemmatizer — an irregular-noun exception map
(WordNet-style, matching pos='n' default behavior) ahead of suffix rules;
the Spark-side shape is
the real thing: an Arrow-batched ``pandas_udf`` applied to a token column,
initialised once per executor (the reference caches its NLTK download the
same way, app.py:13-22).

The rules are intentionally SQL-replicable so the DuckDB oracle can verify
the full pipeline value-for-value — swap `_lemma_series` for a WordNet
call when the corpus ships with NLTK available.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Irregular noun plurals (WordNet's noun exception behavior for the common
# cases; the reference's WordNetLemmatizer defaults to pos='n', reference
# app.py:54-56, so noun exceptions are the ones that matter). Public
# dictionary knowledge; checked BEFORE the suffix rules — "geese" must map
# to "goose", not fall through to the "-s" rule and become "geese"→"geese".
IRREGULAR_NOUNS: dict[str, str] = {
    "calves": "calf",
    "children": "child",
    "criteria": "criterion",
    "elves": "elf",
    "feet": "foot",
    "geese": "goose",
    "halves": "half",
    "knives": "knife",
    "leaves": "leaf",
    "lice": "louse",
    "lives": "life",
    "loaves": "loaf",
    "men": "man",
    "mice": "mouse",
    "oxen": "ox",
    "phenomena": "phenomenon",
    "shelves": "shelf",
    "teeth": "tooth",
    "thieves": "thief",
    "wives": "wife",
    "wolves": "wolf",
    "women": "woman",
}


def lemma_word(w: str) -> str:
    """Exception map first, then suffix rules first-match-only (order
    matters)."""
    exc = IRREGULAR_NOUNS.get(w)
    if exc is not None:
        return exc
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith("ing") and len(w) > 5:
        return w[:-3]
    if w.endswith("ed") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith("ss") and len(w) > 3:
        return w[:-1]
    return w


def _lemma_series(s: pd.Series) -> pd.Series:
    return s.map(lambda w: lemma_word(w) if isinstance(w, str) else w)


lemmatize_udf = F.pandas_udf(_lemma_series, StringType())


# The DuckDB mirror is GENERATED from the same exception dict, so the two
# engines cannot drift: one source of truth for both the pandas kernel and
# the oracle SQL.
_EXC_WHENS = "\n        ".join(
    "WHEN w = '{}' THEN '{}'".format(k.replace("'", "''"), v.replace("'", "''"))
    for k, v in sorted(IRREGULAR_NOUNS.items())
)

SQL_LEMMA_CASE = f"""
    CASE
        {_EXC_WHENS}
        WHEN w LIKE '%ies' AND len(w) > 4 THEN substr(w, 1, len(w) - 3) || 'y'
        WHEN w LIKE '%sses' THEN substr(w, 1, len(w) - 2)
        WHEN w LIKE '%ing' AND len(w) > 5 THEN substr(w, 1, len(w) - 3)
        WHEN w LIKE '%ed' AND len(w) > 4 THEN substr(w, 1, len(w) - 2)
        WHEN w LIKE '%s' AND w NOT LIKE '%ss' AND len(w) > 3
            THEN substr(w, 1, len(w) - 1)
        ELSE w
    END
"""
