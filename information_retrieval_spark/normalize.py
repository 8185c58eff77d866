"""Token normalization — the semantic heart of the engine.

Reference semantics (IndexService.java:159-166, 596-618):
  normalize(token) = stem(lower(token).replaceAll("\\W", ""))  -> null if empty
  keep(term)       = term is not null AND (len(term) < 12 OR term has no digit)
  tokens           = whitespace-split of the document text, line by line
  positions        = 0-based counter over KEPT terms only (IndexService.java:221-225)

The reference stems with Stanford CoreNLP ``Morphology`` (an English
lemmatizer). Bit-exact reimplementation of CoreNLP is out of scope; per
SURVEY.md §1.5 this engine substitutes a small deterministic S-stemmer
whose rules are expressible BOTH as pure Python and as a chain of
``regexp_replace`` calls, so the exact same normalization runs in three
places and provably agrees:

  1. pure Python (`normalize`)              — the pytest oracle
  2. Spark SQL expression (`spark_tokens_expr`) — JVM-side codegen fast path
  3. DuckDB SQL (`duckdb_tokens_expr`)      — the driver correctness oracle

Stemmer rules (applied in order, at most one rewrite each, all anchored):
  r1:  sses$          -> ss       (classes -> class)
  r2:  (.)ies$        -> \1y      (queries -> query; "ies" alone untouched)
  r3:  ([^sui])s$     -> \1       (joins -> join; "ss"/"us"/"is" untouched)

`\\W` in Java default mode is [^a-zA-Z0-9_]; we lowercase first so the
strip class is written [^a-z0-9_].

Whitespace class: the reference splits with Java ``\\s+`` which is the
ASCII class [ \\t\\n\\x0b\\f\\r] (NOT Unicode whitespace — U+00A0 and
U+2028 are token characters to the reference). Every tokenizer path
pins that exact class: Spark SQL ``split(col, '\\s+')`` is Java regex
(already ASCII), the Arrow kernel uses ``pc.ascii_split_whitespace``
(same class), and the pandas / pure-Python / DuckDB paths spell the
class out explicitly (Python ``re`` and RE2 ``\\s`` differ from Java's:
Python's is Unicode-aware on str, RE2's lacks \\x0b). Parity across all
paths on non-ASCII whitespace is pinned by
tests/test_normalize.py::test_whitespace_class_parity.
"""

from __future__ import annotations

import re
from typing import Optional

# --- pure Python -----------------------------------------------------------

# Java \s class, exactly (see module docstring) — NOT Python's Unicode \s
WS_CLASS = r"[ \t\n\x0b\f\r]+"
_WS = re.compile(WS_CLASS)
_NONWORD = re.compile(r"[^a-z0-9_]")
_DIGIT = re.compile(r"[0-9]")
_R1 = re.compile(r"sses$")
_R2 = re.compile(r"(.)ies$")
_R3 = re.compile(r"([^sui])s$")

MAX_UNFILTERED_LEN = 12  # IndexService.java:612 — drop len>=12 tokens with a digit


def stem(word: str) -> str:
    """Deterministic S-stemmer (see module docstring)."""
    word = _R1.sub("ss", word)
    word = _R2.sub(r"\1y", word)
    word = _R3.sub(r"\1", word)
    return word


def normalize(token: str) -> Optional[str]:
    """lower -> strip non-word -> stem; None for non-words.

    Mirrors IndexService.java:164-166 (with the substituted stemmer).
    """
    cleaned = _NONWORD.sub("", token.lower())
    if not cleaned:
        return None
    return stem(cleaned)


def keep(term: Optional[str]) -> bool:
    """Admission filter, IndexService.java:610-616: keep short tokens and
    long pure-alpha words; drop len>=12 tokens containing a digit."""
    if term is None:
        return False
    return len(term) < MAX_UNFILTERED_LEN or _DIGIT.search(term) is None


def tokenize(text: str) -> list:
    """Whitespace-split -> normalize -> filter. Position of a term is its
    index in the returned list (kept terms only, IndexService.java:221-225)."""
    out = []
    for raw in _WS.split(text):
        if not raw:
            continue
        term = normalize(raw)
        if keep(term):
            out.append(term)
    return out


# --- SQL expression builders ----------------------------------------------
# Both dialects implement exactly the pipeline above. Spark's form uses
# higher-order functions (transform/filter) so the tokenizer runs fully
# JVM-side inside whole-stage codegen; DuckDB's uses list lambdas.

def _spark_norm_lambda(var: str = "t") -> str:
    base = f"regexp_replace(lower({var}), '[^a-z0-9_]', '')"
    s1 = f"regexp_replace({base}, 'sses$', 'ss')"
    s2 = f"regexp_replace({s1}, '(.)ies$', '$1y')"
    s3 = f"regexp_replace({s2}, '([^sui])s$', '$1')"
    return s3


def spark_tokens_expr(col: str = "content") -> str:
    """Spark SQL expression: string column -> array<string> of kept terms."""
    norm = _spark_norm_lambda("t")
    return (
        f"filter(transform(split({col}, '\\\\s+'), t -> {norm}), "
        f"t -> t != '' AND (length(t) < {MAX_UNFILTERED_LEN} OR t NOT RLIKE '[0-9]'))"
    )


def duckdb_tokens_expr(col: str = "text") -> str:
    """DuckDB SQL expression: string column -> list<varchar> of kept terms."""
    base = f"regexp_replace(lower(t), '[^a-z0-9_]', '', 'g')"
    s1 = f"regexp_replace({base}, 'sses$', 'ss')"
    s2 = f"regexp_replace({s1}, '(.)ies$', '\\1y')"
    s3 = f"regexp_replace({s2}, '([^sui])s$', '\\1')"
    # RE2's \s lacks \x0b (vertical tab); spell out Java's class
    return (
        f"list_filter(list_transform(regexp_split_to_array({col}, '[ \\t\\n\\x0b\\f\\r]+'), t -> {s3}), "
        f"t -> t != '' AND (length(t) < {MAX_UNFILTERED_LEN} OR NOT regexp_matches(t, '[0-9]')))"
    )
