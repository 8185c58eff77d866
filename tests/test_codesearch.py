"""Trigram-indexed grep: exactness vs a brute-force python oracle,
required-literal extraction soundness, and the pruning contracts that
make the operator the scale path (gram IN pushdown on a persisted
index, candidate set smaller than the corpus, no per-row Python)."""

import re

import pytest
from pyspark.sql import functions as F

from information_retrieval_spark import codesearch as cs


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark sort table merge sort table scan"),
        (1, "scan table sort merge"),
        (2, "sort tablesort table"),          # overlapping-ish occurrences
        (3, "ab"),                            # shorter than a trigram
        (4, "nothing relevant here"),
        (5, "sort  table"),                   # double space: NOT a match
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_literal(rows, needle):
    return {(i, t.count(needle)) for i, t in rows if needle in t}


def _expected_regex(rows, pat):
    return {(i, len(re.findall(pat, t))) for i, t in rows if re.search(pat, t)}


def test_grep_literal_matches_oracle(corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    got = {(r.id, r.n_hits) for r in cs.grep_literal(corpus, "sort table").collect()}
    assert got == _expected_literal(rows, "sort table")
    assert (2, 2) in got  # both occurrences in doc 2 counted


def test_grep_literal_short_needle_fallback(corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    got = {(r.id, r.n_hits) for r in cs.grep_literal(corpus, "ab").collect()}
    assert got == _expected_literal(rows, "ab")


def test_grep_literal_empty_needle_rejected(corpus):
    with pytest.raises(ValueError):
        cs.grep_literal(corpus, "")


def test_grep_regex_matches_oracle(corpus):
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    pat = "s(ort|can) table"
    got = {(r.id, r.n_hits) for r in cs.grep_regex(corpus, pat).collect()}
    assert got == _expected_regex(rows, "s(?:ort|can) table")


def test_grep_regex_no_literal_full_scan(corpus):
    # a pattern with no required literal >=3 chars must still be exact
    rows = [(r.doc_id, r.text) for r in corpus.collect()]
    pat = "s.rt"
    got = {(r.id, r.n_hits) for r in cs.grep_regex(corpus, pat).collect()}
    assert got == _expected_regex(rows, pat)


def test_random_corpus_parity(spark):
    # seeded sweep over random word-soup text: literal + regex both
    # agree with python exactly (counts included)
    import random
    rng = random.Random(7)
    vocab = ["sort", "table", "scan", "merge", "spark", "so", "rt"]
    rows = [(i, " ".join(rng.choices(vocab, k=rng.randint(0, 30))))
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id, r.n_hits) for r in cs.grep_literal(df, "sort table").collect()}
    assert got == _expected_literal(rows, "sort table")
    pat = "(sort|scan) merge"
    got = {(r.id, r.n_hits) for r in cs.grep_regex(df, pat).collect()}
    assert got == _expected_regex(rows, "(?:sort|scan) merge")


def test_required_literals_extraction():
    assert cs.required_literals("s(ort|can) table") == [" table"]
    assert cs.required_literals("shuffl(e|ing)") == ["shuffl"]
    # top-level alternation: nothing is unconditionally required
    assert cs.required_literals("sort|scan") == []
    # quantifier drops only the repeated atom from the run
    assert cs.required_literals("tables?") == ["table"]
    assert cs.required_literals("tab*le") == []   # 'ta' too short, 'le' too short
    assert cs.required_literals("merge+sort") == ["merge", "sort"]
    # classes and escapes break runs; escaped metachars stay literal
    assert cs.required_literals(r"foo\d+bar") == ["foo", "bar"]
    assert cs.required_literals(r"a\(bcd\)e") == ["a(bcd)e"]
    assert cs.required_literals("[abc]def") == ["def"]
    # {m,n} quantifier region is skipped and drops its atom
    assert cs.required_literals("abcx{2,3}def") == ["abc", "def"]


def test_required_literal_soundness_random():
    # property: every string matching the pattern CONTAINS each
    # required literal — soundness of the candidate pruning
    import random
    rng = random.Random(11)
    pats = ["s(ort|can) table", "merge+sort", r"foo\d+bar", "tables?",
            "abcx{2,3}def", "(a|b)cde"]
    alphabet = "abcdefox{}strn 123"
    for pat in pats:
        lits = cs.required_literals(pat)
        cre = re.compile(pat)
        for _ in range(400):
            s = "".join(rng.choices(alphabet, k=rng.randint(0, 25)))
            m = cre.search(s)
            if m:
                for lit in lits:
                    assert lit in s, (pat, lit, s)


def test_candidates_prune_and_pushdown(spark, tmp_path, corpus):
    # persisted index: the gram IN (...) predicate must reach the
    # parquet scan, and the candidate set must be smaller than the
    # corpus (the index actually prunes)
    p = str(tmp_path / "tri_idx")
    post = cs.trigram_postings(corpus, postings_path=p)
    grams = cs._gram_set("sort table")
    cand = cs._candidates(post, cs._pick_grams(post, grams, 8))
    plan = cand._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters" in plan and "gram" in plan, plan
    n_cand = cand.count()
    assert 0 < n_cand < corpus.count()
    # idempotent reuse: a second call reads the same files, no rewrite
    import os
    mtime = os.path.getmtime(os.path.join(p, "_SUCCESS"))
    cs.trigram_postings(corpus, postings_path=p)
    assert os.path.getmtime(os.path.join(p, "_SUCCESS")) == mtime


def test_grep_plans_stay_jvm_side(corpus):
    # no per-row Python anywhere in either operator
    for df in (cs.grep_literal(corpus, "sort table"),
               cs.grep_regex(corpus, "s(ort|can) table")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, plan


def test_max_grams_cap_rarest_first(spark):
    # a long needle has >8 grams: the probe set caps at the 8 rarest
    # and the result is still exact
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown fox"),
            (2, "the quick brown cat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    needle = "quick brown fox"
    post = cs.trigram_postings(df)
    grams = cs._gram_set(needle)
    assert len(grams) > 8
    picked = cs._pick_grams(post, grams, 8)
    assert len(picked) == 8 and set(picked) <= set(grams)
    got = {(r.id, r.n_hits) for r in cs.grep_literal(df, needle).collect()}
    assert got == {(0, 1), (1, 1)}
