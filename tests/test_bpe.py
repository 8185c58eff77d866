"""BPE tokenizer training/encoding (information_retrieval_spark.bpe) vs
a pure-Python reference implementation of Sennrich et al. 2016 (greedy
leftmost merge = the paper's regex replace; tie-break pinned to
(count desc, left, right))."""
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from information_retrieval_spark import bpe


def ref_bpe(texts, n_merges):
    """Dictionary BPE exactly as learn_bpe.py (Sennrich reference):
    word freqs -> per-iteration pair stats -> best pair -> greedy
    leftmost non-overlapping merge of every word."""
    wf = Counter(w for t in texts if t for w in re.split(r"\s+", t) if w)
    segs = {w: list(w) for w in wf}
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for w, s in segs.items():
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += wf[w]
        if not stats:
            break
        (l, r), c = sorted(stats.items(),
                           key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((rank, l, r, c))
        for w, s in segs.items():
            out, pend = [], None
            for sym in s:
                if pend == l and sym == r:
                    out.append(l + r)
                    pend = None
                elif pend is None:
                    pend = sym
                else:
                    out.append(pend)
                    pend = sym
            if pend is not None:
                out.append(pend)
            segs[w] = out
    return merges, segs


DOCS = [
    (0, "low lower lowest low low newer newest new"),
    (1, "wider wide widest new newer aaa abab aaaa"),
    (2, ""),
    (3, None),
    (4, "the the the lowly low"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_train_matches_reference(docs_df):
    ref_merges, _ = ref_bpe([t for _, t in DOCS], 8)
    got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe.train(docs_df, 8).orderBy("merge_rank").collect()]
    assert got == ref_merges


def test_train_overlap_semantics(spark):
    # "aaaa" x1: (a,a) counted 3x (overlaps all count, per get_stats);
    # the merge keeps the 1st and 3rd site -> [aa, aa]
    df = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    m = bpe.train(df, 2).orderBy("merge_rank").collect()
    assert (m[0]["left"], m[0]["right"], m[0]["pair_count"]) == ("a", "a", 3)
    # after [aa, aa], the only pair is (aa, aa) once
    assert (m[1]["left"], m[1]["right"], m[1]["pair_count"]) == ("aa", "aa", 1)


def test_train_early_stop_and_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    # every word is a single symbol -> no pairs -> early stop, 0 merges
    assert bpe.train(df, 3).count() == 0
    with pytest.raises(ValueError):
        bpe.train(df, 0)


def test_segment_counts_matches_reference(docs_df):
    ref_merges, ref_segs = ref_bpe([t for _, t in DOCS], 8)
    merges = [(l, r) for _, l, r, _ in ref_merges]
    got = {r["id"]: r["n_bpe_pieces"]
           for r in bpe.segment_counts(docs_df, merges).collect()}
    want = {i: sum(len(ref_segs[w]) for w in re.split(r"\s+", t) if w)
            if t else 0
            for i, t in DOCS}
    assert got == want
    # null/empty docs keep an explicit 0 row
    assert got[2] == 0 and got[3] == 0


def test_random_corpus_parity(spark):
    # randomized sweep over a tiny alphabet (dense pair collisions ->
    # the tie-break and overlap rules are actually exercised)
    import random
    rng = random.Random(20260819)
    docs = [(i, " ".join("".join(rng.choice("abc") for _ in
                                 range(rng.randint(1, 6)))
                         for _ in range(rng.randint(1, 12))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ref_merges, ref_segs = ref_bpe([t for _, t in docs], 10)
    got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe.train(df, 10).orderBy("merge_rank").collect()]
    assert got == ref_merges
    merges = [(l, r) for _, l, r, _ in ref_merges]
    enc = {r["id"]: r["n_bpe_pieces"]
           for r in bpe.segment_counts(df, merges).collect()}
    want = {i: sum(len(ref_segs[w]) for w in t.split()) for i, t in docs}
    assert enc == want


def _train_counting_jobs(spark, df, n, tag):
    sc = spark.sparkContext
    sc.setJobGroup(tag, "train job budget")
    try:
        got = [(r["merge_rank"], r["left"], r["right"], r["pair_count"])
               for r in bpe.train(df, n).orderBy("merge_rank").collect()]
    finally:
        sc.setJobGroup(None, None)
    return got, len(sc.statusTracker().getJobIdsForGroup(tag))


def test_batched_train_parity_and_job_budget(spark):
    # Round-6 batched merge selection. Exactness comes first: the batch
    # admission rule (contiguous, symbol-disjoint incl. created
    # symbols, strictly above the first sharing pair's count) must
    # reproduce the sequential reference bit-for-bit. The job budget
    # then depends on how symbol-diverse the merge frontier is:
    #
    # (a) a symbol-disjoint dictionary (every word its own letters,
    #     distinct counts) admits whole batches -> <= n/8 driver jobs;
    n = 24
    letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    words = [letters[2 * i] + letters[2 * i + 1] for i in range(26)]
    docs = [(i, " ".join([words[i]] * (100 - i))) for i in range(26)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    ref_merges, _ = ref_bpe([t for _, t in docs], n)
    got, n_jobs = _train_counting_jobs(spark, df, n, "bpe-batch-disjoint")
    assert got == ref_merges
    # one batch round here: jobs = a small session constant (initial
    # checkpoint, AQE stage jobs, final collect), NOT ~2 per merge; the
    # n/8 criterion binds asymptotically (256 merges -> <= 8 rounds)
    assert 0 < n_jobs <= n // 8 + 8, f"{n_jobs} jobs for {n} merges"
    # and directly vs the sequential loop (batch_max=1 forces it):
    sc = spark.sparkContext
    sc.setJobGroup("bpe-seq", "sequential baseline")
    try:
        seq_rows = [(r["merge_rank"], r["left"], r["right"], r["pair_count"])
                    for r in bpe.train(df, n, batch_max=1)
                    .orderBy("merge_rank").collect()]
    finally:
        sc.setJobGroup(None, None)
    n_jobs_seq = len(sc.statusTracker().getJobIdsForGroup("bpe-seq"))
    assert seq_rows == ref_merges
    assert 4 * n_jobs <= n_jobs_seq, (n_jobs, n_jobs_seq)

    # (b) a sharing-heavy natural-word corpus (letter pairs overlap,
    #     batches shrink toward 1) must still be exact and never spend
    #     MORE jobs than the sequential 2-per-merge loop;
    import random
    rng = random.Random(20260821)
    vocab = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    docs2 = [(i, " ".join(rng.choice(vocab)
                          for _ in range(rng.randint(3, 15))))
             for i in range(60)]
    df2 = spark.createDataFrame(docs2, "doc_id long, text string")
    n2 = 24
    ref2, _ = ref_bpe([t for _, t in docs2], n2)
    got2, n_jobs2 = _train_counting_jobs(spark, df2, n2, "bpe-batch-natural")
    assert got2 == ref2
    # a round costs ~3 jobs (AQE stage jobs + checkpoint); worst case
    # one merge per round — never more rounds than merges
    assert n_jobs2 <= 3 * n2 + 4, f"{n_jobs2} jobs for {n2} merges"


def test_shared_freqs_relation(docs_df):
    # train accepts a precomputed dictionary (one corpus scan shared)
    freqs = bpe.word_freqs(docs_df).localCheckpoint(eager=True)
    a = [tuple(r) for r in bpe.train(docs_df, 4).collect()]
    b = [tuple(r) for r in bpe.train(docs_df, 4, freqs=freqs).collect()]
    assert a == b


def test_encode_projection_is_single_map_side_pass(docs_df):
    # the merge chain applies to DISTINCT words in one projection: no
    # Python eval anywhere, and the corpus-side plan has exactly the
    # dictionary exchanges (distinct + join + final agg), no per-merge
    # stages
    out = bpe.segment_counts(docs_df, [("l", "o"), ("lo", "w"), ("e", "r")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_pair_counts_topk_plan(docs_df):
    # exact top-k compiles to TakeOrderedAndProject (per-partition
    # heaps), never a full sort shuffle; no Python eval anywhere
    out = bpe.pair_counts(docs_df, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan


def test_segment_counts_udf_path_equals_expr_path(spark):
    # the two encode paths (chained JVM folds vs Arrow-batched vocab
    # UDF) must segment identically; large tables must run at all (the
    # fold chain hits Catalyst's analyzer ceiling near ~128)
    import random
    rng = random.Random(7)
    docs = [(i, " ".join("".join(rng.choice("ab")
                                 for _ in range(rng.randint(1, 8)))
                         for _ in range(rng.randint(1, 10))))
            for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    mt = [(r["left"], r["right"])
          for r in bpe.train(df, 10).orderBy("merge_rank").collect()]
    a = sorted(tuple(r) for r in bpe.segment_counts(df, mt).collect())
    b = sorted(tuple(r) for r in
               bpe.segment_counts(df, mt, expr_chain_max=0).collect())
    assert a == b
    # 500-entry table (mostly never-matching merges): runs, and the
    # no-op merges change nothing
    big = mt + [(f"q{i}x", f"z{i}y") for i in range(490)]
    c = sorted(tuple(r) for r in bpe.segment_counts(df, big).collect())
    assert c == a
