"""Physical-plan shape assertions: the optimizations the engine relies
on must actually appear in the plans (pushdown, broadcast, no stray
exchanges) — `.explain` as a test, per the task brief."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_postings_term_filter_pushdown(synth_engine):
    blocks = synth_engine.blocks_for(["sym0", "sym1"])
    plan = blocks._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters" in plan and "term" in plan, plan


def test_dictionary_prefix_pushdown(synth_engine):
    d = synth_engine._dictionary.filter(F.col("term").startswith("sym"))
    plan = d._jdf.queryExecution().sparkPlan().toString()
    assert "StartsWith" in plan and "PushedFilters" in plan, plan


def test_postings_scan_prunes_columns(synth_engine):
    # a docID-only projection must not drag the binary columns through the scan
    slim = synth_engine.blocks_for(["sym0"]).select("term", "block_first_doc")
    plan = slim._jdf.queryExecution().sparkPlan().toString()
    assert "doc_gaps" not in plan.split("ReadSchema")[-1], plan


def test_names_join_is_broadcast(synth_engine):
    docs = synth_engine.boolean_docs("sym0 AND sym1")
    plan = _plan(synth_engine._names(docs))
    assert "BroadcastHashJoin" in plan, plan


def test_joker_suffix_pushdown_into_postings(synth_engine):
    # a pure-suffix token must NOT scan the whole postings table: the
    # resolved match set is pushed as an In(term, ...) scan predicate
    docs = synth_engine.joker_docs("*le")  # matches 'needle' etc.
    plan = docs._jdf.queryExecution().sparkPlan().toString()
    assert "In(term" in plan or ("PushedFilters" in plan and "term" in plan), plan
    assert docs.count() > 0


def test_joker_oversized_match_set_uses_join(synth_engine, monkeypatch):
    # force the big-match-set path: joins instead of isin, no driver OOM
    monkeypatch.setattr(type(synth_engine), "JOKER_PUSHDOWN_TERMS", 1)
    via_join = sorted(r["docID"] for r in synth_engine.joker_docs("sym*").collect())
    monkeypatch.undo()
    via_isin = sorted(r["docID"] for r in synth_engine.joker_docs("sym*").collect())
    assert via_join == via_isin and via_join


def test_bm25_shuffles_blocks_not_postings(synth_engine):
    # scoring shuffles COMPRESSED BLOCKS keyed by docID bucket and fuses
    # decode+score+topk in one Arrow kernel: the exchange must be on
    # `bucket`, the binary columns must reach the kernel un-exploded, and
    # no row-at-a-time Python may appear anywhere
    df = synth_engine.bm25("sym0 sym1", k=5, wand=False)
    plan = _plan(df)
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    assert "hashpartitioning(bucket" in plan, plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere
