"""Quantified divergence between this engine's S-stemmer and the
reference's Stanford CoreNLP ``Morphology`` lemmatizer
(IndexService.java:5, 159-166).

SURVEY.md §1.5 documents the substitution; this fixture turns the
documented deviation into a MEASURED one. Expected lemmas are recorded
from published CoreNLP Morphology behavior — a finite-state lemmatizer
implementing WordNet-morphy-style rules (plural nouns -> singular,
-ing/-ed/-s verb forms -> base, irregular exception lists) — with the
reference's own inline example cross-checked (QueryProcessor.java:192:
"searchings -> searching; searching -> search").

The S-stemmer by construction agrees on s-inflections and disagrees on
-ing/-ed forms and irregulars; the measured agreement on this mixed
fixture is pinned below so any stemmer change shows up as a diff, and
SURVEY.md §1.5 cites the number.
"""

from information_retrieval_spark.normalize import stem

# (inflected form, CoreNLP Morphology lemma)
CORENLP_LEMMAS = [
    # s-inflections — the S-stemmer's home turf
    ("engines", "engine"), ("queries", "query"), ("classes", "class"),
    ("joins", "join"), ("tables", "table"), ("windows", "window"),
    ("pineapples", "pineapple"), ("words", "word"), ("triggers", "trigger"),
    ("documents", "document"), ("files", "file"), ("searches", "search"),
    ("matches", "match"), ("indexes", "index"), ("libraries", "library"),
    ("entries", "entry"), ("copies", "copy"), ("buses", "bus"),
    ("glasses", "glass"), ("misses", "miss"),
    # -ing forms (CoreNLP lemmatizes, S-stemmer keeps)
    ("searching", "search"), ("running", "run"), ("indexing", "index"),
    ("testing", "test"), ("debugging", "debug"), ("building", "build"),
    ("merging", "merge"), ("updating", "update"), ("writing", "write"),
    ("reading", "read"),
    # -ed forms
    ("searched", "search"), ("indexed", "index"), ("updated", "update"),
    ("merged", "merge"), ("added", "add"), ("tested", "test"),
    ("dropped", "drop"), ("retrieved", "retrieve"),
    # irregulars
    ("mice", "mouse"), ("children", "child"), ("feet", "foot"),
    ("went", "go"), ("ran", "run"), ("wrote", "write"), ("built", "build"),
    # invariants — both must leave unchanged
    ("corpus", "corpus"), ("this", "this"), ("engine", "engine"),
    ("search", "search"), ("index", "index"),
    # the reference's own example (QueryProcessor.java:192)
    ("searchings", "searching"),
]


def test_stemmer_divergence_vs_corenlp_is_measured():
    agree = [(w, lemma) for w, lemma in CORENLP_LEMMAS if stem(w) == lemma]
    disagree = [(w, stem(w), lemma) for w, lemma in CORENLP_LEMMAS
                if stem(w) != lemma]
    rate = len(agree) / len(CORENLP_LEMMAS)
    # Pinned measurement (cited in SURVEY.md §1.5): the round-2
    # S-stemmer agreed on 22/51 (43%); the round-3 Porter-lite chain
    # (-ing/-ed with e-restoration classes, sibilant -es) reached
    # 43/51 (84%); round 4's IRREGULAR_LEMMAS lexicon (the CoreNLP
    # exception-list behavior, rendered into all three dialects)
    # closes the 7 irregulars -> 50/51 (98%). The single remaining
    # divergence is `buses` (the bare-s es-rule was deliberately
    # dropped: it truncated uses/databases/parses, which dominate a
    # source-code corpus). The s-inflection classes that dominate the
    # reference's own golden queries stay 20/20.
    assert len(CORENLP_LEMMAS) == 51
    assert {w for w, _, _ in disagree} == {"buses"}, disagree
    assert abs(rate - 50 / 51) < 1e-9, (rate, disagree)


def test_stemmer_known_failure_modes_documented():
    # the failure modes a user sees vs the Java engine — documented, not
    # hidden: (a) irregular forms not in IRREGULAR_LEMMAS (ambiguous
    # surface forms like saw/left/found need a POS tag) fall through to
    # the rule chain; (b) bases genuinely ending in a bare
    # consonant+se/-us keep or lose their e by the Cs-restore
    # heuristic, so bus/buses diverge
    assert stem("went") == "go" and stem("mice") == "mouse"  # lexicon hits
    assert stem("saw") == "saw" != "see"  # ambiguous: also a base noun
    assert stem("buses") == "buse" != "bus"
    # and the rules a user RELIES on (the reference's own example plus
    # the code-corpus verb classes) hold:
    assert stem("searchings") == "searching"
    assert stem("searching") == stem("searched") == stem("searches") == "search"
    assert stem("uses") == stem("used") == stem("using") == "use"
    assert stem("databases") == "database"
    assert stem("filtered") == stem("filtering") == "filter"
    assert stem("shuffled") == "shuffle" and stem("compiled") == "compile"
