"""Pure-Python single-process oracle for rank-identity testing.

Implements the exact same query semantics as the Spark engine (and the
reference, QueryProcessor.java) over an in-memory inverted index built
with the shared `normalize.tokenize`. BM25 uses the same constants and
idf as query.QueryEngine — the Spark engine's top-k docIDs AND scores
must match this oracle rank-identically (BASELINE.json north_star).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

from .normalize import normalize, tokenize


class OracleIndex:
    def __init__(self, docs):
        """docs: iterable of (repo, path, content); docIDs are the rank of
        (repo, path) in lexicographic order (mirrors build._build_doc_map)."""
        items = sorted((repo, path, content) for repo, path, content in docs)
        self.doc_keys = [(r, p) for r, p, _ in items]
        self.doc_id = {k: i for i, k in enumerate(self.doc_keys)}
        self.postings = defaultdict(dict)  # term -> {docID: [positions]}
        self.doc_len = {}
        for r, p, content in items:
            d = self.doc_id[(r, p)]
            toks = tokenize(content)
            self.doc_len[d] = len(toks)
            for pos, term in enumerate(toks):
                self.postings[term].setdefault(d, []).append(pos)
        self.n_docs = len(self.doc_keys)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 0.0

    def name(self, doc_id: int) -> str:
        return self.doc_keys[doc_id][1].split("/")[-1]

    def docs_of(self, term):
        return set(self.postings.get(term, {}))

    # -- boolean (QueryProcessor.java:48-99) ---------------------------
    def boolean(self, q: str):
        if re.fullmatch(r"\s*\w[\w\s]*", q) is None:
            raise ValueError("incorrect input")
        result = set()
        for union_part in re.split(r"\s*OR\s*", q):
            inc, exc = [], []
            for token in re.split(r"\s*AND\s*", union_part):
                if token.startswith("NOT"):
                    exc.append(normalize(token[token.rfind(" ") + 1:]))
                else:
                    inc.append(normalize(token))
            if not inc or any(t is None for t in inc):
                # a None include term has no postings -> the clause's
                # intersection is empty (mirrors the engine, query.py, and
                # the reference's retainAll-on-null, QueryProcessor.java:74)
                continue
            docs = set(self.docs_of(inc[0]))
            for t in inc[1:]:
                docs &= self.docs_of(t)
            for t in exc:
                if t is not None:
                    docs -= self.docs_of(t)
            result |= docs
        return sorted(self.name(d) for d in result)

    # -- positional (QueryProcessor.java:110-179) ----------------------
    def positional(self, q: str):
        if re.fullmatch(r"\w+(\s+/\d+\s+\w+)*", q) is None:
            raise ValueError("Wrong input format")
        tokens = re.split(r"\s+", q)
        terms = [normalize(tokens[i]) for i in range(0, len(tokens), 2)]
        dists = [int(tokens[i][1:]) for i in range(1, len(tokens), 2)]
        if any(t is None or t not in self.postings for t in terms):
            return []
        relevant = set()
        for (t1, t2), k in zip(zip(terms, terms[1:]), dists):
            p1, p2 = self.postings[t1], self.postings[t2]
            for d in set(p1) & set(p2):
                if any(abs(a - b) <= k for a in p1[d] for b in p2[d]):
                    relevant.add(d)
        return sorted(self.name(d) for d in relevant)

    # -- phrase (engine addition: exact ordered adjacency) -------------
    def phrase(self, q: str):
        s = q.strip()
        if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
            s = s[1:-1].strip()
        if re.fullmatch(r"\w+(\s+\w+)*", s) is None:
            raise ValueError("Wrong input format")
        terms = [normalize(t) for t in re.split(r"\s+", s)]
        if any(t is None or t not in self.postings for t in terms):
            return []
        relevant = []
        docs = set(self.postings[terms[0]])
        for t in terms[1:]:
            docs &= set(self.postings[t])
        for d in docs:
            starts = set(self.postings[terms[0]][d])
            for i, t in enumerate(terms[1:], start=1):
                starts &= {p - i for p in self.postings[t][d]}
            if starts:
                relevant.append(d)
        return sorted(self.name(d) for d in relevant)

    # -- joker (QueryProcessor.java:183-250, star-free bug fixed) ------
    def joker(self, q: str):
        word = re.compile(r"(\*?\w+(\*\w+)?)|(\w+\*?\w*(\w\*\w*)?)")
        tokens = re.split(r"\s+", q.strip())
        for tok in tokens:
            if word.fullmatch(tok) is None:
                raise ValueError("invalid joker query")
        valid_docs = None
        for tok in (t.lower() for t in tokens):
            if "*" not in tok:
                term = normalize(tok)
                if term is None:
                    continue
                contribution = self.docs_of(term)
            else:
                pre = tok[: tok.index("*")]
                suf = tok[tok.rindex("*") + 1:]
                matched = [t for t in self.postings
                           if t.startswith(pre) and t.endswith(suf)]
                if tok.index("*") != tok.rindex("*"):
                    mid = tok[tok.index("*") + 1: tok.rindex("*")]
                    matched = [t for t in matched if re.fullmatch(f".*{re.escape(mid)}.*", t)]
                if not matched:
                    return []
                contribution = set()
                for t in matched:
                    contribution |= self.docs_of(t)
            valid_docs = contribution if valid_docs is None else (valid_docs & contribution)
            if not valid_docs:
                return []
        return sorted(self.name(d) for d in (valid_docs or set()))

    # -- BM25 ------------------------------------------------------------
    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25(self, query: str, k: int = 10, k1: float = 1.2, b: float = 0.75):
        terms = sorted({t for t in (normalize(tok) for tok in re.split(r"\s+", query.strip()))
                        if t is not None and t in self.postings})
        ranked = self._score_terms(terms, k1, b)[:k]
        return [(d, s, self.name(d)) for d, s in ranked]

    def bm25_boosted(self, boosts: dict, k: int = 10):
        """QueryEngine.bm25_boosted mirror: idf scaled per term."""
        norm = {}
        for tok, w in sorted(boosts.items()):
            t = normalize(tok)
            if t is not None and t in self.postings:
                norm[t] = float(w)
        ranked = self._score_terms(sorted(norm), boosts=norm)[:k]
        return [(d, s, self.name(d)) for d, s in ranked]

    def _score_terms(self, terms, k1: float = 1.2, b: float = 0.75,
                     boosts: dict | None = None):
        """Full BM25 ranking of PRE-NORMALIZED terms: [(docID, score)],
        score desc, docID asc."""
        avgdl = self.avgdl or 1.0
        scores = defaultdict(float)
        for t in terms:
            w = self.idf(t) * (boosts.get(t, 1.0) if boosts else 1.0)
            for d, pos in self.postings.get(t, {}).items():
                tf = len(pos)
                dl = self.doc_len[d]
                scores[d] += w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return sorted(scores.items(), key=lambda x: (-x[1], x[0]))

    def qlm(self, query: str, k: int = 10, mu: float = 2000.0):
        """Dirichlet query-likelihood mirror of QueryEngine.qlm:
        [(docID, score, name)], score desc, docID asc, over docs
        matching >=1 query term. Same rank-equivalent decomposition
        (sum ln(1+tf/w_t) + |q|(ln mu - ln(mu+dl)), w_t = mu*cf/T)
        and the same float64 association (w_t = mu * (cf / T))."""
        terms = sorted({t for t in (normalize(tok) for tok in re.split(r"\s+", query.strip()))
                        if t is not None and t in self.postings})
        if not terms:
            return []
        total_len = float(sum(self.doc_len.values())) or 1.0
        scores = defaultdict(float)
        for t in terms:
            cf = float(sum(len(ps) for ps in self.postings[t].values()))
            w = mu * (cf / total_len)
            for d, pos in self.postings[t].items():
                scores[d] += math.log(1.0 + len(pos) / w)
        qlen = len(terms)
        for d in scores:
            scores[d] += qlen * (math.log(mu) - math.log(mu + self.doc_len[d]))
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        return [(d, s, self.name(d)) for d, s in ranked]

    def doc_vector(self, doc_id: int) -> dict:
        """term -> tf of one document."""
        return {t: len(ps[doc_id]) for t, ps in self.postings.items()
                if doc_id in ps}

    def related_terms(self, query: str, k: int = 10, top_docs: int = 25):
        """QueryEngine.related_terms mirror: [(term, df_s, w)]."""
        q_terms = sorted({t for t in (normalize(tok)
                                      for tok in re.split(r"\s+", query.strip()))
                          if t is not None})
        s = {d for d, _ in self._score_terms(
            [t for t in q_terms if t in self.postings])[:top_docs]}
        cand = defaultdict(set)
        for t, ps in self.postings.items():
            if t in q_terms:
                continue
            for d in ps:
                if d in s:
                    cand[t].add(d)
        rows = [(t, len(ds), round(len(ds) * self.idf(t), 6))
                for t, ds in cand.items()]
        rows.sort(key=lambda r: (-r[2], r[0]))
        return rows[:k]

    def prf_bm25(self, query: str, k: int = 10, fb_terms: int = 5,
                 top_docs: int = 25):
        """QueryEngine.prf_bm25 mirror: BM25 over the union of the
        query's dictionary-present terms and the related_terms
        expansion set."""
        q_terms = sorted({t for t in (normalize(tok)
                                      for tok in re.split(r"\s+", query.strip()))
                          if t is not None and t in self.postings})
        if not q_terms:
            return []
        exp = {t for t, _, _ in self.related_terms(
            query, k=fb_terms, top_docs=top_docs)}
        ranked = self._score_terms(sorted(set(q_terms) | exp))[:k]
        return [(d, s, self.name(d)) for d, s in ranked]

    def more_like_this(self, doc_id: int, k: int = 10, n_terms: int = 5):
        """QueryEngine.more_like_this mirror: top-n_terms by
        (round(tf*idf, 6) desc, term), BM25 over them, source excluded
        before the cut."""
        vec = self.doc_vector(doc_id)
        sel = sorted((-round(tf * self.idf(t), 6), t)
                     for t, tf in vec.items())
        terms = sorted(t for _, t in sel[:n_terms])
        ranked = [(d, s) for d, s in self._score_terms(terms)
                  if d != doc_id][:k]
        return [(d, s, self.name(d)) for d, s in ranked]
