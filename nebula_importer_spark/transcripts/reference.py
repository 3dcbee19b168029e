"""Independent plain-Python reference extractor + P/R harness.

This is the golden-side implementation of the shared extraction spec
(transcripts/extract.py docstring): pure Python over locally collected rows,
no Spark, exact (not approximate) fuzzy matching, union-find (not iterative
joins) for canonicalization. Implementation independence is the point — the
engine's P/R ≥ 0.95 target (BASELINE.json:metric) is measured against THIS
extractor's output, mirroring how the reference repo's golden nGQL statement
tests pin operator behavior (SURVEY §5).
"""

from __future__ import annotations

import re

from nebula_importer_spark.transcripts.extract import PRED_TEXT

_PATTERNS = {
    pred: re.compile(rf"([A-Z]\w*(?: \w+)*?) {txt} ([^.]+?)\.")
    for pred, txt in PRED_TEXT.items()
}
_WS = re.compile(r"\s+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s.strip()).lower()


def _shingles(s: str, n: int = 3) -> frozenset[str]:
    if len(s) < n:
        return frozenset([s])
    return frozenset(s[i : i + n] for i in range(len(s) - n + 1))


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # min-id root → identical canonical choice to the Spark CC operator
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def reference_extract(
    turns: list[tuple[str, int, str]],
    alias_dict: list[tuple[str, str]],
    same_as: list[tuple[str, str]],
    fuzzy_threshold: float = 0.5,
) -> set[tuple[str, int, str, str, str]]:
    """turns: (conv_id, turn_idx, text) in ANY order (sorted internally —
    stable-ordering invariant); alias_dict: (alias, entity_id);
    same_as: (entity_id, dup_id).

    Returns canonical triples {(conv_id, turn_idx, subj, pred, obj)}.
    """
    uf = UnionFind()
    for a, b in same_as:
        uf.union(a, b)

    exact: dict[str, str] = {}
    for alias, eid in sorted(alias_dict):
        exact.setdefault(_norm(alias), eid)  # min entity_id on collision
    alias_sh = [(_norm(alias), _shingles(_norm(alias)), eid) for alias, eid in sorted(alias_dict)]

    link_cache: dict[str, str | None] = {}

    def link(surface: str) -> str | None:
        key = _norm(surface)
        if key in link_cache:
            return link_cache[key]
        eid = exact.get(key)
        if eid is None:
            sh = _shingles(key)
            best: tuple[float, str] | None = None
            for _, ash, aeid in alias_sh:
                j = len(sh & ash) / len(sh | ash)
                if j >= fuzzy_threshold and (best is None or (j, _neg(aeid)) > (best[0], _neg(best[1]))):
                    best = (j, aeid)
            eid = best[1] if best else None
        out = uf.find(eid) if eid is not None else None
        link_cache[key] = out
        return out

    triples: set[tuple[str, int, str, str, str]] = set()
    for conv_id, turn_idx, text in sorted(turns):
        for pred, pat in _PATTERNS.items():
            for s_sf, o_sf in pat.findall(text or ""):
                s_id, o_id = link(s_sf), link(o_sf)
                if s_id is not None and o_id is not None:
                    triples.add((conv_id, int(turn_idx), s_id, pred, o_id))
    return triples


def _neg(s: str) -> tuple[int, ...]:
    """Invert string order so '(j, _neg(id)) > ...' means max-j then MIN-id."""
    return tuple(-ord(c) for c in s)


def precision_recall(
    got: set[tuple], want: set[tuple]
) -> tuple[float, float, float]:
    """(precision, recall, f1) of got vs want."""
    if not got or not want:
        return (0.0, 0.0, 0.0) if want or got else (1.0, 1.0, 1.0)
    tp = len(got & want)
    p = tp / len(got)
    r = tp / len(want)
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1
