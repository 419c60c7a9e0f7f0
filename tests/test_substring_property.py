"""Property-based check of the substring-dedup span pipeline against
a naive Python reference: on random corpora over a 2-token vocabulary
(maximal window-collision density), the distributed anchor-hash →
flag → gaps-and-islands merge must produce exactly the per-doc
duplicated-token coverage a brute-force interval union computes.

The fixed-corpus tests (test_operator_edges) cover the common shapes;
hypothesis hunts the corners: spans that merge THROUGH a gap of
exactly w, whole-doc coverage, single-anchor docs, docs that repeat a
window internally but share nothing across docs, and duplicated
windows straddling span boundaries.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_cassandra_spark.operators.dedup import substring_dup_spans

_W = 3

_DOC = st.lists(
    st.sampled_from(("aa", "bb")), min_size=0, max_size=12
).map(lambda ws: " ".join(ws))

_CORPUS = st.lists(_DOC, min_size=2, max_size=8)


def _naive(corpus: list[str], w: int) -> dict[int, tuple[int, int, int, int]]:
    toks = {i: t.split(" ") if t else [""] for i, t in enumerate(corpus)}
    windows: dict[str, set[int]] = {}
    for d, tk in toks.items():
        for p in range(len(tk) - w + 1):
            windows.setdefault(" ".join(tk[p : p + w]), set()).add(d)
    out: dict[int, tuple[int, int, int, int]] = {}
    for d, tk in toks.items():
        pos = [
            p
            for p in range(len(tk) - w + 1)
            if len(windows[" ".join(tk[p : p + w])]) >= 2
        ]
        if not pos:
            continue
        covered: set[int] = set()
        for p in pos:
            covered.update(range(p, p + w))
        # spans = maximal runs of covered token indices
        spans = 0
        prev = None
        for i in sorted(covered):
            if prev is None or i > prev + 1:
                spans += 1
            prev = i
        n_tokens = len(tk)
        dup = len(covered)
        out[d] = (spans, dup, n_tokens, dup * 10000 // n_tokens)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_CORPUS)
def test_substring_spans_match_naive_interval_union(spark, corpus):
    rows = [(i, text) for i, text in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_dup_spans"],
            r["dup_tokens"],
            r["n_tokens"],
            r["dup_coverage_bp"],
        )
        for r in substring_dup_spans(docs, w=_W).collect()
    }
    assert got == _naive(corpus, _W)
