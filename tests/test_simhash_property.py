"""Property-based check of the fingerprint-contracted SimHash
near-dup stats: against randomly generated corpora (small vocabulary →
dense exact- and near-duplicate structure), the contraction
(distinct-fingerprint pair enumeration + closed-form within-group
degrees + gmin/gmin2 keeper logic) must agree with a naive all-pairs
Hamming scan over the collected fingerprints.

The fixed-corpus test (test_operator_edges) covers the common shapes;
hypothesis hunts the corners: multiple identical-fingerprint groups
that are ALSO near each other, the group-minimum doc whose nearest
neighbour is its own second member, singleton fingerprints colliding
in one band only, and docs whose every token hashes to the same side.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle_to_cassandra_spark.operators.dedup import (
    SIMHASH_MAX_HAMMING,
    SIMHASH_WIDE_BITS,
    simhash_fingerprints,
    simhash_near_dup_stats,
)

#: tiny vocabulary so random docs collide into exact-dup groups and
#: near-dup (1-2 token difference) neighbourhoods with high probability
_VOCAB = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta")

_DOC = st.lists(
    st.sampled_from(_VOCAB), min_size=1, max_size=5
).map(lambda ws: " ".join(ws))

_CORPUS = st.lists(_DOC, min_size=2, max_size=14)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_CORPUS)
def test_simhash_stats_match_naive_all_pairs(spark, corpus):
    rows = [(i, text) for i, text in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fps = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(docs, bits=SIMHASH_WIDE_BITS).collect()
    }
    naive_pairs = {
        (a, b)
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= SIMHASH_MAX_HAMMING
    }
    naive_degree = {d: 0 for d in fps}
    for a, b in naive_pairs:
        naive_degree[a] += 1
        naive_degree[b] += 1

    got = {
        r.doc_id: (r.n_near, r.is_keeper)
        for r in simhash_near_dup_stats(docs).collect()
    }
    assert set(got) == set(fps)
    for d in fps:
        nbrs = [x for p in naive_pairs for x in p if d in p and x != d]
        keeper = not nbrs or min(nbrs) > d
        assert got[d] == (naive_degree[d], keeper), (
            f"doc {d} (fp {fps[d]:012x}): got {got[d]}, "
            f"want ({naive_degree[d]}, {keeper}); corpus={corpus}"
        )
