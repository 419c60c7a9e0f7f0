"""Static guard against fixture-coupled oracle/implementation drift.

The one divergence class no SF sweep can catch: an oracle and an
implementation that express DIFFERENT predicates which happen to agree
on the current fixtures (all SFs share the generator's invariants, so
differential testing is blind to it). Round 8's live instance:
`gdpr_delete_propagation`'s oracle counted events by the bare
`user_id % 101` predicate while the implementation semi-joined a
customer-derived tombstone set — equal only while events.user_id
stays inside the customer key range (since fixed to express the same
cascade on both sides).

Mechanical tripwire: every mod / comparison literal in an oracle text
must appear verbatim in the implementing function's source — the
symmetric-by-construction pattern where one Python constant
interpolates into BOTH texts. Literals that instead come from shared
two-sided helpers (one function emits the Spark Column AND the SQL
from the same constant) are allowlisted below with their provenance;
a NEW asymmetric literal fails here until it is either derived from
a shared constant or audited into the allowlist.
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

_LIT = re.compile(r"%\s*(\d+)|BETWEEN\s+(\d+)|[=<>]\s*(\d{3,})", re.I)

#: literals produced by shared TWO-SIDED helpers (the same Python
#: constant emits both engines' texts), keyed by provenance:
_SHARED = {
    # functions/hashing.py MERSENNE_P — every *_sql twin interpolates it
    "2147483647": "hashing.MERSENNE_P (md5→int31 universal hashing)",
    # operators/dedup.py jaccard_verified_pairs(_sql): threshold*1000
    "600": "dedup.jaccard_verified_pairs_sql(0.6) permil threshold",
    # stats_funcs._POISSON1_CDF_PPM — module constant in both texts
    "367879": "stats_funcs._POISSON1_CDF_PPM",
    "735759": "stats_funcs._POISSON1_CDF_PPM",
    "919699": "stats_funcs._POISSON1_CDF_PPM",
    "981012": "stats_funcs._POISSON1_CDF_PPM",
    "996340": "stats_funcs._POISSON1_CDF_PPM",
    "999406": "stats_funcs._POISSON1_CDF_PPM",
    "999917": "stats_funcs._POISSON1_CDF_PPM",
    # operators/multimodal.py planted-blob geometry shared by the
    # decode helpers and their oracle generators
    "256": "multimodal planted-blob dims",
    "4096": "multimodal WAV frame size",
}


def _module_source(fn) -> str:
    return inspect.getsource(sys.modules[fn.__module__])


def test_oracle_literals_are_symmetric():
    qs = E.queries()
    offenders = {}
    for name, sql in sorted(E.oracle_sql().items()):
        lits = sorted(
            {g for m in _LIT.findall(sql) for g in m if g and g not in _SHARED}
        )
        if not lits:
            continue
        fn = qs[name]
        src = inspect.getsource(fn)
        # module-level constants interpolate into both texts — accept
        # a literal defined anywhere in the implementing module
        mod_src = _module_source(fn)
        missing = [l for l in lits if l not in src and l not in mod_src]
        if missing:
            offenders[name] = missing
    assert not offenders, (
        "oracle literal(s) with no symmetric source in the implementing "
        "module — fixture-coupled divergence risk (the gdpr class). "
        "Derive the value from ONE shared constant used by both texts, "
        f"or audit it into _SHARED with provenance: {offenders}"
    )


def test_shared_allowlist_is_live():
    """Every allowlisted literal must still occur in some oracle —
    remove stale entries so the allowlist can't rot."""
    all_sql = "\n".join(E.oracle_sql().values())
    stale = [l for l in _SHARED if l not in all_sql]
    assert not stale, f"stale _SHARED entries: {stale}"
