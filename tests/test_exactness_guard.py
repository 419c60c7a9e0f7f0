"""Static tripwire for the one class of cross-engine flake this repo
has actually hit: ``round(AGG(float), k)`` compare columns, whose
value depends on parallel accumulation order and FLIPS between Spark
and DuckDB whenever the true sum lands near a rounding boundary
(three real instances at sf0.1 in round 7; see
``functions/exactnum.py`` for the integer-units proof pattern that
round 8 converted every site to).

This test scans every registered oracle text and fails if a new
``round(sum|avg|stddev|var(...))`` site appears whose aggregate
argument is not visibly integer-typed (a 0/1 ``CASE`` flag, an
``::INT``/``::BIGINT`` cast, or the ``CAST(round(x*scale) AS
BIGINT)`` integer-units form).  Sites whose argument is integer by
construction but not by syntax are listed in ``_AUDITED`` with the
reason — add to that list only after checking the argument's type in
BOTH engines.
"""

from __future__ import annotations

import re

import __spark_entry__ as E

_PAT = re.compile(
    r"round\s*\(\s*"
    r"(sum|avg|stddev_samp|stddev_pop|stddev|var_samp|var_pop|variance)"
    r"\s*\(",
    re.IGNORECASE,
)

#: Syntactic evidence that the aggregate's argument is exact-integer,
#: making the sum associative and the single trailing division
#: deterministic.
_INT_MARKERS = (
    "case when",      # 0/1 flag sums
    "::int",          # covers ::INT / ::INTEGER
    "::bigint",
    "::smallint",
    "cast(round",     # integer-units form CAST(round(x*s) AS BIGINT)
    "cast (round",
    "as bigint",
)

#: Audited exceptions: argument is integer-typed by construction
#: (checked in both engines) even though the text inside the agg call
#: carries no cast.
_AUDITED = {
    # len() of a VARCHAR is BIGINT in DuckDB / int in Spark.
    "bpe_apply_tokenize": ["len(f.w)"],
    # Same site, inherited by embedding _APPLY_SQL as a subquery; the
    # rounded column is projected away — the fertility compare columns
    # are all integer-ppm.
    "tokenizer_fertility_per_lang": ["len(f.w)"],
    # c is count(*) from the inner GROUP BY — integer per-key counts.
    "skew_diagnostics_orders_custkey": ["c"],
    # m_c is monetary CENTS (integer units) carried from the CTE.
    "rfm_customer_segments": ["r.m_c"],
    # gap_s is date_diff('second', ...) — BIGINT seconds.
    "inter_event_gap_stats": ["gap_s"],
    # v is a micro-unit BIGINT (unnest of a CAST(round(x*1e6) AS
    # BIGINT) list) — the PQ codebook mean is an exact int64 sum with
    # ONE trailing division + round (similarity_pq.py `_CB_SQL`).
    "similarity_pq_adc_topk": ["v"],
    "similarity_pq_recall_at_10": ["v"],
    "incremental_pq_encode": ["v"],
}


def _agg_argument(text: str, open_paren: int) -> str:
    depth = 0
    for i in range(open_paren, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[open_paren + 1 : i]
    return text[open_paren:]


def test_no_float_accumulation_compare_columns():
    offenders = []
    for name, sql in E.oracle_sql().items():
        for m in _PAT.finditer(sql):
            open_paren = sql.index("(", m.end() - 1)
            arg = _agg_argument(sql, open_paren)
            arg_l = arg.lower()
            if any(k in arg_l for k in _INT_MARKERS):
                continue
            normalized = " ".join(arg.split())
            if normalized in _AUDITED.get(name, []):
                continue
            offenders.append((name, normalized[:90]))
    assert not offenders, (
        "round(AGG(float)) compare column(s) detected — convert to the "
        "integer-units form (functions/exactnum.py) or, if the argument "
        "is provably integer-typed in both engines, add an _AUDITED "
        f"entry with the reason: {offenders}"
    )


def test_audited_exceptions_still_exist():
    """Every _AUDITED entry must still match a live site — stale
    entries would silently widen the allowlist."""
    live = {}
    for name, sql in E.oracle_sql().items():
        for m in _PAT.finditer(sql):
            open_paren = sql.index("(", m.end() - 1)
            arg = " ".join(_agg_argument(sql, open_paren).split())
            live.setdefault(name, set()).add(arg)
    for name, args in _AUDITED.items():
        for a in args:
            assert a in live.get(name, set()), (
                f"_AUDITED entry ({name!r}, {a!r}) no longer matches any "
                "oracle site — remove it"
            )
