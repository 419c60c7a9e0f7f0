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
    r"(sum|avg|stddev_samp|stddev_pop|stddev|var_samp|var_pop|variance"
    r"|corr|covar_samp|covar_pop|regr_\w+)"
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
    # m_c is monetary CENTS (integer units) carried from the CTE.
    "rfm_customer_segments": ["r.m_c"],
    # Second-moment float accumulations (corr/covar/regr): closed-form
    # integer conversion overflows int64 (Σx² of 1e7-cent prices), and
    # the rounded values are O(1) at 5-6 dp — the boundary sits ~1e5×
    # further away (relative) than the 1e7-scale 2-dp sums that
    # actually flipped in round 7. Audited accepted risk; revisit with
    # DECIMAL(38) partials if a flip is ever observed.
    "correlation_price_quantity": ["l_extendedprice, l_quantity"],
    "linear_regression_price_size": ["p_retailprice, p_size"],
    "quality_length_regression_per_source": ["y, x"],
    # zipf: regr over ln(rank)/ln(freq) doubles — same class.
    "zipf_fit_per_corpus": ["ly, lx"],
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


# --- second tripwire: final round over a DIVISION ---------------------
#
# Verified live this round: Spark's round(double, nd) quantizes the
# double's SHORTEST-DECIMAL repr (BigDecimal HALF_UP) while DuckDB
# rounds the binary double — when an int-derived ratio lands on an
# nd-dp half (reachable whenever the denominator has a factor of
# 2·10^nd the numerator can't cancel: sum_units/10^m with m > nd,
# int-means by group count, count ratios, 6-dp quality scores at
# token counts with an uncancelled 2^7), the two DISAGREE
# deterministically: round(86958149950/10000.0, 2) → Spark 8695815.00,
# DuckDB 8695814.99. Every such compare column is converted to integer
# `div` units or floor(x*10^nd + 0.5) fixed-point (floor on the
# identical double has no repr-vs-binary ambiguity). The residual
# rounds below are individually audited: sqrt/ln-normalized chains
# whose doubles are generic (repr-ties measure-zero) or prime
# denominators admitting no exact nd-dp tie.


def _round_sites(sql: str):
    """(body, nd) for every round(<body>, <nd>) — full paren matching
    (a regex with bounded nesting silently MISSES deep sites; that
    blind spot hid 20+ real ones during the round-8 conversion)."""
    out = []
    for m in re.finditer(r"round\s*\(", sql, re.I):
        start = m.end()
        depth = 1
        i = start
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[start : i - 1]
        depth = 0
        last_comma = -1
        for j, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = j
        if last_comma < 0:
            continue
        nd = inner[last_comma + 1 :].strip()
        if not nd.isdigit():
            continue
        out.append((inner[:last_comma], int(nd)))
    return out


def _grid_divisor_ok(body: str, nd: int) -> bool:
    """round over `x / 10^m` with m <= nd is an ON-GRID identity: the
    true value lies exactly on the nd-dp grid, both engines recover
    it."""
    m = re.search(r"/\s*1(0*)\.0\s*\)*\s*$", body.strip())
    return bool(m) and len(m.group(1)) <= nd


#: audited per-query budgets of residual round-over-division sites
#: (each individually checked: sqrt/ln chains or prime denominators)
_DIV_AUDITED = {
    "benford_first_digit_audit": 2,       # ln expected share + ln-chi²
    "dedup_embedding_top_neighbor": 1,    # cosine (sqrt-normalized)
    "embedding_cluster_keepers": 1,       # cosine
    "embedding_int8_quantization": 2,     # s/127 (prime) + abs-err chain
    "grouped_map_zscore": 1,              # stddev-normalized residual
    "hard_negative_mining": 2,            # cosine ×2
    "hybrid_rrf_retrieval": 2,            # cosine + Σ 1/(60+r)
    "ivf_centroid_refinement": 1,         # cosine
    "jl_projection_recall_distortion": 1, # float-dot / 4.0 projection
    "label_centroid_separation": 1,       # cosine
    "lsh_multiprobe_recall": 2,           # cosine ×2
    "pmi_collocations_topk": 2,           # ln PMI ×2
    "similarity_bruteforce_topk": 1,      # cosine
    "similarity_hyperplane_ann_topk": 1,  # cosine
    "similarity_ivf_recall_at_10": 2,     # cosine ×2
    "similarity_ivf_topk": 1,             # cosine
    "tfidf_top_terms": 1,                 # tf·ln(N/df)
    "token_length_psi_drift": 1,          # (q-p)·ln(q/p)
    "weighted_sample_without_replacement": 1,  # -ln(u)/w rank key
}


def test_no_round_over_division_compare_columns():
    counts: dict[str, int] = {}
    for name, sql in E.oracle_sql().items():
        for body, nd in _round_sites(sql):
            if "/" in body and not _grid_divisor_ok(body, nd):
                counts[name] = counts.get(name, 0) + 1
    over = {
        n: c for n, c in counts.items() if c > _DIV_AUDITED.get(n, 0)
    }
    assert not over, (
        "round(<expr with division>, nd) compare column(s) beyond the "
        "audited budget — emit integer `div` units or floor(x*10^nd + "
        f"0.5) instead (repr-vs-binary ties diverge across engines): {over}"
    )


def test_div_audited_counts_are_tight():
    """The audited budgets must exactly match the live site counts —
    a removed site must shrink the budget, a new one must be
    individually audited."""
    counts: dict[str, int] = {}
    for name, sql in E.oracle_sql().items():
        for body, nd in _round_sites(sql):
            if "/" in body and not _grid_divisor_ok(body, nd):
                counts[name] = counts.get(name, 0) + 1
    assert counts == _DIV_AUDITED, (
        f"live={counts} audited={_DIV_AUDITED} — reconcile the budgets"
    )


# --- live pin: integer-division semantics across engines --------------
#
# The integer-units means emitted by exact_avg_units rely on Spark's
# `div` and DuckDB's `//` agreeing on NEGATIVE operands. Both truncate
# toward zero (unlike Python's floor //): -7 div 2 == -7 // 2 == -3.
# Pinned live so an engine upgrade that changes either semantic fails
# here instead of as a driver hash mismatch on a negative-mean column.


def test_integer_division_truncates_toward_zero_in_both_engines(spark, duck):
    cases = "SELECT -7 {d} 2 AS a, 7 {d} -2 AS b, -7 {d} -2 AS c, 7 {d} 2 AS d"
    srow = spark.sql(cases.format(d="div")).collect()[0]
    drow = duck.execute(cases.format(d="//")).fetchone()
    assert tuple(srow) == tuple(drow) == (-3, -3, 3, 3)
