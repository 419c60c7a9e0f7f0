"""Build an invariant-breaking STRESS dataset from sf0.1.

Differential sweeps at sf0.001/0.01/0.1 all share the generator's
invariants (key ranges, FK closure, unique texts), so they cannot
catch fixture-coupled oracle/implementation drift — the class where
both engines agree only because the data happens to satisfy an
invariant neither text states (round 8's live instance:
`gdpr_delete_propagation` relied on events.user_id ⊆ customer keys).

This tool deliberately BREAKS those invariants while preserving the
properties correctness depends on (key uniqueness for deterministic
tie-breaks, FK consistency within each copy):

- facts (customer, orders, lineitem, events, documents, embeddings)
  are doubled: copy 0 verbatim, copy 1 with all primary/foreign keys
  shifted by +1_000_000 consistently (custkey in customer+orders,
  orderkey in orders+lineitem, doc_id/vec_id, event_id);
- events.user_id in copy 1 shifts by +3_000_000 — OUTSIDE both
  customer key ranges, so any oracle silently assuming user_id ⊆
  customer keys diverges loudly;
- document texts are NOT changed, so every doc has an exact duplicate
  under a different id — dedup/fingerprint paths run at a 100% dup
  rate instead of the generator's planted rate;
- dimensions (region, nation, supplier, part) stay single-copy, so
  fact→dim joins fan 2× — the realistic shape of a fact-table append.

Output: /root/repo/.scratch/stress/ (gitignored). Verify with:
    python tools/sf_sweep.py /root/repo/.scratch/stress --out STRESS_SWEEP.json
"""

from __future__ import annotations

import os

import duckdb

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "stress",
)
OFF = 1_000_000
USER_OFF = 3_000_000

#: per-table key-shift expressions for copy 1 (None = dim, not doubled)
SHIFTS: dict[str, dict[str, str] | None] = {
    "region": None,
    "nation": None,
    "supplier": None,
    "part": None,
    "customer": {"c_custkey": f"c_custkey + {OFF}"},
    "orders": {
        "o_orderkey": f"o_orderkey + {OFF}",
        "o_custkey": f"o_custkey + {OFF}",
    },
    "lineitem": {"l_orderkey": f"l_orderkey + {OFF}"},
    "events": {
        "event_id": f"event_id + {OFF}",
        "user_id": f"user_id + {USER_OFF}",
    },
    "documents": {"doc_id": f"doc_id + {OFF}"},
    "embeddings": {"vec_id": f"vec_id + {OFF}"},
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for table, shift in SHIFTS.items():
        src = f"read_parquet('{SRC}/{table}.parquet')"
        dst = os.path.join(OUT, f"{table}.parquet")
        if shift is None:
            sql = f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)"
        else:
            cols = [
                d[0]
                for d in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
            ]
            shifted = ", ".join(
                f"({shift[c]})::BIGINT AS {c}" if c in shift else c
                for c in cols
            )
            sql = (
                f"COPY (SELECT * FROM {src} "
                f"UNION ALL SELECT {shifted} FROM {src}) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows")
    print(f"stress dataset at {OUT}")


if __name__ == "__main__":
    main()
