"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same sf dir, then compares
row count, column names, and order-insensitive values (sorted rows, columns
sorted by name). The value compare is EXACT — the driver hashes exact
values, so any local tolerance makes this gate strictly weaker than the
driver's (round-5 lesson: q_agg_group drifted by rel ~3.5e-11, inside the
old rel_tol=1e-6, and failed only at the driver). Queries are responsible
for rounding their own outputs to engine-portable values.
"""

from __future__ import annotations

import duckdb


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        # normalize IEEE -0.0: numerically equal to 0.0 but str()-sorts
        # differently, which would misalign the row zip
        return v + 0.0
    if isinstance(v, int):
        return int(v)
    if hasattr(v, "isoformat"):  # datetime-likes -> µs precision string
        return v.isoformat(timespec="microseconds") if hasattr(v, "time") else v.isoformat()
    return v


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty list == parity."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    o_order = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in order) for r in s_rows), key=lambda t: str(t)
    )
    o_norm = sorted(
        (tuple(_norm(r[i]) for i in o_order) for r in o_rows), key=lambda t: str(t)
    )
    bad = 0
    for a, b in zip(s_norm, o_norm):
        if a != b:
            bad += 1
            if bad <= 3:
                problems.append(f"row mismatch: spark={a!r} oracle={b!r}")
    if bad > 3:
        problems.append(f"... {bad} mismatched rows total of {len(s_norm)}")
    return problems
