"""sf1 digest verification of dedup_jaccard_pairs, leg by leg.

The registry entry unions two legs:

- part='pair'    — exact blocked Jaccard pairs (42.2M rows at sf1);
- part='cluster' — connected components over those pairs.

The generic harness (tests/oracle_check.py --digest) compares the whole
entry against ORACLE_JACCARD, whose cluster leg is a RECURSIVE
min-label closure — the only single-statement SQL form — and that walk
materializes O(sum comp^2) rows. At sf1 the 10-copy synthesis fuses
components into dense near-cliques, the closure did not converge in
~2.7 h wall (~4 CPU-h, round 9), and no single-statement fix exists:
that is the named, measured reason the one-shot harness can't cover
this entry at sf1.

This tool verifies the SAME rows a different, feasible way, exploiting
two facts:

1. The aggregate digest law (queries/power.py:agg_digest_*) is a SUM of
   per-row md5 terms, so digest(union) = digest(pair leg) +
   digest(cluster leg) — legs can be verified independently and summed.
2. Connected components need not be computed recursively: a
   Python-driven MIN-LABEL FIXPOINT (comp <- min(comp, neighbors'
   comp) until no row changes) converges in O(graph diameter)
   iterations, and the sf1 components are dense near-cliques with tiny
   diameter. Each iteration is one plain edges-x-labels join — no
   recursion, no comp^2 blowup. This mirrors the Spark side's own
   log-rounds star algorithm (operators/cluster.py), so the two engines
   compute the same fixpoint by the same contraction principle.

Prints per-leg digests/timings and the full-entry verdict; appends a
section to SCALING.md. Usage:
    python tools/sf1_pair_digest.py [sf_dir]
(default /tmp/spark_graft_stress_sf1 — build with
 `python tools/stress_sf1.py relational` first)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_stress_sf1"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    from transitlog_hfp_sink_spark.queries import ml
    from transitlog_hfp_sink_spark.queries.power import (
        agg_digest_spark,
        agg_digest_sql,
    )
    from transitlog_hfp_sink_spark.session import build_session

    spark = build_session(app_name="sf1-pair-digest", master="local[32]",
                          shuffle_partitions=32,
                          extra_conf={"spark.ui.showConsoleProgress": "false"})
    full = ml.q_jaccard_pairs(spark, SF)
    schema = [(c, t) for c, t in full.dtypes]

    t0 = time.time()
    srow = tuple(agg_digest_spark(full, schema).collect()[0])
    t_spark = time.time() - t0
    print(f"spark full entry: {srow} ({t_spark:.1f}s)", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM {src}")

    # --- pair leg: the ORACLE_JACCARD w/p CTEs, no closure -------------
    t0 = time.time()
    con.execute(f"""
        CREATE TABLE p AS
        WITH w AS (
          SELECT doc_id AS id, source,
                 list_distinct(string_split({ml.SQL_NORM.format(c='text')}, ' ')) AS sh
          FROM documents
        )
        SELECT a.id AS id_a, b.id AS id_b,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                     len(list_distinct(list_concat(a.sh, b.sh))), 6) AS score
        FROM w a JOIN w b ON a.source = b.source AND a.id < b.id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    """)
    t_pairs = time.time() - t0
    opair = tuple(con.execute(agg_digest_sql(
        "SELECT 'pair' AS part, id_a, id_b, score FROM p", schema
    )).fetchone())
    print(f"duckdb pair leg: {opair} (join {t_pairs:.1f}s)", flush=True)

    # --- cluster leg: Python-driven min-label fixpoint -----------------
    t0 = time.time()
    con.execute("""
        CREATE TABLE e AS
        SELECT id_a AS u, id_b AS v FROM p
        UNION ALL SELECT id_b, id_a FROM p
    """)
    con.execute("""
        CREATE TABLE lbl AS
        SELECT u AS node, u AS comp FROM (SELECT DISTINCT u FROM e) t
    """)
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
            CREATE OR REPLACE TABLE nxt AS
            SELECT l.node,
                   least(l.comp, coalesce(m.nmin, l.comp)) AS comp
            FROM lbl l
            LEFT JOIN (
              SELECT e.v AS node, min(l2.comp) AS nmin
              FROM e JOIN lbl l2 ON l2.node = e.u
              GROUP BY e.v
            ) m ON m.node = l.node
        """)
        changed = con.execute("""
            SELECT count(*) FROM nxt JOIN lbl USING (node)
            WHERE nxt.comp <> lbl.comp
        """).fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE nxt RENAME TO lbl")
        print(f"  fixpoint round {rounds}: {changed} labels changed", flush=True)
        if changed == 0:
            break
    t_cc = time.time() - t0
    oclu = tuple(con.execute(agg_digest_sql(
        "SELECT 'cluster' AS part, node AS id_a, comp AS id_b, "
        "CAST(NULL AS DOUBLE) AS score FROM lbl", schema
    )).fetchone())
    print(f"duckdb cluster leg: {oclu} ({rounds} rounds, {t_cc:.1f}s)", flush=True)

    # digest terms are sums -> the union digest is the legs' sum
    orow = tuple(a + b for a, b in zip(opair, oclu))
    verdict = "MATCH" if srow == orow else f"MISMATCH spark={srow} oracle={orow}"
    print(f"full entry: {verdict}")
    spark.stop()
    return 0 if srow == orow else 1


if __name__ == "__main__":
    raise SystemExit(main())
