#!/usr/bin/env python3
"""Cross-validate graft's Substrait producer/consumer against independent
engines, with truthful scope (what each engine can actually run):

  1. q_substrait_join  — executed under Acero (pyarrow.substrait.run_query)
     and compared row-for-row with DuckDB running the SQL twin. The plan's
     predicate is a FilterRel above the join (NOT JoinRel.post_join_filter,
     which Acero silently drops), so the check is exact.
  2. q_substrait_union — SetRel UNION_ALL: executed under Acero and
     compared row-for-row with DuckDB.
  3. q_substrait_exec  — the aggregate plan. Acero has NO `modulus` kernel,
     so this plan cannot execute there; the check pins that Acero rejects
     it for exactly (and only) that missing function — i.e. the wire bytes,
     extension URIs/anchors and relation layout all parse in an independent
     consumer; execution stops at kernel lookup. Result equivalence for
     this plan is covered by the driver's DuckDB oracle (CORRECTNESS gate,
     q_substrait_exec) via graft's own decoder instead.
  4. q_substrait_window — Acero has no window-function expression support
     at all; the check pins that its rejection names the window construct
     (the bytes still parse as a plan). Result equivalence rides the
     DuckDB oracle (q_substrait_window).
  5. q_substrait_grouping_sets — Acero rejects AggregateRel with more than
     one grouping ("Grouping sets not supported"); the check pins that
     exact rejection (the bytes parse — including Cast.failure_behavior,
     which Acero validates and the producer now writes). Result
     equivalence rides the DuckDB oracle (q_substrait_grouping_sets).
  6. q_substrait_in_subquery — Acero has no subquery-expression
     conversion; the check pins that its rejection prints the subquery
     construct (bytes parse). Result equivalence rides the DuckDB oracle
     (q_substrait_in_subquery).

Usage:
  sbt "runMain graft.substrait.SubstraitPlanDump target/substrait-plans"
  python3 scripts/check_substrait.py /root/testdata/sf0.001 target/substrait-plans
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.substrait as ps

SQL_TWINS = {
    "q_substrait_join": """
        SELECT o_orderkey, c_mktsegment, o_totalprice AS price
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE o_totalprice > 100000.0
        ORDER BY o_orderkey LIMIT 50""",
    "q_substrait_union": """
        SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, o_totalprice AS price FROM orders WHERE o_totalprice < 2000.0
        ORDER BY o_orderkey""",
}


def main(sf_dir: str, plan_dir: str) -> int:
    tables = {t: pq.read_table(f"{sf_dir}/{t}.parquet") for t in ("orders", "customer")}

    def provider(names, schema):
        # Acero hands back the plan's base_schema; serve exactly those
        # columns with the declared types (the producer narrows/casts)
        t = tables[".".join(names)]
        return pa.table([t.column(f.name).cast(f.type) for f in schema], schema=schema)

    con = duckdb.connect()
    for t, tab in tables.items():
        con.register(t, tab)

    failures = 0

    # --- Acero-runnable plans: exact row comparison with DuckDB ---
    for name, sql in SQL_TWINS.items():
        plan = open(f"{plan_dir}/{name}.plan", "rb").read()
        acero = ps.run_query(pa.py_buffer(plan), table_provider=provider).read_all()
        duck = con.execute(sql).fetch_arrow_table()
        a = [tuple(row.values()) for row in acero.to_pylist()]
        d = [tuple(row.values()) for row in duck.to_pylist()]
        if acero.schema.names != duck.schema.names:
            print(f"FAIL {name}: column names {acero.schema.names} != {duck.schema.names}")
            failures += 1
        elif a != d:
            print(f"FAIL {name}: {len(a)} acero rows != {len(d)} duckdb rows (or order/values differ)")
            failures += 1
        else:
            print(f"OK   {name}: acero == duckdb ({len(a)} rows, cols {acero.schema.names})")

    # --- the aggregate plan: pin Acero's rejection to the missing kernel ---
    plan = open(f"{plan_dir}/q_substrait_exec.plan", "rb").read()
    try:
        ps.run_query(pa.py_buffer(plan), table_provider=provider).read_all()
        print("FAIL q_substrait_exec: unexpectedly ran under Acero — tighten this check "
              "to a full row comparison")
        failures += 1
    except pa.lib.ArrowNotImplementedError as e:
        msg = str(e)
        if "functions_arithmetic.yaml#modulus" in msg:
            print("OK   q_substrait_exec: bytes parse under Acero; rejected only for the "
                  "missing `modulus` kernel (result equivalence covered by the DuckDB "
                  "oracle via graft's decoder)")
        else:
            print(f"FAIL q_substrait_exec: rejected for an unexpected reason: {msg[:200]}")
            failures += 1
    except Exception as e:  # parse errors etc. would mean the bytes are NOT valid substrait
        print(f"FAIL q_substrait_exec: {type(e).__name__}: {str(e)[:200]}")
        failures += 1

    # --- the window plan: pin Acero's rejection to the window construct ---
    plan = open(f"{plan_dir}/q_substrait_window.plan", "rb").read()
    try:
        ps.run_query(pa.py_buffer(plan), table_provider=provider).read_all()
        print("FAIL q_substrait_window: unexpectedly ran under Acero — tighten this "
              "check to a full row comparison")
        failures += 1
    except Exception as e:
        msg = str(e).lower()
        if "window" in msg:
            print("OK   q_substrait_window: bytes parse under Acero; rejected on the "
                  "window-function expression it does not support (result equivalence "
                  "covered by the DuckDB oracle via graft's decoder)")
        else:
            print(f"FAIL q_substrait_window: rejected without naming the window "
                  f"construct: {type(e).__name__}: {str(e)[:200]}")
            failures += 1

    # --- the grouping-sets plan: pin Acero's multi-grouping rejection ---
    plan = open(f"{plan_dir}/q_substrait_grouping_sets.plan", "rb").read()
    try:
        ps.run_query(pa.py_buffer(plan), table_provider=provider).read_all()
        print("FAIL q_substrait_grouping_sets: unexpectedly ran under Acero — tighten "
              "this check to a full row comparison")
        failures += 1
    except Exception as e:
        msg = str(e)
        if "Grouping sets not supported" in msg:
            print("OK   q_substrait_grouping_sets: bytes parse under Acero (incl. cast "
                  "failure_behavior); rejected on the multi-grouping AggregateRel it "
                  "does not support (result equivalence covered by the DuckDB oracle)")
        else:
            print(f"FAIL q_substrait_grouping_sets: rejected for an unexpected reason: "
                  f"{type(e).__name__}: {msg[:200]}")
            failures += 1

    # --- the IN-subquery plan: pin Acero's subquery-expression rejection ---
    plan = open(f"{plan_dir}/q_substrait_in_subquery.plan", "rb").read()
    try:
        ps.run_query(pa.py_buffer(plan), table_provider=provider).read_all()
        print("FAIL q_substrait_in_subquery: unexpectedly ran under Acero — tighten "
              "this check to a full row comparison")
        failures += 1
    except Exception as e:
        msg = str(e)
        if "subquery" in msg and "in_predicate" in msg:
            print("OK   q_substrait_in_subquery: bytes parse under Acero; rejected on "
                  "the subquery expression it cannot convert (result equivalence "
                  "covered by the DuckDB oracle)")
        else:
            print(f"FAIL q_substrait_in_subquery: rejected for an unexpected reason: "
                  f"{type(e).__name__}: {msg[:200]}")
            failures += 1

    print(f"{'PASS' if failures == 0 else 'FAIL'}: {6 - failures}/6 substrait cross-checks green")
    return 1 if failures else 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
