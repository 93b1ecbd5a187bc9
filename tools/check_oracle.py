#!/usr/bin/env python3
"""Local pre-check that emulates the driver's DuckDB-oracle compare.

Usage:
  python3 tools/check_oracle.py [sfDir] [verifyOut]

Assumes `sbt "runMain graft.Verify <sfDir> <verifyOut>"` already ran.
For each query: loads <verifyOut>/<name>/*.parquet (Spark result) and runs
the oracle SQL from oracle_sql.json in DuckDB with each table registered as
a view over <sfDir>/<table>.parquet. Sorts columns by name, sorts rows,
compares cell-by-cell (exact; reports first diffs).

Dev-tool only — never shipped in the engine (driver-side python env).

Oracle-authoring gotcha (r07 ts_holt_forecast): DuckDB evaluates a
struct-typed lambda result FIELD-SEQUENTIALLY against an accumulator
mutated in place — inside list_reduce, a later field's expression reading
an earlier field of `a` sees the already-updated value. Never carry
recursion state in a struct; use a list (array) accumulator instead.
"""
import sys, json, glob, math

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # NOTE: no int widening here — the dtype gate below must see the
        # raw integer widths (a Spark int32 vs oracle int64 changes the
        # driver-side typed hash and has to fail locally too)
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def canon_type(t: pa.DataType) -> str:
    """Canonical physical-type string emulating the driver's typed hash.

    Decimal stays distinct from floating (the a11 r6 regression: Spark SQL
    typed a literal-100.0 division DECIMAL(27,6) while the oracle returned
    DOUBLE — pandas coerced both to float64 so the value compare passed
    locally but the driver's typed hash failed). Date folds into
    timestamp: r06 shows the driver passing date-vs-midnight-timestamp
    pairs (a4_grouped_max_grain et al.), so flagging them here would be
    stricter than the gate being emulated. Timestamp unit/tz and string
    width variants are normalized away since norm() already casts them
    before the value compare.
    """
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "timestamp"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon_type(t.value_type)}>"
    return str(t)


def schema_types(schema: pa.Schema) -> dict:
    return {f.name: canon_type(f.type) for f in schema}


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    # dtype-strict: an int and a float never hash the same driver-side,
    # even when numerically equal (e.g. 99111 vs 99111.0).
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    return a == b


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # mirror Verify's SPARK_GRAFT_VERIFY_ONLY: when the dump was filtered,
    # silently skip the undumped queries instead of reporting them failed
    only = {q.strip() for q in
            __import__("os").environ.get("SPARK_GRAFT_VERIFY_ONLY", "")
            .split(",") if q.strip()}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(duckdb.sql(
                f"SELECT * FROM read_parquet({files!r})").df())
            exp_tbl = con.sql(sql).arrow()
            # date_as_object=False keeps DATE columns datetime64 (what
            # duckdb's own .df() produced before the arrow detour), so
            # the pandas dtype gate below sees the same shapes as r06
            exp = norm(exp_tbl.to_pandas(date_as_object=False))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} "
                  f"oracle={list(exp.columns)}")
            n_fail += 1
            continue
        # physical-schema gate: compare the parquet footer's arrow types
        # against the oracle's arrow types BEFORE pandas coerces them —
        # decimal128 vs double both land in float64 downstream and would
        # pass the value compare while failing the driver's typed hash.
        # Exception, matching observed driver behavior (s4/j4 green in r06
        # with a DECIMAL-typed oracle literal vs Spark DOUBLE, while a11's
        # decimal-typed SPARK column failed): a decimal-vs-float pair
        # passes IFF every value's canonical string form agrees — i.e.
        # Decimal('19700000.0') vs 19700000.0 passes, Decimal('97.880000')
        # vs 97.88 fails.
        got_types = schema_types(pq.read_schema(files[0]))
        exp_types = schema_types(exp_tbl.schema)
        hard, soft = [], []
        for c in sorted(exp_types):
            gt, et = got_types.get(c), exp_types.get(c)
            if gt == et:
                continue
            kinds = {str(gt).split("(")[0], str(et).split("(")[0]}
            if kinds in ({"decimal", "double"}, {"decimal", "float"}):
                soft.append(c)
            else:
                hard.append((c, gt, et))
        if hard:
            print(f"FAIL {name}: physical type mismatch {hard}")
            n_fail += 1
            continue
        soft_bad = []
        for c in soft:
            # canonical string forms must come from duckdb VARCHAR casts
            # (pandas would coerce the decimal side to float first and
            # erase exactly the difference being adjudicated); sorted
            # multiset compare — row alignment is the main loop's job
            gs = [r[0] for r in duckdb.sql(
                f'SELECT CAST("{c}" AS VARCHAR) '
                f"FROM read_parquet({files!r}) ORDER BY 1").fetchall()]
            es = [r[0] for r in con.sql(
                f'SELECT CAST("{c}" AS VARCHAR) FROM ({sql}) ORDER BY 1'
            ).fetchall()]
            if gs != es:
                soft_bad.append((c, got_types.get(c), exp_types.get(c),
                                 next(((a, b) for a, b in zip(gs, es)
                                       if a != b), ("len", "diff"))))
            # drop from the pandas-side compare either way: the dtype gate
            # would re-flag float64-vs-object for a pair already adjudicated
            got = got.drop(columns=[c])
            exp = exp.drop(columns=[c])
        if soft_bad:
            print(f"FAIL {name}: decimal/double string mismatch {soft_bad}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        # dtype-strict: the driver hash is computed over typed values, so a
        # HUGEINT/DOUBLE oracle column vs a Spark BIGINT column must fail
        # here even if every cell compares numerically equal.
        dt_diffs = [(c, str(got[c].dtype), str(exp[c].dtype))
                    for c in got.columns
                    if str(got[c].dtype) != str(exp[c].dtype)]
        if dt_diffs:
            print(f"FAIL {name}: dtype mismatch {dt_diffs}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            ga, ea = got[c].values, exp[c].values
            for i in range(len(ga)):
                if not cells_equal(ga[i], ea[i]):
                    diffs.append((c, i, ga[i], ea[i]))
                    if len(diffs) >= 3:
                        break
            if len(diffs) >= 3:
                break
        if diffs:
            print(f"FAIL {name}: {len(diffs)}+ cell diffs, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
