#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the
same parquet tables, canonicalizes (columns sorted by name, rows
sorted by all columns, doubles rounded to 1e-9), and compares hashes.
"""
import sys, os, json, hashlib
import duckdb

class ArrayCell(Exception):
    """Raised when a result cell is array-typed. The driver's comparator
    sorts rows with pandas, and numpy.ndarray cells are unhashable there
    (TypeError in sort_values) — so any array-typed output column that
    passes locally would still go red in the driver. Reshape the query to
    scalars (posexplode) or JSON text (to_json) instead."""

def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, (list, tuple, dict)):
                raise ArrayCell(f"column '{colnames[i]}' is array/struct-typed")
            if isinstance(v, float):
                v = round(v, 9)
                if v == 0.0:
                    v = 0.0  # normalize -0.0
            # NOTE: no Decimal->float coercion here — the driver hashes
            # decimals as-is, so local green must mean driver green.
            if hasattr(v, 'isoformat'):
                v = v.isoformat()
            vals.append(repr(v))
        out.append('\x01'.join(vals))
    out.sort()
    return hashlib.sha256('\n'.join(out).encode()).hexdigest(), len(out)

def canon_pandas(df):
    """Second canon mode mimicking the driver's pandas comparator
    (sort_values over all columns + per-dtype string casting). Catches
    representation-level divergence the repr canon can't see — e.g. an
    engine int column that arrives with NULLs becomes float64 in pandas
    and renders '5.0' where the oracle's non-null int64 renders '5'.
    Local PANDIFF predicts driver hash-red even when repr-canon passes."""
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    def cell(x):
        # date vs midnight-timestamp hash EQUAL (calibrated on the
        # driver: q39 emits parquet DATE vs DuckDB datetime64 and is
        # driver-green), while int-vs-float renders DIFFER (t46's
        # HUGEINT->float64 seq_id was driver-red).
        if x is None or (not isinstance(x, (list, tuple, dict)) and pd.isna(x)):
            return 'NULL'
        if hasattr(x, 'isoformat'):
            v = x.isoformat()
            return v[:-9] if v.endswith(('T00:00:00', ' 00:00:00')) else v
        return str(x)
    parts = []
    for c in df.columns:
        s = df[c]
        if s.dtype.kind == 'f':
            s = s.map(lambda x: 'NULL' if pd.isna(x) else repr(round(x, 9) + 0.0))
        else:
            s = s.map(cell)
        parts.append(s.tolist())
    lines = sorted('\x01'.join(str(v) for v in row) for row in zip(*parts)) if parts else []
    return hashlib.sha256('\n'.join(lines).encode()).hexdigest(), len(df)

TOLERATED_DOUBLE_DEVIATION = 0.01  # mirrors the reference's TPC-DS comparator
                                   # (flink-end-to-end-tests/.../TpcdsResultComparator.java:53)

def tolerant_equal(eng_rows, eng_cols, ora_rows, ora_cols):
    """Per-type tolerant compare for the d-battery (TPC-DS methodology):
    numeric cells equal within +-0.01 absolute, everything else exact.
    Protects decimal re-plans from last-digit hash churn without loosening
    any other battery row. Rows are matched after canonical sorting with
    floats coarsened to 2dp (the tolerance granularity), mirroring the
    reference's ordered line-by-line compare on its ORDER BY'd goldens."""
    if len(eng_rows) != len(ora_rows):
        return False, f"row counts differ: engine {len(eng_rows)} oracle {len(ora_rows)}"
    def prep(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        out = []
        for row in rows:
            vals = []
            for i in order:
                v = row[i]
                if hasattr(v, 'isoformat'):
                    v = v.isoformat()
                vals.append(v)
            out.append(vals)
        def key(vals):
            ks = []
            for v in vals:
                if v is None:
                    ks.append((0, ''))
                elif isinstance(v, (int, float)) and not isinstance(v, bool):
                    ks.append((1, f"{round(float(v), 2):+.2f}"))
                else:
                    ks.append((2, str(v)))
            return ks
        return sorted(out, key=key)
    def cell_eq(a, b):
        if a is None or b is None:
            return a is None and b is None
        try:
            fa, fb = float(a), float(b)
            return abs(fa - fb) <= TOLERATED_DOUBLE_DEVIATION
        except (TypeError, ValueError):
            return str(a) == str(b)
    e, o = prep(eng_rows, eng_cols), prep(ora_rows, ora_cols)
    for i, (er, orow) in enumerate(zip(e, o)):
        for ec, oc in zip(er, orow):
            if not cell_eq(ec, oc):
                return False, f"row {i}: engine {str(er)[:150]} vs oracle {str(orow)[:150]}"
    return True, None

def selftest():
    """Guard the guard: an array-typed cell must trip ArrayCell (the
    driver's pandas comparator dies on ndarray cells, so local green on
    an array output would be a false promise), and scalar rows must
    hash stably regardless of row/column order."""
    try:
        canon([(1, [1, 2])], ["a", "b"])
        raise SystemExit("selftest FAIL: array cell did not raise ArrayCell")
    except ArrayCell:
        pass
    h1, _ = canon([(1, "x"), (2, "y")], ["a", "b"])
    h2, _ = canon([("y", 2), ("x", 1)], ["b", "a"])
    assert h1 == h2, "selftest FAIL: canon not order/column invariant"
    ok, _ = tolerant_equal([("a", 1.004)], ["k", "v"], [(0.999, "a")], ["v", "k"])
    assert ok, "selftest FAIL: tolerant_equal rejects in-tolerance numeric"
    ok, _ = tolerant_equal([("a", 1.02)], ["k", "v"], [(1.0, "a")], ["v", "k"])
    assert not ok, "selftest FAIL: tolerant_equal accepts out-of-tolerance numeric"
    ok, _ = tolerant_equal([("a", None)], ["k", "v"], [(1.0, "a")], ["v", "k"])
    assert not ok, "selftest FAIL: tolerant_equal accepts NULL vs number"
    print("selftest OK: ArrayCell guard active, canon order-invariant, tolerant_equal calibrated")
    raise SystemExit(0)

def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
    # Absence itself must be RED (rounds 7 and 9 both shipped silently-
    # vanished rows): iterate the DECLARED battery (written by Verify as
    # _declared.json), not just the oracle keys, and surface Verify-side
    # exceptions from _errors.json with their message.
    errors = {}
    err_path = os.path.join(out_dir, '_errors.json')
    if os.path.exists(err_path):
        errors = json.load(open(err_path))
    declared = sorted(oracle)
    decl_path = os.path.join(out_dir, '_declared.json')
    if os.path.exists(decl_path):
        declared = sorted(set(json.load(open(decl_path))) | set(oracle))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name in declared:
        if only and name not in only:
            continue
        qdir = os.path.join(out_dir, name)
        if name in errors:
            print(f"ENGERR   {name}: {errors[name][:300]}")
            n_fail += 1
            continue
        if not os.path.isdir(qdir):
            print(f"MISSING  {name} (no engine output, no error entry)")
            n_fail += 1
            continue
        if name not in oracle:
            # non-SQL-expressible op: rows-only check, mirror the driver
            try:
                cnt = con.execute(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            except Exception as e:
                print(f"ERROR    {name}: {e}")
                n_fail += 1
                continue
            if cnt > 0:
                print(f"ROWSONLY {name} ({cnt} rows, no oracle)")
                n_pass += 1
            else:
                print(f"EMPTY    {name} (rows-only check, 0 rows)")
                n_fail += 1
            continue
        try:
            eng = con.execute(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            eng_cols = [d[0] for d in eng.description]
            eng_rows = eng.fetchall()
            ora = con.execute(oracle[name])
            ora_cols = [d[0] for d in ora.description]
            ora_rows = ora.fetchall()
        except Exception as e:
            # Distinguish a vanished oracle side table (harness problem —
            # the staged /tmp input is gone, nothing about the engine was
            # tested) from a genuine oracle/engine error. Still red, but
            # named so a red ORASTAGE row is read as "re-run the battery",
            # not "the operator is wrong" (r11's n54).
            msg = str(e)
            if 'No files found' in msg and '/tmp/graft_oracle' in msg:
                print(f"ORASTAGE {name}: oracle side-table input missing (harness, retryable — engine untested): {msg[:200]}")
            else:
                print(f"ERROR    {name}: {e}")
            n_fail += 1
            continue
        if sorted(eng_cols) != sorted(ora_cols):
            print(f"SCHEMA   {name}: engine={sorted(eng_cols)} oracle={sorted(ora_cols)}")
            n_fail += 1
            continue
        try:
            h1, c1 = canon(eng_rows, eng_cols)
            h2, c2 = canon(ora_rows, ora_cols)
        except ArrayCell as e:
            print(f"ARRAYCOL {name}: {e} — driver comparator would ERROR; emit scalars or to_json")
            n_fail += 1
            continue
        if h1 == h2:
            # repr canon green — also run the pandas-mimic canon so a
            # dtype/representation divergence (the t46 class of driver
            # red) is caught locally. Exceptions here are advisory only.
            pdiff = None
            try:
                import pandas as pd
                edf = pd.read_parquet(qdir)
                odf = con.execute(oracle[name]).df()
                p1, _ = canon_pandas(edf)
                p2, _ = canon_pandas(odf)
                if p1 != p2:
                    pdiff = "pandas-canon hashes differ"
            except Exception as e:
                print(f"  (pandas-canon skipped for {name}: {e})")
            if pdiff:
                print(f"PANDIFF  {name}: {pdiff} — driver comparator would likely red this")
                n_fail += 1
            else:
                print(f"PASS     {name} ({c1} rows)")
                n_pass += 1
        elif name.startswith("d") and name[1:3].isdigit():
            # d-battery only: exact hash missed — apply the TPC-DS-style
            # tolerant compare before redding (last-digit decimal churn
            # from a re-plan is not a correctness failure there).
            ok, why = tolerant_equal(eng_rows, eng_cols, ora_rows, ora_cols)
            if ok:
                print(f"TOLPASS  {name} ({c1} rows; within +-{TOLERATED_DOUBLE_DEVIATION} numeric tolerance, exact hash differs)")
                n_pass += 1
            else:
                print(f"TOLDIFF  {name}: {why}")
                n_fail += 1
        else:
            print(f"HASHDIFF {name}: engine {c1} rows, oracle {c2} rows")
            # show first diffs
            s1 = set(['|'.join(map(repr, r)) for r in eng_rows])
            s2 = set(['|'.join(map(repr, r)) for r in ora_rows])
            for x in list(s1 - s2)[:3]:
                print(f"  engine-only: {x[:300]}")
            for x in list(s2 - s1)[:3]:
                print(f"  oracle-only: {x[:300]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
