#!/usr/bin/env python3
"""Replay SparkEntry.oracleSql in DuckDB against the same testdata tables and
compare with the Spark-side parquet dumps (driver t2-gate replica).

Compare semantics (mirrors the driver): columns sorted by name, rows sorted
by all columns; exact value equality (floats compared exactly — rounding
happens inside the queries themselves)."""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0 and math.copysign(1.0, v) < 0:
                    # keep -0.0 DISTINCT from +0.0: the driver hashes bytes,
                    # so a signed-zero divergence must fail locally too
                    v = "-0.0"
            if isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(colnames), sorted(out, key=lambda t: [repr(x) for x in t])


def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    results = {}
    names = sorted(set(oracle) |
                   {n for n in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, n))})
    for name in names:
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            results[name] = "NO_SPARK_OUTPUT"
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        scols, srows = canon(rel.fetchall(), [c for c in rel.columns])
        if name not in oracle:
            results[name] = f"ROWS_ONLY ({len(srows)} rows)"
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = canon(orel.fetchall(), [c for c in orel.columns])
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        # Type audit: the driver's hash is type-sensitive (DuckDB
        # sum(INTEGER) -> HUGEINT vs Spark BIGINT broke source_gini for
        # three rounds despite value-identical rows). Compare the DuckDB
        # type of each oracle column against the DuckDB type of the same
        # column read back from the Spark parquet dump — any drift
        # (HUGEINT, DECIMAL, INTEGER-vs-BIGINT) is a FAIL here even when
        # every value matches.
        stypes = {c: str(t) for c, t in zip(rel.columns, rel.types)}
        otypes = {c: str(t) for c, t in zip(orel.columns, orel.types)}
        tbad = [(c, stypes[c], otypes[c]) for c in sorted(set(stypes) & set(otypes))
                if stypes[c] != otypes[c]]
        if tbad:
            results[name] = ("TYPE_MISMATCH " +
                             "; ".join(f"{c}: spark={s} oracle={o}" for c, s, o in tbad))
        elif scols != ocols:
            results[name] = f"SCHEMA_MISMATCH spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            bad = sum(1 for a, b in zip(srows, orows) if a != b)
            ex = next((a, b) for a, b in zip(srows, orows) if a != b)
            results[name] = f"VALUE_MISMATCH {bad}/{len(srows)} rows; first: spark={ex[0]} oracle={ex[1]}"
        else:
            results[name] = f"OK ({len(srows)} rows)"
    width = max(len(k) for k in results)
    nok = 0
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith("OK") or v.startswith("ROWS_ONLY") else "FAIL"
        if flag == "PASS":
            nok += 1
        print(f"{flag}  {k:<{width}}  {v}")
    print(f"\n{nok}/{len(results)} queries pass")
    return 0 if nok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
