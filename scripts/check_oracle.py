#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare Spark parquet
outputs (written by graft.Verify) against DuckDB runs of oracle_sql.json
over the same source tables. Row multisets must match exactly (values
compared after per-column name sort, like the driver's hash)."""
import sys, os, json, glob
import duckdb

def canon(v):
    # Normalize value for comparison the way a hash of printed values would.
    if isinstance(v, float):
        return repr(v)  # exact double repr — we expect bit-identical doubles
    return repr(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {spark_rel.shape[0]} rows")
            n_skip += 1
            continue
        try:
            oracle_rel = con.sql(oracles[name])
        except Exception as e:
            print(f"ORACLE-SQL-ERROR {name}: {e}")
            n_fail += 1
            continue
        scols = sorted(spark_rel.columns)
        ocols = sorted(oracle_rel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"SCHEMA-MISMATCH {name}: spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        # Go through pandas like the driver does: this surfaces driver-only
        # failure modes — array cells are unhashable in sort_values, and
        # DuckDB HUGEINT (int128, e.g. SUM of ints) widens to float64.
        try:
            sdf = spark_rel.select(*scols).df()
            odf = oracle_rel.select(*ocols).df()
            sdf.sort_values(by=list(sdf.columns))
            odf.sort_values(by=list(odf.columns))
            srows = list(sdf.itertuples(index=False, name=None))
            orows = list(odf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"PANDAS-COMPARE-ERROR {name}: {e}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"ROWCOUNT-MISMATCH {name}: spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        smulti = sorted(tuple(canon(v) for v in r) for r in srows)
        omulti = sorted(tuple(canon(v) for v in r) for r in orows)
        if smulti != omulti:
            diffs = [(a, b) for a, b in zip(smulti, omulti) if a != b]
            print(f"VALUE-MISMATCH {name}: {len(diffs)} differing rows; first: ")
            print(f"  spark:  {diffs[0][0]}")
            print(f"  oracle: {diffs[0][1]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
