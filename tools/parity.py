#!/usr/bin/env python3
"""Dev-side oracle parity checker mimicking the driver's DuckDB compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
Registers each parquet table by name, runs oracle_sql.json queries,
and compares against the Spark-written parquet (column-name-sorted,
row-sorted, stringified values).
"""
import sys, os, json, glob, time
import duckdb

def canon(rel):
    df = rel.df()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    return list(df.columns), rows

def decimal_cols(rel):
    """Columns typed DECIMAL on either side are a hard failure: the driver's
    hasher renders the two sides of a decimal differently when a value has
    trailing-zero cents ('123.40' vs '123.4'), while pandas' str(Decimal) is
    identical on both sides — exactly the divergence that made this script
    validate the round-8 regression the driver rejected. Rule: exact decimal
    inside the plan, double (or integer) out."""
    return [c for c, t in zip(rel.columns, rel.types) if "DECIMAL" in str(t).upper()]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # Big-SF oracles (recursive closures, inverted indexes) balloon past
    # DuckDB's default 80%-of-RAM limit when several run concurrently —
    # cap memory and point spill at the big disk instead of OOMing.
    if os.environ.get("PARITY_MEM_LIMIT"):
        con.sql(f"SET memory_limit='{os.environ['PARITY_MEM_LIMIT']}'")
    if os.environ.get("PARITY_TEMP_DIR"):
        os.makedirs(os.environ["PARITY_TEMP_DIR"], exist_ok=True)
        con.sql(f"SET temp_directory='{os.environ['PARITY_TEMP_DIR']}'")
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(f)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = 0
    keys = sorted(os.listdir(out_dir))
    for name in keys:
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        t0 = time.time()
        got_rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols, got = canon(got_rel)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        exp_rel = con.sql(oracle[name])
        exp_cols, exp = canon(exp_rel)
        dec = sorted(set(decimal_cols(got_rel)) | set(decimal_cols(exp_rel)))
        if dec:
            print(f"[FAIL decimal] {name}: decimal output columns {dec} "
                  f"(driver renders decimals inconsistently; cast the final "
                  f"projection to DOUBLE on both sides)")
        elif got_cols != exp_cols:
            print(f"[FAIL cols] {name}: spark={got_cols} oracle={exp_cols}")
        elif got != exp:
            print(f"[FAIL rows] {name}: spark {len(got)} rows vs oracle {len(exp)}")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"  first diff at row {i}:\n   spark : {g}\n   oracle: {e}")
                    break
            else:
                print(f"  (length mismatch only; spark[0]={got[0] if got else None})")
        else:
            n_ok += 1
            print(f"[ok] {name}: {len(got)} rows ({time.time()-t0:.0f}s)", flush=True)
    print(f"== {n_ok} matched")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
