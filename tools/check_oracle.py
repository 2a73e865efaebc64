#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL and compare (row count, schema, value hash).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        # canonical float repr (NaN distinct from NULL)
        if v != v:
            return "NaN"
        return repr(v)
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(want)
        ok_schema = sorted(got_cols) == sorted(want_cols)
        ok_hash = table_hash(got, got_cols) == table_hash(want, want_cols)
        if ok_rows and ok_schema and ok_hash:
            print(f"[ok]   {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: rows {len(got)}/{len(want)} "
                  f"schema_ok={ok_schema} hash_ok={ok_hash}")
            if not ok_schema:
                print(f"       spark={sorted(got_cols)}")
                print(f"       duck ={sorted(want_cols)}")
            if ok_schema and not ok_hash:
                order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
                gs = sorted("|".join(norm_cell(r[i]) for i in order) for r in got)
                ws = sorted("|".join(norm_cell(r[i]) for i in order) for r in want)
                for a, b in list(zip(gs, ws))[:2000]:
                    if a != b:
                        print(f"       spark: {a}")
                        print(f"       duck : {b}")
                        break
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
