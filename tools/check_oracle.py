#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run after `sbt "runMain
graft.Verify <sfDir> <outDir>"`. Loads each <outDir>/<name> parquet (Spark
result), runs the matching oracle SQL from oracle_sql.json in DuckDB over
the same sf tables, and compares schema + values (rows sorted, columns
sorted by name). Exit nonzero on any mismatch."""
import sys, json, glob, os, math, struct
import duckdb


def canon(v):
    """Bit-level canonical form matching the driver's value-hash gate:
    floats compare by IEEE-754 bytes (so -0.0 != +0.0, unlike Python's
    ==), with NaN collapsed to one canonical payload."""
    if isinstance(v, float):
        if math.isnan(v):
            v = float("nan")
        return struct.pack("<d", v)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def canon_rows(rows):
    return [tuple(canon(v) for v in r) for r in rows]

if sys.argv[1:] == ["--selftest"]:
    # signed-zero regression (round-9 q146): Python == is blind to it
    assert (-0.0,) == (0.0,)
    assert canon_rows([(-0.0,)]) != canon_rows([(0.0,)])
    assert canon_rows([(0.5, "a")]) == canon_rows([(0.5, "a")])
    assert canon_rows([(float("nan"),)]) == canon_rows([(float("nan"),)])
    assert canon_rows([([1.0, -0.0],)]) != canon_rows([([1.0, 0.0],)])
    assert canon_rows([(None, 3)]) == canon_rows([(None, 3)])
    print("selftest ok")
    sys.exit(0)

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fail = ok = weak = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
    if name not in oracle:
        n = len(spark_rel.fetchall())
        print(f"[weak] {name}: no oracle, rows={n}")
        weak += 1
        continue
    duck_rel = con.sql(oracle[name])
    sc = sorted(zip(spark_rel.columns, map(str, spark_rel.types)))
    dc = sorted(zip(duck_rel.columns, map(str, duck_rel.types)))
    schema_ok = [c for c, _ in sc] == [c for c, _ in dc]
    types_ok = sc == dc
    cols = ", ".join(f'"{c}"' for c, _ in sc)
    sv = con.sql(f"SELECT {cols} FROM spark_rel ORDER BY ALL").fetchall()
    dv = con.sql(f"SELECT {cols} FROM duck_rel ORDER BY ALL").fetchall() if schema_ok else None
    if schema_ok and canon_rows(sv) == canon_rows(dv):
        t = "" if types_ok else f" [type-diff {sc} vs {dc}]"
        print(f"[ok]   {name}: rows={len(sv)}{t}")
        ok += 1
    else:
        fail += 1
        print(f"[FAIL] {name}: schema_ok={schema_ok}")
        if not schema_ok:
            print(f"   spark cols: {sc}\n   duck  cols: {dc}")
        else:
            print(f"   rows spark={len(sv)} duck={len(dv)}")
            for i, (a, b) in enumerate(zip(sv, dv)):
                if tuple(canon(v) for v in a) != tuple(canon(v) for v in b):
                    print(f"   first diff at sorted row {i}:\n    spark: {a}\n    duck : {b}")
                    break
print(f"\n{ok} ok, {weak} weak (no oracle), {fail} FAIL")
sys.exit(1 if fail else 0)
