#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate: for each dumped query
result under OUTDIR, run the matching oracle SQL in DuckDB against the same
parquet fixture dir, sort columns by name + rows, and diff values.

Usage: python3 tools/compare.py /tmp/verify_r1 /root/testdata/sf0.01
"""
import json, math, sys
import duckdb
import pyarrow.parquet as pq
import pyarrow.types as pat

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            # -0.0 == 0.0 numerically; DuckDB's round() keeps the sign
            # of a tiny negative where Spark's BigDecimal round drops it
            return "0.0"
        # Shortest round-trip repr: any cross-engine ulp difference shows.
        # (The driver's hash compare is at least this strict — r1 proved
        # %.9g too lenient: it hid sub-integer diffs on 1e9-magnitude
        # doubles in batch_metrics_bucketed / exp1_summary.)
        return repr(v)
    return str(v)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            # Read the Spark dump via pyarrow, NOT DuckDB: DuckDB's
            # read_parquet silently coerces decimal128 -> double, which
            # hid ab_test_welch's decimal output from this replica for a
            # whole round while the driver's repr-hash failed it.
            # pyarrow keeps Decimal as Decimal, so norm() shows the
            # representation difference exactly like the driver does.
            tbl = pq.ParquetDataset(f"{outdir}/{name}").read()
            dec_cols = [f.name for f in tbl.schema if pat.is_decimal(f.type)]
            if dec_cols:
                print(f"WARN {name}: decimal output columns {dec_cols} — "
                      "driver hash will mismatch a DOUBLE oracle even on "
                      "identical values; cast to double/bigint")
            got = tbl.to_pandas()
            exp = con.execute(sql).fetchdf()
            gcols, ecols = sorted(got.columns), sorted(exp.columns)
            if gcols != ecols:
                print(f"FAIL {name}: columns {gcols} != {ecols}")
                n_bad += 1
                continue
            g = [tuple(norm(v) for v in r) for r in
                 got[gcols].itertuples(index=False)]
            e = [tuple(norm(v) for v in r) for r in
                 exp[ecols].itertuples(index=False)]
            g.sort(); e.sort()
            if g == e:
                print(f"OK   {name} ({len(g)} rows)")
                n_ok += 1
            else:
                n_bad += 1
                print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
                diff = [(a, b) for a, b in zip(g, e) if a != b]
                for a, b in diff[:3]:
                    print(f"     spark={a}\n     duck ={b}")
        except Exception as ex:
            n_bad += 1
            print(f"ERR  {name}: {str(ex)[:200]}")
    print(f"\n{n_ok} ok / {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
