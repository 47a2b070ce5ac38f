#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage:
  python3 scripts/check.py <verify_out_dir> <sf_dir> [--strict]
      [--baseline CORRECTNESS_rN.json]
  python3 scripts/check.py --diff <prev_round.json> <curr_round.json>

Reads each <out>/<name> parquet (Spark result) and oracle_sql.json,
runs the oracle SQL in DuckDB over the sf_dir parquet tables, and
compares: columns sorted by name, rows sorted, values normalized.

--baseline: regression tripwire — any query that FULL-PASSED the given
  driver round but is not green in this local run (or vanished) fails
  the check loudly. Run it before every end-of-round snapshot.
--diff: offline tripwire over two driver CORRECTNESS jsons — exits 1
  on any pass→non-pass transition (this is what would have caught the
  r4 f3_cast/j4_asof_join regressions against r3 before snapshot).
--strict: additionally rejects DECIMAL compared columns and TZ-AWARE
  timestamp columns in the Spark outputs. The tz check exists because
  a UTC session renders micros-UTC and int96 timestamps identically
  by VALUE, so the local value compare stays green while the driver's
  schema hash diverges — exactly the r4 outputTimestampType race.
Dev-only tool — not part of the Scala library.
"""
import sys, os, json, glob, math, datetime, decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # compare at declared scale — the driver does NOT normalize()
        # away trailing zeros, and r3 proved decimal client conversion
        # itself is version-sensitive; keep the replica at least as
        # strict as the strictest plausible driver
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


# Queries allowed to emit DECIMAL-typed output under --strict (the
# diag probe exists precisely to carry the fragile shape).
STRICT_DECIMAL_ALLOW = {"diag1_decimal_sum"}


def decimal_cols(cols, rows):
    hit = set()
    for r in rows[:100]:
        for c, v in zip(cols, r):
            if isinstance(v, decimal.Decimal):
                hit.add(c)
    return sorted(hit)


def full_pass(rec):
    return bool(rec.get("rows_match") and rec.get("schema_match")
                and rec.get("hash_match"))


def diff_rounds(prev_path, curr_path):
    """Pass→non-pass transitions between two driver CORRECTNESS jsons."""
    with open(prev_path) as f:
        prev = json.load(f)
    with open(curr_path) as f:
        curr = json.load(f)
    regressed = []
    for name, rec in sorted(prev.items()):
        was_rows_only = rec.get("err") == "no_oracle" and \
            (rec.get("spark_rows") or 0) > 0
        if full_pass(rec):
            now = curr.get(name)
            if now is None:
                regressed.append((name, "pass -> MISSING"))
            elif not full_pass(now):
                why = "err=%s rows=%s schema=%s hash=%s" % (
                    now.get("err"), now.get("rows_match"),
                    now.get("schema_match"), now.get("hash_match"))
                regressed.append((name, f"pass -> FAIL ({why})"))
        elif was_rows_only:
            now = curr.get(name)
            if now is None:
                regressed.append((name, "rows-only -> MISSING"))
            elif now.get("err") == "no_oracle" and \
                    (now.get("spark_rows") or 0) == 0:
                regressed.append((name, "rows-only -> EMPTY"))
    for name, why in regressed:
        print(f"REGRESSION {name}: {why}")
    print(f"\n--diff: {len(regressed)} regression(s), "
          f"{len(prev)} -> {len(curr)} queries")
    sys.exit(1 if regressed else 0)


def tz_aware_cols(spark_path):
    """Compared columns whose parquet type is a tz-aware timestamp."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
    except ImportError:
        return []
    hit = []
    for f in sorted(glob.glob(os.path.join(spark_path, "*.parquet")))[:1]:
        sch = pq.ParquetFile(f).schema_arrow
        for field in sch:
            if pa.types.is_timestamp(field.type) and field.type.tz:
                hit.append(field.name)
    return hit


def main():
    if "--diff" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--diff"]
        diff_rounds(args[0], args[1])
        return
    strict = "--strict" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    baseline = None
    if "--baseline" in sys.argv:
        bi = sys.argv.index("--baseline")
        with open(sys.argv[bi + 1]) as f:
            baseline = json.load(f)
        args = [a for a in args if a != sys.argv[bi + 1]]
    out_dir, sf_dir = args[0], args[1]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    # Verify-side execution errors (r6+: Verify dumps errors.json so an
    # erroring query surfaces as `err` instead of a silently missing key)
    errors = {}
    err_path = os.path.join(out_dir, "errors.json")
    if os.path.exists(err_path):
        with open(err_path) as f:
            errors = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracles):
        spark_path = os.path.join(out_dir, name)
        # errors.json is AUTHORITATIVE for this run: a query that errored
        # now but dumped successfully into a reused outDir on a prior run
        # must report err, not PASS against the stale output
        if name in errors:
            print(f"FAIL {name}: {errors[name]}")
            n_fail += 1
            results[name] = "err"
            continue
        if not glob.glob(os.path.join(spark_path, "*.parquet")):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            results[name] = "no-output"
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')")
            scols = [d[0] for d in sdf.description]
            srows = sdf.fetchall()
            odf = con.execute(oracles[name])
            ocols = [d[0] for d in odf.description]
            orows = odf.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            results[name] = "error"
            continue
        if strict and name not in STRICT_DECIMAL_ALLOW:
            frag = sorted(set(decimal_cols(scols, srows) +
                              decimal_cols(ocols, orows)))
            if frag:
                # r3: decimal-typed compared columns hash-fail on the
                # driver even when the local replica matches bit-exact
                print(f"FAIL {name}: strict: DECIMAL output cols {frag}")
                n_fail += 1
                results[name] = "strict-decimal"
                continue
        if strict:
            tz = tz_aware_cols(spark_path)
            if tz:
                # r4: micros-UTC timestamps leak tz-awareness into the
                # driver's schema hash; values compare equal under UTC
                print(f"FAIL {name}: strict: TZ-AWARE timestamp cols {tz}")
                n_fail += 1
                results[name] = "strict-tz"
                continue
        sc, sr = canon(scols, srows)
        oc, orr = canon(ocols, orows)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            print(f"FAIL {name}: columns {sc} vs {oc}")
            n_fail += 1
            results[name] = "cols"
        elif sr != orr:
            n_fail += 1
            results[name] = "rows"
            diff = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
            msg = f"rows {len(sr)} vs {len(orr)}"
            if diff:
                i = diff[0]
                msg += f"; first diff @{i}: spark={sr[i]} oracle={orr[i]}"
            elif len(sr) != len(orr):
                long, short = (sr, orr) if len(sr) > len(orr) else (orr, sr)
                extra = [r for r in long if r not in short][:2]
                msg += f"; extra rows: {extra}"
            print(f"FAIL {name}: {msg}")
        else:
            n_pass += 1
            results[name] = "ok"
            print(f"PASS {name} ({len(sr)} rows)")
    # rows-only queries (declared but no oracle)
    for p in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(p)
        if os.path.isdir(p) and name not in oracles:
            try:
                n = con.execute(
                    f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                status = "rows-only OK" if n > 0 else "rows-only EMPTY"
                results[name] = "rows-only" if n > 0 else "rows-only-empty"
                print(f"{status} {name} ({n} rows)")
            except Exception as e:
                print(f"rows-only FAIL {name}: {e}")
                results[name] = "rows-only-error"
    n_reg = 0
    if baseline is not None:
        # regression tripwire: every query green on the previous
        # driver round must still be green here, under the same check
        # class (oracle full-pass stays "ok"; rows-only stays nonempty)
        for name, rec in sorted(baseline.items()):
            now = results.get(name)
            if full_pass(rec) and now != "ok":
                print(f"REGRESSION {name}: driver pass -> local {now}")
                n_reg += 1
            elif rec.get("err") == "no_oracle" and \
                    (rec.get("spark_rows") or 0) > 0 and \
                    now not in ("rows-only", "ok"):
                print(f"REGRESSION {name}: driver rows-only -> local {now}")
                n_reg += 1
        print(f"baseline tripwire: {n_reg} regression(s) vs previous round")
    print(f"\n{n_pass} pass / {n_fail} fail of {len(oracles)} oracle-checked")
    sys.exit(1 if (n_fail or n_reg) else 0)


if __name__ == "__main__":
    main()
