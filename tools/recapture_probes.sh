#!/bin/bash
# Re-capture the frozen constant oracle of a synthetic scale probe.
#
# The probes listed in CLAUDE.md (x22-x26, x36, x45, x49, x52, x55,
# x60, x68, x70) pin their oracle to constants captured at
# SparkEntry.probeScale = 1.0. If a probe's synthesis or settings
# change, run this to recompute the probe at full scale and print the
# exact constant SELECT to paste into SparkEntry.oracleSql.
#
# Usage: tools/recapture_probes.sh <query_name> [sfDir]
#   e.g. tools/recapture_probes.sh x26_neardup_300k
#
# NEVER run while a Bench/Verify JVM is active (CLAUDE.md: concurrent
# recompiles break running JVMs reading target/classes).
set -e
Q=${1:?usage: tools/recapture_probes.sh <query_name> [sfDir]}
SF=${2:-/root/testdata/sf0.01}
OUT=/tmp/graft_recapture
cd /root/repo
sbt -batch compile > /tmp/sbt_compile.log 2>&1 || { tail -40 /tmp/sbt_compile.log; exit 1; }
rm -rf "$OUT"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# Verify never dials probes (SPARK_GRAFT_PROBES is a Bench knob), so
# this runs the probe at probeScale = 1.0 — the scale the frozen
# constants must be captured at.
java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Verify "$SF" "$OUT" "$Q" 2>/tmp/recapture_err.log \
  || { tail -40 /tmp/recapture_err.log; exit 1; }
python3 - "$OUT" "$Q" <<'EOF'
import sys, duckdb
out, q = sys.argv[1], sys.argv[2]
rows = duckdb.connect().execute(
    f"SELECT * FROM read_parquet('{out}/{q}/*.parquet')").fetchall()
cols = [d[0] for d in duckdb.connect().execute(
    f"SELECT * FROM read_parquet('{out}/{q}/*.parquet') LIMIT 0").description]
if len(rows) != 1:
    print(f"-- {q}: {len(rows)} rows — constant-SELECT capture needs exactly 1; first rows:")
    for r in rows[:5]:
        print("--  ", dict(zip(cols, r)))
    sys.exit(1)
def lit(v):
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return f"'{v}'"
body = ", ".join(f"{lit(v)} AS {c}" for c, v in zip(cols, rows[0]))
print(f'    "{q}" ->')
print(f'      "SELECT {body}",')
EOF
