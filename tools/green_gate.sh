#!/usr/bin/env bash
# Pre-snapshot green gate (VERDICT r10 item 2): round 10 ended with a
# red ScaleDesignSpec because plan-pin edits were committed without a
# full-suite run. This script is the LAST command of every round's
# work: it runs the full suite and exits non-zero (loudly) on any
# failure, so a snapshot on red is a deliberate act, never an
# accident.
#
# Default legs beyond the suite: the jar smoke, the sf0.1 oracle
# replay (VERDICT r15 item 7: rounds 9/13 caught real defects only
# because someone remembered to run it — it is now default with a
# skip flag, not an opt-in), the publishLocal+consumer build
# (VERDICT r15 item 5), and the generated COUNTS.json artifact
# (VERDICT r15 item 8).
#
# Optional legs:
#   --skip-oracle           skip the sf0.1 oracle replay (NOT the jar
#                           smoke) — for a quick suite-only gate run;
#                           the round's closing run must not pass this.
#   --with-oracle [sfDir]   override the oracle leg's scale dir
#                           (default /root/testdata/sf0.1).
#   --with-baseline         run the min-of-6 BaselineBench head-to-head
#                           and print the two ratios, so BASELINE.md
#                           gets a fresh row every round instead of
#                           going stale.
#   --with-stream           run graft.StreamBench (per-streaming-query
#                           rows/sec + state size from
#                           StreamingQueryProgress) and auto-append the
#                           band table to BASELINE.md (VERDICT r13
#                           item 5).
#   --with-sf1              the once-per-round DECADE gate (VERDICT r13
#                           items 1+8): synthesize /tmp/testdata/sf1 if
#                           absent (tools/make_sf1.py), run graft.Verify
#                           there, then the CAPPED DuckDB replay
#                           (oracle_check.py --sf1), and auto-append the
#                           record to BASELINE.md. Long (~1-2 h) — run
#                           it detached (setsid nohup) when interactive.
# Usage:  bash tools/green_gate.sh [--skip-oracle] [--with-oracle [sfDir]] [--with-baseline] [--with-stream] [--with-sf1]
set -uo pipefail
cd "$(dirname "$0")/.."

WITH_ORACLE=1
WITH_BASELINE=0
WITH_STREAM=0
WITH_SF1=0
SF_DIR=/root/testdata/sf0.1
while [ $# -gt 0 ]; do
  case "$1" in
    --skip-oracle) WITH_ORACLE=0 ;;
    --with-oracle)
      WITH_ORACLE=1
      if [ $# -gt 1 ] && [ -d "$2" ]; then SF_DIR="$2"; shift; fi ;;
    --with-baseline) WITH_BASELINE=1 ;;
    --with-stream) WITH_STREAM=1 ;;
    --with-sf1) WITH_SF1=1 ;;
    *) echo "[green_gate] unknown arg: $1"; exit 2 ;;
  esac
  shift
done

echo "[green_gate] running full sbt test suite..."
if sbt -batch test > /tmp/green_gate.log 2>&1; then
  tail -5 /tmp/green_gate.log
  echo "[green_gate] suite GREEN."
else
  echo "[green_gate] *** SUITE IS RED — do NOT snapshot. Failures:"
  grep -E "\*\*\* FAILED|TESTS FAILED|error\]" /tmp/green_gate.log | tail -30
  exit 1
fi

# Deployable-artifact leg (VERDICT r14 item 7): the engine is a
# LIBRARY — prove the thin jar runs outside sbt's classpath. sbt
# package, then spark-submit --class graft.Verify against sf0.001 on
# three representative queries, oracle-compared. ~40 s.
echo "[green_gate] jar leg: sbt package + spark-submit smoke..."
if ! sbt -batch package > /tmp/green_gate_jar.log 2>&1; then
  echo "[green_gate] *** sbt package FAILED:"; tail -10 /tmp/green_gate_jar.log
  exit 1
fi
# publishLocal (the consumer leg) also drops -javadoc/-sources jars
# into target — exclude every classifier, not just tests
JAR=$(ls target/scala-2.13/timeseriesspark_*.jar | grep -vE 'javadoc|sources|tests' | head -1)
JAR_OUT=$(mktemp -d /tmp/green_gate_jarout.XXXXXX)
JAR_QS=q20_tpch_q1,q01_assoc_datasource,q31_dedup_minhash
if ! SPARK_LOCAL_IP=127.0.0.1 /opt/spark/bin/spark-submit --class graft.Verify \
    --master 'local[8]' --driver-memory 8g "$JAR" \
    /root/testdata/sf0.001 "$JAR_OUT" "$JAR_QS" \
    >> /tmp/green_gate_jar.log 2>&1; then
  echo "[green_gate] *** spark-submit smoke FAILED:"; tail -15 /tmp/green_gate_jar.log
  exit 1
fi
if python3 tools/oracle_check.py /root/testdata/sf0.001 "$JAR_OUT" "$JAR_QS" \
    > /tmp/green_gate_jar_oracle.log 2>&1 \
    && [ "$(grep -c ': MATCH' /tmp/green_gate_jar_oracle.log)" = 3 ]; then
  echo "[green_gate] jar leg GREEN: $JAR runs under spark-submit, 3/3 MATCH."
else
  echo "[green_gate] *** JAR SMOKE ORACLE RED:"; cat /tmp/green_gate_jar_oracle.log
  exit 1
fi

# Consumer leg (VERDICT r15 item 5): the jar smoke proves
# spark-submit; this proves an EXTERNAL build can DEPEND on graft —
# publishLocal, then tools/consumer (its own sbt project) resolves the
# artifact from the local ivy repo, compiles against the API, and
# drives two operators + PlanLint + an injected SQL function.
echo "[green_gate] consumer leg: sbt publishLocal + external consumer build..."
if ! sbt -batch publishLocal > /tmp/green_gate_publish.log 2>&1; then
  echo "[green_gate] *** sbt publishLocal FAILED:"; tail -10 /tmp/green_gate_publish.log
  exit 1
fi
if (cd tools/consumer && sbt -batch run) > /tmp/green_gate_consumer.log 2>&1 \
    && grep -q "CONSUMER OK" /tmp/green_gate_consumer.log; then
  echo "[green_gate] consumer leg GREEN: $(grep 'CONSUMER OK' /tmp/green_gate_consumer.log)"
else
  echo "[green_gate] *** CONSUMER BUILD/RUN FAILED:"; tail -20 /tmp/green_gate_consumer.log
  exit 1
fi

if [ "$WITH_ORACLE" = 1 ]; then
  OUT=$(mktemp -d /tmp/green_gate_verify.XXXXXX)
  echo "[green_gate] oracle leg: Verify at $SF_DIR -> $OUT ..."
  if ! sbt -batch "runMain graft.Verify $SF_DIR $OUT" \
      > /tmp/green_gate_verify.log 2>&1; then
    echo "[green_gate] *** Verify FAILED:"
    tail -30 /tmp/green_gate_verify.log
    exit 1
  fi
  if python3 tools/oracle_check.py "$SF_DIR" "$OUT" \
      > /tmp/green_gate_oracle.log 2>&1; then
    tail -3 /tmp/green_gate_oracle.log
    echo "[green_gate] oracle gate GREEN at $SF_DIR (report: /tmp/green_gate_oracle.log)."
  else
    echo "[green_gate] *** ORACLE GATE RED at $SF_DIR:"
    grep -v MATCH /tmp/green_gate_oracle.log | tail -30
    exit 1
  fi
  # Counts artifact (VERDICT r15 item 8): the registry/survey counts
  # as ONE generated source of truth (COUNTS.json), derived from the
  # artifacts this gate just produced — never prose arithmetic.
  if python3 tools/make_counts.py "$OUT" /tmp/green_gate_oracle.log; then
    echo "[green_gate] COUNTS.json regenerated: $(cat COUNTS.json)"
  else
    echo "[green_gate] *** make_counts FAILED"; exit 1
  fi
fi

if [ "$WITH_BASELINE" = 1 ]; then
  echo "[green_gate] baseline leg: min-of-6 BaselineBench head-to-head..."
  if SPARK_GRAFT_BENCH_REPS=6 sbt -batch "runMain graft.BaselineBench" \
      > /tmp/green_gate_baseline.log 2>&1; then
    grep -E "ratio|scaffold|novelty|graft|reference" /tmp/green_gate_baseline.log | tail -12
    # Auto-append the dated section to BASELINE.md (VERDICT r12 item 7:
    # the print-and-hope handoff went stale in r11; the gate now writes
    # the record itself).
    python3 - <<'PYEOF'
import json, datetime
rows = {}
for line in open('/tmp/green_gate_baseline.log'):
    line = line.strip()
    if not line.startswith('{'):
        continue
    try:
        d = json.loads(line)
    except Exception:
        continue
    if 'variant' in d:
        rows[d['variant']] = d
    elif 'metric' in d:
        rows[d['metric']] = d['value']
need = ['reference_scaffold', 'graft', 'reference_novelty', 'graft_novelty',
        'graft_over_reference', 'graft_over_reference_novelty']
missing = [k for k in need if k not in rows]
if missing:
    raise SystemExit(f'[green_gate] baseline log missing {missing}')
stamp = datetime.date.today().isoformat()
sec = lambda v: rows[v]['sec']
section = f"""
## Gate run {stamp} (min of 6 interleaved, sf0.1 — auto-appended by green_gate.sh)

Reference scaffold formulation **{sec('reference_scaffold'):.2f} s** vs
graft **{sec('graft'):.2f} s**
(**{rows['graft_over_reference']:.2f}x**); reference scoring->novelty
chain **{sec('reference_novelty'):.2f} s** vs graft
**{sec('graft_novelty'):.2f} s**
(**{rows['graft_over_reference_novelty']:.2f}x**). Result identity is
spec-pinned; the <=2x criterion {'PASSES' if rows['graft_over_reference'] <= 2 and rows['graft_over_reference_novelty'] <= 2 else 'FAILS'}.
"""
with open('BASELINE.md', 'a') as f:
    f.write(section)
print(f'[green_gate] appended gate-run section ({stamp}) to BASELINE.md.')
PYEOF
  else
    echo "[green_gate] *** BaselineBench FAILED:"
    tail -20 /tmp/green_gate_baseline.log
    exit 1
  fi
fi

if [ "$WITH_STREAM" = 1 ]; then
  echo "[green_gate] stream leg: graft.StreamBench throughput/state record..."
  if SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.StreamBench" \
      > /tmp/green_gate_stream.log 2>&1; then
    python3 - <<'PYEOF'
import json, datetime
line = next(l for l in open('BENCH_STREAM.json') if l.strip().startswith('{'))
d = json.loads(line)
stamp = datetime.date.today().isoformat()
rows = []
for name, s in sorted(d['queries'].items()):
    if 'err' in s:
        rows.append(f"| {name} | ERR {s['err'][:40]} | | |")
        continue
    rows.append(f"| {name} | {s['rows_per_sec']:,.0f} | {s['state_rows_max']:,} "
                f"| {s['state_bytes_max'] / 1048576:.1f} |")
section = (f"\n## Streaming band {stamp} (AvailableNow replay at sf0.1 — "
           "auto-appended by green_gate.sh --with-stream)\n\n"
           "Replay-shaped figures: rows/sec is a floor (state-store startup "
           "per micro-batch is billed in); max state rows/bytes are "
           "split-invariant. Full detail in BENCH_STREAM.json.\n\n"
           "| query | rows/sec | state rows (max) | state MB (max) |\n"
           "|---|---|---|---|\n" + "\n".join(rows) + "\n")
with open('BASELINE.md', 'a') as f:
    f.write(section)
print(f'[green_gate] appended streaming band ({stamp}, {len(rows)} queries) to BASELINE.md.')
PYEOF
  else
    echo "[green_gate] *** StreamBench FAILED:"
    tail -20 /tmp/green_gate_stream.log
    exit 1
  fi
fi

if [ "$WITH_SF1" = 1 ]; then
  SF1_DIR=/tmp/testdata/sf1
  if [ ! -f "$SF1_DIR/lineitem.parquet" ]; then
    echo "[green_gate] sf1 leg: synthesizing $SF1_DIR (make_sf1.py)..."
    if ! python3 tools/make_sf1.py > /tmp/green_gate_sf1_make.log 2>&1; then
      echo "[green_gate] *** make_sf1 FAILED:"; tail -10 /tmp/green_gate_sf1_make.log
      exit 1
    fi
  fi
  SF1_OUT=$(mktemp -d /tmp/green_gate_sf1.XXXXXX)
  echo "[green_gate] sf1 leg: Verify at $SF1_DIR -> $SF1_OUT (long)..."
  if ! sbt -batch "runMain graft.Verify $SF1_DIR $SF1_OUT" \
      > /tmp/green_gate_sf1_verify.log 2>&1; then
    echo "[green_gate] *** sf1 Verify FAILED:"; tail -20 /tmp/green_gate_sf1_verify.log
    exit 1
  fi
  echo "[green_gate] sf1 leg: capped DuckDB replay (oracle_check --sf1, long)..."
  if python3 tools/oracle_check.py --sf1 "$SF1_DIR" "$SF1_OUT" \
      > /tmp/green_gate_sf1_oracle.log 2>&1; then
    N_MATCH=$(grep -c ': MATCH' /tmp/green_gate_sf1_oracle.log)
    {
      echo ""
      echo "## sf1 decade gate $(date +%F) (auto-appended by green_gate.sh --with-sf1)"
      echo ""
      echo "graft.Verify + capped DuckDB replay (oracle_check --sf1) at the"
      echo "synthetic sf1 (tools/make_sf1.py): **$N_MATCH/$N_MATCH MATCH, zero"
      echo "mismatches** (report: /tmp/green_gate_sf1_oracle.log)."
    } >> BASELINE.md
    echo "[green_gate] sf1 gate GREEN: $N_MATCH MATCH, recorded in BASELINE.md."
  else
    echo "[green_gate] *** SF1 ORACLE GATE RED:"
    grep -v ': MATCH' /tmp/green_gate_sf1_oracle.log | tail -30
    exit 1
  fi
fi

echo "[green_gate] GREEN — safe to snapshot/commit artifacts."
