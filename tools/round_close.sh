#!/usr/bin/env bash
# Round-close gate: run the cross-SF correctness sweep (sf0.001 + sf0.1 —
# the driver's own gate only checks sf0.01) and record the evidence as
# CROSSSF_r<N>.json in the repo root.
#
# Why this exists: r13 shipped two queries (q187, q190) that were green at
# the sf0.01 gate but WRONG at sf0.1 — cast-boundary/ULP defects only fire
# at specific data shapes, and tools/cross_sf_check.sh catches them for
# free (it caught r10's q80/q83/q54 the same way). This script makes the
# sweep part of every round close instead of an ad-hoc habit; see
# CHECKLIST.md.
#
# Usage: tools/round_close.sh <round-number>
set -u
cd "$(dirname "$0")/.."
round="${1:?usage: tools/round_close.sh <round-number>}"
out="CROSSSF_r$(printf '%02d' "$round").json"

# Evidence-integrity gate (r16 lesson: a FAILING pre-fix HAMMER repro run
# was committed as the round's concurrency evidence while the survey
# claimed a clean re-run). A close must never snapshot a failing
# stress/concurrency artifact silently — if the run was a repro, keep it
# under /tmp, not in the repo root.
for artifact in HAMMER.json STRESS.json; do
  [ -f "$artifact" ] || continue
  bad=$(python3 - "$artifact" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
probs = [k for k in ("lost_updates", "failures", "failed", "errors")
         if isinstance(d.get(k), (int, float)) and d[k] != 0]
print(",".join(probs))
PY
)
  if [ -n "$bad" ]; then
    echo "== REFUSING TO CLOSE: $artifact reports nonzero $bad —"
    echo "== commit a clean post-fix run (or delete the repro artifact)"
    exit 2
  fi
done
# Bench-hygiene gate (r17 lesson: a bench with drift canary 1.074 and two
# variance warnings was committed under a "quiet-box" label; the 266s board
# total then overstated regression by ~7-12% ambient noise). Bench.scala
# already computes both signals into BENCH_FULL.json — refuse to close on a
# noisy artifact instead of trusting the commit message.
if [ -f BENCH_FULL.json ]; then
  benchbad=$(python3 - <<'PY'
import json
d = json.load(open("BENCH_FULL.json"))
probs = []
drift = d.get("drift")
if isinstance(drift, (int, float)) and drift > 1.05:
    probs.append(f"drift {drift} > 1.05")
vw = d.get("variance_warnings") or []
if vw:
    probs.append(f"{len(vw)} variance warning(s): " + "; ".join(vw))
print(" | ".join(probs))
PY
)
  if [ -n "$benchbad" ]; then
    echo "== REFUSING TO CLOSE: BENCH_FULL.json is noisy — $benchbad"
    echo "== re-run graft.Bench on an idle box before closing the round"
    exit 2
  fi
fi
declare -A pass fail engine
status=0
for sf in /root/testdata/sf0.001 /root/testdata/sf0.1; do
  name=$(basename "$sf")
  dump="/tmp/graft_roundclose_$name"
  echo "== $name: verify dump"
  sbt -batch "set fork := true" "runMain graft.Verify $sf $dump" \
    > "/tmp/graft_roundclose_$name.log" 2>&1 \
    || { echo "== $name: VERIFY DRIVER FAILED"; status=1; continue; }
  echo "== $name: oracle compare"
  summary=$(python3 tools/oracle_check.py "$dump" "$sf" | tee \
    "/tmp/graft_roundclose_${name}_oracle.log" | tail -1)
  echo "== $name: $summary"
  # validate the summary shape BEFORE extracting: sed echoes its input on
  # no-match, which would inject an unquoted string into the JSON exactly
  # when the oracle output format drifts — the case this gate exists for
  if echo "$summary" | grep -qE '^[0-9]+ pass.* [0-9]+ fail.* [0-9]+ engine-only'; then
    pass[$name]=$(echo "$summary" | sed -E 's/^([0-9]+) pass.*/\1/')
    fail[$name]=$(echo "$summary" | sed -E 's/.* ([0-9]+) fail.*/\1/')
    engine[$name]=$(echo "$summary" | sed -E 's/.* ([0-9]+) engine-only.*/\1/')
  else
    echo "== $name: UNRECOGNIZED SUMMARY FORMAT"
    pass[$name]=null; fail[$name]=null; engine[$name]=null
    status=1
  fi
  [ "${fail[$name]}" = "0" ] || status=1
done
{
  printf '{'
  first=1
  for name in sf0.001 sf0.1; do
    [ $first -eq 1 ] || printf ','
    first=0
    printf '"%s":{"pass":%s,"fail":%s,"engine_only":%s}' \
      "$name" "${pass[$name]:-null}" "${fail[$name]:-null}" \
      "${engine[$name]:-null}"
  done
  printf ',"ok":%s}\n' "$([ $status -eq 0 ] && echo true || echo false)"
} > "$out"
echo "== wrote $out"
cat "$out"
exit $status
