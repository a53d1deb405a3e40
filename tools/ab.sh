#!/usr/bin/env bash
# Interleaved A/B benchmark of two git refs on a named query subset.
#
# The r6→r7 asDouble/Cast incident proved single-shot measurements on
# this box mislead: a committed "win" was machine-load noise hiding a
# real 2.2→3.6 s regression, caught only by a hand-run back-to-back
# bisect. This script is that bisect as tooling: it checks each ref
# out into a worktree under target/ab/, compiles once, then runs the
# two builds ALTERNATELY (A,B,A,B,…) so both sample the same machine
# state within minutes, and reports per-query min/median/max per ref
# with an overlap verdict.
#
# Usage:
#   tools/ab.sh <refA> <refB> <queries_csv> [sweeps] [sfdir] [cpus]
#     refA/refB    git refs; "." = the current working tree's build
#     queries_csv  e.g. q_ann_lsh,q_ann_ivf  (SPARK_GRAFT_ONLY filter)
#     sweeps       alternations per ref (default 5)
#     sfdir        default /root/testdata/sf0.1
#     cpus         default 32
#   AB_REPS (env, default 2): in-JVM reps per run; min-of-reps absorbs
#   per-JVM codegen/JIT compile cost identically for both refs.
set -euo pipefail
REFA=${1:?usage: ab.sh refA refB queries_csv [sweeps] [sfdir] [cpus]}
REFB=${2:?need refB}
QUERIES=${3:?need queries csv}
SWEEPS=${4:-5}
SFDIR=${5:-/root/testdata/sf0.1}
CPUS=${6:-32}
REPS=${AB_REPS:-2}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
mkdir -p target/ab
rm -f target/ab/run_*.json

# Same JDK17 module opens + session props build.sbt passes to forked runs.
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

prepare() { # $1 = ref -> prints the build dir
  # compile logs go to target/ab/*.log, not /dev/null: under set -e a
  # silenced compile failure aborted the script with zero diagnostics
  if [ "$1" = "." ]; then
    sbt -batch compile >target/ab/compile_worktree.log 2>&1 \
      || { echo "[ab] compile FAILED for working tree — see target/ab/compile_worktree.log" >&2; exit 1; }
    echo "$REPO"
  else
    local sha wt
    sha=$(git rev-parse --short "$1")
    wt="$REPO/target/ab/wt_$sha"
    # an `sbt clean`/target wipe deletes the worktree DIR but not git's
    # .git/worktrees metadata; prune first so re-adding always works
    [ -d "$wt" ] || git worktree prune
    [ -d "$wt" ] || git worktree add --detach "$wt" "$sha" >/dev/null
    (cd "$wt" && sbt -batch compile >"$REPO/target/ab/compile_$sha.log" 2>&1) \
      || { echo "[ab] compile FAILED for $1 ($sha) — see target/ab/compile_$sha.log" >&2; exit 1; }
    echo "$wt"
  fi
}

run_one() { # $1 = build dir, $2 = tag, $3 = sweep index
  # bench stdout/stderr kept per run: a query that throws makes Bench
  # exit non-zero, and the log is the only place its stack trace lands
  (cd "$1" && \
    SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS="$CPUS" \
    SPARK_GRAFT_ONLY="$QUERIES" SPARK_GRAFT_REPS="$REPS" \
    SPARK_GRAFT_WARMUP=0 SPARK_GRAFT_SETTLE_S=0 SPARK_GRAFT_RESWEEPS=0 \
    java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS \
      -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -cp "$1/target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.Bench >"$REPO/target/ab/bench_${2}_${3}.log" 2>&1) \
    || { echo "[ab] bench FAILED ($2 sweep $3) — see target/ab/bench_${2}_${3}.log" >&2; exit 1; }
  # bench.json's "queries" map (full tier: always fits for a subset)
  # exists at every ref; bench_detail.json only since round 8.
  cp "$1/target/bench.json" "$REPO/target/ab/run_${2}_${3}.json"
}

echo "[ab] preparing A=$REFA" >&2
DIR_A=$(prepare "$REFA")
echo "[ab] preparing B=$REFB" >&2
DIR_B=$(prepare "$REFB")

for i in $(seq 1 "$SWEEPS"); do
  echo "[ab] sweep $i/$SWEEPS: A" >&2
  run_one "$DIR_A" A "$i"
  echo "[ab] sweep $i/$SWEEPS: B" >&2
  run_one "$DIR_B" B "$i"
done

python3 - "$REFA" "$REFB" "$SWEEPS" <<'EOF'
import json, glob, statistics, sys
refa, refb, sweeps = sys.argv[1], sys.argv[2], int(sys.argv[3])
def load(tag):
    per = {}
    for f in sorted(glob.glob(f"target/ab/run_{tag}_*.json")):
        d = json.load(open(f))
        qs = d.get("queries", {})
        cs = d.get("qunit") == "cs"
        if d.get("rest"):
            print(f"WARNING: {f} hit the family-rollup bench tier — "
                  "queries folded into 'rest' are invisible here; "
                  "run a smaller subset", file=sys.stderr)
        for q, v in qs.items():
            # stripped bench tiers drop the uniform q_ prefix; restore
            # it so A and B key identically whatever tier each emitted
            q = q if q.startswith("q_") else "q_" + q
            per.setdefault(q, []).append(v / 100.0 if cs else float(v))
    return per
A, B = load("A"), load("B")
print(f"\n== A/B: A={refa}  B={refb}  ({sweeps} interleaved sweeps, "
      f"values = per-run min-of-reps seconds) ==")
if sweeps < 3:
    print("WARNING: <3 sweeps — ranges are too narrow to trust a "
          "'disjoint' verdict; use 5+ for a decision")
hdr = (f"{'query':24s} {'A min/med/max':>20s} {'B min/med/max':>20s}"
       f" {'Δmin':>8s} {'pairedΔ':>8s}  verdict")
print(hdr); print("-" * len(hdr))
for q in sorted(set(A) | set(B)):
    a, b = A.get(q, []), B.get(q, [])
    if not a or not b:
        print(f"{q:24s}  missing on one side"); continue
    fmt = lambda xs: f"{min(xs):.2f}/{statistics.median(xs):.2f}/{max(xs):.2f}"
    d = min(b) - min(a)
    # Paired stat: within one sweep A and B run back-to-back, so the
    # per-sweep difference cancels slow machine-state drift that
    # min/range comparisons across all sweeps cannot. Two independent
    # signals must agree to call it real: disjoint ranges (strong) or
    # every paired delta sharing one sign (consistent drift per pair).
    pairs = [bb - aa for aa, bb in zip(a, b)]
    pmed = statistics.median(pairs)
    disjoint = max(a) < min(b) or max(b) < min(a)
    onesided = len(pairs) >= 3 and (all(p > 0 for p in pairs)
                                    or all(p < 0 for p in pairs))
    verdict = ("LIKELY REAL (disjoint ranges)" if disjoint
               else "LEANS REAL (all paired deltas one-signed)" if onesided
               else "ranges overlap (noise-compatible)")
    print(f"{q:24s} {fmt(a):>20s} {fmt(b):>20s} {d:>+8.2f} {pmed:>+8.2f}  {verdict}")
EOF
