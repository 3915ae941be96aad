#!/usr/bin/env bash
# Round-close verification stack, in dependency order. Each step is the
# committed evidence behind a round's claims; run from the repo root:
#
#   bash tools/close_round.sh [ROUND]        # e.g. bash tools/close_round.sh 7
#
# Steps (all must exit 0):
#   1. pytest          — unit/property/plan-lint/skew suites
#   2. full local gate — every queries() entry vs its DuckDB oracle at
#                        sf0.01, ledger committed as LOCAL_GATE_r{N}.json
#  5b. sf0.1 local gate — the SAME full compare at sf0.1 (after the
#                        benches, so its 35-min load shadow cannot
#                        contaminate them — see the step-5b notes)
#   3. bench sf0.1     — per-query wall, writes bench_detail.json
#  3b. bench adjudication — tools/bench_compare.py vs the committed
#                        control, recorded as BENCH_ADJUDICATION_r{N}.txt
#   4. bench sf1       — 10x data (tools/make_sf.py output in .bench_sf/sf1)
#   5. slope gate      — per-query sf0.1->sf1 ratios vs the superlinear
#                        allowlist (tools/slope.py)
#   6. skew gate       — planted mega-star/clique dup-graph stress
#   7. corpus skew     — guarded text-dedup chain on a 10%-one-family corpus
#   8. stream skew     — hot-key (50%-one-user) stateful sessionization
#   9. ANN skew        — hot-cell (50%-one-family) persisted-IVF serving
#  10. semdedup skew   — mega-cluster (50%-one-cluster) SemDeDup blas path
#  11. line-dedup skew  — hot-digest (viral boilerplate line on 50% of docs)
#  12. span skew       — hot-gram (viral 12-token block on 50% of docs)
#
# Wall-clock ~80 min on local[32]. Bench numbers carry +/-30% host
# variance — re-measure warm-solo before treating a regression as real.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:-dev}"

echo "== 1/13 pytest =="
python -m pytest tests/ -q

echo "== 2/13 full local gate (sf0.01) =="
python tools/check_correctness.py --json "LOCAL_GATE_r${ROUND}.json"

echo "== 2b/13 degenerate-input gate =="
# round-15 addition: the full oracle compare over a corpus seeded with
# degenerate documents rows (NULL/empty/whitespace-only text, NULL
# lang/source). Catches what the standard corpora cannot witness:
# Spark-side crashes on degenerate arrays (negative slice lengths,
# descending sequence(1,0)) and cross-engine NULL-semantics divergence.
# First run found 10 real findings (two Spark crashes among them).
python tools/make_degenerate.py /root/testdata/sf0.001 .bench_sf/degen
python tools/check_correctness.py --sf-dir .bench_sf/degen --json "DEGEN_GATE_r${ROUND}.json"

echo "== 3/13 bench sf0.1 =="
python bench.py
cp bench_detail.json /tmp/close_round_small.json

echo "== 3b/13 bench adjudication vs committed control =="
# The repeatable form of the BASELINE decision rule (rounds 10-13 ran it
# by hand): per-query median ratio + episode windows vs the committed
# canonical control. Recorded as a per-round artifact so the adjudication
# is mechanical, not narrative. Informational (exit 0 always) — the raw
# total only matters through this lens on an episodic host.
# `|| true`: bench_compare exits non-zero on a missing/truncated control
# (e.g. a fork with no committed bench_detail.json) — that must not
# abort the remaining gate stack under set -e, this step is advisory.
python tools/bench_compare.py bench_detail.json git:HEAD:bench_detail.json \
  | tee "BENCH_ADJUDICATION_r${ROUND}.txt" || true

if [ -d .bench_sf/sf1 ]; then
  echo "== 4/13 bench sf1 =="
  SPARK_GRAFT_SF_DIR=.bench_sf/sf1 python bench.py
  cp bench_detail.json /tmp/close_round_large.json
  echo "== 5/13 slope gate =="
  python tools/slope.py /tmp/close_round_small.json /tmp/close_round_large.json --factor 10
  # restore the default-scale detail file the repo keeps committed
  cp /tmp/close_round_small.json bench_detail.json
else
  echo "== 4-5/13 SKIPPED: no .bench_sf/sf1 (generate: python tools/make_sf.py 10 .bench_sf/sf1) =="
fi

echo "== 5b/13 full local gate (sf0.1) =="
# round-12 lesson #1: a value gate at ONE scale can be green by corpus
# luck (the BPE phantom-pair bug was invisible below sf0.1) — the
# full-registry exact compare runs at sf0.1 too (~35 min, dominated by
# the recursive-CC DuckDB oracles).
# round-12 lesson #2: this step runs AFTER the benches — its first
# placement (before step 3) left the host descending from load ~8 and
# shifted the in-stack bench a uniform 1.4x (438 s vs the 264-294 s
# control band; median per-query ratio 1.40, no structural mover).
python tools/check_correctness.py --sf-dir /root/testdata/sf0.1 --json "LOCAL_GATE_r${ROUND}_sf0.1.json"

echo "== 6/13 skew graph gate =="
python tools/skew_graph.py

echo "== 7/13 corpus skew gate =="
python tools/skew_corpus.py

echo "== 8/13 stream skew gate =="
python tools/skew_stream.py

echo "== 9/13 ANN skew gate =="
python tools/skew_ann.py

echo "== 10/13 semdedup skew gate =="
python tools/skew_semdedup.py

echo "== 11/13 line-dedup skew gate =="
python tools/skew_linededup.py

echo "== 12/13 span skew gate =="
python tools/skew_spans.py

echo "close_round: all gates green"
