#!/bin/bash
# Round-2 hardware measurement campaign (single v5e over the axon tunnel).
# Sequential (single-core host: parallel python processes starve each
# other), each step under timeout, continues past failures.  Appends one
# labelled JSONL record per config to artifacts/round2_hw.jsonl (bench.py
# detail records land on stderr -> captured per-step logs in /tmp).
set -u
cd "$(dirname "$0")/.."
OUT=artifacts/round2_hw.jsonl
mkdir -p artifacts
run_bench() {  # label, env...
  local label=$1; shift
  echo "=== $label" >&2
  local detail
  detail=$(timeout 1800 env "$@" python bench.py 2>&1 >/dev/null | tail -1)
  if [ -n "$detail" ] && [ "${detail:0:1}" = "{" ]; then
    echo "{\"campaign\": \"$label\", ${detail:1}" >> "$OUT"
  else
    echo "{\"campaign\": \"$label\", \"error\": \"$(echo "$detail" | tr -d '"' | tail -c 200)\"}" >> "$OUT"
  fi
}

# 1. DD headline (driver defaults) — regression check; plus the round-1
# fixed-width pick for an A/B against the spill-mode auto resolution
run_bench dd_default HCSPMM_BENCH_K=20
run_bench dd_w640 HCSPMM_BENCH_BAND_WIDTHS=640

# (1b. the fetch-once X ring config was pruned in round 5)

# 2. dim-32 (reference Table XVI shape): plain + folded layout (VERDICT #2)
run_bench dd_dim32 HCSPMM_BENCH_DIM=32

# 3. power-law regime (VERDICT #1): adversarial Chung-Lu + Table II stand-ins
run_bench powerlaw_cluster HCSPMM_BENCH_GRAPH=powerlaw HCSPMM_BENCH_REORDER=cluster
run_bench standin_dd HCSPMM_BENCH_GRAPH=standin:DD HCSPMM_BENCH_REORDER=cluster
run_bench standin_rd_q HCSPMM_BENCH_GRAPH=standin:RD@0.25 HCSPMM_BENCH_REORDER=cluster
run_bench standin_tt_q HCSPMM_BENCH_GRAPH=standin:TT@0.25 HCSPMM_BENCH_REORDER=cluster

# 3b. spill-formulation A/B (kernels/colstream.py vs take) + bench rerun
# with the streamed spill on the spill-heaviest configs
timeout 1800 python tools/ab_spill.py >> "$OUT" 2>/tmp/campaign_abspill.log
HCSPMM_AB_GRAPH=standin:RD@0.25 timeout 1800 python tools/ab_spill.py \
  >> "$OUT" 2>/tmp/campaign_abspill_rd.log
run_bench powerlaw_colstream HCSPMM_BENCH_GRAPH=powerlaw \
  HCSPMM_BENCH_REORDER=cluster HCSPMM_BENCH_SPILL=colstream
run_bench standin_rd_colstream HCSPMM_BENCH_GRAPH=standin:RD@0.25 \
  HCSPMM_BENCH_REORDER=cluster HCSPMM_BENCH_SPILL=colstream
run_bench standin_tt_colstream HCSPMM_BENCH_GRAPH=standin:TT@0.25 \
  HCSPMM_BENCH_REORDER=cluster HCSPMM_BENCH_SPILL=colstream

# 4. training epoch parity (VERDICT #6) + BASELINE configs (VERDICT #3)
timeout 3000 python tools/bench_train.py --configs gcn2,gin5 \
  --nodes 334928 --degree 5.03 >> "$OUT" 2>/tmp/campaign_train.log
timeout 3000 python tools/bench_train.py --configs gcn2_arxiv \
  >> "$OUT" 2>/tmp/campaign_arxiv.log
timeout 3000 python tools/bench_train.py --configs gin5_rd --scale 0.25 \
  >> "$OUT" 2>/tmp/campaign_rd.log
timeout 3000 python tools/bench_train.py --configs loi_products --scale 0.1 \
  >> "$OUT" 2>/tmp/campaign_products.log

# 5. gather-path hardware probes (spill design data + int4 retest)
timeout 1800 python tools/probe_gather.py >> "$OUT" 2>/tmp/campaign_probe.log

echo "campaign done" >&2
