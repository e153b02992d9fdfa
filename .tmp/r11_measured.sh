#!/bin/bash
set -uo pipefail
cd /root/repo
log() { echo "[r11-pipeline $(date +%H:%M:%S)] $*"; }

log "1/8 ingest rehearsal compact-swap @2M"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.IngestRehearsal \
  bench/ingest_rehearsal_r11.json /tmp/clustered2m 8 compact-swap \
  > .tmp/ingest_rehearsal_r11.log 2>&1
log "1/8 exit=$?"

log "2/8 pq recall sweep @sf10 (2M dihedral worst case)"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.PqRecallSweep \
  /tmp/sf10 bench/pq_recall_r11.json 200,1000,4000,16000 8 \
  > .tmp/pq_sweep_r11.log 2>&1
log "2/8 exit=$?"

log "3/8 ivfpq probe @clustered2m (default nprobe)"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.IvfPqProbe \
  /tmp/clustered2m bench/ivfpq_decade_r11.json 3 \
  > .tmp/ivfpq_probe_r11.log 2>&1
log "3/8 exit=$?"

log "4/8 ivfpq probe @clustered2m (measured 2% knee nprobe=200)"
SPARK_GRAFT_OPTS="-Dspark.graft.ann.nprobe=200" SPARK_GRAFT_CPUS=32 \
  tools/javamain.sh graft.tools.IvfPqProbe \
  /tmp/clustered2m bench/ivfpq_decade_r11_knee.json 3 \
  > .tmp/ivfpq_probe_knee_r11.log 2>&1
log "4/8 exit=$?"

log "5/8 microbench sf10 adjudication re-bank"
SPARK_GRAFT_MICRO_TAG=r11_sf10 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
  tools/javamain.sh graft.tools.MicroBench /tmp/sf10 \
  ann_ivf_batch q01_pricing_summary q05_region_revenue \
  q10_customer_order_stats q21_above_avg_qty dedup_ngram_jaccard \
  dedup_semantic_exact dedup_semantic_incremental_exact \
  > .tmp/micro_r11_sf10.log 2>&1
log "5/8 exit=$?"

log "6/8 bench sf0.1 run a"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/javamain.sh graft.Bench > .tmp/bench_r11_a.log 2>&1
grep '"metric"' .tmp/bench_r11_a.log | tail -1 > bench/r11_sf0.1_a.json
log "6/8 exit=$?"

log "7/8 bench sf0.1 run b"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  tools/javamain.sh graft.Bench > .tmp/bench_r11_b.log 2>&1
grep '"metric"' .tmp/bench_r11_b.log | tail -1 > bench/r11_sf0.1_b.json
log "7/8 exit=$?"

log "8/8 verify sf0.1 + eligible oracle sweep"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.Verify \
  /root/testdata/sf0.1 /tmp/verify_r11_sf0.1 > .tmp/verify_r11_sf0.1.log 2>&1
log "verify exit=$?"
python3 - <<'PY' > .tmp/gate_r11_sf0.1.log 2>&1
import json, subprocess, sys
oracle = json.load(open("/tmp/verify_r11_sf0.1/oracle_sql.json"))
names = sorted(n for n in oracle if n != "dedup_minhash_lsh")
sys.exit(subprocess.call(["python3", "tools/check_correctness.py",
  "/root/testdata/sf0.1", "/tmp/verify_r11_sf0.1"] + names))
PY
log "8/8 exit=$?"
log "pipeline done"
