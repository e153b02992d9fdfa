#!/bin/bash
set -uo pipefail
cd /root/repo
echo "[followup] pq sweep @clustered2m (2M decade)"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.PqRecallSweep \
  /tmp/clustered2m bench/pq_recall_r11_2m.json 200,1000,4000,16000,64000 6 \
  > .tmp/pq_sweep_r11_2m.log 2>&1
echo "[followup] sweep exit=$?"
echo "[followup] ivfpq probe @clustered2m, knee nprobe + CALIBRATED shortlist"
SPARK_GRAFT_OPTS="-Dspark.graft.ann.nprobe=200 -Dspark.graft.pq.shortlistCalibration=/root/repo/bench/pq_recall_r11_2m.json" \
  SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.IvfPqProbe \
  /tmp/clustered2m bench/ivfpq_decade_r11_calibrated.json 3 \
  > .tmp/ivfpq_probe_cal_r11.log 2>&1
echo "[followup] probe exit=$?"
echo "[followup] plan audit regen (131 queries, sf0.01)"
SPARK_GRAFT_CPUS=8 tools/javamain.sh graft.tools.PlanAudit \
  /root/testdata/sf0.01 > .tmp/plan_audit_r11.log 2>&1
echo "[followup] audit exit=$?"
echo "[followup] done"
