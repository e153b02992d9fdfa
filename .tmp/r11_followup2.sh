#!/bin/bash
set -uo pipefail
cd /root/repo
echo "[f2] sbt test"
sbt -batch test > .tmp/sbt_test_r11.log 2>&1
echo "[f2] test exit=$?"
echo "[f2] verify sf0.01 + gate"
SPARK_GRAFT_CPUS=8 tools/javamain.sh graft.Verify /root/testdata/sf0.01 /tmp/verify_out_r11c > .tmp/verify_r11c.log 2>&1
python3 tools/check_correctness.py /root/testdata/sf0.01 /tmp/verify_out_r11c > .tmp/gate_r11c.log 2>&1
echo "[f2] gate exit=$? ($(tail -1 .tmp/gate_r11c.log))"
echo "[f2] ivfpq probe calibrated re-bank"
SPARK_GRAFT_OPTS="-Dspark.graft.ann.nprobe=200 -Dspark.graft.pq.shortlistCalibration=/root/repo/bench/pq_recall_r11_2m.json" \
  SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.IvfPqProbe \
  /tmp/clustered2m bench/ivfpq_decade_r11_calibrated.json 3 \
  > .tmp/ivfpq_probe_cal2_r11.log 2>&1
echo "[f2] probe exit=$?"
echo "[f2] microbench 2M serving re-bank"
SPARK_GRAFT_MICRO_TAG=r11_2m SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
  tools/javamain.sh graft.tools.MicroBench /tmp/clustered2m \
  ann_ivf_topk ann_ivf_batch dedup_semantic \
  > .tmp/micro_r11_2m.log 2>&1
echo "[f2] micro exit=$?"
echo "[f2] done"
