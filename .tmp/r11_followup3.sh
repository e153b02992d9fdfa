#!/bin/bash
set -uo pipefail
cd /root/repo
echo "[f3] ivfpq probe calibrated (codes-read memo)"
SPARK_GRAFT_OPTS="-Dspark.graft.ann.nprobe=200 -Dspark.graft.pq.shortlistCalibration=/root/repo/bench/pq_recall_r11_2m.json" \
  SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.tools.IvfPqProbe \
  /tmp/clustered2m bench/ivfpq_decade_r11_calibrated.json 3 \
  > .tmp/ivfpq_probe_cal3_r11.log 2>&1
echo "[f3] probe exit=$?"
echo "[f3] microbench 2M noop sink"
SPARK_GRAFT_MICRO_TAG=r11_2m SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 SPARK_GRAFT_SINK=noop \
  tools/javamain.sh graft.tools.MicroBench /tmp/clustered2m \
  ann_ivf_topk ann_ivf_batch dedup_semantic \
  > .tmp/micro_r11_2m_b.log 2>&1
echo "[f3] micro exit=$?"
echo "[f3] done"
