#!/bin/bash
set -uo pipefail
cd /root/repo
echo "[final] verify sf0.1 + eligible gate (post-memo)"
SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.Verify /root/testdata/sf0.1 /tmp/verify_r11_sf0.1b > .tmp/verify_r11_sf0.1b.log 2>&1
python3 - <<'PY' > .tmp/gate_r11_sf0.1b.log 2>&1
import json, subprocess, sys
oracle = json.load(open("/tmp/verify_r11_sf0.1b/oracle_sql.json"))
names = sorted(n for n in oracle if n != "dedup_minhash_lsh")
sys.exit(subprocess.call(["python3", "tools/check_correctness.py",
  "/root/testdata/sf0.1", "/tmp/verify_r11_sf0.1b"] + names))
PY
echo "[final] gate exit=$? ($(tail -1 .tmp/gate_r11_sf0.1b.log))"
echo "[final] bench sf1"
SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.Bench > .tmp/bench_r11_sf1.log 2>&1
grep '"metric"' .tmp/bench_r11_sf1.log | tail -1 > bench/r11_sf1.json
echo "[final] sf1 exit=$?"
echo "[final] bench sf10"
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 tools/javamain.sh graft.Bench > .tmp/bench_r11_sf10.log 2>&1
grep '"metric"' .tmp/bench_r11_sf10.log | tail -1 > bench/r11_sf10.json
echo "[final] sf10 exit=$?"
echo "[final] done"
