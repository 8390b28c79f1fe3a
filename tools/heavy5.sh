#!/bin/bash
cd /root/repo
probe() { python3 -c '
import time
t0=time.time(); s=0
for i in range(20000000): s+=i*i
print("PROBE", round(time.time()-t0,3))'; }
echo "=== heavy-5 idle re-anchor $(date) ==="
uptime
probe; probe
for k in d12_semantic_groups s07_stream_join d08_containment e01_knn_brute; do
  echo "--- $k ---"
  SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt -batch "runMain graft.Bench $k" 2>&1 | grep -E '^\{|pass1|micro-batches'
  probe
  uptime
done
echo "--- d05_embedding_dedup (cold) ---"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/tmp/sf10 sbt -batch "runMain graft.Bench --cold d05_embedding_dedup" 2>&1 | grep -E '^\{'
probe
echo "=== done $(date) ==="
