#!/bin/bash
# Epoch control probe: run the control query (q_tpch_q9 warm run3) once,
# log wall time + steal bookends to /tmp/control_log.txt. Used by the
# round-18 re-promotion hunt (see .claude/skills/verify/SKILL.md).
cd /root/repo
while true; do
  st1=$(awk '/^cpu /{print $9}' /proc/stat)
  out=$(SPARK_GRAFT_CPUS=8 sbt "runMain graft.tools.DebugPq q_tpch_q9 /root/testdata/sf0.1" 2>&1 | grep -E '^run[0-9]')
  st2=$(awk '/^cpu /{print $9}' /proc/stat)
  r3=$(echo "$out" | awk '/run3/{print $3}' | sed 's/took=//;s/s$//')
  echo "$(date +%H:%M:%S) run3=${r3}s steal_ticks=$((st2-st1)) | $out" | tr '\n' ' ' >> /tmp/control_log.txt
  echo >> /tmp/control_log.txt
  sleep 540
done
