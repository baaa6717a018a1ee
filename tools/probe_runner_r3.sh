#!/bin/bash
# Serial on-chip probe queue (ONE process on the chip at a time).
# Usage: nohup bash tools/probe_runner_r3.sh > /tmp/runner_r3.log 2>&1 &
set -x
cd /root/repo
timeout 2400 python tools/probe_r3.py --what density   > /tmp/probe_density3.log 2>&1
timeout 2400 python tools/probe_r3.py --what rankpush  > /tmp/probe_rankpush.log 2>&1
timeout 2400 python tools/probe_r3.py --what base --leaf-size 16 > /tmp/probe_leaf16.log 2>&1
timeout 2400 python tools/probe_r3.py --what base --leaf-size 24 > /tmp/probe_leaf24.log 2>&1
echo RUNNER_DONE
