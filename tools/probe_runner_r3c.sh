#!/bin/bash
# Round-3c probe queue (serial — one process on the chip at a time):
# bit-loop pops, BL64, Baldwin–Weber leaf rows, and combos, all at the
# production treelet config (98k/leaf24, 512 sublanes, 32M vmem).
cd "$(dirname "$0")/.."
set -x
timeout 5400 python tools/probe_r3.py --what bitloop \
  --max-tris 98304 --leaf-size 24 --vmem-limit 32e6 \
  > /tmp/probe_bitloop.log 2>&1
timeout 5400 python tools/probe_leaf.py --leaves 24 --bw \
  > /tmp/probe_bw.log 2>&1
timeout 5400 python tools/probe_leaf.py --leaves 24 --bw --bit-loop \
  > /tmp/probe_bw_bl.log 2>&1
