#!/bin/bash
# TRIMMED round-3 probe queue for a late tunnel recovery (~60-80 min total):
# only the three highest-leverage A/Bs, then the operator flips winners and
# runs bench. Full queue: probe_runner_r3.sh. ONE process on the chip.
set -x
cd /root/repo
# 1. The big bet: ~100k-tri SAH treelets, leaf 24 (VMEM tables).
timeout 2400 python tools/probe_r3.py --what halfleaf --max-tris 98304 --leaf-size 24 > /tmp/probe_sah98k_l24.log 2>&1
# 2. Per-step t-cull A/B at the default 32k tables.
timeout 1800 python tools/probe_r3.py --what tcull > /tmp/probe_tcull.log 2>&1
# 3. Fused shadow+bounce launches A/B.
timeout 2400 python tools/probe_fused.py > /tmp/probe_fused.log 2>&1
echo RUNNER_SHORT_DONE
