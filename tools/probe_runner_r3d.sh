#!/bin/bash
# Round-3d probe queue: re-sweep the treelet design space under SAH-split
# clusters (the +19..35% winner, commit b4aa3f5) — the cost balance moved,
# so leaf size / treelet size / density / split optima may have moved too.
# Run ALONE on the chip (timings contaminate both ways).
set -x
cd /root/repo

# 1. Spatial-split budget ladder under SAH clusters at prod flags.
timeout 5400 python tools/probe_leaf.py --leaves 24 --cluster-mode sah \
  --bit-loop --max-groups 64 --split-budget 0.3 > /tmp/probe_split03.log 2>&1
timeout 5400 python tools/probe_leaf.py --leaves 24 --cluster-mode sah \
  --bit-loop --max-groups 64 --split-budget 0.8 > /tmp/probe_split08.log 2>&1

# 2. Leaf ladder under SAH clusters (24 vs 48) at prod flags.
timeout 5400 python tools/probe_leaf.py --leaves 48 --cluster-mode sah \
  --bit-loop --max-groups 64 > /tmp/probe_sahleaf48.log 2>&1

# 3. Density ladder (x4/x8/x16) at prod flags + SAH clusters: does sample
#    batching keep paying past 8 spp?
timeout 5400 python tools/probe_r3.py --what density --cluster-mode sah \
  --bit-loop --max-groups 64 --max-tris 98304 --leaf-size 24 \
  > /tmp/probe_sahdensity.log 2>&1

# 4. 192k treelets under SAH clusters (tables +12% but vmem_limit is 32M):
#    bigger treelets won occlusion +16% at 98k-vs-192k median.
timeout 5400 python tools/probe_leaf.py --leaves 24 --cluster-mode sah \
  --bit-loop --max-groups 64 --max-tris 196608 > /tmp/probe_sah192k.log 2>&1

echo done
