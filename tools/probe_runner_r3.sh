#!/bin/bash
# Serial on-chip probe queue (ONE process on the chip at a time).
# Usage: nohup bash tools/probe_runner_r3.sh > /tmp/runner_r3.log 2>&1 &
set -x
cd /root/repo
# 1. SAH partition (new default) vs logged median-halfleaf numbers
#    (probe_hl: primary 28.15 / bounce 2.84 / sun 10.14 / mix 6.09 Mray/s).
timeout 2400 python tools/probe_r3.py --what halfleaf > /tmp/probe_sah32k.log 2>&1
# 2. The big bet: ~100k-tri SAH treelets (K~5), leaf 24 (VMEM-safe tables).
timeout 2400 python tools/probe_r3.py --what halfleaf --max-tris 98304 --leaf-size 24 > /tmp/probe_sah98k_l24.log 2>&1
# 3. Same at leaf 12 (tables ~5 MB/buffer - may OOM VMEM; failure is data).
timeout 2400 python tools/probe_r3.py --what halfleaf --max-tris 98304 > /tmp/probe_sah98k_l12.log 2>&1
# 4. Rank-select pushes A/B (on SAH 32k tables).
timeout 2400 python tools/probe_r3.py --what rankpush > /tmp/probe_rankpush.log 2>&1
# 5. Density sweep incl. mixed any-hit (sample batching x4/x8).
timeout 2400 python tools/probe_r3.py --what density > /tmp/probe_density3.log 2>&1
# 6. Leaf-size sweep at 32k for completeness.
timeout 2400 python tools/probe_r3.py --what halfleaf --leaf-size 16 > /tmp/probe_sah32k_l16.log 2>&1

# 6b. Pop-counter stats for the winning table config (attribution).
timeout 2400 python tools/probe_r3.py --what stats --max-tris 98304 --leaf-size 24 > /tmp/probe_stats98k.log 2>&1
# 7. Frame-side attribution at the PRODUCTION sponza1080 config (300k tris,
#    treelet backend, 4-sample batch): real - stub = traversal share.
timeout 3600 python tools/frame_probe.py --width 1920 --height 1088 --detail 8 --samples 4 --stub > /tmp/frame_stub_1080.log 2>&1
timeout 3600 python tools/frame_probe.py --width 1920 --height 1088 --detail 8 --samples 4 > /tmp/frame_real_1080.log 2>&1
# 8. Fused shadow+bounce launches A/B (RenderSettings.fuse_shadow).
timeout 3600 python tools/probe_fused.py > /tmp/probe_fused.log 2>&1
# 9. Per-step t-cull + scene-exit caps A/B (vs the step-1 halfleaf rows).
timeout 2400 python tools/probe_r3.py --what tcull > /tmp/probe_tcull.log 2>&1
# 10. tables_hbm unlocks (single-buffered in-kernel table DMA): 2x-bigger
#     segments at 98k, and 192k treelets (CPU proxy: steps 16 vs 34 vs 100).
timeout 2400 python tools/probe_r3.py --what halfleaf --max-tris 98304 --leaf-size 24 --tables-hbm --sublanes 1024 > /tmp/probe_hbmtab_98k_s1024.log 2>&1
timeout 2400 python tools/probe_r3.py --what halfleaf --max-tris 196608 --leaf-size 24 --tables-hbm > /tmp/probe_hbmtab_192k.log 2>&1
echo RUNNER_DONE
