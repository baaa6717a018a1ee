#!/bin/bash
# Round-3 scoped-VMEM sweep: does raising Mosaic's ~16M default
# (CompilerParams.vmem_limit_bytes; v5e has 128M physical) unlock the
# configs that OOM'ed at compile — sublanes 1024 (half the per-ray scalar
# overhead) and 192k-tri treelets (2 live steps/segment vs 4 at 98k)?
# Run serially on a QUIET chip (docs/ROADMAP.md measurement discipline).
set -x
cd "$(dirname "$0")/.."
P="python tools/probe_r3.py --what prod --leaf-size 24"
$P --max-tris 98304                                  2>&1 | tee /tmp/vmem_base98k.log
$P --max-tris 98304  --sublanes 1024 --vmem-limit 40e6 2>&1 | tee /tmp/vmem_98k_sl1024.log
$P --max-tris 196608                 --vmem-limit 40e6 2>&1 | tee /tmp/vmem_192k.log
$P --max-tris 196608 --sublanes 1024 --vmem-limit 64e6 2>&1 | tee /tmp/vmem_192k_sl1024.log
# Density scaling at the production config (does sample batching keep
# paying at x16?) — bounce + occl-mix at x4/x8/x16.
python tools/probe_r3.py --what density --leaf-size 24 --max-tris 98304 \
  --vmem-limit 32e6 2>&1 | tee /tmp/vmem_density.log
