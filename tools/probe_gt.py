"""Primitive-cost probe for a per-ray gather-traversal (GT) design.

The packet kernel wastes ~99% of VPU lanes on incoherent bounce rays (every
[8,128] Möller block serves 1024 rays; ~4 want the leaf — docs/ROADMAP.md
98k/leaf24 stats). A per-ray traversal in pure XLA sidesteps packet waste
entirely IF per-lane node fetches are affordable: each step gathers one
node/leaf row per ray ([N] indices into an [M, row] table). This probe
measures the primitives that gate that design on the real chip:

1. row-gather cost vs row width and table size at 2M lanes;
2. a synthetic traversal step loop (gather + box-test-scale VPU work +
   state update) → ms/step;
3. select-based per-ray short-stack push/pop cost.

Run: python tools/probe_gt.py [--n 2097152]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _pull(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(jnp.sum(leaf))


def _time(fn, *args, reps=5):
    _pull(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _pull(fn(*args))
    return (time.perf_counter() - t0) / reps


def probe_gathers(n):
    print(f"== row gathers at N={n} ==", flush=True)
    rng = np.random.default_rng(0)
    for m in (2048, 16384, 65536):
        for w in (8, 32, 64, 128):
            table = jnp.asarray(rng.standard_normal((m, w), np.float32))
            idx = jnp.asarray(rng.integers(0, m, n).astype(np.int32))

            @jax.jit
            def g(table, idx):
                return jnp.take(table, idx, axis=0)

            ms = _time(g, table, idx) * 1e3
            gb = n * w * 4 / 1e9
            print(
                f"  M={m:6d} W={w:3d}: {ms:7.2f} ms"
                f"  ({gb / (ms / 1e3):6.1f} GB/s out)",
                flush=True,
            )


def probe_step_loop(n, steps=24, w=128, m=16384):
    """Synthetic stackless step: gather a node row per ray, run ~16 box tests
    (width-16 node) + child pick + state update. Upper-bounds a GT step."""
    print(f"== synthetic GT step loop: N={n} steps={steps} row={w} ==",
          flush=True)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((m, w), np.float32))
    o = jnp.asarray(rng.standard_normal((n, 3), np.float32))
    d = jnp.asarray(rng.standard_normal((n, 3), np.float32))

    @jax.jit
    def run(table, o, d):
        inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

        def body(i, st):
            node, best = st
            row = jnp.take(table, node, axis=0)  # [N, w]
            tn_min = jnp.full((n,), jnp.inf, jnp.float32)
            pick = jnp.zeros((n,), jnp.int32)
            for s in range(16):  # width-16 box tests from the gathered row
                t0 = (row[:, 6 * s + 0 : 6 * s + 3] - o) * inv
                t1 = (row[:, 6 * s + 3 : 6 * s + 6] - o) * inv
                tn = jnp.max(jnp.minimum(t0, t1), axis=1)
                tf = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=1), best)
                hit = tn <= tf
                better = hit & (tn < tn_min)
                tn_min = jnp.where(better, tn, tn_min)
                pick = jnp.where(better, s, pick)
            nxt = (node * 16 + pick + 1) % m
            best = jnp.where(jnp.isfinite(tn_min), best * 0.999, best)
            return nxt, best

        node0 = jnp.zeros((n,), jnp.int32)
        best0 = jnp.full((n,), 1e30, jnp.float32)
        node, best = jax.lax.fori_loop(0, steps, body, (node0, best0))
        return best + node.astype(jnp.float32)

    ms = _time(run, table, o, d) * 1e3
    print(f"  total {ms:8.2f} ms  -> {ms / steps:6.2f} ms/step"
          f"  -> {n * steps / (ms / 1e3) / 1e6:7.1f} Mstep/s", flush=True)


def probe_stack_ops(n, depth=6):
    """Per-ray short stack as [N, depth] with select-based push/pop."""
    print(f"== select-based short-stack ops: N={n} depth={depth} ==",
          flush=True)
    rng = np.random.default_rng(2)
    vals = jnp.asarray(rng.integers(0, 1 << 20, n).astype(np.int32))

    @jax.jit
    def run(vals):
        stack = jnp.zeros((n, depth), jnp.int32)
        sp = jnp.zeros((n,), jnp.int32)

        def body(i, st):
            stack, sp, acc = st
            # push (vals+i) at sp
            lane = jax.lax.broadcasted_iota(jnp.int32, (n, depth), 1)
            stack = jnp.where(
                lane == sp[:, None], (vals + i)[:, None], stack
            )
            sp = jnp.minimum(sp + 1, depth - 1)
            # pop
            sp2 = sp - 1
            top = jnp.sum(
                jnp.where(lane == sp2[:, None], stack, 0), axis=1
            )
            return stack, jnp.where(top % 2 == 0, sp2, sp), acc + top

        stack, sp, acc = jax.lax.fori_loop(
            0, 16, body, (stack, sp, jnp.zeros((n,), jnp.int32))
        )
        return acc + sp

    ms = _time(run, vals) * 1e3
    print(f"  16 push+pop rounds: {ms:7.2f} ms -> {ms / 16:5.2f} ms/round",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)
    ap.add_argument("--what", default="all")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if args.what in ("all", "gather"):
        probe_gathers(args.n)
    if args.what in ("all", "steps"):
        probe_step_loop(args.n)
    if args.what in ("all", "stack"):
        probe_stack_ops(args.n)


if __name__ == "__main__":
    main()
