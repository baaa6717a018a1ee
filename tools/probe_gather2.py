"""Round 2 of the gather-layout probe: find an env-alias-table fetch that
avoids the 8 GB padded [N,16] T(8,128) materialization AND stays near the
row gather's ~250 ms. Checks compiled peak memory via memory_analysis().

Variants (all consume the same fields: prob, alias_idx, pdf, rad3,
alias_pdf, alias_rad3):
  A. current row gather tab[k] [N,16], field slices
  B. row gather consumed through .T (hint XLA toward {0,1} layout)
  C. packed 3-word table: [prob|idx u32, rgb9e5, alias rgb9e5] as three
     1-D [N] gathers (linear layout, no padding)
  D. same 3-word table as ONE flat 1-D gather of [3N] (k*3 + j indices)
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import numpy as np
import jax
import jax.numpy as jnp

from raytracer3_tpu.utils import runtime
from raytracer3_tpu.ops import packing

runtime.init_compilation_cache()


def _pull(x):
    return float(jnp.asarray(x).sum())


def bench(name, fn, *args, iters=3):
    fn_j = jax.jit(fn)
    lowered = fn_j.lower(*args)
    comp = lowered.compile()
    try:
        ma = comp.memory_analysis()
        peak = getattr(ma, "temp_size_in_bytes", None)
        peak = f"{peak/2**30:.2f}G temp" if peak is not None else "?"
    except Exception as e:  # noqa: BLE001
        peak = f"mem? {e}"
    _pull(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _pull(fn_j(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"  {name:28s}: {dt:8.1f} ms  [{peak}]", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16777216)
    ap.add_argument("--m", type=int, default=32768)
    args = ap.parse_args()
    n, m = args.n, args.m
    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.standard_normal((m, 16), dtype=np.float32) ** 2)
    idx = jnp.asarray(rng.integers(0, m, n, dtype=np.int64).astype(np.int32))
    u = jnp.asarray(rng.random(n, dtype=np.float32))

    # Packed 3-word table.
    prob = np.clip(np.asarray(tab[:, 0]), 0, 1)
    alias = np.asarray(
        rng.integers(0, m, m, dtype=np.int64).astype(np.uint32)
    )
    w0 = (alias << np.uint32(12)) | (prob * 4095.0 + 0.5).astype(np.uint32)
    rad = np.abs(np.asarray(tab[:, 3:6]))
    arad = np.abs(np.asarray(tab[:, 7:10]))
    w1 = np.asarray(packing.pack_rgb9e5(jnp.asarray(rad)))
    w2 = np.asarray(packing.pack_rgb9e5(jnp.asarray(arad)))
    packed = jnp.asarray(np.stack([w0, w1, w2], axis=1))  # [m, 3] u32
    packed_flat = jnp.asarray(np.stack([w0, w1, w2], axis=1).reshape(-1))
    pw0, pw1, pw2 = (
        jnp.asarray(w0), jnp.asarray(w1), jnp.asarray(w2)
    )

    print(f"n={n} m={m}", flush=True)

    def consume(prob_v, aidx, rad_v, arad_v, take):
        r = jnp.where(take[:, None], arad_v, rad_v)
        pdf = 0.2126 * r[:, 0] + 0.7152 * r[:, 1] + 0.0722 * r[:, 2]
        return (r.sum() + pdf.sum()
                + jnp.where(take, aidx, 0).astype(jnp.float32).sum())

    def var_a(T, i, uu):
        row = T[i]
        take = uu >= row[:, 0]
        return consume(
            row[:, 0], row[:, 1].astype(jnp.int32), row[:, 3:6],
            row[:, 7:10], take,
        )

    bench("A row gather [N,16]", var_a, tab, idx, u)

    def var_b(T, i, uu):
        row_t = T[i].T  # [16, N]
        take = uu >= row_t[0]
        rad_v = jnp.stack([row_t[3], row_t[4], row_t[5]], axis=1)
        arad_v = jnp.stack([row_t[7], row_t[8], row_t[9]], axis=1)
        return consume(row_t[0], row_t[1].astype(jnp.int32), rad_v, arad_v, take)

    bench("B row gather .T consumer", var_b, tab, idx, u)

    def unpack3(g0, g1, g2, uu):
        p = (g0 & 0xFFF).astype(jnp.float32) / 4095.0
        aidx = (g0 >> 12).astype(jnp.int32)
        take = uu >= p
        return consume(p, aidx, packing.unpack_rgb9e5(g1),
                       packing.unpack_rgb9e5(g2), take)

    def var_c(T0, T1, T2, i, uu):
        return unpack3(T0[i], T1[i], T2[i], uu)

    bench("C three 1-D u32 gathers", var_c, pw0, pw1, pw2, idx, u)

    def var_d(Tf, i, uu):
        base = i * 3
        g0 = Tf[base]
        g1 = Tf[base + 1]
        g2 = Tf[base + 2]
        return unpack3(g0, g1, g2, uu)

    bench("D flat 1-D strided gathers", var_d, packed_flat, idx, u)

    def var_e(T, i, uu):
        row = T[i]  # [N, 3] u32
        return unpack3(row[:, 0], row[:, 1], row[:, 2], uu)

    bench("E row gather [N,3] u32", var_e, packed, idx, u)

    # F/G: chunked row gather via lax.map — same total row count (gathers
    # are row-count bound) but the padded [chunk,16]->[chunk,128] temp is
    # 1/chunks the size. Fields unpack INSIDE the chunk so the padded
    # buffer dies before the next chunk.
    for chunks in (4, 8, 16):
        def var_f(T, i, uu, chunks=chunks):
            ic = i.reshape(chunks, -1)
            uc = uu.reshape(chunks, -1)

            def body(args):
                ii, uuu = args
                row = T[ii]
                take = uuu >= row[:, 0]
                r = jnp.where(take[:, None], row[:, 7:10], row[:, 3:6])
                pdf = 0.2126 * r[:, 0] + 0.7152 * r[:, 1] + 0.0722 * r[:, 2]
                return (
                    r.sum() + pdf.sum()
                    + jnp.where(take, row[:, 1], 0.0).sum()
                )

            return jax.lax.map(body, (ic, uc)).sum()

        bench(f"F chunked x{chunks} [N,16]", var_f, tab, idx, u)
