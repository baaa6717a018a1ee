"""Row-gather layout probe: [N,16] row gathers (tab[k]) can materialize in
T(8,128) row-major layout, padding 16 lanes to 128 — an 8x HBM expansion
(7.97 GB at 16.7M lanes, the sponza1080 OOM driver). Gathering the
TRANSPOSED table (tab_t[:, k] -> [16, N]) keeps N in the lane dimension:
zero padding. This probe times both and prints the speed + the fact the
transposed one compiles at 16.7M without the 8 GB temp."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse, time
import numpy as np
import jax
import jax.numpy as jnp

from raytracer3_tpu.utils import runtime

runtime.init_compilation_cache()


def _pull(x):
    return float(jnp.asarray(x).sum())


def timeit(fn, *args, iters=3):
    fn_j = jax.jit(fn)
    _pull(fn_j(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _pull(fn_j(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16777216)
    ap.add_argument("--m", type=int, default=8192, help="table rows")
    ap.add_argument("--w", type=int, default=16, help="table row width")
    args = ap.parse_args()
    n, m, w = args.n, args.m, args.w
    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.standard_normal((m, w), dtype=np.float32))
    tab_t = jnp.asarray(np.asarray(tab).T.copy())
    idx = jnp.asarray(rng.integers(0, m, n, dtype=np.int64).astype(np.int32))

    print(f"n={n} m={m} w={w}", flush=True)
    # Consumer sums over the row axis so both layouts feed the same math.
    t = timeit(lambda T, i: (T[i] * 2.0).sum(), tab, idx)
    print(f"  row gather tab[k] [N,{w}]   : {t:8.1f} ms", flush=True)
    t = timeit(lambda T, i: (T[:, i] * 2.0).sum(), tab_t, idx)
    print(f"  col gather tab_t[:,k] [{w},N]: {t:8.1f} ms", flush=True)
    # Strided consumer (like unpacking row fields into [N] vectors).
    t = timeit(
        lambda T, i: sum((T[i][:, j] * (j + 1.0)).sum() for j in range(w)),
        tab, idx,
    )
    print(f"  row gather + field unpack  : {t:8.1f} ms", flush=True)
    t = timeit(
        lambda T, i: sum((T[j, i] * (j + 1.0)).sum() for j in range(w)),
        tab_t, idx,
    )
    print(f"  col gather + field unpack  : {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
