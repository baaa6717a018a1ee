"""Driver-overhead probe for the treelet sorted-launch path.

The sponza1080@8spp frame (20.3 s) exceeds its attributed parts
(3x bounce 3.0 s + 4x occl 1.0 s + primary + 2.7 s shading stub ~= 16 s);
the suspected gap is the per-launch sort driver (argsort + [N,7] pack
gather + inverse-perm + [4,N] unsort gather) at 16.7M lanes x 7 launches.
This probe times each driver stage standalone at 2M and 16.7M rays and
A/Bs the inverse permutation built by a second argsort (current
treelets.py) against a scatter of iota (permutation inverse needs no
sort). Honest scalar-pull timing per docs/ROADMAP.md.
"""
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
    _pull(fn_j(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        _pull(fn_j(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2 * 1024 * 1024)
    args = ap.parse_args()
    n = args.n
    rng = np.random.default_rng(7)
    key = jnp.asarray(rng.integers(0, 1 << 27, n, dtype=np.int64).astype(np.int32))
    cols = jnp.asarray(rng.standard_normal((n, 7), dtype=np.float32))
    out4 = jnp.asarray(rng.standard_normal((4, n), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    print(f"n={n}", flush=True)

    t = timeit(lambda k: jnp.argsort(k).astype(jnp.int32), key)
    print(f"  argsort(key)            : {t:8.1f} ms", flush=True)

    t = timeit(lambda c, o: c[o], cols, perm)
    print(f"  pack gather [N,7]       : {t:8.1f} ms", flush=True)

    t = timeit(lambda o: jnp.argsort(o).astype(jnp.int32), perm)
    print(f"  inverse via argsort     : {t:8.1f} ms", flush=True)

    def inv_scatter(o):
        return (
            jnp.zeros_like(o)
            .at[o]
            .set(jnp.arange(o.shape[0], dtype=o.dtype), unique_indices=True,
                 indices_are_sorted=False)
        )

    t = timeit(inv_scatter, perm)
    print(f"  inverse via iota scatter: {t:8.1f} ms", flush=True)

    t = timeit(lambda u, i: u[:, i], out4, perm)
    print(f"  unsort gather [4,N]     : {t:8.1f} ms", flush=True)

    def full_current(k, c, u):
        order = jnp.argsort(k).astype(jnp.int32)
        packed = c[order]
        inv = jnp.argsort(order).astype(jnp.int32)
        return packed.sum() + u[:, inv].sum()

    t = timeit(full_current, key, cols, out4)
    print(f"  full driver (argsort inv): {t:7.1f} ms", flush=True)

    def full_scatter(k, c, u):
        order = jnp.argsort(k).astype(jnp.int32)
        packed = c[order]
        inv = inv_scatter(order)
        return packed.sum() + u[:, inv].sum()

    t = timeit(full_scatter, key, cols, out4)
    print(f"  full driver (scatter inv): {t:7.1f} ms", flush=True)

    # Variadic sort: move the payload THROUGH lax.sort (sequential-access
    # sorting-network passes) instead of argsort + random row gather.
    def vsort(k, c):
        ops = (k,) + tuple(c[:, i] for i in range(c.shape[1]))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return sum(o.sum() for o in out[1:])

    t = timeit(vsort, key, cols)
    print(f"  variadic sort key+7pay  : {t:8.1f} ms", flush=True)

    # And the iota ride-along that replaces the separate inverse argsort:
    # sort (key, iota, payload) in ONE call, derive inv from the carried
    # iota by scatter (or use it for the unsort gather).
    def vsort_iota(k, c):
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        ops = (k, iota) + tuple(c[:, i] for i in range(c.shape[1]))
        out = jax.lax.sort(ops, dimension=0, num_keys=1)
        return sum(o.sum() for o in out[1:])

    t = timeit(vsort_iota, key, cols)
    print(f"  variadic sort +iota     : {t:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
