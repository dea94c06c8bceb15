#!/usr/bin/env python
"""Tile-size sweep for the Pallas kernels at the N=50k streaming config.

VERDICT r02 next-round #5: justify the default tiles of
``kernel_matmul_pallas`` (the streaming K@V workhorse) and
``gauss_kernel_pallas`` (dense kernel construction) by measurement
instead of folklore.  Run on the real TPU:

    python tools/tile_sweep.py            # ~a few minutes warm-cache

Prints one table per kernel (median of 3 timed reps after a compile
warmup) plus the winner; results of record go in docs/performance.md.
The N=50k streaming shape class is (n=50_000, p=20, m=540) — the Krylov
block width q at neig=500 — and the dense kernel shape is the election
bench (n=3106) plus n=8192 for a shape the MXU can actually fill.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from bigkrls_tpu.ops.kernels import gauss_kernel_pallas
    from bigkrls_tpu.ops.matvec import kernel_matmul_pallas

    assert jax.default_backend() == "tpu", "sweep is meaningful on TPU only"
    rng = np.random.default_rng(0)

    def timeit(fn, *args, reps=10, **kw):
        # axon gotcha: block_until_ready does NOT wait for execution on
        # the tunneled backend — force a host scalar.  Dispatch ``reps``
        # times and force only the last output (in-order execution), so
        # the ~25 ms tunnel RTT is amortized across the batch.
        float(jnp.sum(fn(*args, **kw)))          # compile + first exec
        t = time.time()
        for _ in range(reps):
            out = fn(*args, **kw)
        float(jnp.sum(out))
        return (time.time() - t) / reps

    with jax.default_matmul_precision("highest"):
        # ---- kernel_matmul_pallas at the streaming shape class ----
        n, p, m = 50_000, 20, 540
        X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
        V = jnp.asarray(rng.normal(size=(n, m)), jnp.float32)
        flops = 2.0 * n * n * (p + m)
        print(f"kernel_matmul_pallas  n={n} p={p} m={m} "
              f"({flops/1e12:.1f} TFLOP/product)")
        best = (None, np.inf)
        for ti in (128, 256, 512):
            for tj in (256, 512, 1024):
                for tm in (256, 512):
                    try:
                        s = timeit(kernel_matmul_pallas, X, V, float(p),
                                   tile_i=ti, tile_j=tj, tile_m=tm)
                    except Exception as e:
                        print(f"  ti={ti:4d} tj={tj:4d} tm={tm:4d}  FAIL "
                              f"({type(e).__name__})")
                        continue
                    print(f"  ti={ti:4d} tj={tj:4d} tm={tm:4d}  "
                          f"{s*1e3:8.1f} ms  {flops/s/1e12:6.2f} TFLOP/s")
                    if s < best[1]:
                        best = ((ti, tj, tm), s)
        print(f"  BEST: tile_i/j/m={best[0]}  {best[1]*1e3:.1f} ms "
              f"({flops/best[1]/1e12:.2f} TFLOP/s)\n")

        # ---- gauss_kernel_pallas at dense-bench shapes ----
        for n2 in (3106, 8192):
            X2 = jnp.asarray(rng.normal(size=(n2, 67 if n2 == 3106 else 20)),
                             jnp.float32)
            p2 = X2.shape[1]
            f2 = 2.0 * n2 * n2 * p2
            print(f"gauss_kernel_pallas  n={n2} p={p2}")
            best = (None, np.inf)
            for tile in (256, 512, 1024):
                try:
                    s = timeit(gauss_kernel_pallas, X2, float(p2), tile=tile)
                except Exception as e:
                    print(f"  tile={tile:4d}  FAIL ({type(e).__name__})")
                    continue
                print(f"  tile={tile:4d}  {s*1e3:8.1f} ms  "
                      f"{f2/s/1e12:6.2f} TFLOP/s")
                if s < best[1]:
                    best = (tile, s)
            print(f"  BEST: tile={best[0]}  {best[1]*1e3:.1f} ms\n")


if __name__ == "__main__":
    main()
