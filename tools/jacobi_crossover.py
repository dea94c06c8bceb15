"""Crossover measurement: mesh block-Jacobi eig vs gathered (replicated)
dense eigh on the 8-virtual-device CPU mesh (VERDICT r03 next-round #2
done-bar: a documented crossover).

Run:  python tools/jacobi_crossover.py [sizes...]
(defaults 1024 2048 4096; f64, 8 virtual CPU devices)

The comparison is honest about what each side is:

* "gathered eigh" = jnp.linalg.eigh on the full operator, replicated on
  every device — the only thing XLA itself offers under a mesh (eigh has
  no SPMD partitioning), so its wall-clock does not improve with devices
  and its memory is O(N²) PER DEVICE;
* "block-Jacobi" = parallel/jacobi.py with the stripe-update rounds —
  all batched GEMMs, partitioned across the mesh, memory O(N²/devices)
  per device at scale.

The crossover on real hardware therefore has two axes: wall-clock (which
this script measures — on this host both sides share 2 physical cores,
so the FLOP ratio dominates) and memory (where Jacobi wins at any N that
does not fit one device — the reason the path exists).
"""
import sys
import time

import numpy as np

import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax                                                    # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                                       # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bigkrls_tpu.parallel.jacobi import block_jacobi_eigh      # noqa: E402
from bigkrls_tpu.parallel.sharded import (block_sharding,      # noqa: E402
                                          make_mesh)


def one(n: int, mesh):
    rng = np.random.default_rng(0)
    lams = np.exp(-np.arange(n) / (n / 12.0))
    Qr = np.linalg.qr(rng.normal(size=(n, n)))[0]
    A = (Qr * lams) @ Qr.T
    A = jnp.asarray(0.5 * (A + A.T))

    t = time.time()
    ve, Ue = jnp.linalg.eigh(A)
    jax.block_until_ready((ve, Ue))
    t_eigh_cold = time.time() - t
    t = time.time()
    ve, Ue = jnp.linalg.eigh(A)
    jax.block_until_ready((ve, Ue))
    t_eigh = time.time() - t

    As = jax.device_put(A, block_sharding(mesh))
    t = time.time()
    vj, Uj = block_jacobi_eigh(As, mesh=mesh)
    jax.block_until_ready((vj, Uj))
    t_jac_cold = time.time() - t
    t = time.time()
    vj, Uj = block_jacobi_eigh(As, mesh=mesh)
    jax.block_until_ready((vj, Uj))
    t_jac = time.time() - t

    err = float(jnp.max(jnp.abs(vj - ve)))
    # eigenvector quality via reconstruction residual
    resid = float(jnp.linalg.norm((Uj * vj) @ Uj.T - A) /
                  jnp.linalg.norm(A))
    print(f"N={n:5d}  eigh(gathered): {t_eigh:7.2f}s  "
          f"jacobi(mesh,stripe): {t_jac:7.2f}s  ratio {t_jac / t_eigh:5.1f}x"
          f"  max|dval|={err:.2e}  recon={resid:.2e}  "
          f"(cold: {t_eigh_cold:.1f}s / {t_jac_cold:.1f}s)")


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    mesh = make_mesh(devices=jax.devices()[:8])
    print(f"devices={len(jax.devices())} mesh={mesh.devices.shape} f64")
    for n in sizes:
        one(n, mesh)


if __name__ == "__main__":
    main()
