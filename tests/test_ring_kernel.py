"""Ring-pass blocked kernel construction vs the single-device kernel."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bigkrls_tpu.ops.kernels import gauss_kernel
from bigkrls_tpu.parallel.ring_kernel import (make_ring_mesh,
                                              padded_ring_kernel,
                                              ring_gauss_kernel)
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def ring():
    return make_ring_mesh(jax.devices()[:8])


def test_ring_matches_dense(ring, rng):
    n, p = 64, 5
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    Xd = jax.device_put(jnp.asarray(X),
                        NamedSharding(ring, P("r", None)))
    K_ring = ring_gauss_kernel(ring, Xd, float(p))
    K_ref = gauss_kernel(jnp.asarray(X), float(p))
    assert np.max(np.abs(np.asarray(K_ring) - np.asarray(K_ref))) < 1e-12
    # output is genuinely row-sharded over the ring
    devs = {s.device for s in K_ring.addressable_shards}
    assert len(devs) == 8


def test_ring_rejects_ragged(ring, rng):
    X = jnp.asarray(rng.normal(size=(30, 3)))
    with pytest.raises(ValueError, match="divisible"):
        ring_gauss_kernel(ring, X, 3.0)


def test_padded_ring_arbitrary_n(ring, rng):
    n, p = 53, 4   # not a multiple of 8
    X = rng.normal(size=(n, p))
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    K_ring = padded_ring_kernel(ring, jnp.asarray(X), float(p))
    K_ref = gauss_kernel(jnp.asarray(X), float(p))
    assert K_ring.shape == (n, n)
    assert np.max(np.abs(np.asarray(K_ring) - np.asarray(K_ref))) < 1e-12
