"""Multi-device sharding: representation-equivalence (sharded fit ==
single-device fit, the TPU analog of the reference's base-R vs bigmemory
equality test, ``test_basic_usage.R:103-123``) and the sharded jitted fit
step used by the driver's multichip dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bigkrls_tpu as bk
from bigkrls_tpu.parallel.fit_step import build_sharded_fit_step, fit_step
from bigkrls_tpu.parallel.sharded import (block_sharding, make_mesh,
                                          replicated, row_sharding)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    return make_mesh(devices=jax.devices()[:8])


def test_make_mesh_shape(mesh):
    assert mesh.axis_names == ("i", "j")
    assert mesh.devices.size == 8
    # most-square factorization of 8
    assert sorted(mesh.devices.shape) == [2, 4]


def test_sharded_fit_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    n, p = 64, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(X @ np.ones(p) + 0.3 * rng.normal(size=n))
    m1 = bk.fit(y, X, noisy=False)
    m2 = bk.fit(y, X, noisy=False, mesh=mesh)
    assert abs(m1.lambda_ - m2.lambda_) < 1e-9
    assert np.max(np.abs(m1.coeffs - m2.coeffs)) < 1e-9
    assert np.max(np.abs(m1.yfitted - m2.yfitted)) < 1e-9
    assert np.max(np.abs(m1.derivatives - m2.derivatives)) < 1e-8
    assert np.max(np.abs(np.asarray(m1.K) - np.asarray(m2.K))) < 1e-12
    assert np.allclose(m1.var_avgderivatives, m2.var_avgderivatives)


def test_sharded_fit_step_matches_unsharded(mesh):
    rng = np.random.default_rng(1)
    n, p = 32, 4
    X = rng.normal(size=(n, p))
    X[:, 2] = (X[:, 2] > 0).astype(float)
    X = (X - X.mean(0)) / X.std(0, ddof=1)
    y = np.asarray(np.sin(X[:, 0]) + 0.2 * rng.normal(size=n))
    y = (y - y.mean()) / y.std(ddof=1)
    mask = np.array([np.unique(X[:, j]).size == 2 for j in range(p)])

    Xd, yd = jnp.asarray(X), jnp.asarray(y)
    lam = jnp.asarray(0.4)
    maskd = jnp.asarray(mask)

    ref = fit_step(Xd, yd, lam, maskd, sigma=float(p))

    Xs = jax.device_put(Xd, row_sharding(mesh))
    ys = jax.device_put(yd, replicated(mesh))
    step = build_sharded_fit_step(mesh, sigma=float(p))
    out = step(Xs, ys, jax.device_put(lam, replicated(mesh)),
               jax.device_put(maskd, replicated(mesh)))

    assert np.max(np.abs(np.asarray(ref.coeffs) - np.asarray(out.coeffs))) < 1e-9
    assert np.max(np.abs(np.asarray(ref.derivatives) -
                         np.asarray(out.derivatives))) < 1e-9
    assert np.isclose(float(ref.looloss), float(out.looloss))
    # the sharded output really is distributed
    shard_devs = {s.device for s in out.derivatives.addressable_shards}
    assert len(shard_devs) == 8


def test_block_sharded_matmul_roundtrip(mesh):
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.normal(size=(32, 32)))
    As = jax.device_put(A, block_sharding(mesh))
    out = jax.jit(lambda a: a @ a.T)(As)
    assert np.allclose(np.asarray(out), np.asarray(A @ A.T))


def test_dryrun_multichip_entrypoint():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out.looloss))


def test_streaming_fit_with_mesh(mesh):
    """Composition: kernel-free streaming products under a device mesh —
    X row-sharded, the scan's rank-P GEMMs shard with it."""
    rng = np.random.default_rng(3)
    n, p = 64, 3
    X = rng.normal(size=(n, p))
    y = np.asarray(X @ np.ones(p) + 0.2 * rng.normal(size=n))
    m1 = bk.fit(y, X, neig=20, streaming=True, noisy=False)
    m2 = bk.fit(y, X, neig=20, streaming=True, noisy=False, mesh=mesh)
    assert m2.K is None
    assert abs(m1.lambda_ - m2.lambda_) < 1e-8 * max(1.0, m1.lambda_)
    assert np.max(np.abs(m1.coeffs - m2.coeffs)) < 1e-8
    assert np.max(np.abs(m1.derivatives - m2.derivatives)) < 1e-7
