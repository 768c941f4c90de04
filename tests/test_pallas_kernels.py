"""Pallas kernel parity vs dense jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.ops.matching import dual_softmax
from gim_tpu.ops.pallas_kernels.dsmax import dual_softmax_mutual


def _dense_reference(f0, f1, T, mask0=None, mask1=None):
    sim = jnp.einsum("lc,sc->ls", f0, f1)[None]
    m0 = mask0[None] if mask0 is not None else None
    m1 = mask1[None] if mask1 is not None else None
    conf = dual_softmax(sim, T, m0, m1)[0]
    jbest = jnp.argmax(conf, axis=1)
    vbest = jnp.max(conf, axis=1)
    ibest = jnp.argmax(conf, axis=0)
    mutual = jnp.take(ibest, jbest) == jnp.arange(f0.shape[0])
    return jbest, vbest, mutual


def test_dsmax_kernel_matches_dense():
    rng = np.random.default_rng(0)
    L, S, C = 70, 90, 32
    f0 = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        jb, vb, mu = dual_softmax_mutual(f0, f1, 0.1, block=128)
        jb_r, vb_r, mu_r = _dense_reference(f0, f1, 0.1)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vb_r),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(jb), np.asarray(jb_r))
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu_r))


def test_dsmax_kernel_masked():
    rng = np.random.default_rng(1)
    L, S, C = 40, 50, 16
    f0 = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    m0 = jnp.asarray(rng.random(L) > 0.25)
    m1 = jnp.asarray(rng.random(S) > 0.25)
    with jax.default_matmul_precision("highest"):
        jb, vb, mu = dual_softmax_mutual(f0, f1, 0.1, m0, m1, block=128)
        jb_r, vb_r, mu_r = _dense_reference(f0, f1, 0.1, m0, m1)
    keep = np.asarray(m0)
    np.testing.assert_allclose(np.asarray(vb)[keep], np.asarray(vb_r)[keep],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(jb)[keep],
                                  np.asarray(jb_r)[keep])
    # invalid rows must be non-mutual with zero confidence
    assert not np.asarray(mu)[~keep].any()
    assert (np.asarray(vb)[~keep] == 0).all()
