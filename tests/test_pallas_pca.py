"""Streaming PCA-expand kernel (ops/pallas_pca.py), interpret mode.

The kernel must match the XLA bf16 formulation of expand_pca (same bf16
rounding of the dot inputs, f32 accumulation) and its gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np

from liftreg_tpu.ops.pallas_pca import expand_pca_streamed


def _xla_expand(coefs, vectors, mean):
    return jnp.dot(coefs.astype(jnp.bfloat16), vectors,
                   preferred_element_type=jnp.float32) + mean


def _rand(B=3, L=5, n=3 * 16 ** 3, seed=0):
    rng = np.random.RandomState(seed)
    coefs = jnp.asarray(rng.randn(B, L), jnp.float32)
    vectors = jnp.asarray(rng.randn(L, n) * 0.01, jnp.float32).astype(
        jnp.bfloat16)
    mean = jnp.asarray(rng.randn(n) * 0.01, jnp.float32)
    return coefs, vectors, mean


def test_matches_xla_bf16_path():
    coefs, vectors, mean = _rand()
    ref = _xla_expand(coefs, vectors, mean)
    got = expand_pca_streamed(coefs, vectors, mean, 2048, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_block_not_dividing_n_adapts():
    coefs, vectors, mean = _rand(n=3 * 8 ** 3)   # 1536: 2048 won't divide
    ref = _xla_expand(coefs, vectors, mean)
    got = expand_pca_streamed(coefs, vectors, mean, 2048, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla():
    coefs, vectors, mean = _rand(B=2, n=2048)
    tgt = jnp.asarray(np.random.RandomState(1).randn(2, 2048), jnp.float32)

    def loss(fn):
        def f(c, v, m):
            return jnp.mean((fn(c, v, m) - tgt) ** 2)
        return f

    ga = jax.grad(loss(_xla_expand), argnums=(0, 1, 2))(coefs, vectors, mean)
    gb = jax.grad(loss(lambda c, v, m: expand_pca_streamed(
        c, v, m, 1024, True)), argnums=(0, 1, 2))(coefs, vectors, mean)
    for a, b, tol in zip(ga, gb, (2e-3, 2e-2, 1e-6)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=tol, rtol=2e-2)
