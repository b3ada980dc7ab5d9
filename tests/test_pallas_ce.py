"""Fused Pallas tied-head cross-entropy vs the plain XLA reference,
values and gradients, in interpret mode on the CPU test backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.ops.pallas_ce import fused_tied_cross_entropy


def reference_nll(g, table, bias, labels):
    logits = (g @ table.T + bias).astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    lab = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return lse - lab


@pytest.fixture
def problem(rng):
    n, d, v = 48, 64, 256
    ks = jax.random.split(rng, 4)
    g = jax.random.normal(ks[0], (n, d)) * 0.5
    table = jax.random.normal(ks[1], (v, d)) * 0.5
    bias = jax.random.normal(ks[2], (v,)) * 0.1
    labels = jax.random.randint(ks[3], (n,), 0, v)
    return g, table, bias, labels


class TestFusedCE:
    def test_forward_matches_reference(self, problem):
        g, table, bias, labels = problem
        got = fused_tied_cross_entropy(g, table, bias, labels,
                                       tt=16, vt=128, interpret=True)
        ref = reference_nll(g, table, bias, labels)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_forward_unaligned_tokens(self, problem):
        g, table, bias, labels = problem
        got = fused_tied_cross_entropy(g[:13], table, bias, labels[:13],
                                       tt=16, vt=128, interpret=True)
        ref = reference_nll(g[:13], table, bias, labels[:13])
        assert got.shape == (13,)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_gradients_match_reference(self, problem):
        g, table, bias, labels = problem
        w = jax.random.normal(jax.random.PRNGKey(9), (g.shape[0],))

        def f_fused(g, table, bias):
            nll = fused_tied_cross_entropy(g, table, bias, labels,
                                           tt=16, vt=128, interpret=True)
            return jnp.sum(nll * w)

        def f_ref(g, table, bias):
            return jnp.sum(reference_nll(g, table, bias, labels) * w)

        gf = jax.grad(f_fused, argnums=(0, 1, 2))(g, table, bias)
        gr = jax.grad(f_ref, argnums=(0, 1, 2))(g, table, bias)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5)

    def test_bf16_inputs(self, problem):
        g, table, bias, labels = problem
        g16, t16 = g.astype(jnp.bfloat16), table.astype(jnp.bfloat16)

        def f(g, table):
            nll = fused_tied_cross_entropy(g, table, bias, labels,
                                           tt=16, vt=128, interpret=True)
            return jnp.sum(nll)

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(g16, t16)
        ref = float(jnp.sum(reference_nll(g16, t16, bias, labels)))
        assert abs(float(val) - ref) / abs(ref) < 2e-2
        assert grads[0].dtype == jnp.bfloat16
        assert grads[1].dtype == jnp.bfloat16
