"""Unit tests for config, schedules, distributions, math utils, and RAdam."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparse_vae_tpu.utils.config import (
    TrainerHparams, coerce_value, merge_into_dataclass, parse_dotlist, to_dict)
from sparse_vae_tpu.utils.schedules import (
    cosine_decay_factor, cosine_decay_with_warmup_factor, kl_weight_schedule,
    scaled_lr)
from sparse_vae_tpu.utils.distributions import (
    DiagonalGaussian, gaussian_from_params, kl_divergence,
    standard_normal_kl, standard_normal_log_prob)
from sparse_vae_tpu.utils.math_utils import (
    analytic_gaussian_rbf_mmd_sq, bleu_score_corpus, marginal_kl,
    pairwise_gaussian_kl, reconstruction_bleu)
from sparse_vae_tpu.training.optimizer import make_optimizer, radam


class TestConfig:
    def test_dotlist_parse_and_merge(self):
        overrides = parse_dotlist(["accumulate_grad_batches=4", "precision=fp32"])
        cfg = merge_into_dataclass(TrainerHparams(), overrides)
        assert cfg.accumulate_grad_batches == 4
        assert cfg.precision == "fp32"

    def test_type_coercion(self):
        assert coerce_value("true", bool) is True
        assert coerce_value("3e-4", float) == 3e-4
        assert coerce_value("100_000", int) == 100_000
        assert coerce_value("none", int) is None

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="Unknown hparam"):
            merge_into_dataclass(TrainerHparams(), {"nonsense": "1"})

    def test_to_dict_roundtrip(self):
        d = to_dict(TrainerHparams())
        assert d["seed"] == 7295

    def test_presets_registry(self):
        from sparse_vae_tpu.hparam_presets import hparam_presets
        assert set(hparam_presets) == {
            'lstm-benchmark', 'lstm-wikipedia', 'dense-benchmark',
            'sparse-benchmark', 'nonvae-wikipedia', 'wikipedia', 'pg19',
            'nonvae-pg19'}
        assert hparam_presets['pg19']['data']['max_tokens_per_sample'] == 102_400


class TestSchedules:
    def test_cosine_endpoints(self):
        assert cosine_decay_factor(0, 100) == pytest.approx(1.0)
        assert cosine_decay_factor(50, 100) == pytest.approx(0.5)
        assert cosine_decay_factor(100, 100) == pytest.approx(0.0)
        assert cosine_decay_factor(150, 100) == pytest.approx(0.0)

    def test_warmup(self):
        assert cosine_decay_with_warmup_factor(0, 100, 10) == pytest.approx(0.0)
        assert cosine_decay_with_warmup_factor(5, 100, 10) == pytest.approx(0.5)
        assert cosine_decay_with_warmup_factor(10, 100, 10) == pytest.approx(1.0)

    def test_kl_annealing(self):
        assert kl_weight_schedule(0, 0.1, 1.0, 100) == pytest.approx(0.1)
        assert kl_weight_schedule(50, 0.1, 1.0, 100) == pytest.approx(0.55)
        assert kl_weight_schedule(200, 0.1, 1.0, 100) == pytest.approx(1.0)
        assert kl_weight_schedule(0, 0.1, 1.0, 0) == pytest.approx(1.0)

    def test_sqrt_lr_scaling(self):
        assert scaled_lr(2e-4, 400_000, 100_000) == pytest.approx(4e-4)


class TestDistributions:
    def test_log_prob_matches_scipy_formula(self, rng):
        g = DiagonalGaussian(jnp.array([1.0, -2.0]), jnp.array([0.5, 2.0]))
        x = jnp.array([0.0, 0.0])
        expected = -0.5 * ((x - g.loc) / g.scale) ** 2 - jnp.log(g.scale) \
            - 0.5 * math.log(2 * math.pi)
        np.testing.assert_allclose(g.log_prob(x), expected, rtol=1e-6)

    def test_rsample_stats(self, rng):
        g = DiagonalGaussian(jnp.full((4,), 3.0), jnp.full((4,), 0.5))
        samples = g.sample(rng, (20000,))
        np.testing.assert_allclose(samples.mean(), 3.0, atol=0.02)
        np.testing.assert_allclose(samples.std(), 0.5, atol=0.02)

    def test_standard_kl_zero_at_standard(self):
        kl = standard_normal_kl(jnp.zeros(8), jnp.zeros(8))
        np.testing.assert_allclose(kl, 0.0, atol=1e-7)

    def test_standard_kl_matches_general_kl(self):
        mu, logvar = jnp.array([0.7, -1.0]), jnp.array([0.3, -0.2])
        p = gaussian_from_params(mu, logvar)
        q = DiagonalGaussian(jnp.zeros(2), jnp.ones(2))
        np.testing.assert_allclose(
            standard_normal_kl(mu, logvar), kl_divergence(p, q), rtol=1e-5)

    def test_prior_log_prob(self):
        z = jnp.zeros((3, 4))
        expected = -0.5 * 4 * math.log(2 * math.pi)
        np.testing.assert_allclose(standard_normal_log_prob(z),
                                   jnp.full((3,), expected), rtol=1e-6)


class TestMathUtils:
    def test_pairwise_kl_diagonal_zero(self):
        g = DiagonalGaussian(
            jax.random.normal(jax.random.PRNGKey(1), (5, 8)),
            jnp.exp(jax.random.normal(jax.random.PRNGKey(2), (5, 8)) * 0.1))
        mat = pairwise_gaussian_kl(g)
        np.testing.assert_allclose(jnp.diag(mat), 0.0, atol=1e-4)
        # Cross-check one off-diagonal entry against the elementwise formula
        p = DiagonalGaussian(g.loc[0], g.scale[0])
        q = DiagonalGaussian(g.loc[1], g.scale[1])
        np.testing.assert_allclose(mat[0, 1], kl_divergence(p, q).sum(),
                                   rtol=1e-4)

    def test_marginal_kl_near_zero_for_standard_posteriors(self, rng):
        # If every posterior IS the prior, aggregate == prior, KL ~ 0.
        g = DiagonalGaussian(jnp.zeros((64, 8)), jnp.ones((64, 8)))
        est = marginal_kl(g, rng, num_samples=64)
        assert abs(float(est)) < 0.3

    def test_marginal_kl_positive_for_spread_posteriors(self, rng):
        locs = jax.random.normal(jax.random.PRNGKey(3), (32, 8)) * 5.0
        g = DiagonalGaussian(locs, jnp.full((32, 8), 0.1))
        assert float(marginal_kl(g, rng, num_samples=32)) > 1.0

    def test_mmd_small_for_gaussian_samples(self, rng):
        x = jax.random.normal(rng, (256, 16))
        stat = analytic_gaussian_rbf_mmd_sq(x, standardize=True)
        assert abs(float(stat)) < 4.0  # standardized: ~N(0,1) under the null

    def test_mmd_large_for_shifted_samples(self, rng):
        x = jax.random.normal(rng, (256, 16)) + 3.0
        assert float(analytic_gaussian_rbf_mmd_sq(x, standardize=True)) > 10.0

    def test_custom_mmd_reduces_to_analytic_at_standard_normal(self, rng):
        """custom_gaussian_rbf_mmd_sq(mean=0, var=1) must equal
        analytic_gaussian_rbf_mmd_sq exactly (same estimator)."""
        from sparse_vae_tpu.utils.math_utils import custom_gaussian_rbf_mmd_sq

        x = jax.random.normal(rng, (128, 16))
        for std in (False, True):
            a = analytic_gaussian_rbf_mmd_sq(x, standardize=std)
            b = custom_gaussian_rbf_mmd_sq(x, jnp.zeros(16), jnp.ones(16),
                                           standardize=std)
            # custom_ computes determinants in float32 log-domain while
            # analytic_ uses exact Python scalar powers -> ~1e-4 relative
            np.testing.assert_allclose(float(a), float(b), rtol=5e-4,
                                       atol=1e-6)

    def test_custom_mmd_small_under_its_own_gaussian(self, rng):
        from sparse_vae_tpu.utils.math_utils import custom_gaussian_rbf_mmd_sq

        mean = jnp.arange(16.0) * 0.3
        var = jnp.linspace(0.5, 2.0, 16)
        x = mean + jnp.sqrt(var) * jax.random.normal(rng, (256, 16))
        stat = custom_gaussian_rbf_mmd_sq(x, mean, var, standardize=True)
        assert abs(float(stat)) < 4.0
        shifted = custom_gaussian_rbf_mmd_sq(x + 3.0, mean, var,
                                             standardize=True)
        assert float(shifted) > 10.0

    def test_two_dist_cross_entropy(self):
        """H(p_i, q_j) matrix: diagonal of the self case equals the entropy,
        and the self case equals pairwise_gaussian_cross_entropy."""
        from sparse_vae_tpu.utils.math_utils import (
            multivariate_gaussian_cross_entropy,
            multivariate_gaussian_entropy, pairwise_gaussian_cross_entropy)

        g = DiagonalGaussian(
            jax.random.normal(jax.random.PRNGKey(4), (5, 8)),
            jnp.exp(jax.random.normal(jax.random.PRNGKey(5), (5, 8)) * 0.2))
        mat = multivariate_gaussian_cross_entropy(g, g)
        np.testing.assert_allclose(np.asarray(mat),
                                   np.asarray(pairwise_gaussian_cross_entropy(g)),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.diag(mat)),
                                   np.asarray(multivariate_gaussian_entropy(g)),
                                   rtol=1e-5)
        # H(p, q) - H(p) == KL(p || q)
        q = DiagonalGaussian(g.loc[:3] + 1.0, g.scale[:3] * 1.5)
        hpq = multivariate_gaussian_cross_entropy(g, q)
        assert hpq.shape == (5, 3)
        kl = pairwise_gaussian_kl(
            DiagonalGaussian(jnp.concatenate([g.loc, q.loc]),
                             jnp.concatenate([g.scale, q.scale])))[:5, 5:]
        ent = multivariate_gaussian_entropy(g)
        np.testing.assert_allclose(np.asarray(hpq - ent[:, None]),
                                   np.asarray(kl), rtol=1e-4, atol=1e-4)

    def test_reconstruction_bleu_identity(self):
        seq = list(range(5, 40))
        assert reconstruction_bleu(seq, seq) == pytest.approx(1.0)
        assert reconstruction_bleu(seq, list(range(100, 135))) == 0.0

    def test_corpus_bleu(self):
        cand = [["the", "cat", "sat"]]
        refs = [[["the", "cat", "sat"]]]
        assert bleu_score_corpus(cand, refs, max_n=2) == pytest.approx(1.0)
        assert bleu_score_corpus([["dog"]], refs, max_n=1) == 0.0


class TestRAdam:
    def _rho(self, step, b2):
        rho_inf = 2 / (1 - b2) - 1
        return rho_inf - 2 * step * b2 ** step / (1 - b2 ** step)

    def test_sgd_phase_then_adam_phase(self):
        # With b2=0.999 the rectification threshold rho_t > 4 is crossed at
        # step 5 (rectified_adam.py:30-37) — early steps must be plain
        # momentum-SGD updates.
        assert self._rho(4, 0.999) <= 4 < self._rho(5, 0.999)

        opt = radam(learning_rate=0.1, weight_decay=0.0)
        params = {"w": jnp.array([1.0])}
        state = opt.init(params)
        g = {"w": jnp.array([1.0])}
        updates, state = opt.update(g, state, params)
        # Step 1 (SGD phase): m = 0.1*g; update = -lr * m / (1-b1^1) = -lr*g
        np.testing.assert_allclose(updates["w"], -0.1, rtol=1e-6)

        for _ in range(10):
            updates, state = opt.update(g, state, params)
        # Adam phase with constant grad: direction -> ~ -lr_eff * 1
        assert float(updates["w"][0]) < 0

    def test_matches_reference_numerics(self):
        """Lockstep comparison with a straight NumPy port of the reference
        update rule (rectified_adam.py:16-88)."""
        lr, b1, b2, eps, wd = 0.01, 0.9, 0.999, 1e-6, 0.01
        rng = np.random.default_rng(0)
        p_ref = rng.normal(size=(7,)).astype(np.float64)
        grads = [rng.normal(size=(7,)).astype(np.float64) for _ in range(12)]

        # NumPy reference
        m = np.zeros(7); v = np.zeros(7); p = p_ref.copy()
        rho_inf = 2 / (1 - b2) - 1
        for t, g in enumerate(grads, start=1):
            b2_t = b2 ** t
            bcv = (1 - b2_t) ** 0.5
            rho_t = rho_inf - 2 * t * b2_t / (1 - b2_t)
            eff_lr = lr
            if rho_t > 4:
                r_t = (((rho_t - 4) * (rho_t - 2) * rho_inf)
                       / ((rho_inf - 4) * (rho_inf - 2) * rho_t)) ** 0.5
                eff_lr = lr * r_t * bcv
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            bcm = 1 - b1 ** t
            p *= (1 - eff_lr * wd)
            if rho_t > 4:
                p -= (eff_lr / bcm) * m / (np.sqrt(v) / bcv + eps)
            else:
                p -= (eff_lr / bcm) * m

        # Ours
        opt = radam(lr, b1, b2, eps, wd)
        params = {"w": jnp.asarray(p_ref, jnp.float32)}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update({"w": jnp.asarray(g, jnp.float32)},
                                        state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(params["w"], p, rtol=2e-3, atol=2e-5)

    def test_weight_decay_is_decoupled(self):
        opt = radam(learning_rate=0.1, weight_decay=0.5)
        params = {"w": jnp.array([2.0])}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.array([0.0])}, state, params)
        # Zero grad => update is pure decay: -lr*wd*p = -0.1*0.5*2
        np.testing.assert_allclose(updates["w"], -0.1, rtol=1e-6)

    def test_lamb_trust_ratio_bounds_update(self):
        opt = radam(learning_rate=0.1, weight_decay=0.0, lamb=True)
        params = {"w": jnp.full((4,), 100.0)}  # norm 200, clamped to 10
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.ones(4)}, state, params)
        # |update| = lr * trust * |u|/|u| * ... ; trust = 10/|u|, so norm = lr*10
        np.testing.assert_allclose(
            float(jnp.linalg.norm(updates["w"])), 0.1 * 10.0, rtol=1e-4)

    def test_make_optimizer_runs_and_clips(self):
        opt = make_optimizer(lr=1.0, lr_decay_steps=100, grad_clip_threshold=1.0)
        params = {"w": jnp.zeros(3)}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.full(3, 100.0)}, state, params)
        assert float(jnp.linalg.norm(updates["w"])) < 2.0
