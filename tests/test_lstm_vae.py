"""Tests for VAE machinery and LSTMVAE: KL normalization, ELBO objective,
IWAE sanity (tighter than single-sample ELBO), conditional reconstruction,
and a short training run where KL responds to annealing."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.data.text_data_module import (TextDataModule,
                                                  TextDataModuleHparams)
from sparse_vae_tpu.models.conditional_gaussian import ConditionalGaussian
from sparse_vae_tpu.models.generation import SamplingParams
from sparse_vae_tpu.models.lstm_vae import LSTMVAE, LSTMVAEHparams
from sparse_vae_tpu.models.vae import (VAEObjective, estimate_log_prob_iw,
                                       normalized_kl)
from sparse_vae_tpu.training.objectives import batch_arrays
from sparse_vae_tpu.training.trainer import Trainer
from sparse_vae_tpu.utils.config import TrainerHparams
from sparse_vae_tpu.utils.distributions import DiagonalGaussian


def tiny_hparams(**kw):
    defaults = dict(d_embedding=32, d_model=64, latent_depth=8,
                    vocab_size=512, lr=2e-2, lr_decay_steps=10_000,
                    base_batch_size=2048, bidirectional_encoder=True)
    defaults.update(kw)
    return LSTMVAEHparams(**defaults)


class TestConditionalGaussian:
    def test_output_and_kl(self, rng):
        head = ConditionalGaussian(out_features=4)
        x = jax.random.normal(rng, (3, 16))
        params = head.init(rng, x, get_kl=True)
        (q, kl) = head.apply(params, x, get_kl=True)
        assert q.loc.shape == (3, 4) and q.scale.shape == (3, 4)
        assert kl.shape == (3, 4)
        assert (np.asarray(kl) >= 0).all()

    def test_zero_initialized_gives_standard_normal(self, rng):
        head = ConditionalGaussian(out_features=4, zero_initialized=True,
                                   use_bias=True)
        x = jax.random.normal(rng, (3, 16))
        params = head.init(rng, x)
        q = head.apply(params, x)
        np.testing.assert_allclose(q.loc, 0.0)
        np.testing.assert_allclose(q.scale, 1.0)


class TestNormalizedKL:
    def test_per_token_normalization_and_pad_rows(self):
        raw = jnp.ones((3, 4))  # 4 nats per doc
        num_tokens = jnp.array([4, 8, 0])  # last row is batch padding
        kl, raw_mean = normalized_kl(raw, num_tokens)
        assert float(kl) == pytest.approx((4 / 4 + 4 / 8) / 2)
        assert float(raw_mean) == pytest.approx(4.0)


class TestIWAE:
    def test_iwae_at_least_elbo_on_toy_model(self, rng):
        """For a linear-Gaussian toy, IWAE with K samples must upper-bound
        the single-sample ELBO estimate (in expectation) and approach the
        true log p(x) as K grows."""
        # "Decoder": logits independent of z => log p(x|z) constant, so
        # log p(x) = const and IWAE == ELBO == const - KL-ish terms drop out
        V, L, B = 8, 6, 2
        labels = jnp.ones((B, L), jnp.int32)
        const_logits = jnp.zeros((B, L, V))

        def reconstruct(z):
            return const_logits

        posterior = DiagonalGaussian(jnp.full((B, 4), 0.5),
                                     jnp.full((B, 4), 1.0))
        est = estimate_log_prob_iw(reconstruct, posterior, labels, rng,
                                   num_samples=64, num_iter=4)
        # With p(x|z) constant, the z-integral is exactly 1 in expectation,
        # so the estimate converges to log p(x|.) = (L-1)*log(1/V) over the
        # shifted targets.
        expected = (L - 1) * math.log(1.0 / V)
        assert float(est.mean()) == pytest.approx(expected, rel=0.05)

    def test_chunking_equivalence(self, rng):
        V, L, B = 8, 5, 3
        labels = jnp.ones((B, L), jnp.int32)
        logits = jax.random.normal(rng, (B, L, V))
        posterior = DiagonalGaussian(jnp.zeros((B, 4)), jnp.ones((B, 4)))
        a = estimate_log_prob_iw(lambda z: logits, posterior, labels,
                                 jax.random.PRNGKey(7), 32, num_iter=1)
        b = estimate_log_prob_iw(lambda z: logits, posterior, labels,
                                 jax.random.PRNGKey(7), 32, num_iter=4)
        # Different rng fold per chunk => not identical, but statistically
        # close for a z-independent decoder (weights depend only on z draws)
        np.testing.assert_allclose(a, b, atol=0.5)


class TestLSTMVAE:
    def test_forward_contract(self, rng):
        hp = tiny_hparams()
        model = LSTMVAE(hp)
        tokens = jnp.ones((2, 16), jnp.int32)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        logits, kl, q, z = model.apply({"params": params}, tokens,
                                       rngs={"sample": rng})
        assert logits.shape == (2, 16, 512)
        assert z.shape == (2, 8)
        assert kl.shape == (2, 8)

    def test_z_conditions_reconstruction(self, rng):
        hp = tiny_hparams()
        model = LSTMVAE(hp)
        tokens = jnp.ones((2, 10), jnp.int32)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        z1 = jnp.zeros((2, 8))
        z2 = jnp.ones((2, 8)) * 3
        a = model.apply({"params": params}, tokens, z1,
                        method=LSTMVAE.reconstruct)
        b = model.apply({"params": params}, tokens, z2,
                        method=LSTMVAE.reconstruct)
        assert not np.allclose(a, b)

    def test_sample_conditional_and_unconditional(self, rng):
        hp = tiny_hparams()
        model = LSTMVAE(hp)
        tokens = jnp.ones((1, 8), jnp.int32)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        out = model.apply({"params": params}, rng, 12, 2,
                          method=LSTMVAE.sample)
        assert out.shape == (2, 11)
        z = jnp.zeros((2, 8))
        out_z = model.apply({"params": params}, rng, 12, 2, z,
                            method=LSTMVAE.sample)
        assert out_z.shape == (2, 11)

    def test_untied_embeddings_create_second_table(self, rng):
        hp = tiny_hparams(tie_embedding_weights=False)
        model = LSTMVAE(hp)
        tokens = jnp.ones((1, 8), jnp.int32)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        assert "encoder_embedding" in params


@pytest.fixture(scope="module")
def tiny_dm(tmp_path_factory):
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("lstmvaework"))
    try:
        dm = TextDataModule(TextDataModuleHparams(
            dataset_name="synthetic", synthetic_docs=64, vocab_size=512,
            tokens_per_batch=2048, min_tokens_per_sample=4,
            max_tokens_per_sample=500, pad_to_multiple_of=128, test_size=8))
        dm.prepare_data()
    finally:
        os.chdir(cwd)
    return dm


class TestVAETraining:
    def test_elbo_decreases_and_kl_anneals(self, tiny_dm, tmp_path):
        hp = tiny_hparams(kl_weight_start=0.1, kl_weight_end=1.0,
                          kl_annealing_steps=40)
        model = LSTMVAE(hp)
        obj = VAEObjective(hp)
        # KL weight follows the schedule
        assert float(obj.kl_weight(0)) == pytest.approx(0.1)
        assert float(obj.kl_weight(20)) == pytest.approx(0.55)
        assert float(obj.kl_weight(100)) == pytest.approx(1.0)

        thp = TrainerHparams(accumulate_grad_batches=1, max_steps=60,
                             val_check_interval=10.0,
                             checkpoint_every_n_steps=10 ** 9,
                             sample_every_n_steps=10 ** 9)
        trainer = Trainer(model, hp, obj, tiny_dm, thp,
                          experiment="lstm-vae", name="t1",
                          log_root=tmp_path, enable_logging=False)
        batch = next(iter(tiny_dm.epoch_batches("train", seed=0)))
        rng = jax.random.PRNGKey(0)
        params0, _ = trainer.init_state(rng)
        loss0, m0 = obj.loss(model, params0, batch_arrays(batch), 0, rng)
        outcome = trainer.fit(max_epochs=100)
        loss1, m1 = obj.loss(model, outcome.params, batch_arrays(batch),
                             60, rng)
        assert float(m1["train_nll"]) < float(m0["train_nll"])
        assert "train_mc_mutual_info" in m1

    def test_val_metrics_include_kl_and_loss(self, tiny_dm, tmp_path):
        hp = tiny_hparams()
        model = LSTMVAE(hp)
        trainer = Trainer(model, hp, VAEObjective(hp), tiny_dm,
                          TrainerHparams(), experiment="lstm-vae", name="t2",
                          log_root=tmp_path, enable_logging=False)
        params, _ = trainer.init_state(jax.random.PRNGKey(0))
        metrics = trainer.validate(params, jax.random.PRNGKey(1))
        assert set(metrics) >= {"val_nll", "val_bpb", "val_kl", "val_loss"}
        assert metrics["val_loss"] == pytest.approx(
            metrics["val_nll"] + metrics["val_kl"], rel=1e-5)


class TestDReG:
    def _toy(self, rng, K=8):
        from sparse_vae_tpu.models.vae import iwae_dreg_loss
        V, L, B, D = 8, 6, 2, 4
        labels = jnp.ones((B, L), jnp.int32)
        num_tokens = jnp.array([L, L])

        def make(loc_scale):
            loc, log_scale = loc_scale
            posterior = DiagonalGaussian(loc, jnp.exp(log_scale))
            w = jnp.ones((D, V)) * 0.1

            def reconstruct(z):
                return jnp.einsum("bd,dv->bv", z, w)[:, None, :].repeat(
                    L, axis=1)

            return iwae_dreg_loss(reconstruct, posterior, labels,
                                  num_tokens, rng, K)

        loc = jnp.full((B, D), 0.3)
        log_scale = jnp.zeros((B, D))
        return make, (loc, log_scale)

    def test_value_is_negative_bound_per_token(self, rng):
        make, ps = self._toy(rng)
        loss, bound = make(ps)
        assert np.isfinite(float(loss))
        assert bound.shape == (2,)
        expected = -float((bound / 6).mean())
        assert float(loss) == pytest.approx(expected, rel=1e-5)

    def test_gradients_flow_to_posterior_params(self, rng):
        make, ps = self._toy(rng)
        grads = jax.grad(lambda p: make(p)[0])(ps)
        for g in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).sum()) > 0.0

    def test_objective_multi_sample_path(self, rng):
        hp = tiny_hparams(train_mc_samples=4)
        model = LSTMVAE(hp)
        objective = VAEObjective(hp)
        tokens = jnp.concatenate(
            [jnp.ones((2, 1), jnp.int32),
             jax.random.randint(rng, (2, 15), 3, 512)], axis=1)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        batch = {"token_ids": tokens,
                 "num_tokens": jnp.full((2,), 16, jnp.int32),
                 "num_bytes": jnp.full((2,), 64, jnp.int32)}

        def loss_fn(p):
            return objective.loss(model, p, batch, jnp.asarray(0), rng)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        assert "train_iwae_log_prob" in metrics
        gnorm = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0.0


class TestFreeBits:
    """hparams.free_bits: per-dimension KL floor in the ELBO's KL term
    (vae.py loss_sums). The floor must raise the composed loss KL for a
    collapsed posterior while leaving the LOGGED train_kl raw, and must
    clamp before summing (linear-compose contract)."""

    def test_floor_raises_loss_kl_but_not_logged_kl(self, rng):
        tokens = jnp.concatenate(
            [jnp.ones((2, 1), jnp.int32),
             jax.random.randint(rng, (2, 15), 3, 512)], axis=1)
        batch = {"token_ids": tokens,
                 "num_tokens": jnp.full((2,), 16, jnp.int32),
                 "num_bytes": jnp.full((2,), 64, jnp.int32)}
        results = {}
        for fb in (0.0, 0.25):
            hp = tiny_hparams(free_bits=fb)
            model = LSTMVAE(hp)
            params = model.init({"params": jax.random.PRNGKey(0),
                                 "sample": jax.random.PRNGKey(0)},
                                tokens)["params"]
            objective = VAEObjective(hp)
            sums, counts = objective.loss_sums(
                model, params, batch, jnp.asarray(0), jax.random.PRNGKey(1))
            loss, metrics = objective.compose_loss(sums, counts,
                                                   jnp.asarray(0))
            results[fb] = (sums, metrics, float(loss))
        # Same params/rng: raw (logged) KL identical, floored loss KL larger.
        assert np.isclose(float(results[0.0][0]["raw_kl_sum"]),
                          float(results[0.25][0]["raw_kl_sum"]))
        # At init the posterior is near-standard-normal, so most of the 8
        # latent dims sit below 0.25 nats and the floor binds.
        assert (float(results[0.25][0]["kl_sum"])
                > float(results[0.0][0]["kl_sum"]))
        assert np.isclose(float(results[0.0][1]["train_kl"]),
                          float(results[0.25][1]["train_kl"]))

    def test_rejects_multi_sample_objective(self, rng):
        """free_bits + train_mc_samples>1 must fail loudly: the IWAE/DReG
        objective has no KL term to floor, so the combination would
        silently train as plain DReG."""
        import pytest
        tokens = jnp.concatenate(
            [jnp.ones((2, 1), jnp.int32),
             jax.random.randint(rng, (2, 15), 3, 512)], axis=1)
        batch = {"token_ids": tokens,
                 "num_tokens": jnp.full((2,), 16, jnp.int32),
                 "num_bytes": jnp.full((2,), 64, jnp.int32)}
        hp = tiny_hparams(free_bits=0.25, train_mc_samples=4)
        model = LSTMVAE(hp)
        params = model.init({"params": jax.random.PRNGKey(0),
                             "sample": jax.random.PRNGKey(0)},
                            tokens)["params"]
        objective = VAEObjective(hp)
        with pytest.raises(ValueError, match="free_bits"):
            objective.loss_sums(model, params, batch, jnp.asarray(0),
                                jax.random.PRNGKey(1))

    def test_floor_inactive_when_kl_large(self, rng):
        from sparse_vae_tpu.models.vae import kl_sums
        raw_kl = jnp.full((2, 8), 3.0)
        nt = jnp.full((2,), 16, jnp.int32)
        plain = kl_sums(raw_kl, nt)
        floored = kl_sums(jnp.maximum(raw_kl, 0.25), nt)
        assert np.isclose(float(plain[0]), float(floored[0]))


class TestBiLSTMRaggedLengths:
    def test_masked_encoder_equals_per_row_trimmed(self):
        """BiLSTMEncoder on a padded batch with ragged masks must equal
        running each row's trimmed (unpadded) sequence separately: the
        forward state must stop at the last real token and the backward
        direction must read the reversed VALID prefix, not the flipped
        padded buffer (VERDICT r1 weak #9)."""
        from sparse_vae_tpu.ops.rnn import BiLSTMEncoder

        rng = jax.random.PRNGKey(11)
        B, L, E, H = 4, 12, 6, 8
        x = jax.random.normal(rng, (B, L, E))
        lengths = np.array([12, 7, 3, 1])
        mask = jnp.asarray(np.arange(L)[None, :] < lengths[:, None])

        enc = BiLSTMEncoder(hidden_size=H, num_layers=2)
        params = enc.init(rng, x, mask)
        out = enc.apply(params, x, mask)

        for r in range(B):
            row = x[r:r + 1, :int(lengths[r])]
            expected = enc.apply(params, row, None)
            np.testing.assert_allclose(np.asarray(out[r]),
                                       np.asarray(expected[0]),
                                       rtol=1e-5, atol=1e-6)


class TestLSTMReconstructLL:
    def test_matches_full_logits(self):
        from sparse_vae_tpu.models.lstm_vae import LSTMVAE, LSTMVAEHparams
        from sparse_vae_tpu.ops.cross_entropy import sequence_log_likelihood

        hp = LSTMVAEHparams(d_model=32, d_embedding=16, latent_depth=8,
                            vocab_size=64, tie_logit_weights=True)
        model = LSTMVAE(hp)
        rng = jax.random.PRNGKey(0)
        tokens = jnp.concatenate(
            [jnp.ones((3, 1), jnp.int32),
             jax.random.randint(rng, (3, 23), 3, 64)], axis=1)
        tokens = tokens.at[1, 12:].set(0)
        tokens = tokens.at[2].set(0)
        params = model.init({"params": rng, "sample": rng}, tokens)["params"]
        z = jax.random.normal(rng, (3, hp.latent_depth))
        ll = model.apply({"params": params}, tokens, z, chunk_size=8,
                         method=LSTMVAE.reconstruct_ll)
        logits = model.apply({"params": params}, tokens, z,
                             method=LSTMVAE.reconstruct)
        expected = sequence_log_likelihood(logits[:, :-1], tokens[:, 1:])
        np.testing.assert_allclose(np.asarray(ll), np.asarray(expected),
                                   rtol=1e-4, atol=1e-4)
