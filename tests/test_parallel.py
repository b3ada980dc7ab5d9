"""Multi-device tests on the 8-device virtual CPU mesh: batch sharding,
replicated params, data-parallel gradient equivalence, and a sharded train
step through the Trainer."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from sparse_vae_tpu.data.batching import plan_batches
from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                           LSTMLanguageModelHparams)
from sparse_vae_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                          pad_batch_rows,
                                          param_sharding_rules, replicated,
                                          shard_params)
from sparse_vae_tpu.training.objectives import ARObjective


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(num_devices=8, devices=jax.devices("cpu"))


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.shape == {"data": 8, "model": 1}

    def test_model_axis(self):
        m = create_mesh(num_devices=8, model_axis=2,
                        devices=jax.devices("cpu"))
        assert m.shape == {"data": 4, "model": 2}

    def test_param_rules_replicate_small(self, mesh):
        params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros(4)}
        rules = param_sharding_rules(params, mesh)
        assert rules["w"].spec == P()

    def test_param_rules_shard_large_on_model_axis(self):
        m = create_mesh(num_devices=8, model_axis=2,
                        devices=jax.devices("cpu"))
        params = {"big": jnp.zeros((512, 512)), "small": jnp.zeros((4, 4))}
        rules = param_sharding_rules(params, m)
        assert rules["big"].spec == P(None, "model")
        assert rules["small"].spec == P()

    def test_pad_batch_rows(self):
        arrays = {"token_ids": jnp.ones((5, 16), jnp.int32),
                  "num_tokens": jnp.ones(5, jnp.int32),
                  "num_bytes": jnp.ones(5, jnp.int32)}
        out = pad_batch_rows(arrays, 8)
        assert out["token_ids"].shape == (8, 16)
        assert int(out["num_tokens"][5:].sum()) == 0

    def test_rows_multiple_of_in_batcher(self):
        rng = np.random.default_rng(0)
        lengths = rng.integers(30, 2000, size=200)
        plans = plan_batches(lengths, 10_000, rng=rng, rows_multiple_of=8)
        assert all(p.rows % 8 == 0 for p in plans)


class TestDataParallelStep:
    def test_sharded_grads_match_single_device(self, mesh):
        """The DP-sharded gradient must equal the single-device gradient —
        XLA inserts the psum; the math cannot change."""
        hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32,
                                      vocab_size=64)
        model = LSTMLanguageModel(hp)
        rng = jax.random.PRNGKey(0)
        tokens = jax.random.randint(rng, (8, 32), 3, 60)
        batch = {"token_ids": tokens,
                 "num_tokens": jnp.full(8, 32, jnp.int32),
                 "num_bytes": jnp.full(8, 128, jnp.int32)}
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            params = model.init(rng, tokens)["params"]
        obj = ARObjective()

        def grad_fn(p, b):
            return jax.grad(lambda p: obj.loss(model, p, b, 0, rng)[0])(p)

        g_single = jax.jit(grad_fn)(params, batch)

        params_sh, _ = shard_params(params, mesh)
        batch_sh = {k: jax.device_put(v, batch_sharding(mesh))
                    for k, v in batch.items()}
        g_sharded = jax.jit(grad_fn)(params_sh, batch_sh)

        flat_a = jax.tree.leaves(g_single)
        flat_b = jax.tree.leaves(g_sharded)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_output_sharding_propagates(self, mesh):
        x = jnp.arange(16.0).reshape(16, 1)
        xs = jax.device_put(x, batch_sharding(mesh))
        y = jax.jit(lambda t: t * 2)(xs)
        assert y.sharding.is_equivalent_to(batch_sharding(mesh), y.ndim)


class TestTensorParallel:
    def test_tp_matmul_matches(self):
        """Model-axis sharded matmul == replicated matmul (GSPMD inserts
        the collectives)."""
        m = create_mesh(num_devices=8, model_axis=4,
                        devices=jax.devices("cpu"))
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (16, 256))
        w = jax.random.normal(jax.random.PRNGKey(1), (256, 512))
        expected = x @ w

        w_sh = jax.device_put(w, NamedSharding(m, P(None, "model")))
        x_sh = jax.device_put(x, NamedSharding(m, P("data", None)))
        out = jax.jit(lambda x, w: x @ w)(x_sh, w_sh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-4, atol=1e-4)


class TestTrainerWithMesh:
    def test_fit_on_8_device_mesh(self, tmp_path, tmp_path_factory):
        """End-to-end Trainer.fit over the virtual 8-device mesh: batch rows
        sharded on 'data', params replicated, XLA inserts the grad psum."""
        import os

        from sparse_vae_tpu.data.text_data_module import (
            TextDataModule, TextDataModuleHparams)
        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.mesh import create_mesh
        from sparse_vae_tpu.training.trainer import Trainer
        from sparse_vae_tpu.utils.config import TrainerHparams

        cwd = os.getcwd()
        os.chdir(tmp_path_factory.mktemp("meshwork"))
        try:
            dm = TextDataModule(TextDataModuleHparams(
                dataset_name="synthetic", synthetic_docs=48, vocab_size=512,
                tokens_per_batch=1024, min_tokens_per_sample=4,
                max_tokens_per_sample=250, pad_to_multiple_of=128,
                test_size=8))
            dm.prepare_data()
        finally:
            os.chdir(cwd)

        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=512, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False,
            lr=1e-2, lr_decay_steps=10_000, base_batch_size=2048)
        model = TransformerVAE(hp)
        obj = VAEObjective(hp)
        thp = TrainerHparams(accumulate_grad_batches=1, max_steps=4,
                             val_check_interval=100.0,
                             checkpoint_every_n_steps=10 ** 9,
                             sample_every_n_steps=10 ** 9)
        mesh = create_mesh(num_devices=8)
        trainer = Trainer(model, hp, obj, dm, thp,
                          experiment="transformer-vae", name="mesh1",
                          log_root=tmp_path, enable_logging=False,
                          mesh=mesh)
        outcome = trainer.fit(max_epochs=100)
        assert outcome.step == 4
        leaves = jax.tree_util.tree_leaves(outcome.params)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)


class TestShardMapSPMD:
    def test_spmd_step_matches_single_device(self, mesh):
        """The explicit shard_map data-parallel step must produce the same
        params as the plain single-device step on the same global batch."""
        import optax

        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import (shard_batch,
                                                  sharded_train_step)
        from sparse_vae_tpu.training.optimizer import make_optimizer

        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=256, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        objective = VAEObjective(hp)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(0)
        b = mesh.shape["data"] * 2
        tokens = jax.random.randint(rng, (b, 64), 3, 256)
        tokens = tokens.at[:, 0].set(1)
        batch = {"token_ids": tokens,
                 "num_tokens": jnp.full((b,), 64, jnp.int32),
                 "num_bytes": jnp.full((b,), 256, jnp.int32)}
        params = model.init({"params": rng, "sample": rng},
                            tokens[:1])["params"]
        opt_state = optimizer.init(params)

        # NOTE: the per-shard loss sees only its rows; per-token-mean losses
        # then pmean to the same value as the global mean when shards carry
        # equal token counts (true here by construction).
        def loss_fn(p, bt, step, r):
            return objective.loss(model, p, bt, step, r)

        step_fn = sharded_train_step(loss_fn, optimizer, mesh)
        p1, _, loss1, _ = step_fn(params, opt_state,
                                  shard_batch(batch, mesh),
                                  jnp.asarray(0), rng)

        # Single device reference: same batch, same rng
        (loss0, _), grads = jax.value_and_grad(
            lambda p: loss_fn(p, batch, jnp.asarray(0), rng),
            has_aux=True)(params)
        updates, _ = optimizer.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        # The z-sample rng differs per shard vs global (each shard draws
        # its own eps for its rows from the same key), so exact equality
        # is not expected for the VAE loss — check the step runs, shapes
        # match, and params moved a comparable amount.
        d1 = sum(float(jnp.abs(a - b_).sum()) for a, b_ in zip(
            jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p0)))
        base = sum(float(jnp.abs(a).sum())
                   for a in jax.tree_util.tree_leaves(params))
        assert np.isfinite(float(loss1))
        assert d1 / base < 0.05  # both steps moved params by ~lr-sized amounts
