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


def _tree_allclose(a, b, rtol=1e-6, atol=1e-7):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def _uneven_batch(rng, k, b, L, vocab):
    """Stacked [k, b, L] batch with ragged lengths and all-PAD filler rows —
    the shard-imbalanced regime where pmean-of-means would be biased."""
    lengths = np.array(jax.random.randint(rng, (k, b), 0, L))
    lengths[:, -2:] = 0      # two all-PAD rows per microbatch
    lengths[:, 0] = L        # and one full row
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, vocab))
    for i in range(k):
        for r in range(b):
            tokens[i, r, lengths[i, r]:] = 0
            if lengths[i, r] > 0:
                tokens[i, r, 0] = 1
    return {"token_ids": jnp.asarray(tokens, jnp.int32),
            "num_tokens": jnp.asarray(lengths, jnp.int32),
            "num_bytes": jnp.asarray(lengths * 4, jnp.int32)}


class TestShardMapSPMD:
    """Exact-equivalence tests for the production multi-device path
    (parallel/spmd.py): psum'd loss sums => the sharded loss/grad is the
    exact global token-weighted value, with pinned RNG semantics (rng folded
    by data-axis index, split per microbatch)."""

    def test_lm_step_exact_vs_true_single_device(self, mesh):
        """ARObjective + deterministic LSTM-LM: the shard_map step must
        reproduce the single-device step on the same global batch EXACTLY,
        including ragged lengths and all-PAD rows (the unequal-token-count
        regime where pmean-of-means was biased)."""
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        import optax

        hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32,
                                      vocab_size=64)
        model = LSTMLanguageModel(hp)
        objective = ARObjective(hp)
        # Plain SGD: param diffs reflect gradient diffs directly (no rsqrt
        # amplification), so the equivalence tolerance stays tight. The real
        # optimizer runs through this path in TestTrainerWithMesh.
        optimizer = optax.sgd(1e-2)
        rng = jax.random.PRNGKey(0)
        k, b = 2, mesh.shape["data"] * 2
        batch = _uneven_batch(rng, k, b, 48, 64)
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            params = model.init(rng, batch["token_ids"][0])["params"]
        opt_state = optimizer.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)  # steps donate buffers
        sharded = make_train_step(model, objective, optimizer, mesh=mesh)
        p1, o1, m1 = sharded(clone(params), clone(opt_state),
                             shard_batch(batch, mesh, stacked=True),
                             jnp.asarray(0), rng)

        # The deterministic LM ignores rng, so the single-device step on the
        # full batch is the exact global computation.
        single = make_train_step(model, objective, optimizer, mesh=None)
        p0, o0, m0 = single(clone(params), clone(opt_state), batch,
                            jnp.asarray(0), rng)

        # Identical math; per-shard partial sums reassociate float32
        # reductions, so "exact" means reduction-order tolerance, not
        # bitwise.
        _tree_allclose(p1, p0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m0["grad_norm"]), rtol=1e-4)

    def test_vae_step_exact_vs_shard_simulation(self, mesh):
        """TransformerVAE (stochastic z-sampling): the sharded step must
        match a single-device simulation that reproduces the pinned RNG
        semantics (fold by shard index, split per microbatch) and composes
        the same psum'd sums — float-exact up to reduction order."""
        import optax

        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
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
        n_dev = mesh.shape["data"]
        k, b = 2, n_dev * 2
        batch = _uneven_batch(rng, k, b, 64, 256)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = optimizer.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)  # steps donate buffers
        step_fn = make_train_step(model, objective, optimizer, mesh=mesh)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = step_fn(clone(params), clone(opt_state),
                             shard_batch(batch, mesh, stacked=True),
                             jnp.asarray(0), step_rng)

        # Single-device simulation with identical semantics.
        rows_per = b // n_dev

        def micro_loss(p, i):
            sums = counts = None
            for s in range(n_dev):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {name: arr[i, s * rows_per:(s + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(
                    jnp.add, sums, su)
                counts = co if counts is None else jax.tree.map(
                    jnp.add, counts, co)
            return objective.compose_loss(sums, counts, 0)

        grads_acc, losses = None, []
        for i in range(k):
            (loss_i, _), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(loss_i))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = optimizer.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        _tree_allclose(p1, p0, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)

    def test_accumulation_scan_matches_host_loop(self):
        """Single-device in-jit lax.scan accumulation == the old host loop
        (per-microbatch grads summed, /k, one optimizer update), metrics
        averaged over microbatches."""
        import optax

        from sparse_vae_tpu.parallel.spmd import make_train_step
        from sparse_vae_tpu.training.optimizer import make_optimizer

        import optax

        hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32,
                                      vocab_size=64)
        model = LSTMLanguageModel(hp)
        objective = ARObjective(hp)
        optimizer = optax.sgd(1e-2)
        rng = jax.random.PRNGKey(3)
        k = 3
        batch = _uneven_batch(rng, k, 4, 32, 64)
        params = model.init(rng, batch["token_ids"][0])["params"]
        opt_state = optimizer.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)  # steps donate buffers
        step_fn = make_train_step(model, objective, optimizer)
        p1, _, m1 = step_fn(clone(params), clone(opt_state), batch,
                            jnp.asarray(0), rng)

        rngs = jax.random.split(rng, k)
        grads_acc, losses = None, []
        for i in range(k):
            mb = {name: arr[i] for name, arr in batch.items()}
            (loss_i, _), g = jax.value_and_grad(
                lambda p: objective.loss(model, p, mb, 0, rngs[i]),
                has_aux=True)(params)
            losses.append(float(loss_i))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = optimizer.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        _tree_allclose(p1, p0, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-6)

    def test_eval_step_exact(self, mesh):
        """Sharded eval sums (psum) == single-device eval sums."""
        from sparse_vae_tpu.parallel.spmd import make_eval_step, shard_batch

        hp = LSTMLanguageModelHparams(d_embedding=16, d_model=32,
                                      vocab_size=64)
        model = LSTMLanguageModel(hp)
        objective = ARObjective(hp)
        rng = jax.random.PRNGKey(1)
        batch = {name: arr[0] for name, arr in
                 _uneven_batch(rng, 1, mesh.shape["data"] * 2, 40, 64
                               ).items()}
        params = model.init(rng, batch["token_ids"])["params"]

        sharded = make_eval_step(model, objective, mesh=mesh)
        single = make_eval_step(model, objective, mesh=None)
        s1 = sharded(params, shard_batch(batch, mesh), rng)
        s0 = single(params, batch, rng)
        for key in s0:
            np.testing.assert_allclose(np.asarray(s1[key]),
                                       np.asarray(s0[key]), rtol=1e-6)


class TestComposeLossLinearity:
    """The sharded-gradient contract: compose_loss must be linear in sums
    (see parallel.spmd.assert_compose_loss_linear and the objective
    docstrings). Run this check against every objective branch."""

    def test_ar_objective_linear(self):
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear
        obj = ARObjective()
        sums = {"nll_sum": jnp.asarray(37.5)}
        counts = {"token_count": jnp.asarray(13.0)}
        assert_compose_loss_linear(obj, sums, counts, step=5)

    def test_vae_objective_linear_elbo_branch(self):
        from sparse_vae_tpu.models.vae import (ContinuousVAEHparams,
                                               VAEObjective)
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear
        obj = VAEObjective(ContinuousVAEHparams(
            kl_annealing_steps=100, kl_weight_start=0.1))
        sums = {"nll_sum": jnp.asarray(37.5), "kl_sum": jnp.asarray(2.5),
                "raw_kl_sum": jnp.asarray(60.0),
                "marginal_kl_rows": jnp.asarray(1.25)}
        counts = {"token_count": jnp.asarray(13.0),
                  "row_count": jnp.asarray(4.0)}
        assert_compose_loss_linear(obj, sums, counts, step=50)

    def test_vae_objective_linear_dreg_branch(self):
        from sparse_vae_tpu.models.vae import (ContinuousVAEHparams,
                                               VAEObjective)
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear
        obj = VAEObjective(ContinuousVAEHparams(train_mc_samples=4))
        sums = {"neg_bound_sum": jnp.asarray(-12.0),
                "bound_sum": jnp.asarray(12.0)}
        counts = {"token_count": jnp.asarray(0.0),
                  "row_count": jnp.asarray(4.0)}
        assert_compose_loss_linear(obj, sums, counts, step=0)

    def test_detects_nonlinear_composition(self):
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear

        class Bad:
            def compose_loss(self, sums, counts, step):
                # log of a sum: grads differ between local and global sums
                return jnp.log(sums["s"]) / counts["n"], {}

        with pytest.raises(AssertionError):
            assert_compose_loss_linear(
                Bad(), {"s": jnp.asarray(3.0)}, {"n": jnp.asarray(2.0)},
                step=0)


@pytest.fixture(scope="module")
def mesh2d():
    """data 4 x model 2 — the 2-D production mesh."""
    return create_mesh(num_devices=8, model_axis=2,
                       devices=jax.devices("cpu"))


class TestTensorParallelStep:
    """Tensor parallelism composed with the shard_map production step
    (parallel/tp.py): attention heads + FFN inner dim sharded over 'model',
    exact equivalence vs the single-device computation (VERDICT r2 #5)."""

    def _lm(self, sparse=False):
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        hp = TransformerHparams(
            d_model=64, num_heads=4, num_layers=2, vocab_size=512,
            sparse_self_attention=sparse, attn_window_size=2,
            attn_block_size=128, use_pallas_kernel=False)
        return TransformerLanguageModel(hp), hp

    def test_tp_forward_exact(self, mesh2d):
        from sparse_vae_tpu.parallel.tp import tp_localize, tp_param_specs
        model, hp = self._lm()
        tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0, 512)
        params = model.init(jax.random.PRNGKey(0), tokens)["params"]
        ref = model.apply({"params": params}, tokens)

        m_tp = tp_localize(model, 2)
        p_specs = tp_param_specs(params, 2)
        mapped = jax.shard_map(
            lambda p, t: m_tp.apply({"params": p}, t),
            mesh=mesh2d, in_specs=(p_specs, P("data")),
            out_specs=P("data"), check_vma=False)
        out = jax.jit(mapped)(params, tokens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("sparse", [False, True])
    def test_tp_lm_train_step_exact_vs_single_device(self, mesh2d, sparse):
        """Full production train step on data 4 x model 2 == single-device
        step on the same global batch (deterministic AR objective), dense
        and sliding-window-sparse attention paths."""
        import optax
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.parallel.tp import tp_localize

        model, hp = self._lm(sparse=sparse)
        objective = ARObjective(hp)
        optimizer = optax.sgd(1e-2)
        rng = jax.random.PRNGKey(0)
        k, b = 2, mesh2d.shape["data"] * 2
        batch = _uneven_batch(rng, k, b, 128, 512)
        params = model.init(rng, batch["token_ids"][0])["params"]
        opt_state = optimizer.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)
        sharded = make_train_step(tp_localize(model, 2), objective,
                                  optimizer, mesh=mesh2d)
        p1, o1, m1 = sharded(clone(params), clone(opt_state),
                             shard_batch(batch, mesh2d, stacked=True),
                             jnp.asarray(0), rng)

        single = make_train_step(model, objective, optimizer, mesh=None)
        p0, o0, m0 = single(clone(params), clone(opt_state), batch,
                            jnp.asarray(0), rng)

        _tree_allclose(p1, p0, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m0["grad_norm"]), rtol=1e-4)

    def test_tp_vae_train_step_with_radam_clip(self, mesh2d):
        """TransformerVAE (Perceiver learned queries + cross-attention +
        z-injection) through the TP step with the real optimizer chain —
        including the TP-aware global-norm clip — vs a single-device
        simulation with the pinned per-data-shard RNG semantics."""
        import optax
        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.parallel.tp import tp_localize
        from sparse_vae_tpu.training.optimizer import make_optimizer

        # d_model 128 so the Perceiver's derived head count (d_model//64=2)
        # divides the model axis; smaller widths are DP-only for the VAE.
        hp = TransformerVAEHparams(
            d_model=128, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=256, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        objective = VAEObjective(hp)
        # Tight clip threshold so the clip path actually triggers.
        opt_tp = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=0.05, tp_size=2)
        opt_1d = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=0.05)

        rng = jax.random.PRNGKey(0)
        n_data = mesh2d.shape["data"]
        k, b = 2, n_data * 2
        batch = _uneven_batch(rng, k, b, 64, 256)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = opt_tp.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)
        step_fn = make_train_step(tp_localize(model, 2), objective, opt_tp,
                                  mesh=mesh2d)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = step_fn(clone(params), clone(opt_state),
                             shard_batch(batch, mesh2d, stacked=True),
                             jnp.asarray(0), step_rng)

        rows_per = b // n_data

        def micro_loss(p, i):
            sums = counts = None
            for s in range(n_data):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {name: arr[i, s * rows_per:(s + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(
                    jnp.add, sums, su)
                counts = co if counts is None else jax.tree.map(
                    jnp.add, counts, co)
            return objective.compose_loss(sums, counts, 0)

        grads_acc, losses = None, []
        for i in range(k):
            (loss_i, _), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(loss_i))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = opt_1d.update(grads, opt_1d.init(params), params)
        p0 = optax.apply_updates(params, updates)

        _tree_allclose(p1, p0, rtol=5e-5, atol=2e-5)
        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)

    def test_tp_global_norm_matches_full_tree(self, mesh2d):
        """tp_global_norm (sharded leaves psum'd over 'model') == the plain
        global norm of the full tree."""
        import optax
        from sparse_vae_tpu.parallel.tp import (tp_global_norm,
                                                tp_param_specs,
                                                tp_sharded_mask)
        model, hp = self._lm()
        tokens = jnp.zeros((2, 128), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens)["params"]
        ref = float(optax.global_norm(params))

        p_specs = tp_param_specs(params, 2)
        mapped = jax.shard_map(
            lambda p: tp_global_norm(p, tp_sharded_mask(p, 2)),
            mesh=mesh2d, in_specs=(p_specs,), out_specs=P(),
            check_vma=False)
        got = float(jax.jit(mapped)(params))
        np.testing.assert_allclose(got, ref, rtol=1e-6)

    def test_tp_localize_rejects_lstm(self):
        from sparse_vae_tpu.parallel.tp import tp_localize
        model = LSTMLanguageModel(LSTMLanguageModelHparams(
            d_embedding=8, d_model=16, vocab_size=64))
        with pytest.raises(ValueError, match="data-parallel only"):
            tp_localize(model, 2)

    def test_tp_vocab_sharded_embedding_head_exact(self, mesh2d):
        """Vocab-parallel TP (loss_chunk_size set + tied head): the tied
        embedding/head is sharded over 'model' (Megatron vocab-parallel
        CE + sharded-table lookup) and the full train step still matches
        the single-device step exactly."""
        import optax
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.parallel.tp import (shards_vocab, tp_localize,
                                                tp_param_specs)

        hp = TransformerHparams(
            d_model=64, num_heads=4, num_layers=2, vocab_size=512,
            sparse_self_attention=False, use_pallas_kernel=False,
            loss_chunk_size=64)
        assert shards_vocab(hp, 2)
        model = TransformerLanguageModel(hp)
        objective = ARObjective(hp)
        optimizer = optax.sgd(1e-2)
        rng = jax.random.PRNGKey(0)
        k, b = 2, mesh2d.shape["data"] * 2
        batch = _uneven_batch(rng, k, b, 128, 512)
        params = model.init(rng, batch["token_ids"][0])["params"]
        opt_state = optimizer.init(params)

        # the embedding/bias really are sharded in the spec tree
        specs = tp_param_specs(params, 2, True)
        assert specs["input_embedding"]["embedding"] == P("model", None)
        assert specs["output_bias"] == P("model")

        clone = lambda t: jax.tree.map(jnp.array, t)
        sharded = make_train_step(tp_localize(model, 2), objective,
                                  optimizer, mesh=mesh2d)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = sharded(clone(params), clone(opt_state),
                             shard_batch(batch, mesh2d, stacked=True),
                             jnp.asarray(0), step_rng)

        # Single-device simulation with the pinned per-data-shard rng
        # semantics (the chunked AR branch applies dropout, whose masks are
        # a function of the folded shard rng — a plain single-device step
        # would draw different masks).
        n_data = mesh2d.shape["data"]
        rows_per = b // n_data

        def micro_loss(p, i):
            sums = counts = None
            for s in range(n_data):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {name: arr[i, s * rows_per:(s + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(
                    jnp.add, sums, su)
                counts = co if counts is None else jax.tree.map(
                    jnp.add, counts, co)
            return objective.compose_loss(sums, counts, 0)

        grads_acc, losses = None, []
        for i in range(k):
            (loss_i, _), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(loss_i))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = optimizer.update(grads, opt_state, params)
        import optax as _optax
        p0 = _optax.apply_updates(params, updates)

        _tree_allclose(p1, p0, rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
