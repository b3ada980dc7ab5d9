"""Mixture-of-Experts FFN (models/moe.py) + expert parallelism
(parallel/ep.py): routing/dispatch oracles, capacity dropping, pad
exclusion, the linear aux-loss composition, and exact equivalence of the
expert-parallel production train step on the virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from sparse_vae_tpu.models.moe import (MoEFFN, collect_moe_stats,
                                       compose_moe_losses, expert_capacity)
from sparse_vae_tpu.models.transformer_lm import (TransformerHparams,
                                                  TransformerLanguageModel)
from sparse_vae_tpu.training.objectives import ARObjective


def _moe_apply(m, x, mask=None):
    variables = m.init(jax.random.PRNGKey(0), x, mask)
    y, lvars = m.apply({"params": variables["params"]}, x, mask,
                       mutable=["losses"])
    return variables["params"], y, collect_moe_stats(lvars["losses"])


def _oracle(params, x_flat, mask_flat, top_k, capacity=None):
    """Per-token loop: top-k expert mix with optional per-expert capacity
    dropping in (slot, token) priority order."""
    logits = x_flat @ params["router"]["kernel"]
    probs = jax.nn.softmax(logits, -1)
    gv, idx = jax.lax.top_k(probs, top_k)
    gv = gv / jnp.maximum(gv.sum(-1, keepdims=True), 1e-9) if top_k > 1 \
        else gv
    n = x_flat.shape[0]
    used = {}
    out = np.zeros_like(np.asarray(x_flat))
    for s in range(top_k):
        for t in range(n):
            if not bool(mask_flat[t]):
                continue
            e = int(idx[t, s])
            c = used.get(e, 0)
            used[e] = c + 1
            if capacity is not None and c >= capacity:
                continue
            h = jax.nn.gelu(x_flat[t] @ params["w_in"][e]
                            + params["b_in"][e])
            out[t] += float(gv[t, s]) * np.asarray(h @ params["w_out"][e])
    return out


class TestMoEFFN:
    @pytest.mark.parametrize("top_k", [1, 2])
    def test_matches_per_token_oracle(self, top_k):
        b, l, d, e = 2, 16, 8, 4
        m = MoEFFN(d_model=d, d_hidden=16, num_experts=e, top_k=top_k,
                   capacity_factor=float(e))  # no drops
        x = jax.random.normal(jax.random.PRNGKey(1), (b, l, d))
        mask = jnp.ones((b, l), bool).at[1, 10:].set(False)
        params, y, _ = _moe_apply(m, x, mask)
        oracle = _oracle(params, x.reshape(-1, d), mask.reshape(-1), top_k)
        np.testing.assert_allclose(np.asarray(y).reshape(-1, d), oracle,
                                   atol=3e-5)

    def test_capacity_dropping_priority(self):
        """Overflowing tokens get ZERO MoE output; priority is slot-major
        then token order — exactly the oracle's loop order."""
        b, l, d, e = 1, 32, 8, 2
        m = MoEFFN(d_model=d, d_hidden=16, num_experts=e, top_k=2,
                   capacity_factor=0.25)
        cap = expert_capacity(b * l, e, 2, 0.25)
        assert cap == 8
        x = jax.random.normal(jax.random.PRNGKey(2), (b, l, d))
        params, y, _ = _moe_apply(m, x)
        oracle = _oracle(params, x.reshape(-1, d),
                         jnp.ones((b * l,), bool), 2, capacity=cap)
        np.testing.assert_allclose(np.asarray(y).reshape(-1, d), oracle,
                                   atol=3e-5)
        # something actually dropped at this capacity
        assert np.any(np.all(oracle == 0.0, axis=-1))

    def test_pads_excluded_everywhere(self):
        """Pad tokens produce zero output, consume no capacity, and do not
        enter the balance statistics."""
        b, l, d, e = 2, 16, 8, 4
        m = MoEFFN(d_model=d, d_hidden=16, num_experts=e, top_k=1,
                   capacity_factor=float(e))
        x = jax.random.normal(jax.random.PRNGKey(3), (b, l, d))
        mask = jnp.ones((b, l), bool).at[:, 8:].set(False)
        params, y, stats = _moe_apply(m, x, mask)
        assert float(jnp.abs(y[:, 8:]).max()) == 0.0
        assert float(stats["nv"]) == 16.0
        np.testing.assert_allclose(np.asarray(stats["load"]).sum(), 16.0)
        np.testing.assert_allclose(np.asarray(stats["imp"]).sum(), 16.0,
                                   rtol=1e-5)

    def test_aux_composition_value(self):
        """compose_moe_losses reproduces the textbook Switch aux loss
        E * sum_e f_e * P_e and the ST-MoE z-loss on hand-built stats."""
        imp = jnp.asarray([[2.0, 1.0, 1.0, 0.0]])      # [nL=1, E=4]
        load = jnp.asarray([[3.0, 1.0, 0.0, 0.0]])
        sums = {"moe_imp_sum": imp, "moe_z_sum": jnp.asarray(8.0)}
        counts = {"moe_load": load, "moe_nv": jnp.asarray(4.0)}
        loss, metrics = compose_moe_losses(sums, counts, 0.5, 0.25)
        expect_aux = 4 * (3 * 2 + 1 * 1) / 16.0
        np.testing.assert_allclose(float(metrics["train_moe_aux"]),
                                   expect_aux, rtol=1e-6)
        np.testing.assert_allclose(float(metrics["train_moe_z"]), 2.0)
        np.testing.assert_allclose(float(loss),
                                   0.5 * expect_aux + 0.25 * 2.0, rtol=1e-6)

    def test_balanced_router_aux_near_one(self):
        """A fresh (near-uniform) router gives aux ~= 1 — the standard
        normalization where perfectly balanced routing scores exactly 1."""
        b, l, d, e = 4, 32, 16, 8
        m = MoEFFN(d_model=d, d_hidden=32, num_experts=e, top_k=2,
                   capacity_factor=2.0)
        x = jax.random.normal(jax.random.PRNGKey(4), (b, l, d))
        _, _, stats = _moe_apply(m, x)
        sums, counts = {}, {}
        from sparse_vae_tpu.models.moe import moe_loss_terms
        moe_loss_terms(stats, sums, counts)
        _, metrics = compose_moe_losses(sums, counts, 1.0, 0.0)
        assert 0.7 < float(metrics["train_moe_aux"]) < 1.5


def _lm(num_experts, **over):
    hp = TransformerHparams(vocab_size=64, d_model=32, num_heads=4,
                            num_layers=2, sparse_self_attention=False,
                            use_pallas_kernel=False, loss_chunk_size=16,
                            num_experts=num_experts,
                            moe_capacity_factor=8.0, **over)
    return TransformerLanguageModel(hp), ARObjective(hp)


class TestMoELanguageModel:
    def _batch(self, k=None):
        rng = jax.random.PRNGKey(0)
        shape = (8, 32) if k is None else (k, 8, 32)
        ids = jax.random.randint(rng, shape, 3, 64)
        ids = ids.at[..., -1, 5:].set(0)
        return {"token_ids": ids,
                "num_tokens": (ids != 0).sum(-1).astype(jnp.int32),
                "num_bytes": jnp.full(shape[:-1], 50.0)}

    def test_loss_has_aux_terms_and_router_grad(self):
        model, objective = _lm(4)
        batch = self._batch()
        rng = jax.random.PRNGKey(1)
        params = model.init(rng, batch["token_ids"])["params"]

        def f(p):
            s, c = objective.loss_sums(model, p, batch, 0, rng)
            return objective.compose_loss(s, c, 0)

        (loss, metrics), grads = jax.value_and_grad(f, has_aux=True)(params)
        assert "train_moe_aux" in metrics and "train_moe_z" in metrics
        assert float(metrics["train_moe_aux"]) > 0
        for layer in ("layer_0", "layer_1"):
            moe = grads[layer]["moe"]
            assert float(jnp.linalg.norm(moe["router"]["kernel"])) > 0
            assert float(jnp.linalg.norm(moe["w_in"])) > 0

    def test_compose_loss_is_linear_in_sums(self):
        """The sharded-gradient contract (parallel/spmd.py): the MoE aux
        terms must keep compose_loss linear in sums at fixed counts."""
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear
        model, objective = _lm(4)
        batch = self._batch()
        rng = jax.random.PRNGKey(1)
        params = model.init(rng, batch["token_ids"])["params"]
        sums, counts = objective.loss_sums(model, params, batch, 0, rng)
        assert_compose_loss_linear(objective, sums, counts, 0)

    def test_remat_matches_no_remat(self):
        """grad_checkpointing must not change the MoE loss or gradients
        (sow rides flax's lifted remat)."""
        model, objective = _lm(4)
        model_r, objective_r = _lm(4, grad_checkpointing=True)
        batch = self._batch()
        rng = jax.random.PRNGKey(1)
        params = model.init(rng, batch["token_ids"])["params"]

        def loss_of(m, obj):
            def f(p):
                s, c = obj.loss_sums(m, p, batch, 0, rng)
                return obj.compose_loss(s, c, 0)[0]
            return f

        l0, g0 = jax.value_and_grad(loss_of(model, objective))(params)
        l1, g1 = jax.value_and_grad(loss_of(model_r, objective_r))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for (p0, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                   jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=str(p0))

    def test_vae_decoder_moe(self):
        """The flagship TransformerVAE inherits MoE decoder FFNs (the
        Perceiver encoder stays dense); the VAE objective folds the aux
        terms in and its composition stays linear in sums."""
        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import assert_compose_loss_linear

        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=64, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False,
            loss_chunk_size=16, num_experts=4, moe_capacity_factor=8.0)
        model = TransformerVAE(hp)
        objective = VAEObjective(hp)
        batch = self._batch()
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][:1])["params"]
        assert "moe" in params["layer_0"]
        assert not any("moe" in k for k in params["encoder"]["first_layer"])
        sums, counts = objective.loss_sums(model, params, batch, 0, rng)
        assert "moe_imp_sum" in sums
        loss, metrics = objective.compose_loss(sums, counts, 0)
        assert np.isfinite(float(loss))
        assert "train_moe_aux" in metrics and "train_kl" in metrics
        assert_compose_loss_linear(objective, sums, counts, 0)

    def test_vae_moe_multi_sample_raises(self):
        import dataclasses

        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective

        hp = TransformerVAEHparams(
            d_model=32, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=64, num_encoder_latents=4,
            sparse_self_attention=False, use_pallas_kernel=False,
            loss_chunk_size=16, num_experts=4, train_mc_samples=4)
        model = TransformerVAE(hp)
        objective = VAEObjective(hp)
        batch = self._batch()
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][:1])["params"]
        with pytest.raises(ValueError, match="train_mc_samples=1"):
            objective.loss_sums(model, params, batch, 0, rng)

    def test_pp_plus_moe_raises(self):
        from sparse_vae_tpu.parallel.mesh import create_mesh
        from sparse_vae_tpu.parallel.pp import (make_pp_optimizer,
                                                make_pp_train_step)
        model, objective = _lm(4)
        mesh = create_mesh(num_devices=4, pipe_axis=2,
                           devices=jax.devices("cpu"))
        opt = make_pp_optimizer(lr=1e-3, lr_decay_steps=100,
                                grad_clip_threshold=5.0)
        with pytest.raises(NotImplementedError, match="not pipelined"):
            make_pp_train_step(model, objective, opt, mesh)

    def test_moe_lm_samples(self):
        """The AR decode path runs the MoE FFN on single-token steps
        (per-step capacity pools) and produces a full sequence."""
        model, _ = _lm(4)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 16), jnp.int32))["params"]
        tokens = jax.jit(
            lambda p, r: model.apply({"params": p}, r, 24, 2,
                                     method=type(model).sample)
        )(params, jax.random.PRNGKey(1))
        assert tokens.shape == (2, 23)  # max_length-1 generated tokens
        assert np.asarray(tokens).max() < 64

    def test_dead_rows_do_not_steal_decode_capacity(self):
        """At decode, finished rows feed [PAD]=0 forever; they must not be
        dispatched, or (at tight capacity) they would preempt live rows'
        expert slots and make a row's sample depend on how many siblings
        finished. Invariance check: a live token's logits are identical
        whether it sits behind three dead rows or in front of them."""
        import dataclasses
        model, _ = _lm(2, moe_top_k=1)
        hp = dataclasses.replace(model.hparams, moe_capacity_factor=0.25)
        model = TransformerLanguageModel(hp)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 16), jnp.int32))["params"]

        def step_logits(tokens):
            caches = model.apply({"params": params}, 4, 16,
                                 method=type(model).init_caches)
            logits, _ = model.apply({"params": params},
                                    jnp.asarray(tokens, jnp.int32), caches,
                                    jnp.asarray(0),
                                    method=type(model).decode_step)
            return np.asarray(logits)

        for t in range(3, 11):
            behind = step_logits([0, 0, 0, t])[3]
            front = step_logits([t, 0, 0, 0])[0]
            np.testing.assert_allclose(behind, front, atol=1e-6,
                                       err_msg=f"token {t}")

    def test_moe_under_sequence_parallel_eval_exact(self):
        """MoE + sequence parallelism: the 'seq'-sharded eval step (length
        axis sharded, MoE routing per length shard, balance sums psum'd
        over (data, seq)) equals single-device eval — the aux composition
        is layout-independent by construction."""
        from sparse_vae_tpu.parallel.mesh import create_mesh
        from sparse_vae_tpu.parallel.sp import sp_localize
        from sparse_vae_tpu.parallel.spmd import (make_eval_step,
                                                  shard_batch)

        hp = TransformerHparams(
            vocab_size=64, d_model=32, num_heads=4, num_layers=2,
            sparse_self_attention=True, attn_window_size=1,
            attn_block_size=16, use_pallas_kernel=False,
            loss_chunk_size=16, num_experts=4, moe_capacity_factor=8.0)
        model = TransformerLanguageModel(hp)
        objective = ARObjective(hp)
        mesh = create_mesh(num_devices=4, seq_axis=2,
                           devices=jax.devices("cpu"))
        rng = jax.random.PRNGKey(0)
        ids = jax.random.randint(rng, (4, 64), 3, 64)
        batch = {"token_ids": ids,
                 "num_tokens": (ids != 0).sum(-1).astype(jnp.int32),
                 "num_bytes": jnp.full((4,), 50.0)}
        params = model.init(rng, ids)["params"]
        twin = sp_localize(model, 2)
        s1 = make_eval_step(twin, objective, mesh=mesh)(
            jax.tree.map(jnp.array, params), shard_batch(batch, mesh), rng)
        s0 = make_eval_step(model, objective, mesh=None)(
            params, batch, rng)
        for key in s0:
            np.testing.assert_allclose(float(s1[key]), float(s0[key]),
                                       rtol=1e-5, err_msg=key)


class TestExpertParallel:
    @pytest.fixture(scope="class")
    def mesh(self):
        from sparse_vae_tpu.parallel.mesh import create_mesh
        return create_mesh(num_devices=4, expert_axis=2,
                           devices=jax.devices("cpu"))

    def test_mesh_axes(self, mesh):
        assert mesh.shape == {"data": 2, "expert": 2}

    def test_ep_param_specs(self):
        from sparse_vae_tpu.parallel.ep import ep_param_specs
        model, _ = _lm(4)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 8), jnp.int32))["params"]
        specs = ep_param_specs(params)
        assert specs["layer_0"]["moe"]["w_in"] == P("expert", None, None)
        assert specs["layer_0"]["moe"]["b_in"] == P("expert", None)
        assert specs["layer_0"]["moe"]["router"]["kernel"] == P()
        assert specs["head_dense"]["kernel"] == P()

    def test_ep_train_step_exact_vs_shard_simulation(self, mesh):
        """The expert-parallel production step (data 2 x expert 2: rows
        sharded over both axes, expert stacks all_to_all'd) must equal a
        single-device simulation with the pinned per-shard RNG and the
        same psum'd sums — float-exact up to reduction order. Capacity is
        set high enough that nothing drops (the per-shard drop pools are
        the one deliberately layout-dependent behavior)."""
        from sparse_vae_tpu.parallel.ep import (clip_by_ep_global_norm,
                                                ep_localize, ep_shardings)
        from sparse_vae_tpu.parallel.spmd import (make_train_step,
                                                  shard_batch)
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective = _lm(4, moe_top_k=2)
        twin = ep_localize(model, 2)
        opt = make_optimizer(lr=1e-2, lr_decay_steps=100,
                             grad_clip_threshold=5.0,
                             clip=clip_by_ep_global_norm(5.0))
        batch = TestMoELanguageModel._batch(self, k=2)
        k, b = 2, 8
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["token_ids"][0])["params"]
        opt_state = opt.init(params)
        put = lambda t: jax.tree.map(jax.device_put,
                                     jax.tree.map(jnp.array, t),
                                     ep_shardings(t, mesh))
        step = make_train_step(twin, objective, opt, mesh=mesh)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = step(put(params), put(opt_state),
                          shard_batch(batch, mesh, stacked=True),
                          jnp.asarray(0), step_rng)

        # Single-device simulation: same shard split (rows over
        # data-major x expert), same rng folds, psum == python sum.
        n_shard, rows_per = 4, b // 4

        def micro_loss(p, i):
            sums = counts = None
            for s in range(n_shard):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {n: a[i, s * rows_per:(s + 1) * rows_per]
                      for n, a in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(jnp.add,
                                                            sums, su)
                counts = co if counts is None else jax.tree.map(jnp.add,
                                                                counts, co)
            return objective.compose_loss(sums, counts, 0)

        opt_ref = make_optimizer(lr=1e-2, lr_decay_steps=100,
                                 grad_clip_threshold=5.0)
        grads_acc, losses = None, []
        for i in range(k):
            (li, _), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(li))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = opt_ref.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        for (path, a), (_, b_) in zip(
                jax.tree_util.tree_leaves_with_path(p1),
                jax.tree_util.tree_leaves_with_path(p0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-5, atol=2e-5,
                                       err_msg=str(path))

    def test_ep_eval_step_matches_single_device(self, mesh):
        from sparse_vae_tpu.parallel.ep import ep_localize, ep_shardings
        from sparse_vae_tpu.parallel.spmd import (make_eval_step,
                                                  shard_batch)

        model, objective = _lm(4)
        twin = ep_localize(model, 2)
        batch = TestMoELanguageModel._batch(self)
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["token_ids"])["params"]
        p_dev = jax.tree.map(jax.device_put, params,
                             ep_shardings(params, mesh))
        s1 = make_eval_step(twin, objective, mesh=mesh)(
            p_dev, shard_batch(batch, mesh), rng)
        s0 = make_eval_step(model, objective, mesh=None)(
            params, batch, rng)
        for key in s0:
            np.testing.assert_allclose(float(s1[key]), float(s0[key]),
                                       rtol=1e-5, err_msg=key)

    def test_ep_localize_guards(self):
        from sparse_vae_tpu.parallel.ep import ep_localize
        dense, _ = _lm(0)
        with pytest.raises(ValueError, match="num_experts > 1"):
            ep_localize(dense, 2)
        moe3, _ = _lm(3)
        with pytest.raises(ValueError, match="not divisible"):
            ep_localize(moe3, 2)

    def test_mesh_combo_guard(self):
        from sparse_vae_tpu.parallel.mesh import create_mesh
        with pytest.raises(NotImplementedError):
            create_mesh(num_devices=8, expert_axis=2, model_axis=2,
                        devices=jax.devices("cpu"))

    def test_trainer_fit_on_expert_mesh(self, tmp_path, tmp_path_factory):
        """End-to-end Trainer.fit of an MoE Transformer-LM on a
        data 4 x expert 2 mesh (trainer.expert_parallel=2 wiring: the
        ep-localized twin, expert shardings, the EP-aware clip)."""
        import os

        from sparse_vae_tpu.data.text_data_module import (
            TextDataModule, TextDataModuleHparams)
        from sparse_vae_tpu.parallel.mesh import create_mesh
        from sparse_vae_tpu.training.trainer import Trainer
        from sparse_vae_tpu.utils.config import TrainerHparams

        cwd = os.getcwd()
        os.chdir(tmp_path_factory.mktemp("epwork"))
        try:
            dm = TextDataModule(TextDataModuleHparams(
                dataset_name="synthetic", synthetic_docs=48, vocab_size=512,
                tokens_per_batch=1024, min_tokens_per_sample=4,
                max_tokens_per_sample=250, pad_to_multiple_of=128,
                test_size=8))
            dm.prepare_data()
        finally:
            os.chdir(cwd)

        hp = TransformerHparams(
            d_model=32, num_heads=4, num_layers=2, vocab_size=512,
            sparse_self_attention=False, use_pallas_kernel=False,
            loss_chunk_size=64, num_experts=4, moe_top_k=2,
            lr=1e-2, lr_decay_steps=10_000, base_batch_size=2048)
        model = TransformerLanguageModel(hp)
        obj = ARObjective(hp)
        thp = TrainerHparams(accumulate_grad_batches=1, max_steps=3,
                             val_check_interval=100.0,
                             checkpoint_every_n_steps=10 ** 9,
                             sample_every_n_steps=10 ** 9,
                             expert_parallel=2)
        mesh = create_mesh(num_devices=8, expert_axis=thp.expert_parallel)
        trainer = Trainer(model, hp, obj, dm, thp,
                          experiment="transformer-lm", name="ep1",
                          log_root=tmp_path, enable_logging=False,
                          mesh=mesh)
        outcome = trainer.fit(max_epochs=100)
        assert outcome.step == 3
        leaves = jax.tree_util.tree_leaves(outcome.params)
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves)

    def test_checkpoint_resume_on_expert_mesh(self, tmp_path,
                                              tmp_path_factory):
        """Orbax save/restore roundtrips EXPERT-SHARDED params: the resume
        template comes from init_state (ep shardings), so the restored
        expert stacks come back sharded over 'expert' and training
        continues from the saved step."""
        import os

        from sparse_vae_tpu.data.text_data_module import (
            TextDataModule, TextDataModuleHparams)
        from sparse_vae_tpu.parallel.mesh import create_mesh
        from sparse_vae_tpu.training.trainer import Trainer
        from sparse_vae_tpu.utils.config import TrainerHparams

        cwd = os.getcwd()
        os.chdir(tmp_path_factory.mktemp("epckpt"))
        try:
            dm = TextDataModule(TextDataModuleHparams(
                dataset_name="synthetic", synthetic_docs=48, vocab_size=512,
                tokens_per_batch=1024, min_tokens_per_sample=4,
                max_tokens_per_sample=250, pad_to_multiple_of=128,
                test_size=8))
            dm.prepare_data()
        finally:
            os.chdir(cwd)

        hp = TransformerHparams(
            d_model=32, num_heads=4, num_layers=2, vocab_size=512,
            sparse_self_attention=False, use_pallas_kernel=False,
            loss_chunk_size=64, num_experts=4, moe_top_k=2,
            lr=1e-2, lr_decay_steps=10_000, base_batch_size=2048)
        mesh = create_mesh(num_devices=8, expert_axis=2)

        def make_trainer(max_steps):
            thp = TrainerHparams(
                accumulate_grad_batches=1, max_steps=max_steps,
                val_check_interval=100.0, checkpoint_every_n_steps=2,
                sample_every_n_steps=10 ** 9, expert_parallel=2)
            return Trainer(TransformerLanguageModel(hp), hp, ARObjective(hp),
                           dm, thp, experiment="transformer-lm",
                           name="ep-resume", log_root=tmp_path,
                           enable_logging=True, mesh=mesh)

        t1 = make_trainer(2)
        out1 = t1.fit(max_epochs=100)
        t1.ckpt.close()
        assert out1.step == 2

        t2 = make_trainer(4)
        out2 = t2.fit(max_epochs=100, resume=True)
        t2.ckpt.close()
        assert out2.step == 4
        w_in = out2.params["layer_0"]["moe"]["w_in"]
        assert w_in.sharding.spec[0] == "expert", w_in.sharding
        assert np.isfinite(np.asarray(w_in)).all()


class TestMoETensorParallel:
    """MoE composed with tensor parallelism (parallel/tp.py): every
    expert's hidden dim sharded over 'model' (w_in column-parallel, w_out
    row-parallel per expert), router and dispatch replicated — exact
    equivalence of the production train step vs single-device."""

    @pytest.fixture(scope="class")
    def mesh2d(self):
        from sparse_vae_tpu.parallel.mesh import create_mesh
        return create_mesh(num_devices=8, model_axis=2,
                           devices=jax.devices("cpu"))

    def test_tp_moe_param_specs(self):
        from sparse_vae_tpu.parallel.tp import tp_param_specs
        model, _ = _lm(4)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((1, 8), jnp.int32))["params"]
        specs = tp_param_specs(params, 2)
        moe = specs["layer_0"]["moe"]
        assert moe["w_in"] == P(None, None, "model")
        assert moe["b_in"] == P(None, "model")
        assert moe["w_out"] == P(None, "model", None)
        assert moe["router"]["kernel"] == P()

    def test_tp_moe_forward_exact(self, mesh2d):
        """MoEFFN with the hidden dim sharded over 'model' == the unsharded
        layer, bit-for-float on the same dispatch (routing is replicated)."""
        from sparse_vae_tpu.models.moe import MoEFFN
        d, e = 16, 4
        m = MoEFFN(d_model=d, d_hidden=32, num_experts=e, top_k=2,
                   capacity_factor=float(e))
        # batch 4 = the mesh's data axis (shard_map needs it divisible)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 24, d))
        mask = jnp.ones((4, 24), bool).at[1, 20:].set(False)
        params = m.init(jax.random.PRNGKey(0), x, mask)["params"]
        ref, _ = m.apply({"params": params}, x, mask, mutable=["losses"])

        m_tp = MoEFFN(d_model=d, d_hidden=32, num_experts=e, top_k=2,
                      capacity_factor=float(e), tp_size=2)
        specs = {
            "router": {"kernel": P()},
            "w_in": P(None, None, "model"),
            "b_in": P(None, "model"),
            "w_out": P(None, "model", None),
        }
        mapped = jax.shard_map(
            lambda p, xx, mm: m_tp.apply({"params": p}, xx, mm,
                                         mutable=["losses"])[0],
            mesh=mesh2d, in_specs=(specs, P("data"), P("data")),
            out_specs=P("data"), check_vma=False)
        out = jax.jit(mapped)(params, x, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_tp_moe_train_step_exact_vs_single_device(self, mesh2d):
        """Full production train step for an MoE LM on data 4 x model 2 ==
        a single-device simulation with the pinned per-data-shard rng
        (the chunked AR branch applies dropout whose masks are a function
        of the folded shard rng — same protocol as
        test_tp_vocab_sharded_embedding_head_exact and the EP test).
        Capacity is high enough that nothing drops; aux/z losses
        included."""
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.parallel.tp import tp_localize
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective = _lm(4, moe_top_k=2)
        opt = make_optimizer(lr=1e-2, lr_decay_steps=100,
                             grad_clip_threshold=5.0, tp_size=2,
                             tp_shard_vocab=True)
        opt_ref = make_optimizer(lr=1e-2, lr_decay_steps=100,
                                 grad_clip_threshold=5.0)
        batch = TestMoELanguageModel._batch(self, k=2)
        k, b = 2, 8
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, batch["token_ids"][0])["params"]
        # Decisive routing margins: at a fresh init the router logits are
        # near-uniform, so the ulp-level reassociation differences from the
        # TP attention psum can flip top-k order between near-tied experts.
        # Scaling the router kernel makes the margins decisive; it tests
        # the same code paths.
        for layer in ("layer_0", "layer_1"):
            moe = params[layer]["moe"]
            moe["router"]["kernel"] = moe["router"]["kernel"] * 30.0
        opt_state = opt.init(params)

        clone = lambda t: jax.tree.map(jnp.array, t)
        sharded = make_train_step(tp_localize(model, 2), objective, opt,
                                  mesh=mesh2d)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = sharded(clone(params), clone(opt_state),
                             shard_batch(batch, mesh2d, stacked=True),
                             jnp.asarray(0), step_rng)

        # Single-device simulation: same data-shard split, same rng folds,
        # psum == python sum over shards.
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
                sums = su if sums is None else jax.tree.map(jnp.add,
                                                            sums, su)
                counts = co if counts is None else jax.tree.map(jnp.add,
                                                                counts, co)
            return objective.compose_loss(sums, counts, 0)

        grads_acc, losses = None, []
        for i in range(k):
            (li, mets), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(li))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = opt_ref.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        assert float(m1["train_moe_aux"]) > 0
        for (path, a), (_, b_) in zip(
                jax.tree_util.tree_leaves_with_path(p1),
                jax.tree_util.tree_leaves_with_path(p0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=3e-5, atol=2e-5,
                                       err_msg=str(path))

    def test_ep_times_tp_guarded(self):
        """The 3-axis MoE combination (experts over 'expert' AND hidden
        over 'model') is an explicit unimplemented scope, not silence."""
        from sparse_vae_tpu.models.moe import MoEFFN
        m = MoEFFN(d_model=8, d_hidden=16, num_experts=4, ep_size=2,
                   tp_size=2)
        with pytest.raises(NotImplementedError, match="expert x tensor"):
            m.init(jax.random.PRNGKey(0),
                   jnp.ones((1, 8, 8), jnp.float32), None)
