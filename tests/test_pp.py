"""Pipeline parallelism (parallel/pp.py): the GPipe-style scan-of-ppermute
step on a ('data', 'pipe') mesh must reproduce the single-device accumulated
step exactly — loss, grad norm (the pp-aware clip), and every updated
parameter — including when the microbatch count is smaller than the stage
count (pipeline bubbles) and under per-layer rematerialization."""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sparse_vae_tpu.models.transformer_lm import (TransformerHparams,
                                                  TransformerLanguageModel)
from sparse_vae_tpu.parallel.mesh import create_mesh
from sparse_vae_tpu.parallel.pp import (make_pp_optimizer, make_pp_train_step,
                                        pp_merge_params, pp_param_specs,
                                        pp_split_params)
from sparse_vae_tpu.parallel.spmd import shard_batch
from sparse_vae_tpu.training.objectives import ARObjective
from sparse_vae_tpu.training.optimizer import make_optimizer


def _setup(num_layers=4, grad_checkpointing=False):
    hp = TransformerHparams(
        d_model=32, num_heads=2, num_layers=num_layers, vocab_size=64,
        sparse_self_attention=True, attn_window_size=2, attn_block_size=8,
        use_pallas_kernel=False, loss_chunk_size=16,
        grad_checkpointing=grad_checkpointing)
    return TransformerLanguageModel(hp), ARObjective(hp), hp


def _batch(rng, k, b, L, vocab=64):
    lengths = np.array(jax.random.randint(rng, (k, b), L // 2, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, vocab))
    tokens = tokens * (np.arange(L)[None, None, :] < lengths[:, :, None])
    return {"token_ids": jnp.asarray(tokens, jnp.int32),
            "num_tokens": jnp.asarray(lengths, jnp.int32),
            "num_bytes": jnp.asarray(lengths * 4, jnp.int32)}


def _single_device_reference(model, obj, params, batch, k):
    """Mean-of-per-microbatch global losses/grads (spmd.py semantics) with
    the standard optimizer, deterministic (rng=None) forwards."""
    opt_ref = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                             grad_clip_threshold=5.0)
    grads_acc, losses = None, []
    for i in range(k):
        mb = {name: arr[i] for name, arr in batch.items()}
        (loss_i, _), g = jax.value_and_grad(
            lambda p: obj.loss(model, p, mb, 0, None), has_aux=True)(params)
        losses.append(float(loss_i))
        grads_acc = g if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, g)
    grads = jax.tree.map(lambda x: x / k, grads_acc)
    updates, _ = opt_ref.update(grads, opt_ref.init(params), params)
    return (optax.apply_updates(params, updates), np.mean(losses),
            float(optax.global_norm(grads)))


def _assert_trees_match(got, want, rtol=2e-4, atol=2e-6):
    flat_want = {str(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(want)}
    flat_got = {str(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(got)}
    assert flat_want.keys() == flat_got.keys()
    for key, v in flat_got.items():
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(flat_want[key]),
                                   rtol=rtol, atol=atol, err_msg=key)


@pytest.fixture
def pipe_mesh():
    return create_mesh(num_devices=8, pipe_axis=4)


class TestParamLayout:
    def test_split_merge_roundtrip(self):
        model, _, hp = _setup()
        rng = jax.random.PRNGKey(0)
        params = model.init(rng, jnp.ones((2, 32), jnp.int32))["params"]
        merged = pp_merge_params(pp_split_params(params, hp.num_layers))
        _assert_trees_match(merged, params, rtol=0, atol=0)

    def test_specs_shard_only_layers(self):
        from jax.sharding import PartitionSpec as P
        model, _, hp = _setup()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.ones((2, 32), jnp.int32))["params"]
        ppp = pp_split_params(params, hp.num_layers)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=None,
                                grad_clip_threshold=5.0)
        for tree in (ppp, opt.init(ppp)):
            specs = pp_param_specs(tree)
            flat = jax.tree_util.tree_leaves_with_path(specs)
            assert any(s == P("pipe") for _, s in flat)
            for path, spec in flat:
                in_layers = any(
                    isinstance(kk, jax.tree_util.DictKey)
                    and kk.key == "layers" for kk in path)
                assert spec == (P("pipe") if in_layers else P()), path


class TestPipelineStepExact:
    @pytest.mark.parametrize("k,checkpointing", [(5, False), (2, False),
                                                 (5, True)])
    def test_matches_single_device(self, pipe_mesh, k, checkpointing):
        """data=2 x pipe=4; k=2 < pipe exercises bubble ticks (stages idle
        on garbage, masked); checkpointing wraps the stage layers in
        jax.checkpoint."""
        model, obj, hp = _setup(grad_checkpointing=checkpointing)
        rng = jax.random.PRNGKey(1)
        batch = _batch(rng, k, 4, 64)
        params = model.init(rng, batch["token_ids"][0])["params"]

        ppp = pp_split_params(params, hp.num_layers)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=5.0)
        step_fn = make_pp_train_step(model, obj, opt, pipe_mesh,
                                     deterministic=True)
        clone = lambda t: jax.tree.map(jnp.array, t)
        p1, o1, m1 = step_fn(clone(ppp), clone(opt.init(ppp)),
                             shard_batch(batch, pipe_mesh, stacked=True),
                             jnp.asarray(0), jax.random.PRNGKey(7))

        p0, loss0, gnorm0 = _single_device_reference(model, obj, params,
                                                     batch, k)
        np.testing.assert_allclose(float(m1["loss"]), loss0, rtol=1e-5)
        np.testing.assert_allclose(float(m1["grad_norm"]), gnorm0,
                                   rtol=1e-4)
        _assert_trees_match(pp_merge_params(p1), p0)

    def test_two_steps_stay_exact(self, pipe_mesh):
        """Optimizer state (RAdam moments on stacked leaves) carries
        correctly across steps."""
        model, obj, hp = _setup()
        rng = jax.random.PRNGKey(2)
        batch1 = _batch(rng, 4, 4, 64)
        batch2 = _batch(jax.random.PRNGKey(3), 4, 4, 64)
        params = model.init(rng, batch1["token_ids"][0])["params"]

        ppp = pp_split_params(params, hp.num_layers)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=5.0)
        step_fn = make_pp_train_step(model, obj, opt, pipe_mesh,
                                     deterministic=True)
        p1, o1 = jax.tree.map(jnp.array, ppp), opt.init(ppp)
        for i, bt in enumerate((batch1, batch2)):
            p1, o1, m1 = step_fn(p1, o1, shard_batch(bt, pipe_mesh,
                                                     stacked=True),
                                 jnp.asarray(i), jax.random.PRNGKey(7))

        # Single-device two-step reference.
        opt_ref = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                 grad_clip_threshold=5.0)
        p0, os0 = params, opt_ref.init(params)
        for bt in (batch1, batch2):
            grads_acc = None
            for i in range(4):
                mb = {name: arr[i] for name, arr in bt.items()}
                g = jax.grad(lambda p: obj.loss(model, p, mb, 0, None)[0]
                             )(p0)
                grads_acc = g if grads_acc is None else jax.tree.map(
                    jnp.add, grads_acc, g)
            grads = jax.tree.map(lambda x: x / 4, grads_acc)
            updates, os0 = opt_ref.update(grads, os0, p0)
            p0 = optax.apply_updates(p0, updates)
        _assert_trees_match(pp_merge_params(p1), p0, rtol=5e-4, atol=5e-6)

    def test_dropout_mode_runs(self, pipe_mesh):
        """Non-deterministic mode (per microbatch x global-layer folded
        dropout streams) compiles and produces finite loss/params."""
        model, obj, hp = _setup()
        rng = jax.random.PRNGKey(4)
        batch = _batch(rng, 4, 4, 64)
        params = model.init(rng, batch["token_ids"][0])["params"]
        ppp = pp_split_params(params, hp.num_layers)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=5.0)
        step_fn = make_pp_train_step(model, obj, opt, pipe_mesh)
        p1, _, m1 = step_fn(jax.tree.map(jnp.array, ppp), opt.init(ppp),
                            shard_batch(batch, pipe_mesh, stacked=True),
                            jnp.asarray(0), jax.random.PRNGKey(7))
        assert np.isfinite(float(m1["loss"]))
        for leaf in jax.tree.leaves(p1):
            assert np.all(np.isfinite(np.asarray(leaf)))


def _vae_setup(num_layers=4, free_bits=0.0):
    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)
    from sparse_vae_tpu.models.vae import VAEObjective
    hp = TransformerVAEHparams(
        d_model=32, num_heads=2, num_layers=num_layers, latent_depth=8,
        vocab_size=64, num_encoder_latents=8, sparse_self_attention=True,
        attn_window_size=2, attn_block_size=8, use_pallas_kernel=False,
        loss_chunk_size=16, free_bits=free_bits)
    return TransformerVAE(hp), VAEObjective(hp), hp


class TestVaePipelineStepExact:
    """The flagship family under pp: per-tick replicated encoder with the
    production rng derivation (z bitwise-identical on every stage and to the
    non-pp step), staged z-injection, KL sums counted once."""

    def test_posterior_and_z_matches_training_forward(self):
        """posterior_and_z must draw from the SAME flax 'sample' fold as
        forward_chunked_nll — the property the pp step's exactness rests
        on."""
        model, obj, hp = _vae_setup()
        rng = jax.random.PRNGKey(0)
        tok = jax.random.randint(rng, (3, 64), 3, 64)
        tok = tok.at[:, 40:].set(0)
        params = model.init({"params": rng, "sample": rng},
                            tok[:1])["params"]
        drop, samp, _ = jax.random.split(jax.random.PRNGKey(5), 3)
        from sparse_vae_tpu.models.transformer_vae import TransformerVAE
        _, _, _, _, z_ref = model.apply(
            {"params": params}, tok, rngs={"dropout": drop, "sample": samp},
            method=TransformerVAE.forward_chunked_nll)
        _, _, z_pp = model.apply({"params": params}, tok,
                                 rngs={"sample": samp},
                                 method=TransformerVAE.posterior_and_z)
        np.testing.assert_array_equal(np.asarray(z_ref), np.asarray(z_pp))

    @pytest.mark.parametrize("free_bits", [0.0, 0.25])
    def test_matches_single_device(self, pipe_mesh, free_bits):
        """data=2 x pipe=4 VAE step == per-data-shard-folded single-device
        accumulation (the test_sp data x seq reference pattern), including
        the free-bits clamped KL sums."""
        model, obj, hp = _vae_setup(free_bits=free_bits)
        rng = jax.random.PRNGKey(3)
        k, b = 4, 4
        batch = _batch(rng, k, b, 64)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]

        ppp = pp_split_params(params, hp.num_layers)
        assert "z_projections" in ppp
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=1000,
                                grad_clip_threshold=5.0)
        step_fn = make_pp_train_step(model, obj, opt, pipe_mesh)
        clone = lambda t: jax.tree.map(jnp.array, t)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = step_fn(clone(ppp), clone(opt.init(ppp)),
                             shard_batch(batch, pipe_mesh, stacked=True),
                             jnp.asarray(0), step_rng)

        opt_ref = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                 grad_clip_threshold=5.0)
        rows_per = b // 2

        def micro_loss(p, i):
            sums = counts = None
            for sdx in range(2):
                r = jax.random.split(jax.random.fold_in(step_rng, sdx),
                                     k)[i]
                mb = {name: arr[i, sdx * rows_per:(sdx + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = obj.loss_sums(model, p, mb, 0, r)
                sums = su if sums is None else jax.tree.map(jnp.add, sums,
                                                            su)
                counts = co if counts is None else jax.tree.map(
                    jnp.add, counts, co)
            return obj.compose_loss(sums, counts, 0)

        grads_acc, losses, kls = None, [], []
        for i in range(k):
            (loss_i, met_i), g = jax.value_and_grad(
                lambda p: micro_loss(p, i), has_aux=True)(params)
            losses.append(float(loss_i))
            kls.append(float(met_i["train_kl"]))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = opt_ref.update(grads, opt_ref.init(params), params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["train_kl"]), np.mean(kls),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(optax.global_norm(grads)),
                                   rtol=1e-4)
        _assert_trees_match(pp_merge_params(p1), p0)

    def test_mc_samples_rejected(self, pipe_mesh):
        model, obj, hp = _vae_setup()
        hp.train_mc_samples = 4
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=None,
                                grad_clip_threshold=5.0)
        with pytest.raises(NotImplementedError, match="multi-sample"):
            make_pp_train_step(model, obj, opt, pipe_mesh)

    def test_lstm_vae_rejected(self, pipe_mesh):
        from sparse_vae_tpu.models.lstm_vae import LSTMVAE, LSTMVAEHparams
        from sparse_vae_tpu.models.vae import VAEObjective
        hp = LSTMVAEHparams(d_model=32, latent_depth=8, vocab_size=64)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=None,
                                grad_clip_threshold=5.0)
        with pytest.raises(NotImplementedError, match="stageable"):
            make_pp_train_step(LSTMVAE(hp), VAEObjective(hp), opt,
                               pipe_mesh)


class TestGuards:
    def test_layers_not_divisible(self, pipe_mesh):
        model, obj, hp = _setup(num_layers=6)  # 6 % 4 != 0
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=None,
                                grad_clip_threshold=5.0)
        with pytest.raises(ValueError, match="not divisible"):
            make_pp_train_step(model, obj, opt, pipe_mesh)

    def test_mesh_without_pipe_rejected(self):
        model, obj, _ = _setup()
        mesh = create_mesh(num_devices=8)
        opt = make_pp_optimizer(lr=1e-2, lr_decay_steps=None,
                                grad_clip_threshold=5.0)
        with pytest.raises(ValueError, match="pipe"):
            make_pp_train_step(model, obj, opt, mesh)
