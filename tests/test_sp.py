"""Sequence (context) parallelism: exactness against single-device execution.

parallel/sp.py shards the LENGTH axis over a 'seq' mesh axis — the scaling
axis for the pg19 batch-1 long-document regime. These tests pin:
- the blocked halo attention == the full-sequence masked oracle, per shard;
- the distributed-softmax cross attention == dense attention;
- boundary-crossing labels == the global shift;
- a full TransformerVAE optimizer step on a 'seq' mesh == the single-device
  step (loss, metrics incl. KL, and updated params to float tolerance) —
  which exercises every collective's custom VJP, the shard-0-only row
  statistics, and the z-injection gradient path through the [CLS] broadcast;
- a (data x seq) mesh composes both axes;
- the guard rails (dense config, LSTM, multi-sample bound, unchunked loss).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.ops.attention import (dense_attention,
                                          sliding_window_token_mask)
from sparse_vae_tpu.parallel.mesh import create_mesh
from sparse_vae_tpu.parallel.sp import (halo_blocks,
                                        seq_parallel_cross_attention,
                                        sp_localize, sp_shifted_labels,
                                        windowed_attention_ctx)


def _tree_allclose(a, b, rtol=1e-5, atol=1e-6):
    flat_a, flat_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


@pytest.fixture
def seq_mesh():
    return create_mesh(num_devices=4, seq_axis=4,
                       devices=jax.devices()[:4])


@pytest.fixture
def data_seq_mesh():
    return create_mesh(num_devices=8, seq_axis=4,
                       devices=jax.devices()[:8])


class TestWindowedAttentionCtx:
    """The per-shard blocked compute, no mesh: manually sliced halo/CLS
    inputs must reproduce the full-sequence masked oracle's rows."""

    @pytest.mark.parametrize("use_mask,ws", [(False, 2), (True, 2),
                                             (False, 1), (True, 3)])
    def test_matches_full_oracle(self, use_mask, ws):
        """ws=1 is the zero-halo edge (diagonal-only band); ws=3 checks the
        halo really carries window-1 blocks, not window."""
        bs, n_shards = 16, 4
        B, H, D = 2, 2, 8
        S = 64
        L = S * n_shards
        ctx = halo_blocks(ws) * bs
        rng = jax.random.PRNGKey(0)
        kq, kk, kv, km = jax.random.split(rng, 4)
        q = jax.random.normal(kq, (B, H, L, D))
        k = jax.random.normal(kk, (B, H, L, D))
        v = jax.random.normal(kv, (B, H, L, D))
        kv_mask = None
        if use_mask:
            kv_mask = jax.random.bernoulli(km, 0.8, (B, L))
            kv_mask = kv_mask.at[:, 0].set(True)

        mask = sliding_window_token_mask(L, L, bs, ws, causal=True)[None,
                                                                    None]
        if kv_mask is not None:
            mask = mask & kv_mask[:, None, None, :]
        oracle = dense_attention(q, k, v, mask)

        pad_k = jnp.concatenate([jnp.zeros((B, H, ctx, D)), k], axis=2)
        pad_v = jnp.concatenate([jnp.zeros((B, H, ctx, D)), v], axis=2)
        pad_m = None
        if kv_mask is not None:
            pad_m = jnp.concatenate(
                [jnp.zeros((B, ctx), bool), kv_mask], axis=1)
        for i in range(n_shards):
            start = i * S
            out = windowed_attention_ctx(
                q[:, :, start:start + S],
                pad_k[:, :, start:start + ctx + S],
                pad_v[:, :, start:start + ctx + S],
                k[:, :, :bs], v[:, :, :bs], jnp.asarray(start),
                None if pad_m is None else pad_m[:, start:start + ctx + S],
                None if kv_mask is None else kv_mask[:, :bs],
                window_size=ws, block_size=bs)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(oracle[:, :, start:start + S]),
                rtol=1e-5, atol=1e-5, err_msg=f"shard {i}")


class TestSpPallasKernel:
    """The fused sequence-parallel Pallas path (interpret mode on CPU) vs
    the blocked-XLA oracle — values and gradients, both branches of the
    start==0 cond, with and without padding."""

    def _inputs(self, seed, B=2, H=2, S=64, D=8, bs=16, ws=2, pad=False):
        ctx = halo_blocks(ws) * bs
        rng = jax.random.PRNGKey(seed)
        ks = jax.random.split(rng, 6)
        q = jax.random.normal(ks[0], (B, H, S, D))
        k_ext = jax.random.normal(ks[1], (B, H, ctx + S, D))
        v_ext = jax.random.normal(ks[2], (B, H, ctx + S, D))
        cls_k = jax.random.normal(ks[3], (B, H, bs, D))
        cls_v = jax.random.normal(ks[4], (B, H, bs, D))
        if pad:
            ext_len = jax.random.randint(ks[5], (B,), ctx + S // 2, ctx + S)
            cls_len = jnp.full((B,), bs, jnp.int32)
        else:
            ext_len = jnp.full((B,), ctx + S, jnp.int32)
            cls_len = jnp.full((B,), bs, jnp.int32)
        return q, k_ext, v_ext, cls_k, cls_v, ext_len, cls_len, bs, ws

    @pytest.mark.parametrize("start_blocks,pad,ws", [
        (0, False, 2), (8, False, 2), (8, True, 2), (4, True, 2),
        (8, False, 1), (8, False, 3)])
    def test_matches_oracle_and_grads(self, start_blocks, pad, ws):
        from sparse_vae_tpu.ops.pallas_kernels import \
            sp_windowed_attention_pallas

        (q, k_ext, v_ext, cls_k, cls_v, ext_len, cls_len,
         bs, ws) = self._inputs(start_blocks + 17, pad=pad, ws=ws)
        ctx = halo_blocks(ws) * bs
        start = jnp.asarray(start_blocks * bs)
        if start_blocks == 0:
            # shard 0: halo rows are invalid — ext_len counts LOCAL keys.
            ext_len = jnp.minimum(ext_len - ctx, q.shape[2])

        pos = jnp.arange(ctx + q.shape[2])
        if start_blocks == 0:
            mask_ext = (pos[None, :] >= ctx) & (
                pos[None, :] - ctx < ext_len[:, None])
        else:
            mask_ext = pos[None, :] < ext_len[:, None]
        cls_mask = jnp.arange(bs)[None, :] < cls_len[:, None]

        from sparse_vae_tpu.parallel.sp import windowed_attention_ctx

        # On shard 0 the CLS store IS the local block 0 (the psum broadcast
        # of it): derive it inside the function so both implementations —
        # whose gradient DECOMPOSITION between dk_ext and dcls differs on
        # shard 0 (branch A never consumes the cls tensors) — are compared
        # on the same total.
        if start_blocks == 0:
            def expand(args):
                q_, ke_, ve_ = args
                return (q_, ke_, ve_, ke_[:, :, ctx:ctx + bs],
                        ve_[:, :, ctx:ctx + bs])
            args = (q, k_ext, v_ext)
            names = ("dq", "dk_ext", "dv_ext")
        else:
            expand = lambda a: a
            args = (q, k_ext, v_ext, cls_k, cls_v)
            names = ("dq", "dk_ext", "dv_ext", "dcls_k", "dcls_v")

        def run_oracle(args):
            return windowed_attention_ctx(
                *expand(args)[:5], start, mask_ext, cls_mask,
                window_size=ws, block_size=bs)

        def run_kernel(args):
            return sp_windowed_attention_pallas(
                *expand(args)[:5], start, ext_len, cls_len, ws, bs, True)

        expected = run_oracle(args)
        got = run_kernel(args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

        cot = jax.random.normal(jax.random.PRNGKey(99), expected.shape)

        def loss(fn):
            return lambda a: jnp.sum(fn(a) * cot)

        g_oracle = jax.grad(loss(run_oracle))(args)
        g_kernel = jax.grad(loss(run_kernel))(args)
        for a, b, name in zip(g_oracle, g_kernel, names):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4, err_msg=name)


class TestSeqCollectives:
    def test_cross_attention_combine(self, seq_mesh):
        from jax.sharding import PartitionSpec as P

        B, H, Q, L, D = 2, 2, 6, 64, 8
        rng = jax.random.PRNGKey(1)
        kq, kk, kv, km = jax.random.split(rng, 4)
        q = jax.random.normal(kq, (B, H, Q, D))
        k = jax.random.normal(kk, (B, H, L, D))
        v = jax.random.normal(kv, (B, H, L, D))
        kv_mask = jax.random.bernoulli(km, 0.7, (B, L))

        expected = dense_attention(q, k, v, kv_mask[:, None, None, :])

        mapped = jax.shard_map(
            lambda q_, k_, v_, m_: seq_parallel_cross_attention(
                q_, k_, v_, m_, "seq"),
            mesh=seq_mesh,
            in_specs=(P(), P(None, None, "seq"), P(None, None, "seq"),
                      P(None, "seq")),
            out_specs=P(),
            check_vma=False)
        out = mapped(q, k, v, kv_mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)

    def test_shifted_labels_cross_boundary(self, seq_mesh):
        from jax.sharding import PartitionSpec as P

        from sparse_vae_tpu.models.transformer_lm import \
            TransformerLanguageModel

        tokens = jax.random.randint(jax.random.PRNGKey(2), (3, 64), 3, 100)
        expected = TransformerLanguageModel.shifted_labels(tokens)
        mapped = jax.shard_map(
            lambda t: sp_shifted_labels(t, 4),
            mesh=seq_mesh, in_specs=P(None, "seq"), out_specs=P(None, "seq"),
            check_vma=False)
        np.testing.assert_array_equal(np.asarray(mapped(tokens)),
                                      np.asarray(expected))


def _vae_setup(sp_size=1, free_bits=0.0, latents=4):
    from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                       TransformerVAEHparams)
    from sparse_vae_tpu.models.vae import VAEObjective

    hp = TransformerVAEHparams(
        d_model=64, num_heads=2, num_layers=2, latent_depth=8,
        vocab_size=128, num_encoder_latents=latents,
        sparse_self_attention=True, attn_window_size=2, attn_block_size=16,
        use_pallas_kernel=False, loss_chunk_size=32, free_bits=free_bits,
        sp_size=sp_size)
    return TransformerVAE(hp), VAEObjective(hp), hp


def _batch(rng, k, b, L, vocab):
    """Stacked [k, b, L] batch with trailing pad runs inside each row."""
    lengths = np.array(jax.random.randint(rng, (k, b), L // 2, L))
    tokens = np.array(jax.random.randint(rng, (k, b, L), 3, vocab))
    pos = np.arange(L)
    mask = pos[None, None, :] < lengths[:, :, None]
    tokens = tokens * mask
    return {
        "token_ids": jnp.asarray(tokens, jnp.int32),
        "num_tokens": jnp.asarray(lengths, jnp.int32),
        "num_bytes": jnp.asarray(lengths * 4, jnp.int32),
    }


class TestSeqParallelStep:
    def test_vae_train_step_exact(self, seq_mesh):
        """One optimizer step on a seq=4 mesh == the single-device step with
        the same pinned RNG semantics (fold by data index 0, split per
        microbatch) — loss, KL metric, and every updated parameter.

        num_encoder_latents == the per-shard length (64) on purpose: the
        Perceiver's learned-query layer must NOT add a residual just because
        the sharded document slice happens to match the latent set's shape
        (the reference's shape-equality gate misfires there)."""
        import optax

        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective, hp = _vae_setup(latents=64)
        sp_model = sp_localize(model, 4)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(0)
        k, b, L = 2, 3, 256
        batch = _batch(rng, k, b, L, 128)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = optimizer.init(params)
        clone = lambda t: jax.tree.map(jnp.array, t)

        step_fn = make_train_step(sp_model, objective, optimizer,
                                  mesh=seq_mesh)
        step_rng = jax.random.PRNGKey(7)
        p1, o1, m1 = step_fn(clone(params), clone(opt_state),
                             shard_batch(batch, seq_mesh, stacked=True),
                             jnp.asarray(0), step_rng)

        # Single-device reference with identical RNG semantics.
        rng_s = jax.random.fold_in(step_rng, 0)
        rngs_s = jax.random.split(rng_s, k)
        grads_acc, losses, kls = None, [], []
        for i in range(k):
            mb = {name: arr[i] for name, arr in batch.items()}
            (loss_i, metrics_i), g = jax.value_and_grad(
                lambda p: objective.loss(model, p, mb, 0, rngs_s[i]),
                has_aux=True)(params)
            losses.append(float(loss_i))
            kls.append(float(metrics_i["train_kl"]))
            grads_acc = g if grads_acc is None else jax.tree.map(
                jnp.add, grads_acc, g)
        grads = jax.tree.map(lambda x: x / k, grads_acc)
        updates, _ = optimizer.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["train_kl"]), np.mean(kls),
                                   rtol=1e-4, atol=1e-7)
        _tree_allclose(p1, p0, rtol=2e-4, atol=2e-6)

    def test_vae_train_step_exact_data_x_seq(self, data_seq_mesh):
        """data=2 x seq=4: both axes compose; reference folds the RNG per
        data shard like parallel/spmd.py does."""
        import optax

        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective, hp = _vae_setup()
        sp_model = sp_localize(model, 4)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(3)
        k, b, L = 2, 4, 256   # 2 rows per data shard
        batch = _batch(rng, k, b, L, 128)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = optimizer.init(params)
        clone = lambda t: jax.tree.map(jnp.array, t)

        step_fn = make_train_step(sp_model, objective, optimizer,
                                  mesh=data_seq_mesh)
        step_rng = jax.random.PRNGKey(11)
        p1, o1, m1 = step_fn(clone(params), clone(opt_state),
                             shard_batch(batch, data_seq_mesh, stacked=True),
                             jnp.asarray(0), step_rng)

        rows_per = b // 2

        def micro_loss(p, i):
            sums = counts = None
            for s in range(2):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {name: arr[i, s * rows_per:(s + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(jnp.add, sums,
                                                            su)
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

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        _tree_allclose(p1, p0, rtol=2e-4, atol=2e-6)

    def test_free_bits_composes(self, seq_mesh):
        """The free-bits KL floor (clamped before the sums) stays exact
        under the seq-sharded composition."""
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective, hp = _vae_setup(free_bits=0.25)
        sp_model = sp_localize(model, 4)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)
        rng = jax.random.PRNGKey(5)
        batch = _batch(rng, 1, 2, 256, 128)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        step_fn = make_train_step(sp_model, objective, optimizer,
                                  mesh=seq_mesh)
        step_rng = jax.random.PRNGKey(13)
        _, _, m1 = step_fn(jax.tree.map(jnp.array, params),
                           optimizer.init(params),
                           shard_batch(batch, seq_mesh, stacked=True),
                           jnp.asarray(0), step_rng)

        rngs_s = jax.random.split(jax.random.fold_in(step_rng, 0), 1)
        mb = {name: arr[0] for name, arr in batch.items()}
        loss0, _ = objective.loss(model, params, mb, 0, rngs_s[0])
        np.testing.assert_allclose(float(m1["loss"]), float(loss0),
                                   rtol=1e-5)

    def test_dreg_train_step_exact(self, seq_mesh):
        """Multi-sample IWAE/DReG on a 'seq' mesh: reconstruct_ll psums the
        per-shard row sums into the global per-document value, so the
        nonlinear bound runs unchanged — one optimizer step equals the
        single-device step."""
        import dataclasses

        import optax

        from sparse_vae_tpu.models.transformer_vae import TransformerVAE
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        _, _, hp = _vae_setup()
        hp = dataclasses.replace(hp, train_mc_samples=3)
        model = TransformerVAE(hp)
        objective = VAEObjective(hp)
        sp_model = sp_localize(model, 4)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(21)
        k, b, L = 1, 2, 256
        batch = _batch(rng, k, b, L, 128)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = optimizer.init(params)

        step_fn = make_train_step(sp_model, objective, optimizer,
                                  mesh=seq_mesh)
        step_rng = jax.random.PRNGKey(23)
        p1, _, m1 = step_fn(jax.tree.map(jnp.array, params),
                            jax.tree.map(jnp.array, opt_state),
                            shard_batch(batch, seq_mesh, stacked=True),
                            jnp.asarray(0), step_rng)

        rngs_s = jax.random.split(jax.random.fold_in(step_rng, 0), k)
        mb = {name: arr[0] for name, arr in batch.items()}
        (loss0, metrics0), g = jax.value_and_grad(
            lambda p: objective.loss(model, p, mb, 0, rngs_s[0]),
            has_aux=True)(params)
        updates, _ = optimizer.update(g, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), float(loss0),
                                   rtol=1e-5)
        np.testing.assert_allclose(
            float(m1["train_iwae_log_prob"]),
            float(metrics0["train_iwae_log_prob"]), rtol=1e-5)
        _tree_allclose(p1, p0, rtol=2e-4, atol=2e-6)

    def test_vae_train_step_exact_kernel_path(self, seq_mesh, monkeypatch):
        """The fused SP Pallas path inside the FULL sharded optimizer step
        (lax.cond of pallas_call, halo/CLS collectives, custom VJPs, grad
        accumulation scan — all composed), interpret mode on the virtual
        mesh, against the same single-device reference the XLA path
        matches."""
        import optax

        import sparse_vae_tpu.ops.attention as attention_mod
        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.training.optimizer import make_optimizer

        monkeypatch.setattr(attention_mod, "_SP_KERNEL_INTERPRET", True)
        model, objective, hp = _vae_setup()
        sp_model = sp_localize(model, 4)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                                   grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(31)
        k, b, L = 1, 2, 256
        batch = _batch(rng, k, b, L, 128)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = optimizer.init(params)

        step_fn = make_train_step(sp_model, objective, optimizer,
                                  mesh=seq_mesh)
        step_rng = jax.random.PRNGKey(37)
        p1, _, m1 = step_fn(jax.tree.map(jnp.array, params),
                            jax.tree.map(jnp.array, opt_state),
                            shard_batch(batch, seq_mesh, stacked=True),
                            jnp.asarray(0), step_rng)

        # Single-device reference runs the plain (non-sp) model — the
        # kernel path must agree with it, not merely with the XLA sp path.
        monkeypatch.setattr(attention_mod, "_SP_KERNEL_INTERPRET", False)
        rngs_s = jax.random.split(jax.random.fold_in(step_rng, 0), k)
        mb = {name: arr[0] for name, arr in batch.items()}
        (loss0, _), g = jax.value_and_grad(
            lambda p: objective.loss(model, p, mb, 0, rngs_s[0]),
            has_aux=True)(params)
        updates, _ = optimizer.update(g, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), float(loss0),
                                   rtol=1e-5)
        _tree_allclose(p1, p0, rtol=2e-4, atol=2e-6)

    def test_eval_step_exact(self, seq_mesh):
        from sparse_vae_tpu.parallel.spmd import make_eval_step, shard_batch

        model, objective, hp = _vae_setup()
        sp_model = sp_localize(model, 4)
        rng = jax.random.PRNGKey(4)
        batch = {name: arr[0] for name, arr in
                 _batch(rng, 1, 3, 256, 128).items()}
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][:1])["params"]

        sharded = make_eval_step(sp_model, objective, mesh=seq_mesh)
        single = make_eval_step(model, objective, mesh=None)
        s1 = sharded(params, shard_batch(batch, seq_mesh), rng)
        s0 = single(params, batch, rng)
        assert set(s1) == set(s0)
        for key in s0:
            np.testing.assert_allclose(np.asarray(s1[key]),
                                       np.asarray(s0[key]),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=key)


class TestGuards:
    def test_dense_config_rejected(self):
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)

        hp = TransformerHparams(d_model=32, num_heads=2, num_layers=1,
                                vocab_size=64, sparse_self_attention=False)
        with pytest.raises(ValueError, match="sparse"):
            sp_localize(TransformerLanguageModel(hp), 4)

    def test_lstm_rejected(self):
        from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                                   LSTMLanguageModelHparams)

        hp = LSTMLanguageModelHparams(d_embedding=8, d_model=16,
                                      vocab_size=64)
        with pytest.raises(ValueError, match="sequence parallelism"):
            sp_localize(LSTMLanguageModel(hp), 4)

    def test_unchunked_rejected(self, seq_mesh):
        import dataclasses

        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import make_train_step
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, _, hp = _vae_setup(sp_size=4)
        hp0 = dataclasses.replace(hp, loss_chunk_size=0)
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=100,
                                   grad_clip_threshold=5.0)
        with pytest.raises(ValueError, match="loss_chunk_size"):
            make_train_step(model, VAEObjective(hp0), optimizer,
                            mesh=seq_mesh)

    def test_unlocalized_module_rejected(self, seq_mesh):
        from sparse_vae_tpu.models.vae import VAEObjective
        from sparse_vae_tpu.parallel.spmd import make_train_step
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective, hp = _vae_setup()   # sp_size=1
        optimizer = make_optimizer(lr=1e-2, lr_decay_steps=100,
                                   grad_clip_threshold=5.0)
        with pytest.raises(ValueError, match="sp_localize"):
            make_train_step(model, objective, optimizer, mesh=seq_mesh)


@pytest.fixture(scope="module")
def mesh3d():
    """data=2 x seq=2 x model=2 — the mesh an actual v5e-8 would want for
    the pg19 regime (SP for the 100k-token document, TP for the tied-32k
    head, DP for the rest; VERDICT r3 #7)."""
    return create_mesh(num_devices=8, seq_axis=2, model_axis=2,
                       devices=jax.devices("cpu"))


class Test3AxisMesh:
    """data x seq x model composed in ONE production train step."""

    def _setup(self):
        from sparse_vae_tpu.models.transformer_vae import (
            TransformerVAE, TransformerVAEHparams)
        from sparse_vae_tpu.models.vae import VAEObjective

        # d_model 128 so the Perceiver's derived head count (d_model//64=2)
        # divides the model axis; tied weights + chunked CE so the vocab-
        # parallel head path (parallel/tp.py shards_vocab) is exercised —
        # this is the pg19 production configuration in miniature.
        hp = TransformerVAEHparams(
            d_model=128, num_heads=4, num_layers=2, latent_depth=8,
            vocab_size=256, num_encoder_latents=4,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=16, tie_embedding_weights=True,
            use_pallas_kernel=False, loss_chunk_size=32)
        return TransformerVAE(hp), VAEObjective(hp), hp

    def test_vae_train_step_exact_data_x_seq_x_model(self, mesh3d):
        """One optimizer step on the 2x2x2 mesh == the single-device step
        with the pinned RNG semantics (fold by data shard, split per
        microbatch) — loss and every updated parameter, through the
        sp-localized + tp-localized module with the TP-aware clip."""
        import optax

        from sparse_vae_tpu.parallel.spmd import make_train_step, shard_batch
        from sparse_vae_tpu.parallel.tp import shards_vocab, tp_localize
        from sparse_vae_tpu.training.optimizer import make_optimizer

        model, objective, hp = self._setup()
        assert shards_vocab(hp, 2), "test must cover the vocab-sharded head"
        m3 = sp_localize(tp_localize(model, 2), 2)
        opt3 = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                              grad_clip_threshold=5.0, tp_size=2,
                              tp_shard_vocab=True)
        opt1 = make_optimizer(lr=1e-2, lr_decay_steps=1000,
                              grad_clip_threshold=5.0)

        rng = jax.random.PRNGKey(5)
        k, b, L = 2, 4, 256   # 2 rows per data shard; 128 tokens per seq shard
        batch = _batch(rng, k, b, L, 256)
        params = model.init({"params": rng, "sample": rng},
                            batch["token_ids"][0][:1])["params"]
        opt_state = opt3.init(params)
        clone = lambda t: jax.tree.map(jnp.array, t)

        step_fn = make_train_step(m3, objective, opt3, mesh=mesh3d)
        step_rng = jax.random.PRNGKey(13)
        p1, o1, m1 = step_fn(clone(params), clone(opt_state),
                             shard_batch(batch, mesh3d, stacked=True),
                             jnp.asarray(0), step_rng)

        # Single-device reference: psum'd-sums composition over the 2 data
        # shards, accumulated over k microbatches, through the tp-size-1
        # optimizer (the TP-aware clip must equal the full-tree clip).
        rows_per = b // 2

        def micro_loss(p, i):
            sums = counts = None
            for s in range(2):
                rng_s = jax.random.fold_in(step_rng, s)
                rngs_s = jax.random.split(rng_s, k)
                mb = {name: arr[i, s * rows_per:(s + 1) * rows_per]
                      for name, arr in batch.items()}
                su, co = objective.loss_sums(model, p, mb, 0, rngs_s[i])
                sums = su if sums is None else jax.tree.map(jnp.add, sums,
                                                            su)
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
        updates, _ = opt1.update(grads, opt_state, params)
        p0 = optax.apply_updates(params, updates)

        np.testing.assert_allclose(float(m1["loss"]), np.mean(losses),
                                   rtol=1e-5)
        _tree_allclose(p1, p0, rtol=2e-4, atol=2e-6)
