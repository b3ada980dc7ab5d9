#!/usr/bin/env python
"""Train the REFERENCE LSTM-VAE (torch, /tmp/refwork copy) on the same
corpus, batch stream, optimizer math, schedule, and KL annealing as this
framework's `train.py lstm-vae` — the VAE half of BASELINE.json's
quality-parity protocol (the acceptance bar's actual **ELBO** clause; the
round-4 matched pairs were both plain LMs).

The reference's single-sample ELBO path is `lstm_vae.py:111-127` (sample_z →
reconstruct → nll + kl_weight·kl) with the KL weight annealed in
`continuous_autoencoder.py:28-39`. As shipped that path is non-runnable
(SURVEY §2.9); the un-breaking, applied HERE (not in the verbatim copy,
which stays byte-identical modulo setup_ref.sh's import fixes):
  - hparams carries vocab_size / train_mc_samples (the reference reads both
    off hparams but never defines them; train_mc_samples=0 selects the
    single-sample branch, lstm_vae.py:74,104);
  - `dropout_in` / `dropout_out` (lstm_vae.py:157,169) are missing members —
    bound to nn.Identity(), matching this framework's trained configuration
    (models/vae.py trains with dropout OFF; a documented deviation);
  - `estimate_mutual_info` (lstm_vae.py:122) was removed upstream — stubbed
    to 0.0 (it is logged, never differentiated).

Everything that could skew the comparison is shared, as in train_ref_lstm.py:
OUR TextDataModule batch stream (bit-identical batches), the reference's own
RAdam + sqrt-batch lr scaling + per-step cosine decay, the reference's own
robust_cross_entropy, and initial parameters copied from OUR initialization.

KL-annealing step indexing is kept REFERENCE-EXACT: Lightning's
on_after_backward during optimizer step N sees global_step == N-1 completed
steps, so the reference's weight at step N is start + dist·(N-1)/steps while
ours is start + dist·N/steps — a one-step lag (≤ dist/annealing_steps in one
loss term), documented rather than papered over.

Known intended deviation (affects padded rows only): the reference's LSTM
encoder consumes the PAD tail through the gates and summarizes the final
state (lstm_vae.py:87-89 — no pack_padded_sequence); ours freezes the state
at each row's last real token (ops/rnn.py::BiLSTMEncoder). The --numerics
check therefore uses a synthetic NO-PAD batch, where the two encoders
compute the same function and the z=posterior-mean ELBO must agree to fp32
tolerance.

Usage:
  sh tools/ref_parity/setup_ref.sh
  python tools/ref_parity/train_ref_lstm_vae.py --max_steps 300 \
      --out runs/ref-lstm-vae-parity/reference.jsonl
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np
import torch._dynamo  # noqa: F401  (see train_ref_lstm.py: pre-shim probe)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_dm(args):
    sys.path.insert(0, REPO)
    from sparse_vae_tpu.data.text_data_module import (TextDataModule,
                                                      TextDataModuleHparams)
    dm = TextDataModule(TextDataModuleHparams(
        dataset_name="local-prose", tokens_per_batch=args.tokens_per_batch,
        min_tokens_per_sample=32, max_tokens_per_sample=args.chunk,
        chunk_documents=True, vocab_size=args.vocab,
        test_size=args.test_size))
    dm.prepare_data()
    return dm


def our_overrides(args):
    return dict(
        vocab_size=args.vocab, d_model=args.d_model,
        d_embedding=args.d_embedding, num_layers=args.num_layers,
        latent_depth=args.latent_depth, tie_logit_weights=True,
        tie_embedding_weights=True, bidirectional_encoder=False,
        kl_weight_start=args.kl_start, kl_weight_end=args.kl_end,
        kl_annealing_steps=args.kl_steps)


def our_init_params(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from sparse_vae_tpu import build_model
    module, _, _ = build_model("lstm-vae", our_overrides(args))
    params = jax.device_get(module.init(
        {"params": jax.random.PRNGKey(args.seed),
         "sample": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16), jnp.int32))["params"])
    return module, params


def build_ref_model(args, dm, params=None):
    import torch
    from torch import nn
    sys.path.insert(0, os.path.join(args.refwork, "shims"))
    sys.path.insert(0, os.path.join(args.refwork, "ref"))
    from pytorch_lightning.utilities.parsing import AttributeDict
    from sparse_vae.lstm_vae import LSTMVAE

    hp = AttributeDict(
        vocab_size=args.vocab, latent_depth=args.latent_depth,
        num_latent_vectors=1, bidirectional_encoder=False,
        transformer_encoder=False, tie_embedding_weights=True,
        d_embedding=args.d_embedding, d_model=args.d_model,
        num_layers=args.num_layers, tie_logit_weights=True,
        train_mc_samples=0, kl_annealing_steps=args.kl_steps,
        kl_weight_start=args.kl_start, kl_weight_end=args.kl_end,
        kl_weight=args.kl_start, init_scale=None,
        grad_clip_threshold=args.grad_clip, base_batch_size=100_000,
        lr=args.lr, lr_decay_steps=args.lr_decay_steps,
        early_stopping_metric="val_loss", log_samples=False,
        start_token=dm.start_token, end_token=dm.end_token)
    torch.manual_seed(args.seed)
    model = LSTMVAE(hp)
    # §2.9 missing members (see module docstring):
    model.dropout_in = nn.Identity()
    model.dropout_out = nn.Identity()
    model.estimate_mutual_info = lambda posterior: torch.tensor(0.0)
    model.on_train_start()  # kl_weight <- kl_weight_start

    if params is not None:
        def t(x):
            return torch.from_numpy(np.asarray(x, np.float32))

        enc = params["encoder"]["dir_0"]
        with torch.no_grad():
            model.decoder_embedding.weight.copy_(
                t(params["decoder_embedding"]["embedding"]))
            for i in range(args.num_layers):
                getattr(model.encoder, f"weight_ih_l{i}").copy_(
                    t(enc[f"w_ih_{i}"]))
                getattr(model.encoder, f"weight_hh_l{i}").copy_(
                    t(enc[f"w_hh_{i}"]))
                getattr(model.encoder, f"bias_ih_l{i}").copy_(
                    t(enc[f"b_ih_{i}"]))
                getattr(model.encoder, f"bias_hh_l{i}").copy_(
                    t(enc[f"b_hh_{i}"]))
                getattr(model.decoder, f"weight_ih_l{i}").copy_(
                    t(params["decoder"][f"w_ih_{i}"]))
                getattr(model.decoder, f"weight_hh_l{i}").copy_(
                    t(params["decoder"][f"w_hh_{i}"]))
                getattr(model.decoder, f"bias_ih_l{i}").copy_(
                    t(params["decoder"][f"b_ih_{i}"]))
                getattr(model.decoder, f"bias_hh_l{i}").copy_(
                    t(params["decoder"][f"b_hh_{i}"]))
            model.c0.copy_(t(params["encoder_c0"])[:, None, :])
            model.q_of_z_given_x.linear.weight.copy_(
                t(params["q_of_z_given_x"]["linear"]["kernel"]).T)
            model.q_of_z_given_x.linear.bias.copy_(
                t(params["q_of_z_given_x"]["linear"]["bias"]))
            model.z_to_hidden.weight.copy_(
                t(params["z_to_hidden"]["kernel"]).T)
            model.z_to_hidden.bias.copy_(t(params["z_to_hidden"]["bias"]))
            model.output_layer[0].weight.copy_(
                t(params["logit_bottleneck"]["kernel"]).T)
            model.output_layer[0].bias.copy_(
                t(params["logit_bottleneck"]["bias"]))
            model.output_layer[1].bias.copy_(t(params["logit_bias"]))
    return model


def numerics_check(args, model, module, params):
    """Deterministic (z = posterior mean) ELBO + gradient agreement on a
    synthetic NO-PAD batch (see module docstring for why no-pad)."""
    import jax
    import jax.numpy as jnp
    import torch
    from sparse_vae.core.language_model import robust_cross_entropy
    from sparse_vae_tpu.models.vae import normalized_kl
    from sparse_vae_tpu.ops.cross_entropy import token_nll

    rs = np.random.RandomState(args.seed)
    B, L = 4, 256
    tokens_np = rs.randint(3, args.vocab, size=(B, L)).astype(np.int32)
    num_tokens = np.full((B,), L, np.float32)

    def ours_loss(p):
        q, kl = module.apply({"params": p}, jnp.asarray(tokens_np),
                             get_kl=True, method=type(module).posterior)
        z = q.loc
        logits = module.apply({"params": p}, jnp.asarray(tokens_np), z,
                              method=type(module).reconstruct)
        nll, mask = token_nll(logits[:, :-1], jnp.asarray(tokens_np)[:, 1:],
                              reduce=False)
        nll = jnp.sum(nll) / jnp.sum(mask)
        kl_n, _ = normalized_kl(kl, jnp.asarray(num_tokens))
        return nll + args.kl_start * kl_n, (nll, kl_n)

    (loss_o, (nll_o, kl_o)), grads = jax.value_and_grad(
        ours_loss, has_aux=True)(jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), params))
    gnorm_o = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                                 for g in jax.tree.leaves(grads))))

    tokens_t = torch.from_numpy(tokens_np).long()
    x = model.encoder_embedding(tokens_t)
    last = model.forward(x)
    q, kl_t = model.q_of_z_given_x(last, get_kl=True)
    z = q.loc
    logits = model.reconstruct(x, z)[..., :-1, :]
    nll_t = robust_cross_entropy(logits, tokens_t[..., 1:])
    kl_tn = kl_t.flatten(1).sum(-1).div(
        torch.from_numpy(num_tokens)).mean()
    loss_t = nll_t + args.kl_start * kl_tn
    model.zero_grad()
    loss_t.backward()
    gnorm_t = math.sqrt(sum(float((p.grad ** 2).sum())
                            for p in model.parameters()
                            if p.grad is not None))

    def rel(a, b):
        return abs(a - b) / max(abs(a), abs(b), 1e-12)

    out = {
        "ours": {"loss": float(loss_o), "nll": float(nll_o),
                 "kl": float(kl_o), "grad_norm": gnorm_o},
        "reference": {"loss": float(loss_t), "nll": float(nll_t),
                      "kl": float(kl_tn), "grad_norm": gnorm_t},
        "rel_err": {"loss": rel(float(loss_o), float(loss_t)),
                    "nll": rel(float(nll_o), float(nll_t)),
                    "kl": rel(float(kl_o), float(kl_tn)),
                    "grad_norm": rel(gnorm_o, gnorm_t)},
    }
    model.zero_grad()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refwork", default="/tmp/refwork")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--d_embedding", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=1)
    ap.add_argument("--latent_depth", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--tokens_per_batch", type=int, default=4096)
    ap.add_argument("--test_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr_decay_steps", type=int, default=250_000)
    ap.add_argument("--grad_clip", type=float, default=150.0)
    ap.add_argument("--kl_start", type=float, default=0.1)
    ap.add_argument("--kl_end", type=float, default=1.0)
    ap.add_argument("--kl_steps", type=int, default=150)
    ap.add_argument("--max_steps", type=int, default=300)
    ap.add_argument("--val_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=7295)
    ap.add_argument("--init_from_ours", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--numerics_out", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import torch
    torch.manual_seed(args.seed)
    dm = build_dm(args)
    module, params = our_init_params(args) if args.init_from_ours \
        else (None, None)
    model = build_ref_model(args, dm, params)

    if args.numerics_out and params is not None:
        nc = numerics_check(args, model, module, params)
        os.makedirs(os.path.dirname(args.numerics_out), exist_ok=True)
        with open(args.numerics_out, "w") as fh:
            json.dump(nc, fh, indent=2)
        print("numerics_check:", json.dumps(nc["rel_err"]), flush=True)

    from functools import partial

    from sparse_vae.core.language_model import (cosine_decay,
                                                robust_cross_entropy)
    from sparse_vae.core.rectified_adam import RAdam
    from torch.optim.lr_scheduler import LambdaLR

    lr_scale = (args.tokens_per_batch / 100_000) ** 0.5
    opt = RAdam(model.parameters(), lr=args.lr * lr_scale, weight_decay=0.01)
    sched = LambdaLR(opt, partial(cosine_decay, args.lr_decay_steps))

    def tt(x):
        return torch.from_numpy(np.ascontiguousarray(x)).long()

    def batch_dict(b):
        # Slice to LIVE rows. Our fixed-shape bucketed batches carry dead
        # rows (num_tokens == 0) that our objective masks out; the
        # reference's dynamic batcher only ever produced live rows, and its
        # sample_z divides raw_kl by token_counts unguarded
        # (continuous_autoencoder.py:47) — a dead row makes the loss Inf
        # (measured: first dead-row batch is train step 141, and both the
        # clip-150 and clip-5 reference runs diverged exactly there; see
        # runs/ref-lstm-vae-parity/reference*.jsonl). Dropping dead rows is
        # the faithful emulation of the reference's batch contract and
        # leaves the objective on live rows bit-identical.
        live = b.num_tokens > 0
        return {"token_ids": tt(b.token_ids[live]),
                "num_tokens": torch.from_numpy(
                    np.ascontiguousarray(b.num_tokens[live])).float()}

    def validate():
        """Mirror of VAEObjective.eval_stats/reduce_eval: token-weighted
        val_nll/val_bpb, per-token KL averaged over real rows, val_loss =
        val_nll + val_kl (the reference's own val_loss is nll + kl too,
        lstm_vae.py:127). z is rsampled, as in our eval path."""
        model.eval()
        nll_sum = tok = byt = 0.0
        kl_rows = rows = 0.0
        with torch.no_grad():
            for b in dm.epoch_batches("test", seed=0):
                d = batch_dict(b)
                tokens = d["token_ids"]
                x = model.encoder_embedding(tokens)
                q, kl = model.q_of_z_given_x(model.forward(x), get_kl=True)
                z = q.rsample()
                logits = model.reconstruct(x, z)[..., :-1, :]
                labels = tokens[..., 1:]
                n_valid = int((labels != 0).sum())
                nll_sum += float(robust_cross_entropy(logits, labels)) \
                    * n_valid
                tok += n_valid
                byt += float(b.num_bytes.sum())
                real = d["num_tokens"] > 0
                per_doc = kl.flatten(1).sum(-1) / d["num_tokens"].clamp(1)
                kl_rows += float(per_doc[real].sum())
                rows += float(real.sum())
        model.train()
        val_nll = nll_sum / max(tok, 1.0)
        val_kl = kl_rows / max(rows, 1.0)
        return {"val_nll": val_nll,
                "val_bpb": nll_sum / max(byt, 1.0) / math.log(2),
                "val_kl": val_kl, "val_loss": val_nll + val_kl}

    out = open(args.out, "w") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    step, t0, best = 0, time.time(), None
    for epoch in range(10 ** 9):
        for b in dm.epoch_batches("train", seed=args.seed + epoch):
            model._log_sink = sink = {}
            result = model.training_step(batch_dict(b), step)
            loss = result["loss"]
            if not bool(torch.isfinite(loss)):
                # Divergence diagnostics: the reference's ConditionalGaussian
                # deliberately never clamps (conditional_gaussian.py:22-25 —
                # "the AMP grad scaler will take care of that"); in plain
                # fp32 there is no scaler, so record where the posterior sat
                # and stop instead of training on NaN weights.
                post = result.get("posterior")
                emit({"step": step + 1, "diverged": True,
                      "loss": float(loss),
                      "train_nll": sink.get("train_nll"),
                      "train_kl": sink.get("train_kl"),
                      "posterior_scale_max":
                          float(post.scale.max()) if post is not None
                          else None,
                      "posterior_loc_rms":
                          float((post.loc ** 2).mean().sqrt())
                          if post is not None else None,
                      "kl_weight": float(model.hparams.kl_weight),
                      "wall_s": round(time.time() - t0, 1)})
                if out:
                    out.close()
                return 0
            opt.zero_grad()
            loss.backward()
            # Lightning's hook order: global_step == completed steps when
            # on_after_backward fires (clip + KL-anneal advance,
            # language_model.py:120-122 + continuous_autoencoder.py:28-39).
            model.global_step = step
            model.on_after_backward()
            opt.step()
            sched.step()
            step += 1
            if step % 10 == 0:
                post = result.get("posterior")
                emit({"step": step, "train_loss": float(loss),
                      "train_nll": sink.get("train_nll"),
                      "train_kl": sink.get("train_kl"),
                      "kl_weight": float(model.hparams.kl_weight),
                      "posterior_scale_max":
                          float(post.scale.max()) if post is not None
                          else None,
                      "wall_s": round(time.time() - t0, 1)})
            if step % args.val_every == 0 or step == args.max_steps:
                m = validate()
                best = min(best, m["val_loss"]) if best is not None \
                    else m["val_loss"]
                emit({"step": step, **m})
            if step >= args.max_steps:
                emit({"final": True, "framework": "reference-torch",
                      "best_val_loss": best, "steps": step,
                      "wall_s": round(time.time() - t0, 1),
                      "config": vars(args) | {"refwork": "elided"}})
                if out:
                    out.close()
                return 0


if __name__ == "__main__":
    sys.exit(main())
