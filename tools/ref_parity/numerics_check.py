#!/usr/bin/env python
"""Same-init / same-batch cross-check vs the REFERENCE implementation.

BASELINE.json's quality bar is "val ELBO / val_nll / val_bpb parity vs a
freshly-trained reference configuration". Step one of establishing that
empirically is proving the two frameworks compute the SAME objective: this
script builds our LSTM-LM (jax) and the reference's LSTMLanguageModel
(torch, /root/reference/sparse_vae/lstm_language_model.py run from the
/tmp/refwork copy produced by setup_ref.sh), copies our initialized
parameters into the torch model (the parameterizations map 1:1 — ops/rnn.py
keeps PyTorch gate order for exactly this reason), feeds both the same real
corpus batch (ragged PAD tails included), and compares

  - the training loss (per-token mean NLL, PAD ignored:
    reference robust_cross_entropy language_model.py:161-170 vs our
    training/objectives.py ARObjective), and
  - the global gradient norm (full backward through embedding, LSTM scan,
    tied output head).

Agreement to float32 tolerance means any later training-quality difference
is optimizer/schedule/hardware, not the objective or the model math.

Usage:
  sh tools/ref_parity/setup_ref.sh          # once
  python tools/ref_parity/numerics_check.py
"""
import argparse
import json
import os
import sys

import numpy as np
# Load torch's lazy compile machinery while `triton` is still unimportable
# (see train_ref_lstm.py — torch._dynamo probes the triton shim otherwise).
import torch._dynamo  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CACHE = os.path.join(
    REPO, "sparse-vae-datasets/tokenized/local-prose---2000-32768-whole.npz")


def real_batch(path, lengths, width):
    """[B, width] int32 rows cut from the first docs of the token cache,
    zero(PAD)-padded to ragged `lengths`."""
    z = np.load(path, allow_pickle=True)
    toks, offs = z["tokens"], z["offsets"]
    ids = np.zeros((len(lengths), width), np.int32)
    for i, n in enumerate(lengths):
        doc = toks[offs[i]:offs[i + 1]][:n].astype(np.int32)
        ids[i, :len(doc)] = doc
    return ids, np.asarray(lengths, np.int32)


def ours(args, ids, lengths):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    from sparse_vae_tpu import build_model

    module, hp, objective = build_model("lstm-lm", dict(
        vocab_size=args.vocab, d_model=args.d_model,
        d_embedding=args.d_embedding, num_layers=args.num_layers,
        tie_logit_weights=True))
    params = module.init(jax.random.PRNGKey(args.seed),
                         jnp.zeros((1, 16), jnp.int32))["params"]
    batch = {"token_ids": jnp.asarray(ids),
             "num_tokens": jnp.asarray(lengths),
             "num_bytes": jnp.asarray(lengths * 4)}

    def loss_fn(p):
        return objective.loss(module, p, batch, 0,
                              jax.random.PRNGKey(0))[0]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    sq = sum(float(jnp.sum(g.astype(jnp.float64) ** 2))
             for g in jax.tree.leaves(grads))
    return float(loss), float(np.sqrt(sq)), jax.device_get(params)


def reference(args, ids, params, refwork):
    import torch
    sys.path.insert(0, os.path.join(refwork, "shims"))
    sys.path.insert(0, os.path.join(refwork, "ref"))
    from pytorch_lightning.utilities.parsing import AttributeDict
    from sparse_vae.core.language_model import robust_cross_entropy
    from sparse_vae.lstm_language_model import (LSTMLanguageModel,
                                                LSTMLanguageModelHparams)

    hp = AttributeDict(
        **{f: getattr(LSTMLanguageModelHparams, f, None)
           for f in ("grad_clip_threshold", "base_batch_size", "lr",
                     "lr_decay_steps", "early_stopping_metric",
                     "log_samples")},
        vocab_size=args.vocab, d_model=args.d_model,
        d_embedding=args.d_embedding, num_layers=args.num_layers,
        rnn_type="LSTM", tie_logit_weights=True, init_scale=None,
        start_token=1, end_token=2)
    model = LSTMLanguageModel(hp)

    def t(x):
        return torch.from_numpy(np.asarray(x, np.float32))

    with torch.no_grad():
        model.decoder_embedding.weight.copy_(
            t(params["decoder_embedding"]["embedding"]))
        for i in range(args.num_layers):
            getattr(model.decoder, f"weight_ih_l{i}").copy_(
                t(params["decoder"][f"w_ih_{i}"]))
            getattr(model.decoder, f"weight_hh_l{i}").copy_(
                t(params["decoder"][f"w_hh_{i}"]))
            getattr(model.decoder, f"bias_ih_l{i}").copy_(
                t(params["decoder"][f"b_ih_{i}"]))
            getattr(model.decoder, f"bias_hh_l{i}").copy_(
                t(params["decoder"][f"b_hh_{i}"]))
        model.c0.copy_(t(params["c0"])[:, None, :])
        # tied head: Dense kernel is [in, out]; torch Linear weight [out, in]
        model.output_layer[0].weight.copy_(
            t(params["logit_bottleneck"]["kernel"]).T)
        model.output_layer[0].bias.copy_(
            t(params["logit_bottleneck"]["bias"]))
        model.output_layer[1].bias.copy_(t(params["logit_bias"]))

    tokens = torch.from_numpy(ids).long()
    logits = model({"token_ids": tokens})[..., :-1, :]
    loss = robust_cross_entropy(logits, tokens[..., 1:])
    loss.backward()
    # tied embedding/logit weight is ONE parameter; parameters() dedups it
    sq = sum(float((p.grad.double() ** 2).sum())
             for p in model.parameters() if p.grad is not None)
    return float(loss), float(np.sqrt(sq))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refwork", default="/tmp/refwork")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--d_embedding", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    ids, lengths = real_batch(CACHE, [512, 384, 256, 128], 512)
    our_loss, our_gnorm, params = ours(args, ids, lengths)
    ref_loss, ref_gnorm = reference(args, ids, params, args.refwork)

    rel = abs(our_loss - ref_loss) / max(abs(ref_loss), 1e-9)
    grel = abs(our_gnorm - ref_gnorm) / max(abs(ref_gnorm), 1e-9)
    ok = rel < 2e-5 and grel < 2e-4
    print(json.dumps({
        "check": "lstm_lm_same_init_same_batch",
        "our_loss": our_loss, "ref_loss": ref_loss, "loss_rel_err": rel,
        "our_grad_norm": our_gnorm, "ref_grad_norm": ref_gnorm,
        "grad_norm_rel_err": grel, "ok": ok,
        "config": {"d_model": args.d_model, "d_embedding": args.d_embedding,
                   "num_layers": args.num_layers, "vocab": args.vocab,
                   "batch": "4 rows, lengths 512/384/256/128, real corpus"},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
