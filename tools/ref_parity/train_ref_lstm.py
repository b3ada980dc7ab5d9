#!/usr/bin/env python
"""Train the REFERENCE LSTM-LM (torch, /tmp/refwork copy) on the same corpus,
batch stream, optimizer math, and schedule as this framework's `train.py
lstm-lm` — the matched half of BASELINE.json's quality-parity protocol.

Everything that could skew the comparison is shared:
  - data: OUR TextDataModule (same tokenizer, same token cache, same
    token-budget bucketed batches, same epoch seeds 7295+epoch — the batch
    streams are bit-identical to the jax run's);
  - objective: the reference's own robust_cross_entropy
    (language_model.py:161-170);
  - optimizer: the reference's own RAdam (rectified_adam.py) with the
    reference's sqrt-batch lr scaling and per-step cosine decay
    (language_model.py:68-78);
  - init: optionally OUR initialized parameters copied in (--init_from_ours,
    same mapping as numerics_check.py), so step-0 losses match exactly.

Validation mirrors training/trainer.py::validate: full pass over the test
split, val_nll = nll_sum/token_count, val_bpb = nll_sum/byte_count/ln2.

Usage:
  sh tools/ref_parity/setup_ref.sh
  python tools/ref_parity/train_ref_lstm.py --max_steps 400 \
      --out runs/ref-lstm-parity.jsonl
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np
# Import torch's lazy compile machinery BEFORE the triton shim becomes
# importable: torch._dynamo probes `import triton` at module load and then
# walks shim-less submodules (triton.backends, triton.compiler). Loading it
# now, while no module named triton exists, caches the no-triton
# configuration for the whole process.
import torch._dynamo  # noqa: F401

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


def build_ref_model(args, dm):
    import torch
    sys.path.insert(0, os.path.join(args.refwork, "shims"))
    sys.path.insert(0, os.path.join(args.refwork, "ref"))
    from pytorch_lightning.utilities.parsing import AttributeDict
    from sparse_vae.lstm_language_model import LSTMLanguageModel

    hp = AttributeDict(
        vocab_size=args.vocab, d_model=args.d_model,
        d_embedding=args.d_embedding, num_layers=args.num_layers,
        rnn_type="LSTM", tie_logit_weights=True, init_scale=None,
        grad_clip_threshold=args.grad_clip, base_batch_size=100_000,
        lr=args.lr, lr_decay_steps=args.lr_decay_steps,
        early_stopping_metric="val_nll", log_samples=False,
        start_token=dm.start_token, end_token=dm.end_token)
    torch.manual_seed(args.seed)
    model = LSTMLanguageModel(hp)

    if args.init_from_ours:
        import jax
        jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp
        from sparse_vae_tpu import build_model
        module, _, _ = build_model("lstm-lm", dict(
            vocab_size=args.vocab, d_model=args.d_model,
            d_embedding=args.d_embedding, num_layers=args.num_layers,
            tie_logit_weights=True))
        params = jax.device_get(module.init(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, 16), jnp.int32))["params"])

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
            model.output_layer[0].weight.copy_(
                t(params["logit_bottleneck"]["kernel"]).T)
            model.output_layer[0].bias.copy_(
                t(params["logit_bottleneck"]["bias"]))
            model.output_layer[1].bias.copy_(t(params["logit_bias"]))
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refwork", default="/tmp/refwork")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--d_embedding", type=int, default=256)
    ap.add_argument("--num_layers", type=int, default=1)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--tokens_per_batch", type=int, default=4096)
    ap.add_argument("--test_size", type=int, default=None,
                    help="test-split document count (match the jax run)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr_decay_steps", type=int, default=250_000)
    ap.add_argument("--grad_clip", type=float, default=150.0)
    ap.add_argument("--max_steps", type=int, default=400)
    ap.add_argument("--val_every", type=int, default=50)
    ap.add_argument("--val_max_batches", type=int, default=0,
                    help="cap validation batches (0 = full test split)")
    ap.add_argument("--seed", type=int, default=7295)
    ap.add_argument("--init_from_ours", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import torch
    torch.manual_seed(args.seed)
    dm = build_dm(args)
    model = build_ref_model(args, dm)

    from sparse_vae.core.language_model import (cosine_decay,
                                                robust_cross_entropy)
    from sparse_vae.core.rectified_adam import RAdam
    from torch.optim.lr_scheduler import LambdaLR
    from functools import partial

    # reference configure_optimizers (language_model.py:68-78), accum = 1
    lr_scale = (args.tokens_per_batch / 100_000) ** 0.5
    opt = RAdam(model.parameters(), lr=args.lr * lr_scale, weight_decay=0.01)
    sched = LambdaLR(opt, partial(cosine_decay, args.lr_decay_steps))

    def tt(x):
        return torch.from_numpy(np.ascontiguousarray(x)).long()

    def validate():
        model.eval()
        nll_sum = tok_count = byte_count = 0.0
        with torch.no_grad():
            for i, b in enumerate(dm.epoch_batches("test", seed=0)):
                if args.val_max_batches and i >= args.val_max_batches:
                    break
                tokens = tt(b.token_ids)
                logits = model({"token_ids": tokens})[..., :-1, :]
                labels = tokens[..., 1:]
                n_valid = int((labels != 0).sum())
                nll_sum += float(robust_cross_entropy(logits, labels)) \
                    * n_valid
                tok_count += n_valid
                byte_count += float(b.num_bytes.sum())
        model.train()
        return {"val_nll": nll_sum / max(tok_count, 1.0),
                "val_bpb": nll_sum / max(byte_count, 1.0) / math.log(2)}

    out = open(args.out, "w") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out:
            out.write(line + "\n")
            out.flush()

    step, t0 = 0, time.time()
    best = None
    for epoch in range(10 ** 9):
        for b in dm.epoch_batches("train", seed=args.seed + epoch):
            tokens = tt(b.token_ids)
            logits = model({"token_ids": tokens})[..., :-1, :]
            loss = robust_cross_entropy(logits, tokens[..., 1:])
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(),
                                           args.grad_clip)
            opt.step()
            sched.step()
            step += 1
            if step % 10 == 0:
                emit({"step": step, "train_nll": float(loss),
                      "wall_s": round(time.time() - t0, 1)})
            if step % args.val_every == 0 or step == args.max_steps:
                m = validate()
                best = min(best, m["val_nll"]) if best is not None \
                    else m["val_nll"]
                emit({"step": step, **m})
            if step >= args.max_steps:
                emit({"final": True, "framework": "reference-torch",
                      "best_val_nll": best, "steps": step,
                      "wall_s": round(time.time() - t0, 1),
                      "config": vars(args) | {"refwork": "elided"}})
                if out:
                    out.close()
                return 0


if __name__ == "__main__":
    sys.exit(main())
