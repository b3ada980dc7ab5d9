#!/usr/bin/env python
"""Train the REFERENCE dense TransformerLanguageModel (torch, /tmp/refwork
copy) on the same corpus, batch stream, optimizer math, and schedule as this
framework's `train.py transformer-lm` — extending the quality-parity
protocol (train_ref_lstm.py, BASELINE.md "Quality parity vs the reference
ITSELF") from the LSTM family to the transformer family.

Shared between the two runs (anything that could skew the comparison):
  - data: OUR TextDataModule (same tokenizer, token cache, token-budget
    bucketed batches, epoch seeds 7295+epoch — bit-identical batch streams);
  - objective: the reference's own robust_cross_entropy
    (core/language_model.py:161-170), pad labels excluded (ignore_index=0);
  - optimizer: the reference's own RAdam (core/rectified_adam.py) with the
    reference's sqrt-batch lr scaling and per-step cosine decay
    (core/language_model.py:68-78);
  - init DISTRIBUTION: the reference's initialize_weights normal(0, 0.02)
    (core/language_model.py:80-96) == our dense_kernel_init(0.02).

NOT shared — and why exact init copying (the LSTM pair's --init_from_ours)
is deliberately absent here: the attention layouts differ by design. The
reference applies rotary over the FULL d_model vector before the head
split (core/attention.py:61,70,194-208) and carries a dead pos_linear
(core/attention.py:39, no grad); this framework applies rotary per head
over Dh (ops/rotary.py). A copied init therefore cannot make the forwards
bitwise-comparable — the pair measures QUALITY at matched config, data,
and budget, with the step-0 numerics identity already established on the
LSTM pair where the mapping is exact.

Tokens are wrapped as the reference's PaddedTensor (from_raw infers the
pad mask), so its attention masks pad keys exactly as in its own Trainer.

Usage:
  sh tools/ref_parity/setup_ref.sh
  python tools/ref_parity/train_ref_transformer.py --max_steps 300 \
      --out runs/ref-transformer-parity/reference.jsonl
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np
# Must precede any `import triton` possibility: torch._dynamo probes triton
# at load and caches the no-triton configuration (see train_ref_lstm.py).
import torch._dynamo  # noqa: F401

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)

from train_ref_lstm import build_dm  # noqa: E402  (same data protocol)


def build_ref_model(args, dm):
    import torch
    sys.path.insert(0, os.path.join(args.refwork, "shims"))
    sys.path.insert(0, os.path.join(args.refwork, "ref"))
    from pytorch_lightning.utilities.parsing import AttributeDict
    from sparse_vae.core.transformer_language_model import (
        TransformerLanguageModel)

    hp = AttributeDict(
        d_model=args.d_model, num_heads=args.num_heads,
        num_layers=args.num_layers, d_embedding=None, input_dropout=0.0,
        tie_embedding_weights=True, cross_attention=False,
        grad_checkpointing=False, separate_context_embedding=True,
        attn_window_size=4, sparse_self_attention=False,
        grad_clip_threshold=args.grad_clip, init_scale=args.init_scale,
        base_batch_size=100_000, lr=args.lr,
        lr_decay_steps=args.lr_decay_steps,
        early_stopping_metric="val_nll", log_samples=False,
        start_token=dm.start_token, end_token=dm.end_token)
    torch.manual_seed(args.seed)
    model = TransformerLanguageModel(hp)
    model.initialize_weights()  # reference normal(0, init_scale), zero bias
    return model


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--refwork", default="/tmp/refwork")
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--num_heads", type=int, default=4)
    ap.add_argument("--num_layers", type=int, default=2)
    ap.add_argument("--vocab", type=int, default=32768)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--tokens_per_batch", type=int, default=4096)
    ap.add_argument("--test_size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--lr_decay_steps", type=int, default=250_000)
    ap.add_argument("--grad_clip", type=float, default=150.0)
    ap.add_argument("--init_scale", type=float, default=0.02)
    ap.add_argument("--max_steps", type=int, default=300)
    ap.add_argument("--val_every", type=int, default=50)
    ap.add_argument("--val_max_batches", type=int, default=0)
    ap.add_argument("--seed", type=int, default=7295)
    ap.add_argument("--threads", type=int, default=1,
                    help="torch CPU threads (leave headroom for the chip "
                         "queue's host process)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import torch
    torch.set_num_threads(args.threads)
    torch.manual_seed(args.seed)
    dm = build_dm(args)
    model = build_ref_model(args, dm)

    from sparse_vae.core.language_model import (cosine_decay,
                                                robust_cross_entropy)
    from sparse_vae.core.padded_tensor import PaddedTensor
    from sparse_vae.core.rectified_adam import RAdam
    from torch.optim.lr_scheduler import LambdaLR
    from functools import partial

    # reference configure_optimizers (core/language_model.py:68-78), accum=1
    lr_scale = (args.tokens_per_batch / 100_000) ** 0.5
    opt = RAdam(model.parameters(), lr=args.lr * lr_scale, weight_decay=0.01)
    sched = LambdaLR(opt, partial(cosine_decay, args.lr_decay_steps))

    import logging
    import warnings
    warnings.filterwarnings("ignore", message=".*PaddedTensor.*")
    # The mid-refactor PaddedTensor logs a propagation warning on every
    # subclassed op it does not special-case; harmless here (the pad mask
    # verifiedly reaches attention — see module docstring probe).
    logging.getLogger("sparse_vae.core.padded_tensor").setLevel(
        logging.ERROR)

    def tt(x):
        # padded twin feeds the model (its attention masks pad keys); the
        # plain twin feeds the loss (keeps CE free of subclass dispatch).
        t = torch.from_numpy(np.ascontiguousarray(x)).long()
        return PaddedTensor.from_raw(t), t

    def validate():
        model.eval()
        nll_sum = tok_count = byte_count = 0.0
        with torch.no_grad():
            for i, b in enumerate(dm.epoch_batches("test", seed=0)):
                if args.val_max_batches and i >= args.val_max_batches:
                    break
                tokens, plain = tt(b.token_ids)
                logits = model({"token_ids": tokens})[..., :-1, :]
                labels = plain[..., 1:]
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
            tokens, plain = tt(b.token_ids)
            logits = model({"token_ids": tokens})[..., :-1, :]
            labels = plain[..., 1:]
            loss = robust_cross_entropy(logits, labels)
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
                      "family": "transformer-lm-dense",
                      "best_val_nll": best, "steps": step,
                      "wall_s": round(time.time() - t0, 1),
                      "config": vars(args) | {"refwork": "elided"}})
                if out:
                    out.close()
                return 0


if __name__ == "__main__":
    sys.exit(main())
