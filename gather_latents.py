#!/usr/bin/env python
"""Gather posterior latents over train+test splits:
``python gather_latents.py <model> <run-name>``.

Counterpart of /root/reference/gather_latents.py: runs the encoder posterior
over every document (in document order, so titles align) and saves
{title, latent, scale} as an HF dataset under
sparse-vae-datasets/latents/<model>/<name> (:36-39).
"""
import sys
from pathlib import Path

import jax
import numpy as np


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.cli import assemble_config, build_data
    from sparse_vae_tpu.data.batching import BatchPlan, collate, length_bucket

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name)
    params = state["params"]

    cfg = assemble_config(experiment, [])
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {}))
    data = build_data(cfg)
    pad_mult = cfg.data.pad_to_multiple_of

    predict = jax.jit(lambda tokens: module.apply(
        {"params": params}, tokens, method=type(module).posterior))

    latents, scales, titles, doc_indices = [], [], [], []
    next_index = 0
    for split in ("train", "test"):
        corpus = data.splits[split]
        batch_rows = 32
        for start in range(0, len(corpus), batch_rows):
            idx = list(range(start, min(start + batch_rows, len(corpus))))
            docs = corpus.get_docs(idx)
            bucket = length_bucket(max(len(d) for d in docs), pad_mult)
            plan = BatchPlan(bucket_len=bucket, rows=batch_rows,
                             doc_indices=idx)
            batch = collate(plan, docs,
                            [int(corpus.num_bytes[i]) for i in idx])
            q = predict(batch.token_ids)
            loc = np.asarray(q.loc).reshape(batch_rows, -1)[:len(idx)]
            scale = np.asarray(q.scale).reshape(batch_rows, -1)[:len(idx)]
            latents.extend(loc.tolist())
            scales.extend(scale.tolist())
            if corpus.titles:
                titles.extend(corpus.titles[i] for i in idx)
            else:
                titles.extend([""] * len(idx))
            # Stable join key for downstream tooling (tsne.py): position in
            # the train-then-test document order — titles can be duplicated
            # or empty, indices cannot.
            doc_indices.extend(next_index + i for i in idx)
        next_index += len(corpus)

    print("Saving to disk...")
    from datasets import Dataset
    save_path = (Path.cwd() / "sparse-vae-datasets" / "latents"
                 / experiment / name)
    dataset = Dataset.from_dict(
        {"title": titles, "latent": latents, "scale": scales,
         "doc_index": doc_indices})
    dataset.save_to_disk(str(save_path))
    print(f"Done: {len(titles)} latents -> {save_path}")


if __name__ == "__main__":
    main(sys.argv)
