#!/usr/bin/env python
"""Interactive reconstruction: ``python reconstruct.py <model> <run-name>``.

Counterpart of /root/reference/reconstruct.py: type an article title, the
document is encoded, and a reconstruction is decoded from the posterior mean
at temperature 0.7 (:20-34).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]

    from sparse_vae_tpu import load_checkpoint_for_name
    from sparse_vae_tpu.cli import assemble_config, build_data
    from sparse_vae_tpu.models.generation import SamplingParams

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name)
    params = state["params"]

    cfg = assemble_config(experiment, [])
    cfg.data = type(cfg.data)(**meta.get("data_hparams", {}))
    data = build_data(cfg)
    tokenizer = data.tokenizer

    docs, titles = [], {}
    for split in ("train", "test"):
        corpus = data.splits[split]
        for i in range(len(corpus)):
            title = corpus.titles[i] if corpus.titles else str(len(docs))
            titles[title] = len(docs)
            docs.append(corpus.docs[i])

    print("Type the title of an article to get a reconstruction. "
          "Type q to quit.")
    while (query := input("Article: ")) != "q":
        idx = titles.get(query)
        if idx is None:
            print("No article found with that title. Try again.")
            continue
        tokens = jnp.asarray(np.asarray(docs[idx], np.int32))[None, :]
        posterior = module.apply({"params": params}, tokens,
                                 method=type(module).posterior)
        recon = module.apply(
            {"params": params}, jax.random.PRNGKey(0), 1024, 1,
            posterior.loc, SamplingParams(temperature=0.7),
            method=type(module).sample)
        text = tokenizer.decode([int(t) for t in np.asarray(recon[0])
                                 if t != 0])
        print("Reconstruction:\n\n" + text)


if __name__ == "__main__":
    main(sys.argv)
