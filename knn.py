#!/usr/bin/env python
"""Interactive nearest-neighbor search over gathered latents:
``python knn.py <model> <run-name>``.

Counterpart of /root/reference/knn.py: look up an article by title and print
the top-10 neighbors by L2 distance of posterior means, cosine similarity,
and summed KL divergence (:26-56).
"""
import sys
from pathlib import Path

import numpy as np


def topk_print(scores, titles, k=10, largest=False):
    order = np.argsort(scores)
    if largest:
        order = order[::-1]
    hits = order[:k]
    width = max(len(titles[i]) for i in hits)
    for i in hits:
        print(f"{titles[i]:<{width}} - {scores[i]}")


def main(args):
    experiment, name = args[1], args[2]
    save_path = (Path.cwd() / "sparse-vae-datasets" / "latents"
                 / experiment / name)
    from datasets import Dataset
    dataset = Dataset.load_from_disk(str(save_path))
    titles = dataset["title"]
    loc = np.asarray(dataset["latent"], dtype=np.float32)
    scale = np.asarray(dataset["scale"], dtype=np.float32)
    index = {t: i for i, t in enumerate(titles)}

    print("Type the title of an article to get the nearest neighbors. "
          "Type q to quit.")
    while (query := input("Article: ")) != "q":
        i = index.get(query)
        if i is None:
            print("No article found with that title. Try again.")
            continue

        print("\nL2 distance of means:")
        d2 = np.sum((loc[i] - loc) ** 2, axis=-1)
        topk_print(d2, titles)

        print("\nCosine similarity:")
        norms = np.linalg.norm(loc, axis=-1) * np.linalg.norm(loc[i])
        cos = loc @ loc[i] / np.maximum(norms, 1e-12)
        topk_print(cos, titles, largest=True)

        print("\nKL divergence:")
        var_p, var_q = scale[i] ** 2, scale ** 2
        kl = 0.5 * np.sum(
            var_p / var_q + (loc[i] - loc) ** 2 / var_q - 1.0
            + np.log(var_q / var_p), axis=-1)
        topk_print(kl, titles)
        print()


if __name__ == "__main__":
    main(sys.argv)
