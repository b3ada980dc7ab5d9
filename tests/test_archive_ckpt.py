"""Checkpoint params archive (tools/archive_ckpt.py): the anti-VM-reset
path. A trained run's params must round-trip repo-committed npz archives —
export (best checkpoint -> runs/<name>/ckpt_bf16.npz) then restore (npz ->
loadable Orbax checkpoint) — with every float leaf equal to its bf16
rounding and eval surfaces loading the restored checkpoint unchanged."""
import json
import shutil
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def tiny_run(tmp_path, monkeypatch):
    """Train a 3-step tiny lstm-lm run so a real checkpoint exists under a
    scratch sparse-vae-logs root (checkpointing.run_dir resolves from cwd)."""
    monkeypatch.chdir(tmp_path)
    from sparse_vae_tpu import build_model
    from sparse_vae_tpu.data.text_data_module import (TextDataModule,
                                                      TextDataModuleHparams)
    from sparse_vae_tpu.training.trainer import Trainer
    from sparse_vae_tpu.utils.config import TrainerHparams

    dm = TextDataModule(TextDataModuleHparams(
        dataset_name="synthetic", synthetic_docs=40, tokens_per_batch=512,
        min_tokens_per_sample=16, max_tokens_per_sample=128,
        chunk_documents=True, vocab_size=512))
    dm.prepare_data()
    module, hp, objective = build_model("lstm-lm", dict(
        vocab_size=512, d_model=32, d_embedding=16, num_layers=1,
        tie_logit_weights=True))
    tr = Trainer(module, hp, objective, dm,
                 TrainerHparams(accumulate_grad_batches=1, max_steps=3,
                                precision="fp32"),
                 experiment="lstm-lm", name="arch-test")
    tr.fit()
    return tmp_path


@pytest.mark.slow
def test_export_restore_roundtrip(tiny_run):
    import os
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/archive_ckpt.py"), "export",
         "lstm-lm", "arch-test"],
        cwd=tiny_run, env=env, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    info = json.loads(out.stdout.strip().splitlines()[-1])
    arch = Path(info["archived"])
    # export writes next to the repo the TOOL lives in, keyed by run name
    assert arch.exists()
    meta = json.loads((arch.parent / "ckpt_meta.json").read_text())
    assert meta["experiment"] == "lstm-lm"

    from sparse_vae_tpu import load_checkpoint_for_name
    orig = load_checkpoint_for_name("lstm-lm", "arch-test",
                                    root=tiny_run / "sparse-vae-logs")

    # wipe the "VM-reset" state and restore from the archive alone
    shutil.rmtree(tiny_run / "sparse-vae-logs")
    out = subprocess.run(
        [sys.executable, str(REPO / "tools/archive_ckpt.py"), "restore",
         "lstm-lm", "arch-test"],
        cwd=tiny_run, env=env, capture_output=True, text=True)
    assert out.returncode == 0, out.stderr

    rest = load_checkpoint_for_name("lstm-lm", "arch-test")
    po, pr = orig[3]["params"], rest[3]["params"]
    for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(po)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(pr)[0],
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        want = np.asarray(jnp.asarray(a).astype(jnp.bfloat16)
                          .astype(jnp.asarray(a).dtype))
        np.testing.assert_array_equal(
            np.asarray(b), want,
            err_msg=f"leaf {ka} is not the bf16 rounding of the original")
    assert int(rest[3]["step"]) == int(orig[3]["step"])
    # cleanup the repo-side runs/arch-test the export created
    shutil.rmtree(REPO / "runs" / "arch-test", ignore_errors=True)
