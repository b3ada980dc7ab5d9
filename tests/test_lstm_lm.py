"""End-to-end tests for the LSTM language model: forward shapes, RNN
equivalence vs step decoding, overfitting a tiny corpus through the Trainer,
checkpoint resume, and on-device sampling."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.data.text_data_module import (TextDataModule,
                                                  TextDataModuleHparams)
from sparse_vae_tpu.models.generation import SamplingParams
from sparse_vae_tpu.models.lstm_lm import (LSTMLanguageModel,
                                           LSTMLanguageModelHparams)
from sparse_vae_tpu.ops.rnn import StackedRNN, lstm_scan
from sparse_vae_tpu.training.objectives import ARObjective
from sparse_vae_tpu.training.trainer import Trainer
from sparse_vae_tpu.utils.config import TrainerHparams


def tiny_hparams(**kw):
    # lr is high because the reference RAdam's bias_correction_v factor makes
    # the first ~50 steps tiny (rectified_adam.py:36-38) — tests need fast
    # movement.
    defaults = dict(d_embedding=32, d_model=64, num_layers=1, vocab_size=512,
                    lr=2e-2, lr_decay_steps=10_000, base_batch_size=2048)
    defaults.update(kw)
    return LSTMLanguageModelHparams(**defaults)


class TestStackedRNN:
    def test_scan_matches_stepwise(self, rng):
        rnn = StackedRNN(hidden_size=16, num_layers=2)
        x = jax.random.normal(rng, (3, 7, 8))
        params = rnn.init(rng, x)
        full, states = rnn.apply(params, x)

        # step-by-step must reproduce the scan outputs
        init = None
        h = jnp.zeros((3, 16))
        step_states = [(jnp.zeros((3, 16)), jnp.zeros((3, 16)))] * 2
        outs = []
        for t in range(7):
            out, step_states = rnn.apply(params, x[:, t], step_states,
                                         single_step=True)
            outs.append(out)
        np.testing.assert_allclose(np.stack(outs, 1), full, rtol=2e-5,
                                   atol=1e-5)

    def test_gru_runs(self, rng):
        rnn = StackedRNN(hidden_size=16, rnn_type="GRU")
        x = jax.random.normal(rng, (2, 5, 8))
        params = rnn.init(rng, x)
        out, _ = rnn.apply(params, x)
        assert out.shape == (2, 5, 16)


class TestLSTMLanguageModel:
    def test_forward_shapes(self, rng):
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        tokens = jnp.ones((2, 12), jnp.int32)
        params = model.init(rng, tokens)["params"]
        logits = model.apply({"params": params}, tokens)
        assert logits.shape == (2, 12, 512)

    def test_tied_logits(self, rng):
        hp = tiny_hparams(tie_logit_weights=True)
        model = LSTMLanguageModel(hp)
        tokens = jnp.ones((2, 6), jnp.int32)
        params = model.init(rng, tokens)["params"]
        assert "output_layer" not in params
        logits = model.apply({"params": params}, tokens)
        assert logits.shape == (2, 6, 512)

    def test_sample_shapes_and_termination(self, rng):
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        params = model.init(rng, jnp.ones((1, 4), jnp.int32))["params"]
        out = model.apply({"params": params}, rng, 16, 3,
                          SamplingParams(top_p=1.0, repetition_penalty=1.0),
                          method=LSTMLanguageModel.sample)
        assert out.shape == (3, 15)

    def test_context_changes_logits(self, rng):
        """The context kwarg (VAE z-conditioning hook) must reach the RNN."""
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        tokens = jnp.ones((2, 6), jnp.int32)
        ctx = jnp.ones((2, 8))
        params = model.init(rng, tokens, context=ctx)["params"]
        a = model.apply({"params": params}, tokens, context=ctx)
        b = model.apply({"params": params}, tokens, context=ctx * 2)
        assert not np.allclose(a, b)


@pytest.fixture(scope="module")
def tiny_dm(tmp_path_factory):
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("lstmwork"))
    try:
        dm = TextDataModule(TextDataModuleHparams(
            dataset_name="synthetic", synthetic_docs=64, vocab_size=512,
            tokens_per_batch=2048, min_tokens_per_sample=4,
            max_tokens_per_sample=500, pad_to_multiple_of=128, test_size=8))
        dm.prepare_data()
    finally:
        os.chdir(cwd)
    return dm


class TestTrainerEndToEnd:
    def test_loss_decreases_and_resume(self, tiny_dm, tmp_path):
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        thp = TrainerHparams(accumulate_grad_batches=1, max_steps=80,
                             log_every_n_steps=5, val_check_interval=10.0,
                             checkpoint_every_n_steps=80,
                             sample_every_n_steps=10 ** 9)
        trainer = Trainer(model, hp, ARObjective(), tiny_dm, thp,
                          experiment="lstm-lm", name="t1",
                          log_root=tmp_path)
        # Baseline loss before training
        batch = next(iter(tiny_dm.epoch_batches("train", seed=0)))
        from sparse_vae_tpu.training.objectives import batch_arrays
        rng = jax.random.PRNGKey(0)
        params0, _ = trainer.init_state(rng)
        loss0, _ = ARObjective().loss(model, params0, batch_arrays(batch),
                                      0, rng)
        outcome = trainer.fit(max_epochs=50)
        assert outcome.stopped_reason == "max_steps"
        loss1, _ = ARObjective().loss(model, outcome.params,
                                      batch_arrays(batch), 0, rng)
        assert float(loss1) < float(loss0) * 0.9

        # Resume continues the step counter from the checkpoint
        thp2 = TrainerHparams(accumulate_grad_batches=1, max_steps=82,
                              val_check_interval=10.0,
                              checkpoint_every_n_steps=10 ** 9,
                              sample_every_n_steps=10 ** 9)
        trainer2 = Trainer(model, hp, ARObjective(), tiny_dm, thp2,
                           experiment="lstm-lm", name="t1",
                           log_root=tmp_path)
        outcome2 = trainer2.fit(resume=True, max_epochs=50)
        assert outcome2.step >= 82

    def test_validate_metrics(self, tiny_dm, tmp_path):
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        trainer = Trainer(model, hp, ARObjective(), tiny_dm,
                          TrainerHparams(), experiment="lstm-lm", name="t2",
                          log_root=tmp_path, enable_logging=False)
        params, _ = trainer.init_state(jax.random.PRNGKey(0))
        metrics = trainer.validate(params, jax.random.PRNGKey(1))
        assert set(metrics) >= {"val_nll", "val_bpb", "val_loss"}
        # Untrained model ~ uniform: nll ~ ln(512)
        assert metrics["val_nll"] == pytest.approx(np.log(512), rel=0.3)

    def test_validate_deterministic_in_step(self, tiny_dm, tmp_path):
        """Eval rng derives from (seed, step), not the fit loop's rng chain:
        validate() on the same params is bit-identical across calls, and a
        post-hoc validate at the recorded step reproduces the fit loop's
        logged metrics exactly (VERDICT r2 weak #7)."""
        hp = tiny_hparams()
        model = LSTMLanguageModel(hp)
        thp = TrainerHparams(accumulate_grad_batches=1, max_steps=10,
                             val_check_interval=1e-9,  # validate every step
                             checkpoint_every_n_steps=10 ** 9,
                             sample_every_n_steps=10 ** 9)
        trainer = Trainer(model, hp, ARObjective(), tiny_dm, thp,
                          experiment="lstm-lm", name="tdet",
                          log_root=tmp_path, enable_logging=False)
        outcome = trainer.fit(max_epochs=50)
        assert outcome.metrics_history, "expected at least one validation"
        logged = outcome.metrics_history[-1]
        step = logged["step"]
        assert step == outcome.step  # params correspond to this entry
        a = trainer.validate(outcome.params, step=step)
        b = trainer.validate(outcome.params, step=step)
        for k in a:
            assert a[k] == b[k]
            assert a[k] == logged[k]

    def test_early_stop_start_step_derivation(self):
        from types import SimpleNamespace

        from sparse_vae_tpu.training.trainer import early_stop_start_step

        lm_hp = tiny_hparams()  # no KL schedule -> armed from step 0
        assert early_stop_start_step(TrainerHparams(), lm_hp) == 0
        # explicit value always wins
        assert early_stop_start_step(
            TrainerHparams(early_stopping_start_step=123), lm_hp) == 123
        # a KL-annealed model arms at the end of the anneal
        vae_hp = SimpleNamespace(kl_weight_start=0.1, kl_weight_end=1.0,
                                 kl_annealing_steps=700)
        assert early_stop_start_step(TrainerHparams(), vae_hp) == 700
        # constant KL weight = no anneal -> armed from step 0
        flat_hp = SimpleNamespace(kl_weight_start=1.0, kl_weight_end=1.0,
                                  kl_annealing_steps=700)
        assert early_stop_start_step(TrainerHparams(), flat_hp) == 0

    def test_early_stopping_disarmed_until_start_step(self, tiny_dm,
                                                      tmp_path):
        """With a frozen model (lr=0) the monitored metric never improves,
        so patience=1 fires at the SECOND armed validation — step 2 when
        armed from the start, step es_start+1 when disarmed until then."""
        def run(start_step):
            hp = tiny_hparams(lr=0.0)
            model = LSTMLanguageModel(hp)
            thp = TrainerHparams(accumulate_grad_batches=1, max_steps=20,
                                 val_check_interval=1e-9,  # every step
                                 early_stopping_patience=1,
                                 early_stopping_start_step=start_step,
                                 checkpoint_every_n_steps=10 ** 9,
                                 sample_every_n_steps=10 ** 9)
            trainer = Trainer(model, hp, ARObjective(), tiny_dm, thp,
                              experiment="lstm-lm", name=f"es{start_step}",
                              log_root=tmp_path, enable_logging=False)
            outcome = trainer.fit(max_epochs=50)
            # guard the premise: lr=0 keeps the metric exactly constant
            vals = [h["val_nll"] for h in outcome.metrics_history]
            assert len(set(vals)) == 1
            return outcome

        armed = run(0)
        assert armed.stopped_reason == "early_stopping"
        assert armed.step == 2
        deferred = run(5)
        assert deferred.stopped_reason == "early_stopping"
        assert deferred.step == 6
