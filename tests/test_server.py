"""Online serving engine + HTTP API (sparse_vae_tpu/server.py): greedy
oracle-exactness vs the scalar sample loop, per-request length caps,
concurrent submission, determinism by seed, and an HTTP round-trip."""
import http.client
import json
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_vae_tpu.models.generation import SamplingParams
from sparse_vae_tpu.models.transformer_vae import (TransformerVAE,
                                                   TransformerVAEHparams)
from sparse_vae_tpu.server import ServeEngine, run_server

GREEDY = SamplingParams(top_k=1)


def _vae():
    hp = TransformerVAEHparams(
        d_model=32, num_heads=2, num_layers=2, latent_depth=8,
        vocab_size=32, num_encoder_latents=4,
        sparse_self_attention=True, attn_window_size=2, attn_block_size=8,
        use_pallas_kernel=False)
    model = TransformerVAE(hp)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "sample": rng},
                        jnp.ones((1, 16), jnp.int32))["params"]
    return model, params


def _scalar_reference(model, params, seed: int, max_length: int):
    """The tested scalar sample loop on the SAME z the engine derives from
    `seed` — the oracle for greedy engine outputs."""
    z = jax.random.normal(jax.random.PRNGKey(seed),
                          (1, 1, model.hparams.latent_depth))
    out = model.apply({"params": params}, jax.random.PRNGKey(9), max_length,
                      1, z, GREEDY, method=TransformerVAE.sample)
    row = np.asarray(out[0])
    end = np.nonzero(row == 2)[0]
    return row[:end[0] + 1] if end.size else row[row != 0]


class TestServeEngine:
    def test_greedy_matches_scalar_sample(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=3, max_length=40,
                             sampling=GREEDY, slice_steps=8)
        try:
            for seed in (11, 12, 13):
                got = engine.generate(max_tokens=38, seed=seed, timeout=300)
                ref = _scalar_reference(model, params, seed, 40)
                n = min(len(got), len(ref))
                np.testing.assert_array_equal(got[:n], ref[:n], err_msg=str(seed))
                # engine may stop one short of the scalar loop only at the
                # buffer bound; with max_tokens=38 of a 40 buffer they agree
                assert abs(len(got) - len(ref)) <= 1, (len(got), len(ref))
        finally:
            engine.shutdown()

    def test_per_request_max_tokens(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=64,
                             sampling=GREEDY, slice_steps=16,
                             end_token=-1)  # never stop early
        try:
            for want in (3, 7, 20):
                got = engine.generate(max_tokens=want, seed=5, timeout=300)
                assert len(got) == want, (want, len(got))
        finally:
            engine.shutdown()

    def test_concurrent_requests_deterministic_by_seed(self):
        """9 requests through a 3-row batch: all complete, and each seed's
        output is identical no matter which row/slice served it."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=3, max_length=32,
                             sampling=GREEDY, slice_steps=4)
        try:
            futures = [engine.submit(max_tokens=24, seed=100 + (i % 3))
                       for i in range(9)]
            outs = [f.result(300) for f in futures]
            for i in range(9):
                np.testing.assert_array_equal(outs[i], outs[i % 3])
            stats = engine.snapshot()
            assert stats["served"] == 9
            assert stats["tokens_generated"] == sum(len(o) for o in outs)
        finally:
            engine.shutdown()

    def test_prefill_continues_the_scalar_trajectory(self):
        """Greedy + a prompt equal to the scalar sample's own prefix must
        reproduce the scalar sample EXACTLY: teacher-forcing the true
        prefix builds the identical KV cache, so the continuation is the
        same trajectory."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=40,
                             sampling=GREEDY, slice_steps=8)
        try:
            for seed in (21, 22):
                ref = _scalar_reference(model, params, seed, 40)
                k = min(6, len(ref) - 2)
                got = engine.generate(max_tokens=38,
                                      seed=seed,
                                      prompt_tokens=[int(t)
                                                     for t in ref[:k]],
                                      timeout=300)
                n = min(len(got), len(ref))
                np.testing.assert_array_equal(got[:n], ref[:n],
                                              err_msg=str(seed))
        finally:
            engine.shutdown()

    def test_prompt_containing_end_token_survives(self):
        """A [SEP] inside the prompt must not end the row — only a SAMPLED
        end token finishes a request."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=48,
                             sampling=GREEDY, slice_steps=8,
                             end_token=-1)
        try:
            prompt = [5, 2, 7, 2, 9]  # SEP_ID = 2 twice, mid-prompt
            got = engine.generate(max_tokens=10, prompt_tokens=prompt,
                                  seed=1, timeout=300)
            np.testing.assert_array_equal(got[:5], prompt)
            assert len(got) == len(prompt) + 10
        finally:
            engine.shutdown()

    @pytest.mark.parametrize("sparse", [True, False])
    def test_bulk_prefill_equals_forced_prefill(self, sparse):
        """Bulk prefill (one teacher-forced forward -> fill_cache_row)
        must produce the same greedy continuation as forcing the prompt
        token by token through the decode path — including a prompt long
        enough to wrap the ring cache (ring = 16 positions here)."""
        hp = TransformerVAEHparams(
            d_model=32, num_heads=2, num_layers=2, latent_depth=8,
            vocab_size=32, num_encoder_latents=4,
            sparse_self_attention=sparse, attn_window_size=2,
            attn_block_size=8, use_pallas_kernel=False)
        model = TransformerVAE(hp)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng, "sample": rng},
                            jnp.ones((1, 16), jnp.int32))["params"]
        prompt = [int(t) for t in
                  jax.random.randint(rng, (20,), 3, 32)]  # > ring wrap
        outs = {}
        for mode, threshold in (("bulk", 1), ("forced", 10 ** 9)):
            engine = ServeEngine(model, params, batch_size=2,
                                 max_length=48, sampling=GREEDY,
                                 slice_steps=8, end_token=-1,
                                 bulk_prefill_min=threshold)
            try:
                outs[mode] = engine.generate(max_tokens=12, seed=9,
                                             prompt_tokens=prompt,
                                             timeout=300)
            finally:
                engine.shutdown()
        np.testing.assert_array_equal(outs["bulk"], outs["forced"])
        np.testing.assert_array_equal(outs["bulk"][:20], prompt)
        assert len(outs["bulk"]) == 32

    def test_bulk_prefill_lm_family(self):
        """The LM (no z) bulk-prefill path: forward_hidden seeds the
        caches; continuation equals the forced-token path."""
        from sparse_vae_tpu.models.transformer_lm import (
            TransformerHparams, TransformerLanguageModel)
        hp = TransformerHparams(
            d_model=32, num_heads=2, num_layers=2, vocab_size=32,
            sparse_self_attention=True, attn_window_size=2,
            attn_block_size=8, use_pallas_kernel=False)
        model = TransformerLanguageModel(hp)
        rng = jax.random.PRNGKey(1)
        params = model.init(rng, jnp.ones((1, 16), jnp.int32))["params"]
        prompt = [int(t) for t in jax.random.randint(rng, (18,), 3, 32)]
        outs = {}
        for mode, threshold in (("bulk", 1), ("forced", 10 ** 9)):
            engine = ServeEngine(model, params, batch_size=2,
                                 max_length=48, sampling=GREEDY,
                                 slice_steps=8, end_token=-1,
                                 bulk_prefill_min=threshold)
            try:
                outs[mode] = engine.generate(max_tokens=10,
                                             prompt_tokens=prompt,
                                             timeout=300)
            finally:
                engine.shutdown()
        np.testing.assert_array_equal(outs["bulk"], outs["forced"])

    def test_per_request_temperature_zero_is_greedy(self):
        """A SAMPLING engine (temperature 1.0 default) serving a request
        with temperature=0 must reproduce the greedy scalar trajectory for
        that row — the per-row override path, one shared executable."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=3, max_length=40,
                             sampling=SamplingParams(
                                 temperature=1.0, top_p=0.9), slice_steps=8)
        try:
            # Mixed batch: two sampled rows in flight plus the greedy one.
            bg = [engine.submit(max_tokens=30, seed=50 + i)
                  for i in range(2)]
            got = engine.generate(max_tokens=38, seed=11, temperature=0.0,
                                  timeout=300)
            for f in bg:
                f.result(300)
            ref = _scalar_reference(model, params, 11, 40)
            n = min(len(got), len(ref))
            np.testing.assert_array_equal(got[:n], ref[:n])
        finally:
            engine.shutdown()

    def test_fused_select_rejects_overrides(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=SamplingParams(temperature=1.0),
                             slice_steps=8, fused_select=True)
        try:
            with pytest.raises(ValueError, match="fused_select"):
                engine.submit(max_tokens=4, temperature=0.5)
        finally:
            engine.shutdown()

    def test_streaming_chunks_concatenate_to_result(self):
        """submit(stream=True): per-slice chunks arrive while decoding,
        end with the None sentinel, and concatenate to exactly the
        post-prompt part of the final result."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=48,
                             sampling=GREEDY, slice_steps=4, end_token=-1)
        try:
            prompt = [5, 6, 7]
            fut, chunks = engine.submit(max_tokens=12, seed=8,
                                        prompt_tokens=prompt, stream=True)
            got = []
            n_chunks = 0
            while True:
                c = chunks.get(timeout=300)
                if c is None:
                    break
                got.extend(c)
                n_chunks += 1
            final = fut.result(60)
            assert n_chunks >= 3  # 12 tokens through 4-step slices
            np.testing.assert_array_equal(got, final[len(prompt):])
        finally:
            engine.shutdown()

    def test_http_streaming_ndjson(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=4, end_token=-1)
        server = run_server(engine, port=0,
                            decode_fn=lambda ids: f"<{len(ids)}>")
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=300)
            conn.request("POST", "/v1/generate",
                         json.dumps({"max_tokens": 10, "stream": True,
                                     "seed": 2}))
            resp = conn.getresponse()
            assert resp.status == 200
            assert resp.headers["Content-Type"] == "application/x-ndjson"
            lines = [json.loads(ln) for ln in
                     resp.read().decode().strip().split("\n")]
            assert len(lines) >= 3  # >= 2 token chunks + trailer
            token_lines = [ln for ln in lines if "tokens" in ln]
            trailer = lines[-1]
            assert trailer["done"] and "error" not in trailer
            total = sum(len(ln["tokens"]) for ln in token_lines)
            assert trailer["tokens_total"] == total == 10
            assert trailer["text"] == f"<{total}>"
            # stream + n>1 is a 400
            conn.request("POST", "/v1/generate",
                         json.dumps({"stream": True, "n": 2}))
            resp = conn.getresponse()
            assert resp.status == 400
            resp.read()
            conn.close()
        finally:
            server.shutdown()
            engine.shutdown()

    def test_bad_prompt_tokens_rejected(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=8)
        try:
            with pytest.raises(ValueError, match="PAD"):
                engine.submit(max_tokens=4, prompt_tokens=[3, 0, 5])
            with pytest.raises(ValueError, match="PAD"):
                engine.submit(max_tokens=4, prompt_tokens=[3, 99])
        finally:
            engine.shutdown()

    def test_worker_failure_fails_futures_and_healthz(self):
        """A dying worker must not leave clients hanging: every pending
        future resolves exceptionally, submit() refuses new work, and the
        snapshot carries the fatal error."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=8)

        def boom(*a, **k):
            raise RuntimeError("injected device failure")

        engine._slice_fn = boom
        fut = engine.submit(max_tokens=8, seed=1)
        with np.testing.assert_raises(RuntimeError):
            fut.result(60)
        engine._thread.join(30)
        assert "fatal" in engine.snapshot()
        with np.testing.assert_raises(RuntimeError):
            engine.submit(max_tokens=8)

    def test_unknown_route_does_not_desync_keepalive(self):
        """A POST to an unknown path must drain its body, or HTTP/1.1
        keep-alive parses the leftover bytes as the next request line."""
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=8)
        server = run_server(engine, port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port,
                                              timeout=300)
            def roundtrip(path, body):
                conn.request("POST", path, body)
                resp = conn.getresponse()
                return resp.status, resp.read()  # read: frees keep-alive

            status, _ = roundtrip("/v2/generate",
                                  json.dumps({"max_tokens": 12}))
            assert status == 404
            # Same connection must still serve a real request.
            status, body = roundtrip("/v1/generate",
                                     json.dumps({"max_tokens": 4}))
            assert status == 200, body
            assert json.loads(body)["samples"]
            # Wrong-shape but valid JSON -> 400, not a dropped socket.
            assert roundtrip("/v1/generate", json.dumps([1, 2]))[0] == 400
            assert roundtrip("/v1/generate",
                             json.dumps({"seed": "abc"}))[0] == 400
            conn.close()
        finally:
            server.shutdown()
            engine.shutdown()

    def test_bf16_cast_params_serve(self):
        """Serving-weight cast (params_dtype=bf16): float leaves halve,
        int leaves untouched, and the engine generates valid tokens from
        the cast tree."""
        from sparse_vae_tpu import cast_float_params
        model, params = _vae()
        p16 = cast_float_params(params, "bf16")
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p16)):
            if jnp.issubdtype(a.dtype, jnp.floating):
                assert b.dtype == jnp.bfloat16
            else:
                assert b.dtype == a.dtype
        assert cast_float_params(params, "fp32") is params
        engine = ServeEngine(model, p16, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=8)
        try:
            got = engine.generate(max_tokens=12, seed=3, timeout=300)
            assert 1 <= len(got) <= 12
            assert np.asarray(got).min() >= 0
        finally:
            engine.shutdown()

    def test_http_round_trip(self):
        model, params = _vae()
        engine = ServeEngine(model, params, batch_size=2, max_length=32,
                             sampling=GREEDY, slice_steps=8)
        server = run_server(engine, port=0,
                            decode_fn=lambda ids: f"<{len(ids)} toks>")
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/v1/generate",
                         json.dumps({"max_tokens": 12, "n": 2, "seed": 4}))
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            payload = json.loads(resp.read())
            assert len(payload["samples"]) == 2
            for s in payload["samples"]:
                assert 1 <= len(s["tokens"]) <= 12
                assert s["text"].startswith("<")

            conn.request("GET", "/healthz")
            resp = conn.getresponse()
            assert resp.status == 200
            stats = json.loads(resp.read())
            assert stats["status"] == "ok" and stats["served"] >= 2

            conn.request("POST", "/v1/generate",
                         json.dumps({"max_tokens": 6,
                                     "prompt_tokens": [3, 4, 5]}))
            resp = conn.getresponse()
            assert resp.status == 200, resp.read()
            sample = json.loads(resp.read())["samples"][0]
            assert sample["tokens"][:3] == [3, 4, 5]
            assert len(sample["tokens"]) <= 9

            conn.request("POST", "/v1/generate", "not json")
            assert conn.getresponse().status in (400, 500)
            conn.close()
        finally:
            server.shutdown()
            engine.shutdown()
