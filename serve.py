#!/usr/bin/env python
"""Online generation server: ``python serve.py <model> <run-name>
[port=8600] [batch_size=64] [max_length=512] [slice_steps=64]
[fused_select=0] [temperature=...] [top_p=...] [step=<n|best>]``.

Serves a trained checkpoint behind a continuous-batching HTTP API
(sparse_vae_tpu/server.py): requests are admitted into a persistent
row-wise decode batch, so concurrent clients share the device at ~full
utilization, each with its own max_tokens and (VAE) latent seed.

  curl -s localhost:8600/v1/generate -d '{"max_tokens": 96, "n": 2}'
  curl -s localhost:8600/v1/generate -d '{"prompt": "The", "max_tokens": 64}'
  curl -s localhost:8600/healthz
"""
import sys


def main(args):
    from sparse_vae_tpu.cli import apply_platform_env
    apply_platform_env()
    experiment, name = args[1], args[2]
    extra = dict(kv.split("=", 1) for kv in args[3:])
    port = int(extra.get("port", 8600))
    batch_size = int(extra.get("batch_size", 64))
    max_length = int(extra.get("max_length", 512))
    slice_steps = int(extra.get("slice_steps", 64))
    fused_select = extra.get("fused_select", "0") == "1"

    from sparse_vae_tpu import cast_float_params, load_checkpoint_for_name
    from sparse_vae_tpu.data.tokenizer import SEP_ID
    from sparse_vae_tpu.models.generation import SamplingParams
    from sparse_vae_tpu.server import ServeEngine, run_server

    module, hparams, objective, state, meta = load_checkpoint_for_name(
        experiment, name, step=extra.get("step"))
    # params_dtype=bf16: serving-weight cast — halves the per-step HBM
    # weight read that bounds single-stream decode throughput.
    state["params"] = cast_float_params(state["params"],
                                        extra.get("params_dtype", "fp32"))

    sampling = SamplingParams(
        temperature=float(extra.get("temperature", 1.0)),
        top_p=float(extra.get("top_p", 0.9)),
        top_k=int(extra.get("top_k", 0)),
        repetition_penalty=float(extra.get("repetition_penalty", 1.2)))

    # Tokenizer for the "text" field / "prompt" encoding, resolved from
    # the run's recorded data hparams (same path sample.py uses).
    from sparse_vae_tpu.cli import tokenizer_for_run
    tokenizer = tokenizer_for_run(experiment, meta)
    decode_fn = lambda ids: tokenizer.decode(ids)

    def encode_fn(text):
        # The Roberta post-processor wraps text as [CLS] .. [SEP]; the
        # engine already writes its own start token and the prompt must
        # not end the row, so strip both specials here.
        from sparse_vae_tpu.data.tokenizer import CLS_ID, SEP_ID
        ids = [t for t in tokenizer.encode(text).ids if t != CLS_ID]
        while ids and ids[-1] == SEP_ID:
            ids.pop()
        return ids

    engine = ServeEngine(module, state["params"], batch_size=batch_size,
                         max_length=max_length, sampling=sampling,
                         end_token=SEP_ID, slice_steps=slice_steps,
                         fused_select=fused_select)
    server = run_server(engine, port=port, decode_fn=decode_fn,
                        encode_fn=encode_fn)
    print(f"Serving {experiment}/{name} on :{port} "
          f"(batch {batch_size} x {max_length}, slice {slice_steps})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        engine.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
