"""Online generation server: continuous batching behind an HTTP API.

The production-serving front-end over serving.py's row-wise decode engine
(beyond-reference; the reference's only interactive surface is the
vae-console REPL). One worker thread owns the device state — a persistent
[B, max_len] RowDecodeState + KV caches — and runs bounded decode slices
forever; HTTP handler threads only enqueue requests and wait on futures:

  client ->  POST /v1/generate {"max_tokens": .., "seed": ..}   (blocks)
  engine ->  admit queued requests into dead rows (fresh z, index 0,
             per-row row_max = its max_tokens), run one <=slice_steps
             device slice, harvest finished rows, resolve their futures.

Admission latency is bounded by slice_steps (a new request waits at most
one slice before decoding starts), utilization by the refill loop (a
finished row is re-armed on the next harvest, never idling the batch until
the slowest request ends), and per-request lengths by RowDecodeState's
row_max — three properties lockstep batch sampling cannot give. Device
work stays single-stream and static-shaped: the TPU never sees the queue,
only the same compiled slice function every tick (serving._get_slice_fn).

Requests may carry a prompt ("prompt_tokens" ids, or "prompt" text when a
tokenizer is wired): the prompt is PREFILLED through the same decode path —
each forced token runs the model (building the KV cache exactly as if it
had been sampled) while the sampler's output is discarded (RowDecodeState
.prompt_len) — then sampling continues for max_tokens NEW tokens.

Endpoints:
  POST /v1/generate  {"max_tokens": int=128, "seed": int?, "n": int=1,
                      "prompt_tokens": [int]? | "prompt": str?,
                      "stream": bool=false, "temperature": float?,
                      "top_p": float?, "repetition_penalty": float?}
                     Per-request sampling parameters are traced [B] arrays
                     in the compiled slice — any mix of requests shares
                     ONE executable (temperature 0 = greedy; engine-level
                     top_k stays static).
                     -> {"samples": [{"tokens": [...], "text": str?}, ..],
                         "latency_ms": float}
                     stream=true (n=1): chunked application/x-ndjson —
                     one {"tokens": [...]} line per decode slice as the
                     tokens land, then {"done": true, "tokens_total": ..,
                     "text": ..}.
  GET  /healthz      -> engine statistics (also at /v1/stats)
"""
from __future__ import annotations

import json
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional

import jax
import numpy as np

from .models.generation import (RowDecodeState, SamplingParams,
                                init_row_decode_state)
from .serving import _get_slice_fn, rowwise_family


@dataclass
class _Request:
    max_tokens: int
    seed: Optional[int]
    prompt_tokens: Optional[List[int]] = None
    # Per-request sampling overrides (None = the engine's SamplingParams):
    # traced per-row arrays in the compiled slice, so any mix of requests
    # shares one executable (generation._select_token_rows).
    temperature: Optional[float] = None
    top_p: Optional[float] = None
    repetition_penalty: Optional[float] = None
    # Streaming: when set, the engine pushes each slice's newly decoded
    # tokens (a list of ints) onto this queue as they land, then None at
    # completion; the Future still resolves with the full array.
    chunks: Optional["queue.Queue"] = None
    future: Future = field(default_factory=Future)
    submitted_at: float = field(default_factory=time.monotonic)


class ServeEngine:
    """Continuously-batched generation engine. submit() is thread-safe;
    all device state lives on the single worker thread."""

    def __init__(self, module, params, batch_size: int, max_length: int,
                 sampling: SamplingParams = SamplingParams(),
                 start_token: int = 1, end_token: int = 2,
                 slice_steps: int = 64, fused_select: bool = False,
                 rng_seed: int = 0, bulk_prefill_min: int = 16):
        self.module = module
        self.params = params
        self.batch_size = batch_size
        self.max_length = max_length
        self.start_token = start_token
        self.sampling = sampling
        # Per-request sampling overrides ride the slice as [B] arrays —
        # except under the fused selection kernel, which takes its
        # parameters statically.
        self._use_overrides = not fused_select
        self.is_vae = rowwise_family(module)
        self._slice_fn = _get_slice_fn(module, self.is_vae, sampling,
                                       end_token, slice_steps, fused_select,
                                       interpret=False)
        self._latent = getattr(module.hparams, "latent_depth", 0)
        # Prompts of >= bulk_prefill_min positions fill their row's KV
        # caches with ONE teacher-forced forward (fill_cache_row) instead
        # of prompt-length sequential decode steps; shorter prompts ride
        # the forced-token path (RowDecodeState.prompt_len). Buckets are
        # block-aligned so the sparse forward takes its blocked fast path.
        self.bulk_prefill_min = bulk_prefill_min
        self._prefill_align = max(
            16, getattr(module.hparams, "attn_block_size", 64))
        self._prefill_fns: dict = {}
        self._rng = jax.random.PRNGKey(rng_seed)
        self._live_host = np.zeros(batch_size, bool)  # read by snapshot()
        self._assigned: List[Optional[_Request]] = [None] * batch_size
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._shutdown = threading.Event()
        # Set once the decode slice is compiled (the warmup slice in _run):
        # /healthz reports 503 until then so load balancers and benchmark
        # clients do not time the (possibly minutes-long) first compile.
        self._ready = threading.Event()
        self._fatal: Optional[BaseException] = None
        self._lock = threading.Lock()  # orders submit() vs shutdown/fail
        self.stats = {"served": 0, "tokens_generated": 0, "slices": 0,
                      "request_seconds": 0.0, "started_at": time.time()}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serve-engine")
        self._thread.start()

    # -- client API ----------------------------------------------------------
    def submit(self, max_tokens: int, seed: Optional[int] = None,
               prompt_tokens: Optional[List[int]] = None,
               stream: bool = False, temperature: Optional[float] = None,
               top_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None):
        """Enqueue one generation request; the Future resolves to the
        np.int32 token array (start token stripped, prompt INCLUDED, end
        token kept). prompt_tokens are prefilled through the decode path
        (teacher-forced, KV cache built token by token) before sampling
        continues; max_tokens counts NEW tokens after the prompt."""
        p = len(prompt_tokens or ())
        if p > self.max_length - 3:
            raise ValueError(
                f"prompt of {p} tokens exceeds the batch buffer "
                f"(max_length={self.max_length})")
        vocab = getattr(self.module.hparams, "vocab_size", None)
        if p and (min(prompt_tokens) <= 0
                  or (vocab and max(prompt_tokens) >= vocab)):
            raise ValueError(
                "prompt token ids must be in [1, vocab_size) — 0 is [PAD]")
        max_tokens = max(1, min(int(max_tokens),
                                self.max_length - 2 - p))
        if not self._use_overrides and any(
                v is not None for v in (temperature, top_p,
                                        repetition_penalty)):
            raise ValueError(
                "per-request sampling overrides are unavailable with "
                "fused_select=True (the kernel takes static parameters)")
        req = _Request(max_tokens=max_tokens, seed=seed,
                       prompt_tokens=list(prompt_tokens or ()),
                       temperature=temperature, top_p=top_p,
                       repetition_penalty=repetition_penalty,
                       chunks=queue.Queue() if stream else None)
        # The lock orders this put against shutdown()/worker failure: once
        # either has started failing pending requests (under the same
        # lock), no new request can slip into the drained queue unresolved.
        with self._lock:
            if self._fatal is not None:
                raise RuntimeError(
                    f"engine failed: {self._fatal!r}") from self._fatal
            if self._shutdown.is_set():
                raise RuntimeError("engine is shut down")
            self._queue.put(req)
        return (req.future, req.chunks) if stream else req.future

    def generate(self, max_tokens: int, seed: Optional[int] = None,
                 prompt_tokens: Optional[List[int]] = None,
                 timeout: Optional[float] = 600.0, **sampling) -> np.ndarray:
        return self.submit(max_tokens, seed, prompt_tokens,
                           **sampling).result(timeout)

    def shutdown(self, timeout: float = 30.0):
        self._shutdown.set()
        self._thread.join(timeout)
        self._fail_pending(RuntimeError("engine shut down"))

    def _fail_pending(self, exc: BaseException):
        """Resolve every in-flight and queued future exceptionally (under
        the submit lock, so nothing new slips into the drained queue)."""
        with self._lock:
            for row, req in enumerate(self._assigned):
                if req is not None:
                    self._assigned[row] = None
                    if req.chunks is not None:
                        req.chunks.put(None)  # unblock streaming readers
                    if not req.future.done():
                        req.future.set_exception(exc)
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req.chunks is not None:
                    req.chunks.put(None)
                if not req.future.done():
                    req.future.set_exception(exc)

    def snapshot(self) -> dict:
        s = dict(self.stats)
        served = max(s["served"], 1)
        s["avg_request_s"] = round(s.pop("request_seconds") / served, 3)
        s["queue_depth"] = self._queue.qsize()
        s["live_rows"] = int(np.sum(self._live_host))
        s["batch_size"] = self.batch_size
        s["ready"] = self._ready.is_set()
        s["uptime_s"] = round(time.time() - s.pop("started_at"), 1)
        if self._fatal is not None:
            s["fatal"] = repr(self._fatal)
        return s

    # -- worker thread ---------------------------------------------------
    def _get_prefill_fn(self, lp: int):
        """Jitted bulk prefill for a padded prompt length `lp`: ONE
        teacher-forced forward with the "cache_seed" collection mutable
        (Attention.__call__ sows the head-major rotary K/V per layer),
        then fill_cache_row writes the admitted row of every layer's
        batched cache. Returns the updated caches (donated)."""
        if lp in self._prefill_fns:
            return self._prefill_fns[lp]

        import functools

        from .ops.attention import fill_cache_row

        module, is_vae = self.module, self.is_vae

        @functools.partial(jax.jit, donate_argnums=(1,))
        def prefill(params, caches, row, ids, length, z):
            if is_vae:
                _, seeds = module.apply(
                    {"params": params}, ids, z, mutable=["cache_seed"],
                    method=type(module).reconstruct_hidden)
            else:
                _, seeds = module.apply(
                    {"params": params}, ids, mutable=["cache_seed"],
                    method=type(module).forward_hidden)
            seeds = seeds["cache_seed"]
            out = []
            for i, cache in enumerate(caches):
                kv = seeds[f"layer_{i}"]["attention"]
                out.append(fill_cache_row(cache, row, kv["k"][-1][0],
                                          kv["v"][-1][0], length))
            return out

        self._prefill_fns[lp] = prefill
        return prefill

    def _draw_z(self, seed: Optional[int]) -> np.ndarray:
        if seed is None:
            self._rng, r = jax.random.split(self._rng)
        else:
            r = jax.random.PRNGKey(seed)
        return np.asarray(jax.random.normal(r, (1, max(self._latent, 1))),
                          np.float32)

    def _loop(self):
        try:
            self._run()
        except BaseException as e:  # noqa: BLE001 — a dead worker must not
            # leave clients hanging: record the failure (submit() and
            # /healthz surface it) and resolve every pending future.
            self._fatal = e
            self._fail_pending(RuntimeError(f"engine failed: {e!r}"))
        else:
            self._fail_pending(RuntimeError("engine shut down"))

    def _run(self):
        import jax.numpy as jnp

        b, ml = self.batch_size, self.max_length
        caches = self.module.apply({"params": self.params}, b, ml,
                                   method=type(self.module).init_caches)
        self._rng, d_rng = jax.random.split(self._rng)
        state = init_row_decode_state(b, ml, self.start_token, d_rng)
        # All rows start DEAD: nothing decodes until a request is admitted.
        tokens_h = np.asarray(state.tokens).copy()
        index_h = np.ones(b, np.int32)
        self._live_host = np.zeros(b, bool)
        row_max_h = np.full(b, ml - 1, np.int32)
        prompt_len_h = np.zeros(b, np.int32)
        reported_h = np.zeros(b, np.int32)  # streaming: last pushed index
        temp_h = np.full(b, self.sampling.temperature, np.float32)
        topp_h = np.full(b, self.sampling.top_p, np.float32)
        rp_h = np.full(b, self.sampling.repetition_penalty, np.float32)
        z_h = np.zeros((b, 1, max(self._latent, 1)), np.float32)
        z = jnp.asarray(z_h)
        overrides = ({"temperature": jnp.asarray(temp_h),
                      "top_p": jnp.asarray(topp_h),
                      "repetition_penalty": jnp.asarray(rp_h)}
                     if self._use_overrides else None)
        assigned = self._assigned
        dirty = True  # host mirrors differ from device state

        # Warmup: compile the decode slice before accepting traffic. Rows
        # are explicitly deadened first (init_row_decode_state defaults to
        # live) so the slice is a no-op on the state — but the
        # trace+compile (minutes over a cold cache) happens HERE, not on
        # the first client request.
        state = state._replace(live=jnp.zeros(b, bool),
                               row_max=jnp.asarray(row_max_h),
                               prompt_len=jnp.asarray(prompt_len_h))
        state, caches = self._slice_fn(self.params, state, caches, z,
                                       overrides)
        tokens_h = np.array(state.tokens)
        index_h = np.array(state.index)
        self._live_host = np.array(state.live)
        self._ready.set()

        while not self._shutdown.is_set():
            # Admit: fill every dead row from the queue; block (briefly)
            # when the whole batch is idle so an empty server spins cold.
            admitted = False
            for row in range(b):
                if assigned[row] is not None:
                    continue
                try:
                    if not self._live_host.any() and not admitted:
                        req = self._queue.get(timeout=0.2)
                    else:
                        req = self._queue.get_nowait()
                except queue.Empty:
                    break
                assigned[row] = req
                tokens_h[row] = 0
                tokens_h[row, 0] = self.start_token
                p = len(req.prompt_tokens)
                if p:
                    tokens_h[row, 1:1 + p] = req.prompt_tokens
                index_h[row] = 1
                self._live_host[row] = True
                prompt_len_h[row] = 1 + p
                # index starts at 1 and counts written positions, so a cap
                # of T generated tokens after a p-token prompt is
                # row_max = p + T + 1.
                row_max_h[row] = p + req.max_tokens + 1
                reported_h[row] = 1 + p  # the prompt itself never streams
                s = self.sampling
                temp_h[row] = (s.temperature if req.temperature is None
                               else req.temperature)
                topp_h[row] = s.top_p if req.top_p is None else req.top_p
                rp_h[row] = (s.repetition_penalty
                             if req.repetition_penalty is None
                             else req.repetition_penalty)
                if self.is_vae:
                    z_h[row] = self._draw_z(req.seed)
                if 1 + p >= self.bulk_prefill_min:
                    # Bulk prefill: one forward fills this row's caches
                    # with positions 0..p; decoding resumes at p + 1.
                    align = self._prefill_align
                    lp = min(self.max_length,
                             -(-(1 + p) // align) * align)
                    ids = np.zeros((1, lp), np.int32)
                    ids[0, 0] = self.start_token
                    ids[0, 1:1 + p] = req.prompt_tokens
                    caches = self._get_prefill_fn(lp)(
                        self.params, caches, jnp.asarray(row, jnp.int32),
                        jnp.asarray(ids), jnp.asarray(1 + p, jnp.int32),
                        jnp.asarray(z_h[row][None]))
                    index_h[row] = 1 + p
                admitted = True
                dirty = True
            if not self._live_host.any():
                continue  # idle: retry the blocking get

            if dirty:
                state = RowDecodeState(
                    tokens=jnp.asarray(tokens_h),
                    index=jnp.asarray(index_h),
                    live=jnp.asarray(self._live_host),
                    rng=state.rng, row_max=jnp.asarray(row_max_h),
                    prompt_len=jnp.asarray(prompt_len_h))
                z = jnp.asarray(z_h)  # z only changes on admission
                if self._use_overrides:
                    overrides = {
                        "temperature": jnp.asarray(temp_h),
                        "top_p": jnp.asarray(topp_h),
                        "repetition_penalty": jnp.asarray(rp_h)}
                dirty = False

            state, caches = self._slice_fn(self.params, state, caches, z,
                                           overrides)
            self.stats["slices"] += 1
            tokens_h = np.array(state.tokens)
            index_h = np.array(state.index)
            self._live_host = np.array(state.live)

            for row in range(b):
                req = assigned[row]
                if req is None or req.chunks is None:
                    continue
                new = tokens_h[row, reported_h[row]:index_h[row]]
                if new.size:
                    req.chunks.put([int(t) for t in new])
                reported_h[row] = index_h[row]

            for row in range(b):
                req = assigned[row]
                if req is None or self._live_host[row]:
                    continue
                if req.chunks is not None:
                    req.chunks.put(None)  # end-of-stream sentinel
                out = tokens_h[row, 1:index_h[row]].astype(np.int32)
                assigned[row] = None
                self.stats["served"] += 1
                self.stats["tokens_generated"] += int(out.size)
                self.stats["request_seconds"] += (time.monotonic()
                                                  - req.submitted_at)
                if not req.future.done():  # raced by a failing shutdown
                    req.future.set_result(out)


# -- HTTP layer --------------------------------------------------------------
def make_handler(engine: ServeEngine,
                 decode_fn: Optional[Callable[[List[int]], str]] = None,
                 request_timeout: float = 600.0,
                 encode_fn: Optional[Callable[[str], List[int]]] = None):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # keep-alive (Content-Length is set)

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/v1/stats"):
                snap = engine.snapshot()
                if "fatal" in snap:
                    self._json(503, {"status": "error", **snap})
                elif not snap.get("ready", True):
                    self._json(503, {"status": "warming", **snap})
                else:
                    self._json(200, {"status": "ok", **snap})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            # Consume the body FIRST, on every path: under HTTP/1.1
            # keep-alive an unread body would be parsed as the next
            # request line, desyncing the connection.
            length = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(length) if length else b"{}"
            if self.path != "/v1/generate":
                self._json(404, {"error": f"no route {self.path}"})
                return
            try:
                req = json.loads(body or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
                n = max(1, min(int(req.get("n", 1)), engine.batch_size))
                max_tokens = int(req.get("max_tokens", 128))
                stream = bool(req.get("stream", False))
                if stream and int(req.get("n", 1)) != 1:
                    raise ValueError("stream=true requires n=1")
                seed = req.get("seed")
                seed = None if seed is None else int(seed)
                sp = {k: (None if req.get(k) is None else float(req[k]))
                      for k in ("temperature", "top_p",
                                "repetition_penalty")}
                prompt_tokens = req.get("prompt_tokens")
                if prompt_tokens is not None:
                    prompt_tokens = [int(t) for t in prompt_tokens]
                elif req.get("prompt"):
                    if encode_fn is None:
                        raise ValueError(
                            "text prompts need a tokenizer (encode_fn); "
                            "pass prompt_tokens instead")
                    prompt_tokens = list(encode_fn(str(req["prompt"])))
            except (ValueError, TypeError, AttributeError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            if stream:
                self._stream(max_tokens, seed, prompt_tokens, sp)
                return
            t0 = time.monotonic()
            try:
                futures = [
                    engine.submit(max_tokens,
                                  None if seed is None else int(seed) + i,
                                  prompt_tokens, **sp)
                    for i in range(n)
                ]
                samples = []
                for f in futures:
                    toks = f.result(request_timeout)
                    sample = {"tokens": [int(t) for t in toks]}
                    if decode_fn is not None:
                        sample["text"] = decode_fn(
                            [int(t) for t in toks if t != 0])
                    samples.append(sample)
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._json(200, {
                "samples": samples,
                "latency_ms": round(1e3 * (time.monotonic() - t0), 1),
            })

        def _stream(self, max_tokens, seed, prompt_tokens, sp):
            """Chunked ndjson: one {"tokens": [...]} line per decode slice
            as tokens land, then a {"done": true, ...} trailer."""
            try:
                fut, chunks = engine.submit(max_tokens, seed, prompt_tokens,
                                            stream=True, **sp)
            except (ValueError, RuntimeError) as e:
                self._json(400 if isinstance(e, ValueError) else 503,
                           {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def line(obj):
                payload = (json.dumps(obj) + "\n").encode()
                self.wfile.write(f"{len(payload):X}\r\n".encode()
                                 + payload + b"\r\n")

            deadline = time.monotonic() + request_timeout
            while True:
                try:
                    chunk = chunks.get(
                        timeout=max(0.1, deadline - time.monotonic()))
                except queue.Empty:
                    line({"done": True, "error": "timeout"})
                    break
                if chunk is None:
                    try:
                        toks = [int(t) for t in fut.result(1.0)]
                        trailer = {"done": True, "tokens_total": len(toks)}
                        if decode_fn is not None:
                            trailer["text"] = decode_fn(
                                [t for t in toks if t != 0])
                    except Exception as e:  # noqa: BLE001 — to the client
                        trailer = {"done": True,
                                   "error": f"{type(e).__name__}: {e}"}
                    line(trailer)
                    break
                line({"tokens": chunk})
            self.wfile.write(b"0\r\n\r\n")

    return Handler


class _Server(ThreadingHTTPServer):
    # The stdlib default listen backlog (5) resets connections under
    # concurrent clients (measured: 69/512 ConnectionResetError at
    # concurrency 64 on the round-4 serving benchmark).
    request_queue_size = 128


def run_server(engine: ServeEngine, host: str = "127.0.0.1",
               port: int = 8600, decode_fn=None,
               request_timeout: float = 600.0,
               encode_fn=None) -> ThreadingHTTPServer:
    """Start (and return) the HTTP server; call .serve_forever() to block,
    or drive it from a thread (tests)."""
    handler = make_handler(engine, decode_fn, request_timeout, encode_fn)
    return _Server((host, port), handler)
