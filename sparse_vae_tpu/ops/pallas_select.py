"""Fused decode-time token selection: the nucleus sampling rule in VMEM.

The per-pass cost that makes parallel (Jacobi / frontier) decoding lose to
the AR ring-cache loop is not the forward pass — it is selection over the
[W, 32768] logits (VERDICT r2 #1): the sort-free nucleus bisection
(models/generation.py:68-94) re-reads the full probability tensor from HBM
once per bisection iteration (~24 × 67 MB per 512-token window), and the
Gumbel / argmax stages each add more full-tensor round-trips — ~1.9 GB of
HBM traffic per pass against a ~60 GFLOP forward.

The fix is a bandwidth restructure, not more FLOPs: keep the projection
(and the elementwise repetition penalty, which XLA fuses into the
projection's consumer chain) as ordinary XLA ops — re-streaming the
embedding table per token tile inside a mega-kernel would cost MORE HBM
than materializing the logits once — then run ONE Pallas kernel over row
tiles small enough that a tile's ENTIRE vocabulary row fits in VMEM
([tt, V] fp32, tt=8 → 1 MB, so the double-buffered inputs plus the
probability/value temporaries stay well under the ~16 MB VMEM budget).
Inside the kernel: temperature, softmax statistics, the full top-p
threshold bisection, the Gumbel perturbation and the argmax — logits are
read from HBM exactly once. Per-pass selection traffic drops ~6×.

Mosaic tiling notes: input blocks are [tt, V] fp32 with tt=8 (the minimum
second-minor granularity for 32-bit data); the output is [npad, 128] with
each tile's choices broadcast across the lane dim (wrapper reads lane 0) —
per-tile output blocks of shape (1, tt) violate the (8, 128) block-shape
rule, and dynamic row stores into a resident block are a layout corner
case not worth depending on.

Semantics match models/generation.py's process_logits stage-for-stage
(penalize -> temperature -> nucleus bisection -> Gumbel-max; the penalty
is applied by the caller, models/parallel_decode._fused_select) so the
Jacobi fixed point remains an exact ancestral sample under the same noise
grid; the only divergence from the jnp path is floating-point reduction
order in the bisection mass sums, which can flip the kept-set boundary for
tokens whose probability sits within one ulp of the threshold.

Reference parity: this implements the selection half of
/root/reference/sparse_vae/core/generation.py:30-77 (the reference runs it
once per token on [B, V]; here it runs once per *pass* on [B·W, V]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = float("-inf")


def _select_tile(s, noise, *, top_p: float, temperature: float,
                 num_iters: int):
    """Selection math for one [tt, V] logits tile held entirely in VMEM.

    Shared by the Pallas kernel and the jnp reference path (the tests run
    both and the integration falls back to plain jnp off-TPU), so the two
    implementations cannot drift. The repetition penalty is applied by the
    caller (it is elementwise in the logits and fuses into the projection).
    """
    if temperature != 1.0 and temperature > 0.0:
        s = s / temperature

    if 0.0 < top_p < 1.0:
        # Bisection on UNNORMALIZED exp(s - m): thresholding p/z >= t is
        # identical to p_un >= t*z, so comparing kept unnormalized mass
        # against top_p * z avoids materializing a normalized copy of the
        # tile and a [tt, V] division — the kernel is VPU-bound, so every
        # full-tile pass matters.
        m = jnp.max(s, axis=-1, keepdims=True)
        p_un = jnp.exp(s - m)
        z = jnp.sum(p_un, axis=-1, keepdims=True)
        target = top_p * z
        pmax = jnp.max(p_un, axis=-1, keepdims=True)

        def body(_, bounds):
            lo, hi = bounds
            mid = (lo + hi) * 0.5
            mass = jnp.sum(jnp.where(p_un >= mid, p_un, 0.0), axis=-1,
                           keepdims=True)
            keep_raising = mass >= target
            return (jnp.where(keep_raising, mid, lo),
                    jnp.where(keep_raising, hi, mid))

        lo, _ = jax.lax.fori_loop(0, num_iters, body,
                                  (jnp.zeros_like(pmax), pmax))
        keep = (p_un >= lo) | (p_un == pmax)
    else:
        keep = None

    val = s if noise is None else s + noise
    if keep is not None:
        val = jnp.where(keep, val, _NEG_INF)
    # Hand-rolled first-tie argmax (max, then min index attaining it):
    # identical semantics to jnp.argmax, but lowers to plain reductions —
    # Mosaic's native argmax lowering over a 32k-lane axis is not a
    # dependency worth taking.
    v = val.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, val.shape, val.ndim - 1)
    row_max = jnp.max(val, axis=-1, keepdims=True)
    return jnp.min(jnp.where(val == row_max, idx, v),
                   axis=-1).astype(jnp.int32)


def _kernel(*refs, top_p: float, temperature: float, num_iters: int,
            has_noise: bool):
    s_ref = refs[0]
    noise_ref = refs[1] if has_noise else None
    out_ref = refs[-1]

    s = s_ref[...].astype(jnp.float32)
    noise = noise_ref[...].astype(jnp.float32) if has_noise else None
    choice = _select_tile(s, noise, top_p=top_p, temperature=temperature,
                          num_iters=num_iters)
    # Static full-block store: the [tt] result broadcast across the lane
    # dim. A (1, tt) per-tile output block or a dynamic row store into a
    # resident block would both lean on Mosaic layout corner cases; a
    # (tt, 128)-shaped block is unconditionally legal and the wrapper
    # reads lane 0.
    out_ref[...] = jnp.broadcast_to(choice[:, None], out_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("top_p", "temperature", "num_iters", "tt",
                     "interpret", "use_pallas"))
def nucleus_gumbel_argmax(s, noise=None, *,
                          top_p: float = 0.9, temperature: float = 1.0,
                          num_iters: int = 24,
                          tt: int = 8, interpret: bool = False,
                          use_pallas: bool = True):
    """Temperature/nucleus-filter/Gumbel-max over [N, V] logits.

    s: [N, V] raw (already-penalized) logits; noise: optional [N, V]
    Gumbel noise (None = deterministic argmax under the filtered
    distribution — note plain greedy decoding should skip this entirely
    and argmax `s`). Returns chosen [N] int32. One HBM read of every
    operand; the bisection runs on the VMEM-resident tile.
    """
    n, v = s.shape
    if not use_pallas:
        return _select_tile(
            s.astype(jnp.float32),
            None if noise is None else noise.astype(jnp.float32),
            top_p=top_p, temperature=temperature, num_iters=num_iters)

    pad = (-n) % tt
    if pad:
        s = jnp.pad(s, ((0, pad), (0, 0)))
        if noise is not None:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))
    npad = n + pad
    num_tiles = npad // tt

    operands = [s.astype(jnp.float32)]
    in_specs = [pl.BlockSpec((tt, v), lambda t: (t, 0))]
    if noise is not None:
        operands.append(noise.astype(jnp.float32))
        in_specs.append(pl.BlockSpec((tt, v), lambda t: (t, 0)))

    chosen = pl.pallas_call(
        functools.partial(
            _kernel, top_p=top_p, temperature=temperature,
            num_iters=num_iters, has_noise=noise is not None),
        out_shape=jax.ShapeDtypeStruct((npad, 128), jnp.int32),
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tt, 128), lambda t: (t, 0)),
        interpret=interpret,
    )(*operands)
    return chosen[:n, 0]
