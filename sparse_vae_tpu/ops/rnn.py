"""Recurrent cells as MXU-friendly scans.

TPU-native replacement for the reference's `nn.LSTM`/`nn.GRU` usage
(/root/reference/sparse_vae/lstm_language_model.py:23-31,
lstm_vae.py:37-72). Design: the input projection for ALL timesteps is one
large batched matmul (MXU-shaped), and only the small recurrent matmul lives
inside `lax.scan` — the standard way to keep an RNN from serializing every
FLOP on TPU. Gate order matches PyTorch (i, f, g, o for LSTM; r, z, n for
GRU) so hparams transfer 1:1.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_scan(x_proj, w_hh, b_hh, h0, c0, mask=None):
    """Run an LSTM layer over a precomputed input projection.

    x_proj: [B, L, 4H] = x @ W_ih^T + b_ih; w_hh: [4H, H]; h0/c0: [B, H].
    mask: optional [B, L] bool — state is HELD (not evolved) at invalid
    steps, so the final (h_n, c_n) is the state after each row's last valid
    token even with ragged PAD tails (gate biases would otherwise keep
    evolving the state through the padding). Returns
    (outputs [B, L, H], (h_n, c_n)).
    """
    def cell(h, c, xt):
        gates = xt + h @ w_hh.T + b_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    # unroll: the recurrent matmul is tiny, so loop overhead dominates on
    # TPU; unrolling amortizes it without changing the math.
    if mask is None:
        def step(carry, xt):
            h, c = cell(*carry, xt)
            return (h, c), h

        (h_n, c_n), hs = jax.lax.scan(step, (h0, c0),
                                      x_proj.swapaxes(0, 1), unroll=8)
    else:
        def step(carry, xs):
            xt, mt = xs
            h_new, c_new = cell(*carry, xt)
            keep = mt[:, None]
            h = jnp.where(keep, h_new, carry[0])
            c = jnp.where(keep, c_new, carry[1])
            return (h, c), h

        (h_n, c_n), hs = jax.lax.scan(
            step, (h0, c0),
            (x_proj.swapaxes(0, 1), mask.swapaxes(0, 1)), unroll=8)
    return hs.swapaxes(0, 1), (h_n, c_n)


def lstm_step(xt_proj, w_hh, b_hh, h, c):
    """Single decode step (same math as one scan iteration)."""
    gates = xt_proj + h @ w_hh.T + b_hh
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def gru_scan(x_proj, w_hh, b_hh, h0):
    """GRU layer over precomputed input projections (PyTorch gate math).

    x_proj: [B, L, 3H] = x @ W_ih^T + b_ih; returns ([B, L, H], h_n).
    """
    def step(h, xt):
        hg = h @ w_hh.T + b_hh
        xr, xz, xn = jnp.split(xt, 3, axis=-1)
        hr, hz, hn = jnp.split(hg, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h_n, hs = jax.lax.scan(step, h0, x_proj.swapaxes(0, 1), unroll=8)
    return hs.swapaxes(0, 1), h_n


class StackedRNN(nn.Module):
    """Multi-layer unidirectional LSTM/GRU with the PyTorch parameterization.

    Call with token embeddings [B, L, E]; returns (outputs [B, L, H], final
    states). `initial_state` is ((h0, c0) per layer) for LSTM or (h0,) per
    layer for GRU; defaults to zeros.
    """
    hidden_size: int
    num_layers: int = 1
    rnn_type: str = "LSTM"      # 'LSTM' | 'GRU' (ref lstm_language_model.py:23)
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    def _layer_params(self, layer: int, in_dim: int):
        gates = 4 if self.rnn_type == "LSTM" else 3
        w_ih = self.param(f"w_ih_{layer}", self.kernel_init,
                          (gates * self.hidden_size, in_dim))
        w_hh = self.param(f"w_hh_{layer}", self.kernel_init,
                          (gates * self.hidden_size, self.hidden_size))
        b_ih = self.param(f"b_ih_{layer}", nn.initializers.zeros,
                          (gates * self.hidden_size,))
        b_hh = self.param(f"b_hh_{layer}", nn.initializers.zeros,
                          (gates * self.hidden_size,))
        return w_ih, w_hh, b_ih, b_hh

    @nn.compact
    def __call__(self, x, initial_state=None, single_step: bool = False,
                 mask=None):
        """Full-sequence scan, or one decode step when single_step=True
        (x is then [B, E] and the return is (out [B, H], states)).
        mask: optional [B, L] (True = valid); LSTM state is held at invalid
        steps so final states sit at each row's last valid token."""
        if single_step:
            return self._step(x, initial_state)
        b, length, _ = x.shape
        states = []
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            w_ih, w_hh, b_ih, b_hh = self._layer_params(layer, in_dim)

            x_proj = x @ w_ih.T + b_ih  # [B, L, gates*H] — one MXU matmul
            if initial_state is not None:
                init = initial_state[layer]
            elif self.rnn_type == "LSTM":
                init = (jnp.zeros((b, self.hidden_size), x.dtype),
                        jnp.zeros((b, self.hidden_size), x.dtype))
            else:
                init = jnp.zeros((b, self.hidden_size), x.dtype)

            if self.rnn_type == "LSTM":
                x, state = lstm_scan(x_proj, w_hh, b_hh, init[0], init[1],
                                     mask=mask)
            else:
                x, state = gru_scan(x_proj, w_hh, b_hh, init)
            states.append(state)
        return x, states

    def _step(self, x_t, states):
        """One decode step: x_t [B, E] -> (output [B, H], new states).

        Used inside the jitted sampling while_loop (replaces the reference's
        per-token nn.LSTM calls, lstm_language_model.py:79-84). Call via
        ``__call__(x_t, states, single_step=True)`` so the params are shared
        with the full-sequence path.
        """
        new_states = []
        for layer in range(self.num_layers):
            in_dim = x_t.shape[-1]
            w_ih, w_hh, b_ih, b_hh = self._layer_params(layer, in_dim)
            x_proj = x_t @ w_ih.T + b_ih
            if self.rnn_type == "LSTM":
                h, c = lstm_step(x_proj, w_hh, b_hh, *states[layer])
                x_t, new_state = h, (h, c)
            else:
                _, h = gru_scan(x_proj[:, None, :], w_hh, b_hh, states[layer])
                x_t, new_state = h, h
            new_states.append(new_state)
        return x_t, new_states


class BiLSTMEncoder(nn.Module):
    """Bidirectional LSTM encoder returning the concatenated final hidden
    states of both directions (the reference's VAE encoder when
    ``bidirectional_encoder=True``, lstm_vae.py:64-72 + forward :88-98)."""
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, mask=None, c0=None):
        """x: [B, L, E]; mask: [B, L] bool (True = valid). Returns [B, H*dirs].

        With a mask, the forward pass reads each row's valid prefix (state
        held through the PAD tail, so the final h sits at the last real
        token) and the backward pass reads the per-row REVERSED valid prefix
        (gathered per row, not a whole-buffer flip — a flip would feed the
        PAD tail through the gates before the real tokens)."""
        directions = 2 if self.bidirectional else 1
        L = x.shape[1]
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
            lengths = jnp.sum(mask.astype(jnp.int32), axis=1)       # [B]
        finals = []
        for d in range(directions):
            if d == 0:
                xd = x
            elif mask is None:
                xd = jnp.flip(x, axis=1)
            else:
                # Row r reversed-prefix: position t reads token n_r - 1 - t.
                idx = lengths[:, None] - 1 - jnp.arange(L)[None, :]  # [B, L]
                xd = jnp.take_along_axis(
                    x, jnp.clip(idx, 0, L - 1)[..., None], axis=1)
                xd = jnp.where((idx >= 0)[..., None], xd, 0.0)
            rnn = StackedRNN(hidden_size=self.hidden_size,
                             num_layers=self.num_layers, rnn_type="LSTM",
                             name=f"dir_{d}")
            if c0 is not None:
                b = x.shape[0]
                c = jnp.broadcast_to(c0[d], (b, self.hidden_size))
                init = [(jnp.tanh(c), c)] * self.num_layers
            else:
                init = None
            # The reversed valid prefix occupies positions [0, n) like the
            # forward input, so the same mask freezes the PAD tail.
            _, states = rnn(xd, init, mask=mask)
            finals.append(states[-1][0])  # final h of last layer
        return jnp.concatenate(finals, axis=-1)
