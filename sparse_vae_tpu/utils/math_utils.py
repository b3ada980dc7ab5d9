"""Distribution math and text metrics.

JAX re-design of /root/reference/sparse_vae/core/math_utils.py: Monte-Carlo
marginal KL (mutual-information logging), pairwise Gaussian KL/cross-entropy
matrices, WAE-style MMD statistics, and reconstruction BLEU. All device code is
jnp; BLEU is a host-side numpy routine (it is only used for periodic logging).
"""
from __future__ import annotations

import math
from collections import Counter
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .distributions import DiagonalGaussian

_LOG_2PI = math.log(2.0 * math.pi)


def marginal_kl(posterior: DiagonalGaussian, rng, num_samples: int = 10):
    """MC estimate of KL(q(z) || N(0, I)) where q(z) is the aggregate posterior.

    Mirrors math_utils.py:51-58: draw S samples from each of the B posteriors,
    score each sample under every posterior to estimate log q(z), and compare
    with the standard-normal prior density. Used for the `mc_mutual_info`
    metric (transformer_vae.py:59-61: MI = KL - marginal_kl).
    """
    loc = posterior.loc.reshape(posterior.loc.shape[0], -1)
    scale = posterior.scale.reshape(loc.shape)
    flat = DiagonalGaussian(loc, scale)
    samples = flat.sample(rng, (num_samples,))          # [S, B, D]

    # log q(z_sb | x_i) for every posterior i: [S, B, B]
    cross = flat.log_prob(samples[:, :, None, :]).sum(axis=-1)
    log_marginal = jax.nn.logsumexp(cross, axis=2) - math.log(loc.shape[0])

    d = loc.shape[-1]
    log_prior = -0.5 * (jnp.mean(jnp.sum(jnp.square(samples), axis=-1)) + d * _LOG_2PI)
    # KL(q(z) || p) = E_q[log q(z)] - E_q[log p(z)]. NOTE: the reference
    # returns the negation of this (math_utils.py:58 computes log p - log q),
    # which makes its logged `mc_mutual_info = kl - marginal_kl` wrong in
    # sign; we return the positive KL so MI = kl - marginal_kl holds.
    return jnp.mean(log_marginal) - log_prior


def multivariate_gaussian_entropy(g: DiagonalGaussian):
    """H(g) reduced over the last axis (math_utils.py:62-64)."""
    d = g.scale.shape[-1]
    return jnp.sum(jnp.log(g.scale), axis=-1) + 0.5 * (_LOG_2PI + 1.0) * d


def pairwise_gaussian_kl(g: DiagonalGaussian):
    """[B, B] matrix of KL(g_i || g_j) for a batch of diagonal Gaussians.

    Vectorized like math_utils.py:91-103: entry [i, j] = KL from i to j.
    """
    var_p = g.variance.reshape(g.loc.shape[0], -1)       # [B, D]
    mu = g.loc.reshape(var_p.shape)
    trace_log_sigma = jnp.sum(jnp.log(g.scale.reshape(var_p.shape)), axis=-1)
    log_sigma_ratio = trace_log_sigma[None, :] - trace_log_sigma[:, None]

    inv_var_q = 1.0 / var_p                               # [B, D] (row j)
    # sum_d (mu_i - mu_j)^2 / var_j  and  sum_d var_i / var_j
    quad = (jnp.square(mu) @ inv_var_q.T
            - 2.0 * mu @ (mu * inv_var_q).T
            + jnp.sum(jnp.square(mu) * inv_var_q, axis=-1)[None, :])
    trace = var_p @ inv_var_q.T
    return log_sigma_ratio + 0.5 * (trace + quad - var_p.shape[-1])


def multivariate_gaussian_cross_entropy(p: DiagonalGaussian,
                                        q: DiagonalGaussian):
    """[N, M] matrix of cross-entropies H(p_i, q_j) between two batches of
    diagonal Gaussians (math_utils.py:66-73).

    H(p, q) = sum_d log sigma_q + 1/2 (sum_d (var_p + (mu_p - mu_q)^2)
    / var_q + d log 2pi). NOTE: the reference's middle term uses mu_p twice
    (`mu_p @ (mu_p.T * inv_var_q)`, math_utils.py:71) where the cross term
    of (mu_p - mu_q)^2 requires mu_q — and its broadcasting only admits
    N == M. Reimplemented with the correct cross term for any N, M;
    `pairwise_gaussian_cross_entropy(g)` equals
    `multivariate_gaussian_cross_entropy(g, g)` (tested).
    """
    var_p = p.variance.reshape(p.loc.shape[0], -1)       # [N, D]
    mu_p = p.loc.reshape(var_p.shape)
    var_q = q.variance.reshape(q.loc.shape[0], -1)       # [M, D]
    mu_q = q.loc.reshape(var_q.shape)
    inv_var_q = 1.0 / var_q
    trace_log_sigma_q = jnp.sum(
        jnp.log(q.scale.reshape(var_q.shape)), axis=-1)  # [M]

    quad = (jnp.square(mu_p) @ inv_var_q.T
            - 2.0 * mu_p @ (mu_q * inv_var_q).T
            + jnp.sum(jnp.square(mu_q) * inv_var_q, axis=-1)[None, :])
    trace = var_p @ inv_var_q.T
    d = var_p.shape[-1]
    return trace_log_sigma_q[None, :] + 0.5 * (trace + quad + d * _LOG_2PI)


def pairwise_gaussian_cross_entropy(g: DiagonalGaussian):
    """[B, B] matrix of H(g_i, g_j) (math_utils.py:74-84)."""
    var_p = g.variance.reshape(g.loc.shape[0], -1)
    mu = g.loc.reshape(var_p.shape)
    trace_log_sigma = jnp.sum(jnp.log(g.scale.reshape(var_p.shape)), axis=-1)
    inv_var_q = 1.0 / var_p
    quad = (jnp.square(mu) @ inv_var_q.T
            - 2.0 * mu @ (mu * inv_var_q).T
            + jnp.sum(jnp.square(mu) * inv_var_q, axis=-1)[None, :])
    trace = var_p @ inv_var_q.T
    d = var_p.shape[-1]
    return trace_log_sigma[None, :] + 0.5 * (trace + quad + d * _LOG_2PI)


def _pdist_sq(x):
    """Squared pairwise distances of the rows of x, upper-triangular entries."""
    sq = jnp.sum(jnp.square(x), axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * x @ x.T
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    return jnp.maximum(d2[iu], 0.0)


def _log_rbf_gaussian_overlap(bw_sq, target_var, copies: int):
    """log E[k(a, b)] for an RBF kernel of bandwidth² `bw_sq` where the
    squared distance ||a-b||² is chi-square-like with per-dimension variance
    `copies * target_var` — i.e. log ∏_d sqrt(bw² / (bw² + copies·v_d)).

    This is the one closed form every Gaussian-vs-Gaussian RBF expectation
    reduces to: the kernel-vs-target cross term uses copies=1, the
    target-vs-target term copies=2, and the null-variance correction terms
    copies=3 and 4. Kept in the log domain so large d doesn't underflow.
    """
    return 0.5 * jnp.sum(
        math.log(bw_sq) - jnp.log(bw_sq + copies * target_var), axis=-1)


def custom_gaussian_rbf_mmd_sq(x, mean, var, standardize: bool = True):
    """Unbiased squared MMD between the empirical distribution of x's rows
    and a diagonal Gaussian N(mean, diag(var)), under an RBF kernel with
    bandwidth² = d/8 (semantics of the reference's estimator,
    math_utils.py:128-153; decomposition is ours — see
    _log_rbf_gaussian_overlap). var broadcasts against x's rows.

    MMD² = E_pp[k] - 2·E_xp[k] + E_xx[k]; `standardize` divides by the
    standard error of the estimator under the null (x ~ target), turning the
    statistic into a z-score like the WAE papers report.
    """
    n, d = x.shape
    bw_sq = 0.125 * d
    var = jnp.broadcast_to(jnp.asarray(var, x.dtype), (d,))

    # Target-vs-target and x-vs-target expectations in closed form; only the
    # x-vs-x term needs the empirical pairwise distances.
    log_pp = _log_rbf_gaussian_overlap(bw_sq, var, copies=2)
    log_xp_scale = _log_rbf_gaussian_overlap(bw_sq, var, copies=1)
    xp_quad = jnp.sum(jnp.square(x - mean) / (bw_sq + var), axis=-1)
    e_pp = jnp.exp(log_pp)
    e_xp = jnp.mean(jnp.exp(log_xp_scale - 0.5 * xp_quad))
    e_xx = jnp.mean(jnp.exp(-0.5 * _pdist_sq(x) / bw_sq))
    mmd_sq = e_pp - 2.0 * e_xp + e_xx

    if standardize:
        # Var_null[MMD²] for the unbiased U-statistic: 2/(n(n-1)) ·
        # (E_pp² + overlap(4) − 2·overlap(1)·overlap(3)), all log-domain.
        log_o3 = _log_rbf_gaussian_overlap(bw_sq, var, copies=3)
        log_o4 = _log_rbf_gaussian_overlap(bw_sq, var, copies=4)
        null_var = (2.0 / (n * (n - 1))) * (
            jnp.exp(2.0 * log_pp) + jnp.exp(log_o4)
            - 2.0 * jnp.exp(log_xp_scale + log_o3))
        mmd_sq = mmd_sq / jnp.sqrt(null_var)
    return mmd_sq


def analytic_gaussian_rbf_mmd_sq(x, standardize: bool = True):
    """custom_gaussian_rbf_mmd_sq specialized to a standard-normal target
    (reference math_utils.py:107-126)."""
    return custom_gaussian_rbf_mmd_sq(x, 0.0, 1.0, standardize=standardize)


def gaussian_imq_mmd_sq(x, rng, num_prior_samples: int = 1000):
    """IMQ-kernel MMD vs. N(0, I), averaged over the 7 WAE scales
    (math_utils.py:160-184). Prior samples are drawn from `rng` and exactly
    standardized, matching the reference's variance-reduction trick."""
    n, d = x.shape
    c = 2.0 * d
    scales = jnp.array([0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0]).reshape(-1, 1) * c

    raw = jax.random.normal(rng, (num_prior_samples, d), dtype=x.dtype)
    raw = (raw - jnp.mean(raw)) / jnp.sqrt(jnp.var(raw))

    first = jnp.mean(scales / (scales + _pdist_sq(x)[None, :]))
    inter = jnp.sum(x[None, :, :] * raw[:, None, :], axis=-1)     # [P, B]
    dists = jnp.sum(jnp.square(x), axis=-1)[None, :] - 2 * inter + d
    middle = 2 * jnp.mean(scales[:, :, None] / (scales[:, :, None] + dists[None]))
    prior = jnp.mean(scales / (scales + _pdist_sq(raw)[None, :]))
    return first - middle + prior


def reconstruction_bleu(output: Sequence[int], original: Sequence[int],
                        max_n: int = 4) -> float:
    """Clipped n-gram precision BLEU between two token-id sequences
    (geometric mean over n=1..max_n+1 like math_utils.py:9-38's unigram +
    4 shifted-ngram scores). Host-side; used only for logging."""
    output = [int(t) for t in output]
    original = [int(t) for t in original]
    if not output or not original:
        return 0.0
    scores = []
    for n in range(1, max_n + 2):
        out_ngrams = Counter(tuple(output[i:i + n]) for i in range(len(output) - n + 1))
        ref_ngrams = Counter(tuple(original[i:i + n]) for i in range(len(original) - n + 1))
        total = sum(out_ngrams.values())
        if total == 0:
            scores.append(0.0)
            continue
        clipped = sum(min(c, ref_ngrams[g]) for g, c in out_ngrams.items())
        scores.append(clipped / total)
    if any(s == 0.0 for s in scores):
        return 0.0
    return float(np.exp(np.mean(np.log(scores))))


def bleu_score_corpus(candidates: Sequence[Sequence[str]],
                      references: Sequence[Sequence[Sequence[str]]],
                      max_n: int = 2) -> float:
    """Corpus BLEU over word lists, matching the semantics of
    torchtext.data.metrics.bleu_score as used by the sampling callback
    (text_sampling_callback.py:51-54): uniform weights over n=1..max_n,
    with brevity penalty."""
    clipped = np.zeros(max_n)
    totals = np.zeros(max_n)
    cand_len, ref_len = 0, 0
    for cand, refs in zip(candidates, references):
        cand_len += len(cand)
        ref_len += min((len(r) for r in refs),
                       key=lambda L: (abs(L - len(cand)), L))
        for n in range(1, max_n + 1):
            cand_ngrams = Counter(tuple(cand[i:i + n]) for i in range(len(cand) - n + 1))
            max_ref = Counter()
            for ref in refs:
                ref_ngrams = Counter(tuple(ref[i:i + n]) for i in range(len(ref) - n + 1))
                for g, c in ref_ngrams.items():
                    max_ref[g] = max(max_ref[g], c)
            totals[n - 1] += sum(cand_ngrams.values())
            clipped[n - 1] += sum(min(c, max_ref[g]) for g, c in cand_ngrams.items())
    if np.any(totals == 0) or np.any(clipped == 0):
        return 0.0
    precisions = clipped / totals
    bp = 1.0 if cand_len > ref_len else float(np.exp(1 - ref_len / max(cand_len, 1)))
    return float(bp * np.exp(np.mean(np.log(precisions))))
