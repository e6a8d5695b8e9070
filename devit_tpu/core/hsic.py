"""HSIC (Hilbert-Schmidt Independence Criterion) for importance ranking.

Parity surface: reference `core/imp_rank.py:175-239` — multi-bandwidth Gaussian
kernel over X (sigma in {1,2,4,8,16}, averaged), linear or RBF kernel over Y,
double-centered Gram matrices, score = trace(G_X @ G_Y).

The reference computes one HSIC per neuron/head in a Python loop; here the
candidate axis is vmapped so a whole layer's neurons score in one XLA program —
the TPU-native restructuring of imp_rank.py:33-34, 110-121.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

SIGMAS = (1.0, 2.0, 4.0, 8.0, 16.0)


def _center(g: Array) -> Array:
    """Double-center a Gram matrix (imp_rank.py:175-179)."""
    mean_col = jnp.mean(g, axis=0, keepdims=True)
    mean_row = jnp.mean(g, axis=1, keepdims=True)
    return g - mean_col - mean_row + jnp.mean(g)


def _sq_dists(x: Array) -> Array:
    """Pairwise squared distances between rows of x: (B, F) -> (B, B)."""
    inner = x @ x.T
    norms = jnp.diagonal(inner)
    return norms[None, :] + norms[:, None] - 2.0 * inner


def multi_gaussian_gram(x: Array) -> Array:
    """Average of Gaussian kernels over SIGMAS (imp_rank.py:207-211, 231)."""
    d2 = _sq_dists(x)
    g = jnp.zeros_like(d2)
    for s in SIGMAS:
        g = g + jnp.exp(-d2 / (2.0 * s * s))
    return g / len(SIGMAS)


def linear_gram(x: Array) -> Array:
    return x @ x.T


def _mean_sub(x: Array) -> Array:
    """The reference's mean_sub expression, reproduced verbatim for ranking
    parity (imp_rank.py:227: x - mean(x,0)/(std(x,0)+1e-12) — note the division
    binds to the mean term only, and torch.std defaults to the UNBIASED
    estimator, hence ddof=1)."""
    return x - jnp.mean(x, axis=0) / (jnp.std(x, axis=0, ddof=1) + 1e-12)


def hsic(x: Array, y: Array, *, y_kernel: str = "linear", mean_sub: bool = False) -> Array:
    """HSIC score between features x (B, Fx) and y (B, Fy).

    y_kernel='linear', mean_sub=True  -> relevance   (imp_rank.py:17)
    y_kernel='rbf',    mean_sub=False -> redundancy  (imp_rank.py:18)
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if mean_sub:
        x = _mean_sub(x)
        y = y - jnp.mean(y, axis=0)
    g_x = _center(multi_gaussian_gram(x))
    if y_kernel == "linear":
        g_y = _center(linear_gram(y))
    elif y_kernel == "rbf":
        g_y = _center(multi_gaussian_gram(y))
    else:
        raise ValueError(y_kernel)
    # trace(G_X @ G_Y) without materialising the product.
    return jnp.sum(g_x * g_y.T)


def hsic_relevance_many(xs: Array, probs: Array) -> Array:
    """HSIC(x_i, softmax probs) for each candidate x_i: (C, B, F) x (B, K) -> (C,)."""
    return jax.vmap(lambda x: hsic(x, probs, y_kernel="linear", mean_sub=True))(xs)


def hsic_redundancy_matrix(xs: Array) -> Array:
    """Pairwise RBF-HSIC between candidates: (C, B, F) -> (C, C)."""
    return jax.vmap(
        lambda a: jax.vmap(lambda b: hsic(a, b, y_kernel="rbf", mean_sub=False))(xs)
    )(xs)
