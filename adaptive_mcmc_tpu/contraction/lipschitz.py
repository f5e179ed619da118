"""Lipschitz-NN estimators of Wasserstein contraction coefficients and
kernel distances — the research centerpiece of the reference
(utils/lipschitz.py:97-492).

Estimates  τ(P) = sup_{x≠y} W(P(x,·), P(y,·)) / d(x, y)  and the kernel
distance ρ(P, Q) by training a ~1-Lipschitz test function f (spectrally
normalized MLP) to maximize |Pf(x_i) − Pf(x_j)| / d(x_i, x_j) over probe
pairs, where Pf is Monte-Carlo'd through the transition kernel.

TPU-native design vs the reference:
  * no Flax/optax-module machinery for the net — parameters are a plain
    pytree of (W, b) pairs with a purely functional apply (optax still
    drives Adam);
  * the whole training loop (including the nested kernel rollouts inside
    the loss) is ONE ``lax.while_loop`` jitted end-to-end, rather than a
    Python loop around a jitted step;
  * kernel rollouts batch through the same chain-batched ``sample_pnx``
    engine as everything else, so the heavy inner sampling shards over a
    device mesh.

Semantics preserved: quantile-band pair mask (lipschitz.py:129-134),
−logsumexp smooth-max loss (155-160), Adam + elementwise grad clip ±1
(163-174), stop at max_steps or squared-grad-norm ≤ 1e-10 (190-200),
final eval = hard max ratio over masked pairs (203-219).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# Spectrally-normalized MLP (lipschitz.py:10-92) — pure pytree params.
# ---------------------------------------------------------------------------

def spectral_norm(w: Array, num_iters: int = 10, eps: float = 1e-10) -> Array:
    """Divide ``w`` by max(σ_max, 1) (shrink-only) using power iteration
    with a deterministic start vector."""
    u = jnp.ones((w.shape[0],)) / jnp.sqrt(w.shape[0])

    def body(_, uv):
        u, v = uv
        v = w.T @ u
        v = v / (jnp.linalg.norm(v) + eps)
        u = w @ v
        u = u / (jnp.linalg.norm(u) + eps)
        return u, v

    u, v = lax.fori_loop(0, num_iters, body, (u, jnp.zeros((w.shape[1],))))
    sigma = u @ (w @ v)
    return w / jnp.clip(sigma, min=1.0)


class MLPParams(NamedTuple):
    weights: tuple  # ((in, h), (h, h), (h, 1)) kernels
    biases: tuple


def init_lipschitz_mlp(
    rng_key: Array, dim: int, num_features: int = 32
) -> MLPParams:
    sizes = [(dim, num_features), (num_features, num_features), (num_features, 1)]
    keys = jax.random.split(rng_key, len(sizes))
    ws, bs = [], []
    for k, (fan_in, fan_out) in zip(keys, sizes):
        scale = jnp.sqrt(1.0 / fan_in)  # lecun-normal-style
        ws.append(jax.random.normal(k, (fan_in, fan_out)) * scale)
        bs.append(jnp.zeros((fan_out,)))
    return MLPParams(tuple(ws), tuple(bs))


def apply_lipschitz_mlp(params: MLPParams, x: Array) -> Array:
    """f: (..., dim) -> (...) — 2 hidden leaky-relu layers, all kernels
    spectrally normalized (leaky-relu is 1-Lipschitz)."""
    h = x
    n_layers = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ spectral_norm(w) + b
        if i < n_layers - 1:
            h = jax.nn.leaky_relu(h)
    return h[..., 0]


# ---------------------------------------------------------------------------
# Shared estimation machinery.
# ---------------------------------------------------------------------------

def _pair_mask(X: Array, threshold: float = 1e-10):
    """Quantile-band mask over probe-pair distances (lipschitz.py:129-134):
    keep pairs with d(x_i, x_j) in [2·q_{2d/n}(d), √d · lower + thr]."""
    n_points, dim = X.shape
    dists = jnp.linalg.norm(X[:, None] - X[None, :], axis=-1)
    quantile = 2.0 * dim / n_points
    lower = jnp.maximum(2.0 * jnp.quantile(dists, quantile), threshold)
    upper = jnp.sqrt(float(dim)) * lower + threshold
    mask = (lower <= dists) & (dists <= upper)
    return dists, mask


def _train_test_fn(
    mean_fn: Callable[[MLPParams, Array], Array],
    rng_key: Array,
    X: Array,
    dists: Array,
    mask: Array,
    *,
    alpha: float,
    max_steps: int,
    lr: float,
    num_features: int,
    init_params: Optional[MLPParams],
    threshold: float = 1e-10,
):
    """Maximize the smooth-max of masked |Δmean_fn| / d pairs; returns
    trained params.  ``mean_fn(params, key) -> (n_points,)`` is the
    Monte-Carlo estimate of Pf (or Pf − Qf) at every probe point."""
    rng_key, key_init = jax.random.split(rng_key)
    params = (
        init_lipschitz_mlp(key_init, X.shape[1], num_features)
        if init_params is None
        else init_params
    )
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    safe_dists = jnp.where(mask, dists, 1.0)

    def loss_fn(params, key):
        pf = mean_fn(params, key)
        diffs = jnp.abs(pf[:, None] - pf[None, :])
        ratios = jnp.where(mask, diffs / safe_dists, 0.0)
        return -jax.nn.logsumexp(alpha * ratios) / alpha

    def body(val):
        it, key, params, opt_state, _ = val
        key, sub = jax.random.split(key)
        _, grads = jax.value_and_grad(loss_fn)(params, sub)
        grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        gsq = jax.tree_util.tree_reduce(
            lambda acc, g: acc + jnp.sum(g * g), grads, 0.0
        )
        return it + 1, key, params, opt_state, gsq

    def cond(val):
        it, _, _, _, gsq = val
        return (it < max_steps) & (gsq > threshold)

    _, rng_key, params, _, _ = lax.while_loop(
        cond, body, (0, rng_key, params, opt_state, jnp.inf)
    )
    return params, rng_key


def _eval_max_ratio(mean_fn, params, rng_key, dists, mask, n_eval_batches):
    keys = jax.random.split(rng_key, n_eval_batches)
    pf = jnp.mean(jax.lax.map(lambda k: mean_fn(params, k), keys), axis=0)
    diffs = jnp.abs(pf[:, None] - pf[None, :])
    return jnp.max(jnp.where(mask, diffs / dists, 0.0))


# ---------------------------------------------------------------------------
# Public estimators.
# ---------------------------------------------------------------------------

def compute_wasserstein_contraction(
    sample_px: Callable[[Array, Array, int], Array],
    rng_key: Array,
    X: Array,
    *,
    sample_batch_size: int = 1000,
    n_train_batches: int = 10,
    n_eval_batches: int = 100,
    alpha: float = 10.0,
    max_steps: int = 100,
    lr: float = 0.1,
    num_features: int = 32,
):
    """Estimate τ(P) over probe points ``X`` (n_points, d).

    ``sample_px(key, X, n_samples) -> (n_points, n_samples, d)`` draws from
    the one-step (or n-step) kernel at each probe point — build one with
    :func:`make_sample_px`.  Returns (tau, apply_fn, params).
    """
    X = jnp.asarray(X, jnp.float32)
    dists, mask = _pair_mask(X)

    def mean_fn(params, key):
        keys = jax.random.split(key, n_train_batches)

        def one(k):
            batch = sample_px(k, X, sample_batch_size)
            return jnp.mean(apply_lipschitz_mlp(params, batch), axis=-1)

        return jnp.mean(jax.lax.map(one, keys), axis=0)

    params, rng_key = _train_test_fn(
        mean_fn, rng_key, X, dists, mask,
        alpha=alpha, max_steps=max_steps, lr=lr,
        num_features=num_features, init_params=None,
    )

    def eval_mean_fn(params, key):
        batch = sample_px(key, X, sample_batch_size)
        return jnp.mean(apply_lipschitz_mlp(params, batch), axis=-1)

    tau = _eval_max_ratio(
        eval_mean_fn, params, rng_key, dists, mask, n_eval_batches
    )
    return tau, apply_lipschitz_mlp, params


def compute_kernel_distance(
    sample_px: Callable[[Array, Array, int], Array],
    sample_qx: Callable[[Array, Array, int], Array],
    rng_key: Array,
    X: Array,
    *,
    sample_batch_size: int = 1000,
    n_train_batches: int = 10,
    n_eval_batches: int = 100,
    alpha: float = 10.0,
    max_steps: int = 100,
    lr: float = 0.1,
    num_features: int = 32,
    init_params: Optional[MLPParams] = None,
):
    """Estimate the kernel distance ρ(P, Q): same machinery on the
    difference dPf = Pf − Qf (lipschitz.py:223-360).  P and Q share the
    RNG stream per batch (common random numbers), as in the reference."""
    X = jnp.asarray(X, jnp.float32)
    dists, mask = _pair_mask(X)

    def dmean_fn(params, key):
        keys = jax.random.split(key, n_train_batches)

        def one(k):
            bp = sample_px(k, X, sample_batch_size)
            bq = sample_qx(k, X, sample_batch_size)
            return jnp.mean(
                apply_lipschitz_mlp(params, bp), axis=-1
            ) - jnp.mean(apply_lipschitz_mlp(params, bq), axis=-1)

        return jnp.mean(jax.lax.map(one, keys), axis=0)

    params, rng_key = _train_test_fn(
        dmean_fn, rng_key, X, dists, mask,
        alpha=alpha, max_steps=max_steps, lr=lr,
        num_features=num_features, init_params=init_params,
    )

    def eval_fn(params, key):
        bp = sample_px(key, X, sample_batch_size)
        bq = sample_qx(key, X, sample_batch_size)
        return jnp.mean(apply_lipschitz_mlp(params, bp), axis=-1) - jnp.mean(
            apply_lipschitz_mlp(params, bq), axis=-1
        )

    rho = _eval_max_ratio(eval_fn, params, rng_key, dists, mask, n_eval_batches)
    return rho, apply_lipschitz_mlp, params


def compute_kernel_distance_1d(
    sample_px: Callable,
    sample_qx: Callable,
    rng_key: Array,
    x: Array,
    *,
    sample_batch_size: int = 10000,
    n_train_batches: int = 1,
    n_eval_batches: int = 100,
    max_steps: int = 100,
    lr: float = 0.1,
    ratio_rad: int = 1,
    num_features: int = 32,
    init_params: Optional[MLPParams] = None,
):
    """1-D specialization (lipschitz.py:363-492): consecutive-point ratios
    at offset ``ratio_rad`` on a sorted probe grid instead of the masked
    pair matrix; hard max loss.  P/Q get independent subkeys per batch as
    in the reference (lipschitz.py:409-411)."""
    x = jnp.asarray(x, jnp.float32).reshape(-1)
    X = x[:, None]
    rng_key, key_init = jax.random.split(rng_key)
    params = (
        init_lipschitz_mlp(key_init, 1, num_features)
        if init_params is None
        else init_params
    )
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    grid_dists = jnp.abs(x[:-ratio_rad] - x[ratio_rad:])

    def dpf_batch(params, key):
        kp, kq = jax.random.split(key)
        bp = sample_px(kp, X, sample_batch_size)
        bq = sample_qx(kq, X, sample_batch_size)
        return jnp.mean(apply_lipschitz_mlp(params, bp), axis=-1) - jnp.mean(
            apply_lipschitz_mlp(params, bq), axis=-1
        )

    def loss_fn(params, key):
        keys = jax.random.split(key, n_train_batches)
        dpf = jnp.mean(
            jax.lax.map(lambda k: dpf_batch(params, k), keys), axis=0
        )
        ratios = jnp.abs(dpf[:-ratio_rad] - dpf[ratio_rad:]) / grid_dists
        return -jnp.max(ratios)

    def body(val):
        it, key, params, opt_state, _ = val
        key, sub = jax.random.split(key)
        _, grads = jax.value_and_grad(loss_fn)(params, sub)
        grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        gsq = jax.tree_util.tree_reduce(
            lambda acc, g: acc + jnp.sum(g * g), grads, 0.0
        )
        return it + 1, key, params, opt_state, gsq

    def cond(val):
        it, _, _, _, gsq = val
        return (it < max_steps) & (gsq > 1e-10)

    _, rng_key, params, _, _ = lax.while_loop(
        cond, body, (0, rng_key, params, opt_state, jnp.inf)
    )

    keys = jax.random.split(rng_key, n_eval_batches)
    dpf = jnp.mean(
        jax.lax.map(lambda k: dpf_batch(params, k), keys), axis=0
    )
    rho = jnp.max(jnp.abs(dpf[1:] - dpf[:-1]) / jnp.abs(x[1:] - x[:-1]))
    return rho, apply_lipschitz_mlp, params


def make_sample_px(kernel, adapt_state, n: int = 1):
    """Adapter: build the ``sample_px(key, X, n_samples)`` callable the
    estimators consume from a kernel + frozen adapt state, backed by the
    chain-batched ``sample_pnx`` engine."""
    from adaptive_mcmc_tpu.infer.mcmc import sample_pnx

    def sample_px(key, X, n_samples):
        return sample_pnx(
            kernel, key, X, adapt_state, n=n, n_samples=n_samples
        )

    return sample_px
