"""Sinkhorn-Knopp optimal-transport assignment (jax).

Rebuilds `utils/sinkhorn_knopp.py`:
  * `sinkhorn_knopp` — the classic SwAV assignment (float64-free: we iterate
    in log-space for the same stability the reference buys with .double(),
    `sinkhorn_knopp.py:128-167`);
  * `sinkhorn_knopp_weighted` — learnable class-marginal variant
    (`SinkhornKnopp_im`, `:6-52`), marginal passed in as log-weights;
  * `semi_sinkhorn_knopp` — semi-relaxed OT with a KL-constrained marginal
    (`SemiSinkhornKnopp`, `:82-126`);
  * `balanced_sinkhorn` — learns the prototype marginal by an inner SGD loop
    (`Balanced_sinkhorn`, `:55-79`).

All functions are masked & fixed-shape: `valid` marks real feature rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-8):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


@partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_knopp(features, head, valid=None, queue=None, queue_valid=None,
                   num_iters: int = 3, epsilon: float = 0.05):
    """SwAV assignment: returns Q [N, K] (rows of invalid features are zeros).

    features [N, C], head [C, K] (prototype matrix). Queue rows participate in
    the marginals but are not returned (reference behavior).
    """
    if queue is not None:
        features = jnp.concatenate([features, queue], axis=0)
        valid_all = (
            jnp.concatenate([valid, queue_valid])
            if valid is not None
            else None
        )
    else:
        valid_all = valid
    n = features.shape[0]
    if valid_all is None:
        valid_all = jnp.ones((n,), bool)

    z = _normalize(features)
    c = head / jnp.maximum(jnp.linalg.norm(head, axis=0, keepdims=True), 1e-8)
    logits = (z @ c) / epsilon  # [N, K]
    # log-space Sinkhorn with uniform marginals 1/K (cols of Q^T) and 1/B rows
    logq = jnp.where(valid_all[:, None], logits, -jnp.inf)
    b = jnp.maximum(jnp.sum(valid_all.astype(jnp.float32)), 1.0)
    k = head.shape[1]
    for _ in range(num_iters):
        # normalize over samples for each prototype (rows of Q^T)
        logq = logq - jax.scipy.special.logsumexp(logq, axis=0, keepdims=True)
        logq = logq - jnp.log(k)
        # normalize over prototypes for each sample
        logq = logq - jax.scipy.special.logsumexp(logq, axis=1, keepdims=True)
        logq = logq - jnp.log(b)
    q = jnp.exp(logq) * b  # columns sum to 1 per sample
    q = jnp.where(valid_all[:, None], q, 0.0)
    if queue is not None:
        q = q[: n - queue.shape[0]]
    return q


@partial(jax.jit, static_argnames=("num_iters",))
def sinkhorn_knopp_weighted(features, head, log_w, valid=None,
                            num_iters: int = 3, epsilon: float = 0.05):
    """Sinkhorn with a non-uniform prototype marginal softmax(log_w)."""
    n = features.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    z = _normalize(features)
    c = head / jnp.maximum(jnp.linalg.norm(head, axis=0, keepdims=True), 1e-8)
    logits = (z @ c) / epsilon
    logq = jnp.where(valid[:, None], logits, -jnp.inf)
    b = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    logw = jax.nn.log_softmax(log_w.reshape(-1))
    for _ in range(num_iters):
        logq = logq - jax.scipy.special.logsumexp(logq, axis=0, keepdims=True)
        logq = logq + logw[None, :]
        logq = logq - jax.scipy.special.logsumexp(logq, axis=1, keepdims=True)
        logq = logq - jnp.log(b)
    q = jnp.exp(logq) * b
    return jnp.where(valid[:, None], q, 0.0)


@partial(jax.jit, static_argnames=("num_iters", "num_outer_iters"))
def balanced_sinkhorn(features, head, valid=None, num_iters: int = 3,
                      epsilon: float = 0.05, lr_w: float = 0.1,
                      momentum: float = 0.99, num_outer_iters: int = 10,
                      gamma: float = 5.0):
    """Balanced Sinkhorn: learn the prototype marginal w by SGD.

    Rebuilds `Balanced_sinkhorn` (`utils/sinkhorn_knopp.py:55-79`): an outer
    loop runs SGD(momentum .99, grad-clip 1) on the logit of the prototype
    marginal, minimizing  -E[<Q(w), logits>] + gamma * KL(uniform, softmax(w))
    (the KLDivLoss(batchmean) there divides the KL by K), where Q(w) is the
    weighted Sinkhorn assignment with marginal softmax(w). The gradient flows
    through the full (differentiable, log-space) Sinkhorn iteration, exactly
    as torch autograd differentiates the reference's prob-space loop.

    Returns (q, marginal): the assignment computed with the pre-final-update
    w — matching the reference, which returns the Q of the last inner call
    made *before* the final opt.step() — and the final softmax(w).
    """
    n, k = features.shape[0], head.shape[1]
    if valid is None:
        valid = jnp.ones((n,), bool)
    z = _normalize(features)
    c = head / jnp.maximum(jnp.linalg.norm(head, axis=0, keepdims=True), 1e-8)
    preds = z @ c  # raw cosine logits (the reward term uses these, not /eps)
    b = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    nmask = valid[:, None].astype(jnp.float32)

    def assign(w):
        logw = jax.nn.log_softmax(w)
        logq = jnp.where(valid[:, None], preds / epsilon, -jnp.inf)
        for _ in range(num_iters):
            logq = logq - jax.scipy.special.logsumexp(logq, axis=0,
                                                      keepdims=True)
            logq = logq + logw[None, :]
            logq = logq - jax.scipy.special.logsumexp(logq, axis=1,
                                                      keepdims=True)
            logq = logq - jnp.log(b)
        return jnp.exp(logq) * b * nmask

    def total_loss(w):
        q = assign(w)
        reward = -jnp.sum(q * preds * nmask) / b
        # KLDivLoss(log_softmax(w), softmax(w0)) with reduction="batchmean"
        # over the (K,1)-shaped inputs: KL(uniform || softmax(w)) / K
        t = 1.0 / k
        reg = jnp.sum(t * (jnp.log(t) - jax.nn.log_softmax(w))) / k
        return reward + gamma * reg

    def outer(_, carry):
        w, vel, __ = carry
        q = assign(w)
        g = jax.grad(total_loss)(w)
        gn = jnp.linalg.norm(g)
        g = g * jnp.minimum(1.0, 1.0 / jnp.maximum(gn, 1e-6))
        vel = momentum * vel + g  # torch SGD: buf = mu*buf + grad; p -= lr*buf
        return w - lr_w * vel, vel, q

    w0 = jnp.full((k,), 1.0 / k, jnp.float32)
    w, _, q = jax.lax.fori_loop(
        0, num_outer_iters, outer,
        (w0, jnp.zeros((k,), jnp.float32), jnp.zeros((n, k), jnp.float32)))
    return q, jax.nn.softmax(w)


@partial(jax.jit, static_argnames=("num_iters",))
def semi_sinkhorn_knopp(logits, valid=None, epsilon: float = 0.1,
                        gamma: float = 1.0, num_iters: int = 100):
    """Semi-relaxed OT: equality constraint on samples, KL on prototypes.

    logits [N, K] raw scores. Returns (plan [N, K], loss, kl_reg).
    """
    n, k = logits.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    vm = valid[:, None].astype(jnp.float32)
    p = -jax.nn.log_softmax(logits / 0.1, axis=1)
    q = jnp.exp(-p / epsilon) * vm
    nvalid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    pa = vm / nvalid  # sample marginal
    pb = jnp.ones((k,)) / k
    fi = gamma / (gamma + epsilon)

    def body(_, b):
        a = pa[:, 0] / jnp.maximum(q @ b, 1e-30)
        return jnp.power(pb / jnp.maximum(q.T @ a, 1e-30), fi)

    b = jax.lax.fori_loop(0, num_iters, body, jnp.ones((k,)) / k)
    a = pa[:, 0] / jnp.maximum(q @ b, 1e-30)
    plan = nvalid * a[:, None] * q * b[None, :]
    loss = jnp.sum(jnp.sum(plan * p, axis=1) * valid) / nvalid
    w = jnp.sum(plan * vm, axis=0) / nvalid
    kl = jnp.sum(w * (jnp.log(w + 1e-7) - jnp.log(pb)))
    return plan, loss, kl
