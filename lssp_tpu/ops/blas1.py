"""BLAS-1 vector kernels (reference /root/reference/src/vector.cxx:31-146).

Under jit these are pure jnp and XLA fuses them into surrounding ops; they
exist (a) for API parity, (b) as the single indirection point where the
distributed layer swaps in `lax.psum`-reduced variants (see
lssp_tpu/parallel/dist_ops.py).
"""
from __future__ import annotations

import jax.numpy as jnp


def dot(x, y):
    """<x, y>  (vector.cxx lssp_vec_dot)."""
    return jnp.dot(x, y)


def norm2(x):
    """||x||_2 (vector.cxx lssp_vec_norm)."""
    return jnp.sqrt(jnp.dot(x, x))


def axpy(alpha, x, y):
    """y + alpha*x."""
    return y + alpha * x


def axpby(alpha, x, beta, y):
    """beta*y + alpha*x (vector.cxx lssp_vec_axpby)."""
    return beta * y + alpha * x


def axpbyz(alpha, x, beta, y):
    """z = beta*y + alpha*x (vector.cxx lssp_vec_axpbyz)."""
    return beta * y + alpha * x
