"""Weighted polynomial least-squares on device (Vandermonde + min-norm solve).

TPU-native replacement for the reference's ``numpy.polynomial.polynomial``
usage (polyfit_controller.py:75-76, 203-205).  Follows the column-scaled
least-squares algorithm of ``numpy.polynomial.polyutils._fit``, but solves the
system through an eigendecomposition of the (tiny, ≤6×6) normal matrix instead
of an SVD: float64 LU/SVD custom-calls are unsupported on TPU, while ``eigh``
lowers cleanly, and for ``AᵀA`` the eigen-filtered pseudo-inverse reproduces
numpy's rcond-cut SVD solution (min-norm on rank deficiency) to f64 round-off
for these well-scaled low-degree systems.

Zero weights exclude samples: a row with ``w == 0`` contributes nothing to the
normal equations, which is how data-dependent masks (missing detections)
stay jit-compatible without dynamic shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["polyvander", "polyfit", "polyval", "fit_and_eval", "lstsq_minnorm"]


def lstsq_minnorm(a: jnp.ndarray, b: jnp.ndarray, rcond: float | jnp.ndarray) -> jnp.ndarray:
    """Min-norm least-squares solution of ``a @ x = b`` via normal equations.

    Eigen-decomposes ``aᵀa`` (symmetric PSD, shape (k, k)) and filters
    eigenvalues below ``(rcond·σ_max)²``, mirroring ``np.linalg.lstsq``'s
    singular-value cutoff.  TPU-safe in float64 (elementwise + eigh only).
    """
    ata = a.T @ a
    atb = a.T @ b
    evals, evecs = jnp.linalg.eigh(ata)
    evals = jnp.maximum(evals, 0.0)
    cutoff = (rcond**2) * jnp.max(evals)
    inv = jnp.where(evals > cutoff, 1.0 / jnp.where(evals > cutoff, evals, 1.0), 0.0)
    return evecs @ (inv[:, None] * (evecs.T @ atb))


def polyvander(x: jnp.ndarray, deg: int) -> jnp.ndarray:
    """Increasing-order Vandermonde matrix, shape ``(*x.shape, deg + 1)``."""
    return jnp.power(x[..., None], jnp.arange(deg + 1, dtype=x.dtype))


@partial(jax.jit, static_argnames=("deg",))
def polyfit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    deg: int,
    w: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Least-squares polynomial fit; mirrors ``np.polynomial.polynomial.polyfit``.

    Args:
        x: sample positions, shape (N,).
        y: sample values, shape (N,) or (N, M) for M simultaneous fits.
        deg: polynomial degree (static).
        w: optional per-sample weights (N,); zero excludes a sample.

    Returns:
        Coefficients in increasing order, shape (deg + 1,) or (deg + 1, M).
    """
    x = jnp.asarray(x, dtype=jnp.float64)
    y = jnp.asarray(y, dtype=jnp.float64)

    lhs = polyvander(x, deg)
    rhs = y if y.ndim > 1 else y[:, None]
    if w is not None:
        w = jnp.asarray(w, dtype=jnp.float64)
        lhs = lhs * w[:, None]
        rhs = rhs * w[:, None]

    # Column scaling for conditioning — same as numpy's polyutils._fit.
    scl = jnp.sqrt(jnp.square(lhs).sum(axis=0))
    scl = jnp.where(scl == 0, 1.0, scl)

    rcond = x.shape[0] * jnp.finfo(x.dtype).eps
    c = lstsq_minnorm(lhs / scl, rhs, rcond)
    c = c / scl[:, None]
    return c if y.ndim > 1 else c[:, 0]


def polyval(x: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate polynomial(s) at ``x``.

    ``coeffs`` has increasing-order coefficients along axis 0; trailing axes
    broadcast against ``x``.
    """
    coeffs = jnp.asarray(coeffs, dtype=jnp.float64)
    deg = coeffs.shape[0] - 1
    van = polyvander(jnp.asarray(x, dtype=jnp.float64), deg)
    return jnp.tensordot(van, coeffs, axes=[[-1], [0]])


@partial(jax.jit, static_argnames=("deg",))
def fit_and_eval(
    x: jnp.ndarray,
    y: jnp.ndarray,
    w: jnp.ndarray,
    x_eval: jnp.ndarray,
    deg: int,
) -> jnp.ndarray:
    """Fused fit + single-point eval — the controller's per-cycle hot path."""
    coeffs = polyfit(x, y, deg, w)
    return polyval(x_eval, coeffs)
