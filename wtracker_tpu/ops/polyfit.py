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


def jacobi_eigh(a: jnp.ndarray, sweeps: int = 12) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition by unrolled cyclic Jacobi rotations.

    Built for the tiny (k ≤ 8) normal matrices of polynomial fitting:
    ``jnp.linalg.eigh``'s f64 custom call does not lower reliably on TPU (it
    returns NaN on the axon runtime), while this uses only elementwise f64
    arithmetic.  Cost is ``sweeps · k(k-1)/2`` Givens rotations, fully unrolled
    at trace time.

    Returns ``(eigenvalues, eigenvectors)`` with columns as eigenvectors,
    like ``jnp.linalg.eigh`` (not sorted).
    """
    k = a.shape[0]
    v = jnp.eye(k, dtype=a.dtype)
    tiny = jnp.asarray(jnp.finfo(a.dtype).tiny, a.dtype)

    for _ in range(sweeps):
        for p in range(k - 1):
            for q in range(p + 1, k):
                apq = a[p, q]
                app = a[p, p]
                aqq = a[q, q]

                rotate = jnp.abs(apq) > tiny
                safe_apq = jnp.where(rotate, apq, 1.0)
                tau = (aqq - app) / (2.0 * safe_apq)
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
                t = jnp.where(jnp.sign(tau) == 0, 1.0 / (tau + jnp.sqrt(1.0 + tau * tau)), t)
                c = 1.0 / jnp.sqrt(1.0 + t * t)
                s = t * c
                c = jnp.where(rotate, c, 1.0)
                s = jnp.where(rotate, s, 0.0)

                # a <- Gᵀ a G on rows/cols p, q
                row_p = a[p, :]
                row_q = a[q, :]
                a = a.at[p, :].set(c * row_p - s * row_q)
                a = a.at[q, :].set(s * row_p + c * row_q)
                col_p = a[:, p]
                col_q = a[:, q]
                a = a.at[:, p].set(c * col_p - s * col_q)
                a = a.at[:, q].set(s * col_p + c * col_q)
                a = a.at[p, q].set(0.0)
                a = a.at[q, p].set(0.0)

                vcol_p = v[:, p]
                vcol_q = v[:, q]
                v = v.at[:, p].set(c * vcol_p - s * vcol_q)
                v = v.at[:, q].set(s * vcol_p + c * vcol_q)

    return jnp.diagonal(a), v


def lstsq_minnorm(a: jnp.ndarray, b: jnp.ndarray, rcond: float | jnp.ndarray) -> jnp.ndarray:
    """Min-norm least-squares solution of ``a @ x = b`` via normal equations.

    Eigen-decomposes ``aᵀa`` (symmetric PSD, shape (k, k)) with the TPU-safe
    Jacobi solver and filters eigenvalues below ``(rcond·σ_max)²``, mirroring
    ``np.linalg.lstsq``'s singular-value cutoff.
    """
    ata = a.T @ a
    atb = a.T @ b
    evals, evecs = jacobi_eigh(ata)
    evals = jnp.maximum(evals, 0.0)
    # the eigenvalue cutoff needs a floor at the normal-equations noise level
    # (~eps·λmax — forming aᵀa squares singular values but not the noise), or
    # rank-deficient systems keep spurious directions
    eps = jnp.finfo(ata.dtype).eps
    cutoff = jnp.maximum(rcond**2, 16 * eps) * jnp.max(evals)
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
