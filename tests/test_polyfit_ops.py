"""Device polyfit ops: Jacobi eigensolver and lstsq vs numpy."""

import numpy as np
import numpy.polynomial.polynomial as npoly

import jax.numpy as jnp

from wtracker_tpu.ops.polyfit import jacobi_eigh, lstsq_minnorm, polyfit, polyval


def test_jacobi_eigh_matches_numpy(rng):
    for k in (2, 3, 4, 6, 8):
        for _ in range(5):
            m = rng.normal(size=(k, k))
            a = m @ m.T  # PSD
            evals, evecs = jacobi_eigh(jnp.asarray(a))
            evals, evecs = np.asarray(evals), np.asarray(evecs)

            # reconstruction is the invariant that matters
            np.testing.assert_allclose(evecs @ np.diag(evals) @ evecs.T, a, atol=1e-10)
            np.testing.assert_allclose(evecs @ evecs.T, np.eye(k), atol=1e-12)

            want = np.sort(np.linalg.eigvalsh(a))
            np.testing.assert_allclose(np.sort(evals), want, rtol=1e-10, atol=1e-10)


def test_lstsq_minnorm_full_rank(rng):
    a = rng.normal(size=(12, 4))
    b = rng.normal(size=(12, 2))
    got = np.asarray(lstsq_minnorm(jnp.asarray(a), jnp.asarray(b), 1e-14))
    want, *_ = np.linalg.lstsq(a, b, rcond=None)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_lstsq_minnorm_rank_deficient(rng):
    # only 2 distinct rows -> rank 2 < 4 columns; min-norm solution expected
    a = np.zeros((6, 4))
    a[0] = rng.normal(size=4)
    a[1] = rng.normal(size=4)
    b = np.zeros((6, 1))
    b[:2] = rng.normal(size=(2, 1))
    got = np.asarray(lstsq_minnorm(jnp.asarray(a), jnp.asarray(b), 1e-12))
    want, *_ = np.linalg.lstsq(a, b, rcond=1e-12)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_polyfit_matches_numpy_polynomial(rng):
    x = np.arange(-10.0, 6.0)
    y = rng.normal(size=(len(x), 3)) + 0.5 * x[:, None] + 0.01 * (x**2)[:, None]
    w = rng.uniform(0.5, 2.0, size=len(x))

    got = np.asarray(polyfit(jnp.asarray(x), jnp.asarray(y), 2, jnp.asarray(w)))
    want = npoly.polyfit(x, y, deg=2, w=w)
    np.testing.assert_allclose(got, want, atol=1e-10)

    # zero weights behave like dropped rows
    w2 = w.copy()
    w2[:4] = 0.0
    got = np.asarray(polyfit(jnp.asarray(x), jnp.asarray(y), 2, jnp.asarray(w2)))
    want = npoly.polyfit(x[4:], y[4:], deg=2, w=w[4:])
    np.testing.assert_allclose(got, want, atol=1e-10)

    # eval
    got_v = np.asarray(polyval(jnp.asarray(np.array(7.0)), jnp.asarray(want)))
    want_v = npoly.polyval(7.0, want)
    np.testing.assert_allclose(got_v, want_v, atol=1e-10)
