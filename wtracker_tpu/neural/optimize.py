"""Device-native particle-swarm optimization.

Replaces the reference's ``mealpy.OriginalPSO`` dependency (polyfit weight
tuning, polyfit_optimizer.ipynb cells 10-13: population 100, ≤300 epochs,
"up to 15 minutes").  Here the entire swarm — positions, velocities, bests,
and the vectorized objective — lives on device: one jitted ``lax.scan`` step
per epoch, the objective ``vmap``-ed across the population.  Tuning the
polyfit weights takes seconds instead of minutes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class PSOResult:
    best_position: np.ndarray
    best_value: float
    history: np.ndarray
    """Best objective value after each epoch, shape (epochs,)."""


def particle_swarm(
    objective: Callable[[jnp.ndarray], jnp.ndarray],
    bounds: tuple[np.ndarray, np.ndarray],
    pop_size: int = 100,
    epochs: int = 300,
    inertia: float = 0.4,
    cognitive: float = 2.05,
    social: float = 2.05,
    seed: int = 0,
) -> PSOResult:
    """Minimize ``objective`` over a box-bounded search space.

    Args:
        objective: maps a single candidate vector (D,) to a scalar; must be
            jit-compatible (it is ``vmap``-ed over the population).
        bounds: (lower, upper) arrays of shape (D,).
        pop_size / epochs: swarm size and iteration count.
        inertia / cognitive / social: standard PSO update coefficients.
    """
    lo = jnp.asarray(bounds[0], dtype=jnp.float32)
    hi = jnp.asarray(bounds[1], dtype=jnp.float32)
    dim = lo.shape[0]
    v_max = (hi - lo) * 0.5

    batch_obj = jax.vmap(objective)

    @jax.jit
    def run(key):
        k1, k2 = jax.random.split(key)
        pos = jax.random.uniform(k1, (pop_size, dim), minval=lo, maxval=hi)
        vel = jax.random.uniform(k2, (pop_size, dim), minval=-v_max, maxval=v_max)

        fit = batch_obj(pos)
        pbest, pbest_val = pos, fit
        g_idx = jnp.argmin(fit)
        gbest, gbest_val = pos[g_idx], fit[g_idx]

        def epoch(state, key):
            pos, vel, pbest, pbest_val, gbest, gbest_val = state
            kc, ks = jax.random.split(key)
            r1 = jax.random.uniform(kc, (pop_size, dim))
            r2 = jax.random.uniform(ks, (pop_size, dim))

            vel = (
                inertia * vel
                + cognitive * r1 * (pbest - pos)
                + social * r2 * (gbest[None, :] - pos)
            )
            vel = jnp.clip(vel, -v_max, v_max)
            pos = jnp.clip(pos + vel, lo, hi)

            fit = batch_obj(pos)
            improved = fit < pbest_val
            pbest = jnp.where(improved[:, None], pos, pbest)
            pbest_val = jnp.where(improved, fit, pbest_val)

            g_idx = jnp.argmin(pbest_val)
            g_val = pbest_val[g_idx]
            better = g_val < gbest_val
            gbest = jnp.where(better, pbest[g_idx], gbest)
            gbest_val = jnp.where(better, g_val, gbest_val)

            return (pos, vel, pbest, pbest_val, gbest, gbest_val), gbest_val

        keys = jax.random.split(jax.random.PRNGKey(seed + 1), epochs)
        state = (pos, vel, pbest, pbest_val, gbest, gbest_val)
        state, history = jax.lax.scan(epoch, state, keys)
        return state[4], state[5], history

    gbest, gbest_val, history = run(jax.random.PRNGKey(seed))
    return PSOResult(
        best_position=np.asarray(gbest),
        best_value=float(gbest_val),
        history=np.asarray(history),
    )


def optimize_polyfit_weights(
    evaluator,
    degree: int = 2,
    pop_size: int = 100,
    epochs: int = 300,
    weight_bounds: tuple[float, float] = (1e-6, 5.0),
    seed: int = 0,
) -> PSOResult:
    """Tune :class:`WeightEvaluator` sample weights with the device PSO.

    The evaluator's dataset arrays are closed over as device constants; each
    candidate weight vector is scored by the same fused fit+eval kernel the
    evaluator uses, vmapped over the swarm.
    """
    from wtracker_tpu.ops.polyfit import polyfit, polyvander

    x_input = jnp.asarray(evaluator.x_input, dtype=jnp.float64)
    y_input = jnp.asarray(evaluator.y_input, dtype=jnp.float64)
    x_target = jnp.asarray(evaluator.x_target, dtype=jnp.float64)
    y_target = jnp.asarray(evaluator.y_target, dtype=jnp.float64)
    van_target = polyvander(x_target, degree)

    def objective(w):
        coeffs = polyfit(x_input, y_input, deg=degree, w=w.astype(jnp.float64))
        y_pred = jnp.sum(van_target * coeffs.T, axis=-1)
        return jnp.mean(jnp.abs(y_target - y_pred)).astype(jnp.float32)

    n = evaluator.x_input.shape[0]
    bounds = (np.full(n, weight_bounds[0]), np.full(n, weight_bounds[1]))
    return particle_swarm(objective, bounds, pop_size=pop_size, epochs=epochs, seed=seed)
