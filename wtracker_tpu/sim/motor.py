"""Platform motor models: how a registered (dx, dy) move is spread over frames.

Capability parity with the reference ``wtracker/sim/motor_controllers.py`` —
``MotorController`` ABC (7-30), ``StepMotorController`` (33-55) and the default
``SineMotorController`` (58-88).

Behavioral invariant (SURVEY.md §7 item 4): the sine motor emits per-step
displacements ``(cos(iπ/n) − cos((i+1)π/n))/2 · d`` rounded to integer pixels,
carrying the rounding residual into the next step.  This affects every logged
platform position, so both the host classes here and the jittable
:func:`motor_step_weights` / :func:`integer_motor_steps` used by the scan
engine reproduce it with identical float64 arithmetic.
"""

from __future__ import annotations

import abc

import numpy as np

from wtracker_tpu.sim.config import TimingConfig


def sine_step_weights(n_steps: int) -> np.ndarray:
    """Half-cosine velocity-profile weights; sum to exactly 1 (telescoping).

    Computed with the same float64 expression as the reference motor
    (motor_controllers.py:73-78) so integer rounding decisions match bit-wise.
    """
    i = np.arange(n_steps, dtype=np.float64)
    return (np.cos(i * np.pi / n_steps) - np.cos((i + 1) * np.pi / n_steps)) / 2


def step_weights(n_steps: int, move_after_ratio: float = 0.5) -> np.ndarray:
    """All-at-once profile: the whole move lands on one step."""
    w = np.zeros(n_steps, dtype=np.float64)
    w[round(n_steps * move_after_ratio)] = 1.0
    return w


def integer_motor_steps(weights, d):
    """Residual-carrying integer rounding of a weighted move (jit-safe).

    Given per-step float64 ``weights`` (length ``n``, static) and a displacement
    ``d`` (scalar or batched array), returns the stacked integer per-step
    displacements, shape ``(n, *d.shape)``.  Mirrors the sequential
    ``round(raw + residual)`` loop of the reference motor exactly; the loop is
    unrolled at trace time (``n`` is small and static).
    """
    import jax.numpy as jnp

    d = jnp.asarray(d, dtype=jnp.float64)
    resid = jnp.zeros_like(d)
    steps = []
    for w in np.asarray(weights, dtype=np.float64):
        raw = w * d + resid
        s = jnp.round(raw)
        resid = raw - s
        steps.append(s.astype(jnp.int32))
    return jnp.stack(steps, axis=0)


class MotorController(abc.ABC):
    """Spreads one registered move across the moving phase, one step per frame."""

    def __init__(self, timing_config: TimingConfig):
        self.timing_config = timing_config
        self.movement_steps = timing_config.moving_frame_num

    @abc.abstractmethod
    def register_move(self, dx: int, dy: int) -> None:
        """Queue a full (dx, dy) move to be emitted over the coming steps."""

    @abc.abstractmethod
    def step(self) -> tuple[int, int]:
        """Pop the next per-frame integer displacement."""


class StepMotorController(MotorController):
    """Move the entire distance at once, after ``move_after_ratio`` of the phase."""

    def __init__(self, timing_config: TimingConfig, move_after_ratio: float = 0.5):
        assert 0 <= move_after_ratio <= 1
        super().__init__(timing_config)
        self.queue: list[tuple[int, int]] = []
        self.move_at_step = round(self.movement_steps * move_after_ratio)

    def register_move(self, dx: int, dy: int) -> None:
        steps = [(0, 0)] * (self.movement_steps - 1)
        steps.insert(self.move_at_step, (dx, dy))
        self.queue.extend(steps)

    def step(self) -> tuple[int, int]:
        return self.queue.pop(0)


class SineMotorController(MotorController):
    """Half-cosine velocity profile with residual-carrying integer rounding.

    The default motor of the simulator (simulator.py:46-47 in the reference).
    """

    def __init__(self, timing_config: TimingConfig):
        super().__init__(timing_config)
        self.queue: list[tuple[float, float]] = []

    def register_move(self, dx: int, dy: int) -> None:
        assert len(self.queue) == 0
        for w in sine_step_weights(self.movement_steps):
            self.queue.append((w * dx, w * dy))

    def step(self) -> tuple[int, int]:
        dx, dy = self.queue.pop(0)
        rdx, rdy = round(dx), round(dy)
        resid_x, resid_y = dx - rdx, dy - rdy
        if self.queue:
            nx, ny = self.queue[0]
            self.queue[0] = (nx + resid_x, ny + resid_y)
        return (rdx, rdy)
