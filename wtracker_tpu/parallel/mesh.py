"""Device-mesh scale-out for the closed-loop engine and training.

The reference is strictly single-process with no distributed backend
(SURVEY.md §2b); the TPU framework's parallelism axes are therefore chosen by
the workload, not ported:

* **streams** — independent worm streams / experiments shard across chips for
  the closed-loop engine (embarrassingly parallel; detector weights
  replicate, per-stream state shards, zero collectives on the hot path);
* **data** — batch-dimension sharding for trainers (gradients reduce with
  ``psum`` inserted automatically by XLA from the sharding annotations).

Multi-chip runs use a standard ``jax.sharding.Mesh``; CPU-mesh simulation
(``xla_force_host_platform_device_count``) exercises the same code path
without hardware.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wtracker_tpu.sim.engine import (
    CycleController,
    CycleLog,
    EngineParams,
    _clamp,
    _controller_key,
    _has_stream_bounds,
    make_batched_cycle_step,
    make_cycle_step,
    make_delayed_cycle_step,
)


def pad_streams(arrays, init_positions: np.ndarray, n_devices: int):
    """Pad a stream batch to a multiple of ``n_devices`` by repeating the
    last stream; returns (padded_arrays, padded_init, real_count).

    ``arrays`` is a pytree of (S, ...) leaves (e.g. stacked worm tables or
    trajectories). Logs for slots >= real_count are duplicates to drop.
    This is the padding `run_engine_sharded`'s divisibility error points at —
    explicit so the caller knows which log rows are real.
    """
    s = int(np.asarray(init_positions).shape[0])
    pad = (-s) % n_devices
    if pad == 0:
        return arrays, init_positions, s

    def _pad(leaf):
        leaf = np.asarray(leaf)
        filler = np.repeat(leaf[-1:], pad, axis=0)
        return np.concatenate([leaf, filler], axis=0)

    import jax

    return jax.tree.map(_pad, arrays), _pad(init_positions), s


def make_mesh(n_devices: int | None = None, axis: str = "streams") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def stream_sharding(mesh: Mesh, axis: str = "streams") -> NamedSharding:
    """Sharding that splits the leading (stream/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def run_engine_sharded(
    params: EngineParams,
    controller: CycleController,
    init_positions: np.ndarray,
    n_cycles: int,
    mesh: Mesh,
    axis: str = "streams",
    batched_controller: bool = False,
    delayed_log: bool = False,
    start_cycle: int = 0,
    carry: tuple | None = None,
    return_carry: bool = False,
):
    """Run the stream-batched engine with streams sharded across the mesh.

    Per-stream state (leading axis S) shards over ``axis``; everything closed
    over by the controller (model weights, scene constants) is replicated by
    XLA.  The scan compiles to one SPMD program with no cross-chip
    communication in the cycle loop.

    ``start_cycle``/``carry``/``return_carry`` mirror
    :func:`wtracker_tpu.sim.engine.run_engine` — chunked hosts (the sharded
    real-video path) resume the scan across chunk boundaries from the
    returned carry.

    Contract: S must be a multiple of the mesh size — sharding is a physical
    layout, and an uneven split would silently pad device buffers while the
    controller's math assumes a dense stream axis. Callers with uneven S
    should pad their stream batch (e.g. repeat a trajectory) and drop the
    extra logs, which keeps the padding explicit and the logs unambiguous.
    A ValueError with this guidance is raised otherwise (tests/test_parallel.py).
    """
    if delayed_log and not batched_controller:
        raise ValueError(
            "delayed_log=True requires a batched controller: the delayed cycle "
            "step hands the controller stacked (S, ...) inputs, which a "
            "vmap-style per-stream controller cannot handle"
        )
    n_streams = int(np.asarray(init_positions).shape[0])
    n_dev = mesh.devices.size
    if n_streams % n_dev != 0:
        raise ValueError(
            f"stream count {n_streams} is not a multiple of the mesh size {n_dev}; "
            "pad the stream batch (repeat a stream) and drop the extra logs"
        )
    shard = stream_sharding(mesh, axis)
    run = _sharded_runner(params, controller, mesh, axis, batched_controller, delayed_log)

    def _put_const(leaf):
        # per-stream consts (leading axis S — playback tables, arena bounds,
        # camera sizes) shard with the streams; shared data replicates
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == n_streams:
            return jax.device_put(leaf, shard)
        return jax.device_put(leaf, replicated(mesh))

    with mesh:
        consts = jax.tree.map(_put_const, controller.consts)
        if carry is None:
            init = np.asarray(init_positions, dtype=np.int32)
            if _has_stream_bounds(controller):
                pos0 = np.clip(init, 0, np.asarray(controller.consts["stream_bounds"]) - 1)
            else:
                pos0 = np.asarray(_clamp(jnp.asarray(init), params))
            prev0 = np.broadcast_to(pos0[:, None, :], (n_streams, params.cycle_n, 2))
            carry = (
                jnp.asarray(pos0, jnp.int32),
                jnp.asarray(prev0, jnp.int32),
                controller.init(),
            )
        # per-stream carry leaves shard; scalar bookkeeping (if any) replicates
        carry = jax.tree.map(_put_const, carry)
        cycles = jnp.arange(
            start_cycle, start_cycle + n_cycles + (1 if delayed_log else 0), dtype=jnp.int32
        )
        final_carry, logs = run(consts, carry, cycles)
        if delayed_log:
            logs = jax.tree.map(lambda x: x[1:], logs)
        return (logs, final_carry) if return_carry else logs


_SHARDED_CACHE: dict = {}


def _sharded_runner(params, controller, mesh: Mesh, axis: str, batched_controller: bool, delayed_log: bool):
    key = (params, _controller_key(controller), mesh, axis, batched_controller, delayed_log)
    if key not in _SHARDED_CACHE:
        shard = stream_sharding(mesh, axis)
        if delayed_log:
            batched = make_delayed_cycle_step(params, controller)
        elif batched_controller:
            # the controller owns the stream axis itself (flat device batches);
            # XLA partitions its ops from the carry sharding constraints
            batched = make_batched_cycle_step(params, controller)
        else:
            batched = jax.vmap(make_cycle_step(params, controller), in_axes=(None, (0, 0, 0), None))

        @jax.jit
        def run(consts, carry0, cycles):
            S = carry0[0].shape[0]

            def cons(x):
                # stream-axis leaves pin to the stream sharding; anything else
                # (scalar bookkeeping) is left for the partitioner
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == S:
                    return jax.lax.with_sharding_constraint(x, shard)
                return x

            carry0 = jax.tree.map(cons, carry0)

            def shard_step(carry, c):
                cs, inner = carry
                inner, out = batched(cs, inner, c)
                inner = jax.tree.map(cons, inner)
                return (cs, inner), out

            (_, final), logs = jax.lax.scan(shard_step, (consts, carry0), cycles)
            return final, logs

        _SHARDED_CACHE[key] = run
    return _SHARDED_CACHE[key]


# ---------------------------------------------------------------------------
# data-parallel training step
# ---------------------------------------------------------------------------


def make_dp_train_step(model, tx, loss_fn, mesh: Mesh, axis: str = "data"):
    """A data-parallel train step: batch shards over ``axis``, params replicate.

    XLA inserts the gradient ``psum`` from the sharding annotations — no
    hand-written collectives.  Returns ``step(params, opt_state, X, y)``.
    """
    batch_shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(repl, repl, batch_shard, batch_shard),
        out_shardings=(repl, repl, repl),
    )
    def step(params, opt_state, X, y):
        def loss(p):
            preds = model.apply({"params": p}, X, train=True)
            return loss_fn(preds, y)

        l, grads = jax.value_and_grad(loss)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    return step
