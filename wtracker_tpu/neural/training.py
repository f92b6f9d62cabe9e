"""Predictor training: optax-based fit loop with scan-compiled epochs.

Capability parity with the reference ``wtracker/neural/training.py`` —
``Trainer`` (17-260) and ``MLPTrainer`` (267-333): multi-epoch fit with
best-validation checkpointing, early stopping, per-batch loss tracking,
tensorboard scalars, and the "correct = prediction within 1 px of the target"
accuracy proxy (training.py:317, here ``‖pred − y‖₂ < 1``).

TPU-native design: instead of the reference's per-batch python loop with
``.to(device)`` hops (training.py:212-260, 304-319), the whole dataset lives on
device and an entire epoch — shuffle, batch slicing, forward/backward,
optimizer update, metrics — is a single jitted ``lax.scan`` over batches.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wtracker_tpu.neural.config import LOSSES, OPTIMIZERS, TrainConfig

if TYPE_CHECKING:  # avoid a circular import with models.resmlp
    from wtracker_tpu.models.resmlp import WormPredictor
from wtracker_tpu.neural.dataset import NumpyDataset
from wtracker_tpu.neural.train_results import EpochResult, FitResult


class Trainer:
    """Base trainer: epoch orchestration, checkpointing, early stopping, logs.

    Subclasses provide ``train_epoch``/``test_epoch`` returning
    :class:`EpochResult`.  Mirrors the reference Trainer's control flow
    (training.py:61-143) on top of compiled epoch kernels.
    """

    def __init__(self, log: bool = False):
        self.logger = None
        if log:
            from torch.utils.tensorboard import SummaryWriter  # host-side only

            self.logger = SummaryWriter()

    def fit(
        self,
        dl_train,
        dl_test,
        num_epochs: int,
        checkpoints: str | None = None,
        early_stopping: int | None = None,
        print_every: int = 1,
        **kw,
    ) -> FitResult:
        actual_epoch_num = 0
        epochs_without_improvement = 0
        train_loss, train_acc, test_loss, test_acc = [], [], [], []
        best_val_loss = None

        for epoch in range(num_epochs):
            actual_epoch_num += 1
            verbose = print_every > 0 and (epoch % print_every == 0 or epoch == num_epochs - 1)
            if verbose:
                print(f"--- EPOCH {epoch + 1}/{num_epochs} ---")

            train_result = self.train_epoch(dl_train, verbose=verbose, **kw)
            test_result = self.test_epoch(dl_test, verbose=verbose, **kw)

            train_loss.extend(train_result.losses)
            train_acc.append(train_result.accuracy)
            test_loss.extend(test_result.losses)
            test_acc.append(test_result.accuracy)

            if self.logger is not None:
                self.logger.add_scalar("loss/train", float(np.mean(train_result.losses)), epoch)
                self.logger.add_scalar("loss/test", float(np.mean(test_result.losses)), epoch)
                self.logger.add_scalar("accuracy/train", train_result.accuracy, epoch)
                self.logger.add_scalar("accuracy/test", test_result.accuracy, epoch)

            curr_val_loss = float(np.mean(test_result.losses))
            if best_val_loss is None or curr_val_loss < best_val_loss:
                best_val_loss = curr_val_loss
                epochs_without_improvement = 0
                if checkpoints is not None:
                    self.save_checkpoint(checkpoints, curr_val_loss)
            else:
                epochs_without_improvement += 1
                if early_stopping is not None and epochs_without_improvement >= early_stopping:
                    break

        return FitResult(actual_epoch_num, train_loss, train_acc, test_loss, test_acc)

    def save_checkpoint(self, checkpoint_filename: str, loss: Optional[float] = None) -> None:
        raise NotImplementedError()

    def train_epoch(self, dl_train, **kw) -> EpochResult:
        raise NotImplementedError()

    def test_epoch(self, dl_test, **kw) -> EpochResult:
        raise NotImplementedError()

    def log_hparam(self, hparam_dict: dict, metric_dict: dict = {}, run_name: str = "hparams"):
        if self.logger is not None:
            self.logger.add_hparams(hparam_dict, metric_dict, run_name=run_name)


class MLPTrainer(Trainer):
    """Trains a :class:`WormPredictor` with compiled whole-epoch steps.

    Args:
        predictor: the model + IO contract to train (variables are updated in
            place on ``fit``; the best-validation variables win when
            checkpointing is enabled).
        loss_fn: key into ``LOSSES`` ("mse", "l1").
        optimizer: key into ``OPTIMIZERS`` ("adam", "sgd", "rmsprop", "adamw").
        learning_rate / weight_decay: optimizer hyperparameters.
    """

    def __init__(
        self,
        predictor: "WormPredictor",
        loss_fn: str = "mse",
        optimizer: str = "adam",
        learning_rate: float = 1e-3,
        weight_decay: float = 1e-5,
        log: bool = False,
        seed: int = 42,
    ):
        super().__init__(log=log)
        self.predictor = predictor
        self.loss_name = loss_fn
        self.rng = np.random.default_rng(seed)

        if optimizer == "adamw":
            tx = optax.adamw(learning_rate, weight_decay=weight_decay)
        else:
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay),
                OPTIMIZERS[optimizer](learning_rate),
            )
        self.tx = tx

        variables = predictor.variables
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.opt_state = tx.init(self.params)

        model = predictor.model
        loss = LOSSES[loss_fn]
        has_bn = bool(self.batch_stats)

        def apply_train(params, batch_stats, X):
            vs = {"params": params}
            if has_bn:
                vs["batch_stats"] = batch_stats
                preds, updates = model.apply(vs, X, train=True, mutable=["batch_stats"])
                return preds, updates["batch_stats"]
            return model.apply(vs, X, train=True), batch_stats

        def loss_fn_(params, batch_stats, X, y):
            preds, new_stats = apply_train(params, batch_stats, X)
            return loss(preds, y), (preds, new_stats)

        @jax.jit
        def train_epoch_fn(params, batch_stats, opt_state, Xb, yb):
            """Xb, yb: (n_batches, batch, dim) — one scan step per batch."""

            def step(carry, batch):
                params, batch_stats, opt_state = carry
                X, y = batch
                (l, (preds, batch_stats)), grads = jax.value_and_grad(loss_fn_, has_aux=True)(
                    params, batch_stats, X, y
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                n_correct = jnp.sum(jnp.linalg.norm(preds - y, axis=1) < 1.0)
                return (params, batch_stats, opt_state), (l, n_correct)

            (params, batch_stats, opt_state), (losses, n_correct) = jax.lax.scan(
                step, (params, batch_stats, opt_state), (Xb, yb)
            )
            return params, batch_stats, opt_state, losses, n_correct

        @jax.jit
        def test_epoch_fn(params, batch_stats, Xb, yb):
            def step(_, batch):
                X, y = batch
                vs = {"params": params}
                if has_bn:
                    vs["batch_stats"] = batch_stats
                preds = model.apply(vs, X, train=False)
                return None, (loss(preds, y), jnp.sum(jnp.linalg.norm(preds - y, axis=1) < 1.0))

            _, (losses, n_correct) = jax.lax.scan(step, None, (Xb, yb))
            return losses, n_correct

        self._train_epoch_fn = train_epoch_fn
        self._test_epoch_fn = test_epoch_fn

    # -- data plumbing -----------------------------------------------------

    def _batchify(self, ds, batch_size: int, shuffle: bool):
        X, y = (ds.X, ds.y) if hasattr(ds, "X") else ds
        n = len(X)
        idx = self.rng.permutation(n) if shuffle else np.arange(n)
        n_batches = max(n // batch_size, 1)
        take = n_batches * min(batch_size, n)
        idx = idx[:take]
        bs = min(batch_size, n)
        Xb = X[idx].reshape(n_batches, bs, -1)
        yb = y[idx].reshape(n_batches, bs, -1)
        return jnp.asarray(Xb), jnp.asarray(yb)

    def train_epoch(self, dl_train, batch_size: int = 256, verbose: bool = False, **kw) -> EpochResult:
        Xb, yb = self._batchify(dl_train, batch_size, shuffle=True)
        self.params, self.batch_stats, self.opt_state, losses, n_correct = self._train_epoch_fn(
            self.params, self.batch_stats, self.opt_state, Xb, yb
        )
        losses = np.asarray(losses, dtype=float).tolist()
        acc = float(np.sum(np.asarray(n_correct)) / (Xb.shape[0] * Xb.shape[1]) * 100)
        if verbose:
            print(f"  train: loss {np.mean(losses):.5f}, accuracy {acc:.1f}%")
        return EpochResult(losses=losses, accuracy=acc)

    def test_epoch(self, dl_test, batch_size: int = 256, verbose: bool = False, **kw) -> EpochResult:
        Xb, yb = self._batchify(dl_test, batch_size, shuffle=False)
        losses, n_correct = self._test_epoch_fn(self.params, self.batch_stats, Xb, yb)
        losses = np.asarray(losses, dtype=float).tolist()
        acc = float(np.sum(np.asarray(n_correct)) / (Xb.shape[0] * Xb.shape[1]) * 100)
        if verbose:
            print(f"  test : loss {np.mean(losses):.5f}, accuracy {acc:.1f}%")
        return EpochResult(losses=losses, accuracy=acc)

    # -- persistence -------------------------------------------------------

    @property
    def variables(self) -> dict:
        vs = {"params": self.params}
        if self.batch_stats:
            vs["batch_stats"] = self.batch_stats
        return vs

    def sync_predictor(self) -> "WormPredictor":
        """Refresh the bound predictor with the current trained variables."""
        self.predictor.variables = jax.tree.map(jnp.asarray, self.variables)
        return self.predictor

    def save_checkpoint(self, checkpoint_filename: str, loss: Optional[float] = None) -> None:
        from wtracker_tpu.models.resmlp import save_predictor

        if self.logger is not None:
            checkpoint_filename = f"{self.logger.log_dir}/{checkpoint_filename}"
        save_predictor(self.sync_predictor(), checkpoint_filename)
        print(f"\n*** Saved checkpoint {checkpoint_filename} :: val_loss={loss:.3f}")


def fit_from_config(config: TrainConfig) -> tuple[MLPTrainer, FitResult]:
    """One-call training from a :class:`TrainConfig` (dataset build + fit)."""
    from wtracker_tpu.models.resmlp import load_predictor, make_rmlp_predictor
    from wtracker_tpu.neural.config import IOConfig

    ds = NumpyDataset.create_from_config(config.dataset)
    ds_train, ds_test = ds.split(config.train_test_split, seed=config.seed)

    if isinstance(config.model, str):
        predictor = load_predictor(config.model)
    elif hasattr(config.model, "io_config"):
        predictor = config.model
    else:
        predictor = make_rmlp_predictor(IOConfig.from_datasetConfig(config.dataset), seed=config.seed)

    trainer = MLPTrainer(
        predictor,
        loss_fn=config.loss_fn,
        optimizer=config.optimizer,
        learning_rate=config.learning_rate,
        weight_decay=config.weight_decay,
        log=config.log,
        seed=config.seed,
    )
    result = trainer.fit(
        ds_train,
        ds_test,
        num_epochs=config.num_epochs,
        checkpoints=config.checkpoints,
        early_stopping=config.early_stopping,
        print_every=config.print_every,
        batch_size=config.batch_size,
    )
    trainer.sync_predictor()
    return trainer, result


# ---------------------------------------------------------------------------
# orbax train-state checkpointing (full resume: params + optimizer + stats)
# ---------------------------------------------------------------------------


def save_train_state(trainer: "MLPTrainer", directory: str, step: int = 0) -> None:
    """Persist the complete training state (params, batch stats, optimizer)
    with orbax — resumable mid-run, unlike the best-model .npz checkpoints.
    The reference can only checkpoint whole models (training.py:119-128)."""
    import orbax.checkpoint as ocp

    path = _abs(directory)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            f"{path}/state_{step}",
            {
                "params": trainer.params,
                "batch_stats": trainer.batch_stats,
                "opt_state": trainer.opt_state,
            },
            force=True,
        )


def load_train_state(trainer: "MLPTrainer", directory: str, step: int = 0) -> "MLPTrainer":
    """Restore a training state saved by :func:`save_train_state` in place."""
    import orbax.checkpoint as ocp

    path = _abs(directory)
    target = {
        "params": trainer.params,
        "batch_stats": trainer.batch_stats,
        "opt_state": trainer.opt_state,
    }
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(f"{path}/state_{step}", target)
    trainer.params = state["params"]
    trainer.batch_stats = state["batch_stats"]
    trainer.opt_state = state["opt_state"]
    return trainer


def _abs(directory: str) -> str:
    import os

    return os.path.abspath(directory)
