"""Neural layer tests: dataset construction (vs reference oracle), training
convergence, checkpoint round trip, torch ResMLP port, PSO."""

import numpy as np
import pandas as pd
import pytest

from tests.synthetic import make_worm_csv
from wtracker_tpu.neural.config import DatasetConfig, IOConfig
from wtracker_tpu.neural.dataset import NumpyDataset


@pytest.fixture(scope="module")
def log_csv(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("neural")
    path = str(tmp / "log.csv")
    make_worm_csv(path, num_frames=600)
    return path


def test_dataset_matches_reference(log_csv):
    """Vectorized dataset builder equals the reference's per-row loop."""
    from tests.reference_harness import import_reference

    import_reference()
    from wtracker.neural.config import DatasetConfig as RefDC
    from wtracker.neural.dataset import NumpyDataset as RefDS

    cfg_kwargs = dict(input_frames=[0, -3, -6], pred_frames=[3, 6], log_path=log_csv)
    ref = RefDS.create_from_config(RefDC(**cfg_kwargs))
    ours = NumpyDataset.create_from_config(DatasetConfig(**cfg_kwargs))

    np.testing.assert_allclose(ours.X, ref.X.numpy(), atol=1e-5)
    np.testing.assert_allclose(ours.y, ref.y.numpy(), atol=1e-5)


def test_dataset_save_load_split(log_csv, tmp_path):
    ds = NumpyDataset.create_from_config(
        DatasetConfig(input_frames=[0, -2], pred_frames=[2], log_path=log_csv)
    )
    assert len(ds) > 100
    path = str(tmp_path / "ds.npz")
    ds.save(path)
    ds2 = NumpyDataset.load(path)
    np.testing.assert_array_equal(ds.X, ds2.X)

    tr, te = ds.split(0.8, seed=0)
    assert len(tr) + len(te) == len(ds)
    assert len(tr) == int(len(ds) * 0.8)


def test_mlp_training_converges(log_csv):
    """A small ResMLP fit on synthetic data must reduce val loss markedly."""
    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.training import MLPTrainer

    io = IOConfig(input_frames=[0, -2, -4], pred_frames=[2])
    ds = NumpyDataset.create_from_config(
        DatasetConfig(io.input_frames, io.pred_frames, log_csv)
    )
    tr, te = ds.split(0.8, seed=0)

    predictor = make_rmlp_predictor(io, block_in_dim=32, block_dims=(16, 32), n_blocks=2, seed=0)
    trainer = MLPTrainer(predictor, learning_rate=3e-3, seed=0)

    first = trainer.test_epoch(te, batch_size=64)
    result = trainer.fit(tr, te, num_epochs=40, print_every=0, batch_size=64)
    last = trainer.test_epoch(te, batch_size=64)

    assert np.mean(last.losses) < 0.5 * np.mean(first.losses)
    assert result.num_epochs == 40


def test_early_stopping_and_checkpoint(log_csv, tmp_path):
    from wtracker_tpu.models.resmlp import load_predictor, make_rmlp_predictor
    from wtracker_tpu.neural.training import MLPTrainer

    io = IOConfig(input_frames=[0, -2], pred_frames=[2])
    ds = NumpyDataset.create_from_config(DatasetConfig(io.input_frames, io.pred_frames, log_csv))
    tr, te = ds.split(0.8, seed=0)

    predictor = make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, seed=0)
    trainer = MLPTrainer(predictor, learning_rate=1e-3, seed=0)
    ckpt = str(tmp_path / "best.npz")
    result = trainer.fit(
        tr, te, num_epochs=200, early_stopping=3, checkpoints=ckpt, print_every=0, batch_size=64
    )
    assert result.num_epochs <= 200

    restored = load_predictor(ckpt)
    out = np.asarray(restored(ds.X[:4]))
    assert out.shape == (4, io.out_dim)
    assert np.isfinite(out).all()


def test_torch_resmlp_port_matches_reference_checkpoint():
    """Port the shipped reference ResMLP .pt and compare outputs vs torch."""
    import torch

    from tests.reference_harness import REFERENCE_ROOT, import_reference
    from wtracker_tpu.models.resmlp import load_torch_checkpoint

    import_reference()
    path = f"{REFERENCE_ROOT}/models/ResMLP(imaging-100ms_pred-40ms_moving-50ms).pt"
    predictor = load_torch_checkpoint(path, reference_root=REFERENCE_ROOT)

    tmodel = torch.load(path, map_location="cpu", weights_only=False).eval()

    rng = np.random.default_rng(0)
    x = rng.normal(0, 20, size=(16, predictor.io_config.in_dim)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    got = np.asarray(predictor(x))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_particle_swarm_minimizes_quadratic():
    import jax.numpy as jnp

    from wtracker_tpu.neural.optimize import particle_swarm

    target = np.array([1.5, -0.7, 0.3], dtype=np.float32)

    def obj(w):
        return jnp.sum((w - target) ** 2)

    res = particle_swarm(obj, (np.full(3, -5.0), np.full(3, 5.0)), pop_size=30, epochs=60, seed=0)
    assert res.best_value < 1e-3
    np.testing.assert_allclose(res.best_position, target, atol=0.05)
    assert res.history.shape == (60,)
    assert res.history[-1] <= res.history[0]


def test_optimize_polyfit_weights(log_csv):
    from wtracker_tpu.neural.optimize import optimize_polyfit_weights
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.controllers import WeightEvaluator

    from tests.synthetic import EXP_KWARGS, TIMING_KWARGS

    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)

    ev = WeightEvaluator(
        [log_csv], timing, input_time_offsets=np.array([-8, -4, 0, 3]), pred_time_offset=12
    )
    uniform_mae = ev.eval(np.ones(4), deg=1)
    res = optimize_polyfit_weights(ev, degree=1, pop_size=20, epochs=30, seed=0)
    assert res.best_value <= uniform_mae + 1e-6


def test_orbax_train_state_roundtrip(log_csv, tmp_path):
    """Full training state (incl. optimizer moments) resumes exactly."""
    import numpy as np

    from wtracker_tpu.models.resmlp import make_rmlp_predictor
    from wtracker_tpu.neural.training import MLPTrainer, load_train_state, save_train_state

    io = IOConfig(input_frames=[0, -2], pred_frames=[2])
    ds = NumpyDataset.create_from_config(DatasetConfig(io.input_frames, io.pred_frames, log_csv))
    tr, te = ds.split(0.8, seed=0)

    predictor = make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, seed=0)
    trainer = MLPTrainer(predictor, learning_rate=1e-3, seed=0)
    trainer.fit(tr, te, num_epochs=3, print_every=0, batch_size=64)
    save_train_state(trainer, str(tmp_path / "ckpt"), step=3)

    # continue 2 more epochs from the live trainer (pinned shuffle RNG so the
    # two continuations see identical batches)
    trainer.rng = np.random.default_rng(123)
    trainer.fit(tr, te, num_epochs=2, print_every=0, batch_size=64)
    want = trainer.test_epoch(te, batch_size=64)

    # fresh trainer restored from the checkpoint, same continuation
    predictor2 = make_rmlp_predictor(io, block_in_dim=8, block_dims=(8,), n_blocks=1, seed=0)
    trainer2 = MLPTrainer(predictor2, learning_rate=1e-3, seed=0)
    load_train_state(trainer2, str(tmp_path / "ckpt"), step=3)
    trainer2.rng = np.random.default_rng(123)
    trainer2.fit(tr, te, num_epochs=2, print_every=0, batch_size=64)
    got = trainer2.test_epoch(te, batch_size=64)

    np.testing.assert_allclose(got.losses, want.losses, rtol=1e-6)
