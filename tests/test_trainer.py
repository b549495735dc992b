"""Trainer driver: loop, eval cadence, checkpoint save/resume roundtrip."""
import numpy as np
import jax

from pvn3d_tpu.data.synthetic import synthetic_batch
from pvn3d_tpu.train.checkpoint import CheckpointManager
from pvn3d_tpu.train.state import create_train_state
from pvn3d_tpu.train.step import make_eval_step, make_train_step
from pvn3d_tpu.train.trainer import Trainer, eval_frequency, is_to_eval

import __graft_entry__ as graft


def test_eval_cadence_matches_reference():
    # reference: is_to_eval (train_ycb_pvn3d.py:319-333).
    assert eval_frequency(0) == 5000
    assert eval_frequency(29999) == 5000
    assert eval_frequency(30000) == 2000
    assert eval_frequency(45000) == 1200
    assert eval_frequency(59999) == 800
    assert eval_frequency(70000) == 400
    assert eval_frequency(123456) == 200
    assert is_to_eval(5000) and not is_to_eval(5001)


def _tiny_setup(tmp_path):
    cfg = graft._tiny_config()
    batch = synthetic_batch(cfg, batch_size=2,
                            n_points=cfg.model.n_sample_points,
                            height=64, width=64)
    state, model, tx = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    trainer = Trainer(
        cfg, state, make_train_step(cfg, model, tx),
        make_eval_step(cfg, model),
        checkpoint_manager=CheckpointManager(str(tmp_path / "ckpt")),
        log_every=1000)
    return cfg, batch, trainer, model, tx


def test_trainer_fit_and_checkpoint_resume(tmp_path):
    cfg, batch, trainer, model, tx = _tiny_setup(tmp_path)
    trainer.fit([batch] * 3, max_steps=3)
    assert int(trainer.state.step) == 3
    trainer.ckpt.wait()

    # A fresh trainer with the same template must resume at step 3.
    state2, _, _ = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    trainer2 = Trainer(
        cfg, state2, make_train_step(cfg, model, tx),
        make_eval_step(cfg, model),
        checkpoint_manager=CheckpointManager(str(tmp_path / "ckpt")))
    assert trainer2.resume() == 3
    a = jax.tree_util.tree_leaves(trainer.state.params)[0]
    b = jax.tree_util.tree_leaves(trainer2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_trainer_eval_epoch(tmp_path):
    cfg, batch, trainer, _, _ = _tiny_setup(tmp_path)
    out = trainer.eval_epoch([batch, batch])
    assert out["n_batches"] == 2
    assert np.isfinite(out["loss"])


def test_prefetch_to_device_order_and_completeness():
    from pvn3d_tpu.data.loader import prefetch_to_device
    seen = list(prefetch_to_device(iter(range(7)), lambda x: x * 10, size=3))
    assert seen == [0, 10, 20, 30, 40, 50, 60]
