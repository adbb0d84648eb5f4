"""Experiment bootstrap, checkpointing, and scheduler-dispatcher tests
(reference ``gcd/project_utils/general_utils.py`` / ``schedulers.py``,
``learn_metric.py:320-338`` checkpoint protocol)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scd_tpu.train.checkpoint import CheckpointManager, strip_key_prefix
from scd_tpu.train.schedulers import get_scheduler
from scd_tpu.utils.experiment import (AverageMeter, IndicatePlateau,
                                      init_experiment, read_scalars)


def test_init_experiment_creates_run(tmp_path):
    ctx = init_experiment({"lr": 0.1, "dataset": "cub"},
                          exp_root=str(tmp_path), runner_name="metric_learn")
    assert os.path.isdir(ctx.model_dir)
    assert os.path.exists(os.path.join(ctx.log_dir, "config.json"))
    ctx.writer.add_scalars("acc", {"Old": 0.5, "New": 0.25}, step=3)
    ctx.writer.add_scalar("loss", 1.5, step=3)
    ctx.close()
    scalars = read_scalars(ctx.log_dir)
    assert scalars["acc/Old"].tolist() == [[3, 0.5]]
    assert scalars["loss"].tolist() == [[3, 1.5]]
    ctx.logger.handlers.clear()


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == pytest.approx(2.0)
    assert m.count == 3


def test_indicate_plateau_fires_and_resets():
    p = IndicatePlateau(threshold=0.0, patience_epochs=2, mode="min",
                        threshold_mode="abs")
    assert not p.step(1.0)
    assert not p.step(1.0)  # bad 1
    assert not p.step(1.0)  # bad 2
    assert p.step(1.0)      # bad 3 > patience -> fire + reset
    assert not p.step(0.5)  # improvement after reset


def test_checkpoint_save_restore_best_and_prune(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2, best_metric="acc")
    state = {"w": np.arange(4, dtype=np.float32), "b": np.float32(0.0)}
    for step, acc in [(0, 0.3), (1, 0.9), (2, 0.5), (3, 0.4)]:
        s = {"w": state["w"] + step, "b": np.float32(acc)}
        mgr.save(step, s, metrics={"acc": acc})

    # retention: only last `keep` step blobs remain (+ best copy)
    assert mgr.latest_step() == 3
    assert not os.path.exists(os.path.join(tmp_path, "ckpt_0.msgpack"))

    step, restored = mgr.restore(state)
    assert step == 3
    np.testing.assert_array_equal(restored["w"], state["w"] + 3)

    best_step, best = mgr.restore_best(state)
    assert best_step == 1
    assert best["b"] == pytest.approx(0.9)

    # manifest survives a new manager instance (resume)
    mgr2 = CheckpointManager(str(tmp_path), keep=2, best_metric="acc")
    assert mgr2.latest_step() == 3
    assert mgr2.restore_best(state)[0] == 1


def test_strip_key_prefix():
    sd = {"module.fc.w": 1, "fc.b": 2}
    assert strip_key_prefix(sd) == {"fc.w": 1, "fc.b": 2}


def test_scheduler_dispatcher_shapes():
    for name in ("step", "multi_step", "cosine", "cosine_warm_restarts",
                 "cosine_warm_restarts_warmup"):
        sched = get_scheduler(name, base_lr=0.1, total_steps=100)
        v0 = float(sched(0))
        v50 = float(sched(50))
        assert np.isfinite(v0) and np.isfinite(v50)
        assert 0.0 <= v50 <= 0.1 + 1e-6

    cos = get_scheduler("cosine", base_lr=0.1, total_steps=100)
    assert float(cos(0)) == pytest.approx(0.1)
    assert float(cos(100)) == pytest.approx(1e-4, rel=1e-3)

    # warm restarts: lr returns to base at the restart boundary
    wr = get_scheduler("cosine_warm_restarts", base_lr=0.1, total_steps=90,
                       num_restarts=2)
    assert float(wr(30)) == pytest.approx(0.1)
    assert float(wr(15)) < 0.1


def test_plateau_scheduler_scale():
    pl = get_scheduler("plateau", base_lr=0.1, total_steps=10, patience=1)
    s = [pl.step(1.0) for _ in range(4)]
    assert s[0] == 1.0 and s[-1] < 1.0

    wrp = get_scheduler("warm_restarts_plateau", base_lr=0.1, total_steps=10,
                        patience=0, t_restart=6, threshold=0.0)
    scales = [wrp.step(1.0) for _ in range(6)]
    assert scales[2] < 1.0      # reduced after plateau
    assert scales[5] == 1.0     # restart resets to base


def test_gcd_trainer_fit_with_ckpt(tmp_path):
    from scd_tpu.core.config import TrainConfig
    from scd_tpu.models.vit import ViTConfig
    from scd_tpu.train.gcd import GCDTrainer

    vit_cfg = ViTConfig(image_size=32, patch_size=16, width=32, depth=1,
                        heads=2)
    cfg = TrainConfig(lr=0.01, proj_dim=16, grad_from_block=0, n_views=2)
    trainer = GCDTrainer(vit_cfg, cfg, seed=0, total_steps=4)

    rng = np.random.default_rng(0)

    def batches(_epoch):
        for _ in range(2):
            yield {"images": rng.normal(size=(8, 32, 32, 3)).astype("f"),
                   "labels": np.arange(4) % 2,
                   "mask_lab": np.array([1, 1, 0, 0], bool)}

    accs = iter([0.2, 0.8])

    def eval_fn(tr, epoch):
        feats = tr.extract_features(
            [rng.normal(size=(4, 32, 32, 3)).astype("f")])
        assert feats.shape[0] == 4
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0,
                                   atol=1e-4)
        return {"old_acc_test": next(accs)}

    mgr = CheckpointManager(str(tmp_path), keep=2, best_metric="old_acc_test")
    last = trainer.fit(2, batches, eval_fn=eval_fn, ckpt=mgr, log_fn=None)
    assert "loss" in last and last["old_acc_test"] == pytest.approx(0.8)
    assert mgr.restore_best(trainer.state)[0] == 1

    # resume round-trips the full state incl. optimizer
    step, state = mgr.restore(trainer.state)
    trainer.load_state(state)
    assert step == 1
