"""Engine tests: fit loop, scheduler wiring, checkpoint roundtrip, test eval.

Uses a tiny synthetic CSV dataset + resnet18 at 64px so the whole suite stays
CPU-fast; mirrors the reference demo's minimum end-to-end slice (SURVEY.md §7.6).
"""

import os

import numpy as np
import pytest

from pytorch_retinanet_tpu import OmegaConf, RetinaNetModel, Trainer


@pytest.fixture(scope="module")
def csv_dataset(tmp_path_factory):
    import cv2
    import pandas as pd

    root = tmp_path_factory.mktemp("csvds")
    rows = []
    rng = np.random.default_rng(0)
    for i in range(8):
        img = np.full((100, 80, 3), 255, np.uint8)
        x1, y1 = int(rng.integers(5, 30)), int(rng.integers(5, 40))
        x2, y2 = x1 + int(rng.integers(20, 40)), y1 + int(rng.integers(20, 40))
        x2, y2 = min(x2, 79), min(y2, 99)
        cls = ["car", "dog"][i % 2]
        color = (255, 0, 0) if cls == "car" else (0, 0, 255)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
        path = str(root / f"{i}.png")
        cv2.imwrite(path, img)
        rows.append(
            {
                "filename": path, "width": 80, "height": 100, "class": cls,
                "xmin": float(x1), "ymin": float(y1),
                "xmax": float(x2), "ymax": float(y2), "labels": 1 + (i % 2),
            }
        )
    csv = str(root / "train.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv


@pytest.fixture(scope="module")
def conf(csv_dataset):
    return OmegaConf.create(
        {
            "model": {
                "backbone_kind": "resnet18", "num_classes": 2,
                "min_size": 64, "max_size": 96, "pretrained": False,
            },
            "dataset": {
                "kind": "csv", "trn_paths": csv_dataset,
                "valid_paths": csv_dataset, "test_paths": csv_dataset,
            },
            "dataloader": {
                "train_bs": 2, "valid_bs": 2, "test_bs": 2,
                "args": {"num_workers": 1},
            },
            "transforms": [],
            "optimizer": {
                "class_name": "torch.optim.SGD",
                "params": {"lr": 0.005, "momentum": 0.9},
            },
            "scheduler": {
                "class_name": "torch.optim.lr_scheduler.StepLR",
                "params": {"step_size": 1, "gamma": 0.5},
                "interval": "epoch", "frequency": 1, "monitor": False,
            },
        }
    )


@pytest.fixture(scope="module")
def fitted(conf, tmp_path_factory):
    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    model = RetinaNetModel(conf)
    trainer = Trainer(
        max_epochs=2, checkpoint_dir=ckpt_dir, val_check_interval=1,
        warmup_steps=0,  # exact-LR assertions below
    )
    metrics = trainer.fit(model)
    return model, trainer, metrics, ckpt_dir


class TestFit:
    def test_losses_finite_and_logged(self, fitted):
        _, _, metrics, _ = fitted
        assert np.isfinite(metrics["train_loss"])
        assert np.isfinite(metrics["val_loss"])
        assert "train_classification_loss" in metrics
        assert "train_regression_loss" in metrics

    def test_scheduler_stepped_each_epoch(self, fitted):
        _, trainer, metrics, _ = fitted
        # StepLR gamma=0.5 stepped twice: 0.005 -> 0.00125
        assert metrics["lr"] == pytest.approx(0.005 * 0.25)
        assert trainer.current_lr == pytest.approx(0.005 * 0.25)

    def test_global_step_counts(self, fitted):
        _, trainer, _, _ = fitted
        assert trainer.global_step == 2 * 4  # 2 epochs x (8 imgs / bs 2)

    def test_checkpoint_written(self, fitted):
        _, _, _, ckpt_dir = fitted
        assert os.path.isdir(os.path.join(ckpt_dir, "last"))

    def test_state_synced_to_model(self, fitted):
        model, trainer, _, _ = fitted
        import jax

        leaves = jax.tree_util.tree_leaves(model.net.variables["params"])
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


class TestNoValidationSplit:
    def test_valid_paths_false_means_no_val_ds(self, conf):
        """The reference demo spells "no validation" as `valid_paths: False`
        (demo.ipynb hparams cell); the csv branch must treat False like
        null instead of constructing PascalDataset(False) (regression:
        found by the round-3 demo_voc TPU run)."""
        no_val = OmegaConf.create(
            {**conf, "dataset": {**conf["dataset"], "valid_paths": False}}
        )
        model = RetinaNetModel(no_val)
        model.prepare_data()
        assert model.val_ds is None
        assert model.trn_ds is not None and model.test_ds is not None


class TestOptimizerFlattenConfig:
    def test_flatten_flag_flows_through_config(self, conf):
        """`optimizer.flatten: true` reaches build_optimizer: the optimizer
        state carries ONE raveled momentum vector instead of per-leaf trees,
        and the LR hyperparameter stays injectable."""
        import jax
        import jax.numpy as jnp

        from pytorch_retinanet_tpu.engine.optim import set_learning_rate

        flat_conf = OmegaConf.create(
            {**conf, "optimizer": {**conf["optimizer"], "flatten": True}}
        )
        model = RetinaNetModel(flat_conf)
        opt, _, _ = model.configure_optimizers()
        params = {"a": jnp.ones((3, 4)), "b": {"c": jnp.zeros(5)}}
        state = opt.init(params)
        state = set_learning_rate(state, 0.01)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # Same pytree out regardless of the internal flat representation.
        assert jax.tree_util.tree_structure(
            updates
        ) == jax.tree_util.tree_structure(params)
        # The momentum buffer inside the state is flat: exactly one leaf
        # with 3*4 + 5 elements at some depth of the inner state.
        sizes = [l.size for l in jax.tree_util.tree_leaves(state.inner_state)]
        assert 3 * 4 + 5 in sizes


class TestCheckpointResume:
    def test_restore_roundtrip(self, conf, fitted):
        import jax

        model, trainer, _, ckpt_dir = fitted
        model2 = RetinaNetModel(conf)
        trainer2 = Trainer(max_epochs=2, checkpoint_dir=None)
        trainer2._model = model2
        trainer2._optimizer, trainer2._scheduler, trainer2._sched_meta = (
            model2.configure_optimizers()
        )
        trainer2.state = trainer2._init_state(model2)
        trainer2.restore_checkpoint(os.path.join(ckpt_dir, "last"))
        assert trainer2.global_step == trainer.global_step
        # restored params equal trained params
        a = jax.tree_util.tree_leaves(trainer.state.params)
        b = jax.tree_util.tree_leaves(trainer2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))


class TestDataParallel:
    def test_fit_on_full_8_device_mesh(self, conf, tmp_path_factory):
        """SPMD data-parallel fit: batch 8 sharded across all 8 virtual devices."""
        import copy
        import jax

        assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
        c = copy.deepcopy(conf)
        c.dataloader.train_bs = 8
        c.dataloader.valid_bs = 8
        model = RetinaNetModel(c)
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, warmup_steps=0)
        metrics = trainer.fit(model)
        assert trainer.mesh.num_devices == 8
        assert np.isfinite(metrics["train_loss"])
        # replicated params stay consistent across the mesh
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestMeshRetention:
    def test_eval_batch_pads_instead_of_shrinking_mesh(self, conf):
        """train_bs=8 / valid_bs=6 on 8 devices: the mesh must stay 8-wide
        (eval batches pad 6→8 with masked rows) — the old gcd sizing would
        silently train on a 2-device mesh."""
        import copy
        import jax

        c = copy.deepcopy(conf)
        c.dataloader.train_bs = 8
        c.dataloader.valid_bs = 6
        model = RetinaNetModel(c)
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, warmup_steps=0)
        metrics = trainer.fit(model)
        assert trainer.mesh.num_devices == jax.device_count() == 8
        assert np.isfinite(metrics["val_loss"])

    def test_pad_batch_rows_masks_padding(self, conf):
        model = RetinaNetModel(conf)
        trainer = Trainer(max_epochs=1, checkpoint_dir=None)
        batch = {
            "images": np.random.rand(6, 32, 32, 3).astype(np.float32),
            "image_sizes": np.full((6, 2), 32.0, np.float32),
            "orig_sizes": np.full((6, 2), 32.0, np.float32),
            "image_ids": np.arange(6, dtype=np.int64),
            "boxes": np.zeros((6, 5, 4), np.float32),
            "labels": np.zeros((6, 5), np.int32),
            "valid": np.zeros((6, 5), bool),
            "batch_mask": np.ones(6, bool),
        }
        out = trainer._pad_batch_rows(batch)
        assert out["images"].shape[0] == 8
        assert out["batch_mask"].tolist() == [True] * 6 + [False] * 2
        assert (out["image_sizes"][6:] > 0).all()  # safe division
        assert (out["image_ids"][6:] == -1).all()
        assert not out["valid"][6:].any()


class TestUnfrozenBN:
    def test_batch_stats_update_when_unfrozen(self, conf, tmp_path_factory):
        import copy
        import jax

        c = copy.deepcopy(conf)
        c.model.freeze_bn = False
        model = RetinaNetModel(c)
        before = jax.device_get(model.net.variables["batch_stats"])
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, warmup_steps=0)
        trainer.fit(model)
        after = jax.device_get(model.net.variables["batch_stats"])
        leaves_b = jax.tree_util.tree_leaves(before)
        leaves_a = jax.tree_util.tree_leaves(after)
        changed = any(
            not np.allclose(np.asarray(x), np.asarray(y))
            for x, y in zip(leaves_b, leaves_a)
        )
        assert changed, "train-mode BN must update running statistics"


class TestTestLoop:
    def test_coco_eval_runs(self, fitted):
        model, trainer, _, _ = fitted
        results = trainer.test(model)
        assert isinstance(results, list) and "AP" in results[0]
        assert -1.0 <= results[0]["AP"] <= 1.0


class TestNaNGuard:
    def test_non_finite_metrics_raise_with_guidance(self, conf):
        import copy

        c = copy.deepcopy(conf)
        # absurd LR + no warmup/clip => rapid divergence
        c.optimizer.params.lr = 1e6
        model = RetinaNetModel(c)
        trainer = Trainer(
            max_epochs=3, checkpoint_dir=None, warmup_steps=0, log_every_n_steps=1
        )
        with pytest.raises(FloatingPointError, match="warmup"):
            trainer.fit(model)


class TestCocoKind:
    def test_coco_dataset_kind_end_to_end(self, tmp_path):
        """dataset.kind='coco' with the standard train2017/val2017 layout:
        prepare_data -> fit -> COCO test all function."""
        import json

        import cv2

        root = str(tmp_path / "coco")
        rng = np.random.default_rng(0)
        for split in ("train", "val"):
            img_dir = f"{root}/{split}2017"
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(f"{root}/annotations", exist_ok=True)
            images, anns = [], []
            for i in range(4):
                img = np.full((100, 80, 3), 255, np.uint8)
                x, y = int(rng.integers(5, 30)), int(rng.integers(5, 40))
                w, h = int(rng.integers(25, 40)), int(rng.integers(25, 40))
                cat = 1 + i % 2
                cv2.rectangle(img, (x, y), (min(x + w, 79), min(y + h, 99)),
                              (255 * (cat == 1), 0, 255 * (cat == 2)), -1)
                cv2.imwrite(f"{img_dir}/{i:012d}.jpg", img)
                images.append({"id": i, "height": 100, "width": 80,
                               "file_name": f"{i:012d}.jpg"})
                anns.append({"id": i + 1, "image_id": i, "category_id": cat,
                             "bbox": [x, y, min(w, 79 - x), min(h, 99 - y)],
                             "area": w * h, "iscrowd": 0, "segmentation": []})
            with open(f"{root}/annotations/instances_{split}2017.json", "w") as f:
                json.dump({"images": images, "annotations": anns,
                           "categories": [{"id": 1, "name": "car"},
                                          {"id": 2, "name": "dog"}]}, f)

        conf = OmegaConf.create(
            {
                "model": {"backbone_kind": "resnet18", "num_classes": 2,
                          "min_size": 64, "max_size": 96, "pretrained": False},
                "dataset": {"kind": "coco", "root_dir": root},
                "dataloader": {"train_bs": 2, "valid_bs": 2, "test_bs": 2,
                               "args": {"num_workers": 1}},
                "transforms": [],
                "optimizer": {"class_name": "torch.optim.SGD",
                              "params": {"lr": 0.005, "momentum": 0.9}},
                "scheduler": {"class_name": None, "params": {},
                              "interval": "epoch", "frequency": 1, "monitor": False},
            }
        )
        model = RetinaNetModel(conf)
        trainer = Trainer(max_epochs=1, checkpoint_dir=None, warmup_steps=0)
        metrics = trainer.fit(model)
        assert np.isfinite(metrics["train_loss"])
        results = trainer.test(model)
        assert "AP" in results[0]


class TestGradAccumulationTrainer:
    def test_accumulate_grad_batches_fit(self, conf):
        """pl.Trainer(accumulate_grad_batches=2) parity: one optimizer step
        per two loader batches, scheduler/warmup in optimizer steps, and the
        clip riding the window-mean grads (optim.wrap_accumulation)."""
        import jax

        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            accumulate_grad_batches=2, gradient_clip_val=10.0,
        )
        init = jax.tree_util.tree_map(
            np.asarray, model.net.variables["params"]
        )
        metrics = trainer.fit(model)
        assert np.isfinite(metrics["train_loss"])
        # 8 imgs / bs 2 = 4 loader batches = 2 optimizer steps.
        assert trainer.global_step == 4
        assert trainer._opt_step == 2
        # StepLR(step_size=1, gamma=0.5) stepped once at epoch end.
        assert trainer.current_lr == pytest.approx(0.005 * 0.5)
        # The optimizer actually applied (params moved from init).
        trained = model.net.variables["params"]
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(init),
                jax.tree_util.tree_leaves(trained),
            )
        )
        assert moved

    def test_partial_window_flushed_at_epoch_end(self, conf):
        """Lightning steps the optimizer on each epoch's last batch even when
        the accumulation window is incomplete: 4 loader batches with k=3 must
        produce TWO optimizer steps (one full window + a flushed partial),
        not one, and leave no gradients buffered in MultiSteps."""
        import jax

        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            accumulate_grad_batches=3,
        )
        trainer.fit(model)
        # 4 loader batches -> window [1,2,3] steps, window [4] flushed;
        # global_step advances to the window boundary (2 windows * 3).
        assert trainer.global_step == 6
        assert trainer._opt_step == 2
        assert int(jax.device_get(trainer.state.opt_state.mini_step)) == 0

    def test_spatial_mesh_fit_eval_predict(self, conf):
        """Spatial-parallel TRAINING on a (data=2, spatial=2) mesh: the
        backbone runs on height-sharded images (GSPMD halo exchanges), the
        FPN/head/loss on gathered features. Validation losses must match a
        plain data-parallel trainer on the same (untrained) weights, and
        fit/test must run end-to-end."""
        import jax

        from pytorch_retinanet_tpu.parallel import make_mesh, make_train_mesh

        if jax.device_count() < 4:
            pytest.skip("needs 4 virtual devices")
        model = RetinaNetModel(conf)
        sp = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            mesh=make_train_mesh(jax.devices()[:4], spatial=2),
        )
        dp = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            mesh=make_mesh(jax.devices()[:2]),
        )
        # Same weights, deterministic eval: the split spatial forward must
        # agree with the plain one (bf16 forward; halo-exchange reduction
        # order is the only difference).
        val_sp = sp.validate(model)
        val_dp = dp.validate(model)
        assert val_sp["val_loss"] == pytest.approx(
            val_dp["val_loss"], rel=2e-2
        )
        metrics = sp.fit(model)
        assert np.isfinite(metrics["train_loss"])
        results = sp.test(model)
        assert "AP" in results[0]

    def test_spatial_mesh_rejects_mutable_bn(self, conf):
        """Live-BN TRAINING can't shard spatially (batch statistics would
        need cross-shard reduction): fit must refuse loudly. Eval paths run
        the backbone with train=False (running stats) and must still work."""
        import jax

        from pytorch_retinanet_tpu.parallel import make_train_mesh

        if jax.device_count() < 2:
            pytest.skip("needs 2 virtual devices")
        conf2 = OmegaConf.create(OmegaConf.to_container(conf))
        conf2.model.freeze_bn = False
        model = RetinaNetModel(conf2)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            mesh=make_train_mesh(jax.devices()[:2], spatial=2, data=1),
        )
        with pytest.raises(ValueError, match="freeze_bn"):
            trainer.fit(model)
        val = trainer.validate(model)  # eval-only is legal on the same mesh
        assert np.isfinite(val["val_loss"])

    def test_max_steps_reached_by_flush_stops(self, conf):
        """When the epoch-end flush is the optimizer step that reaches
        max_steps, training must stop — not run one more window next epoch.
        4 loader batches, k=3, max_steps=2: window [1,2,3] steps, flush of
        [4] is step 2 -> stop after epoch 0."""
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=5, checkpoint_dir=None, warmup_steps=0,
            accumulate_grad_batches=3, max_steps=2,
        )
        trainer.fit(model)
        assert trainer.global_step == 6
        assert trainer._opt_step == 2
        assert trainer.should_stop
        assert trainer.current_epoch == 0

    def test_checkpoint_roundtrip_with_accumulation(self, conf, tmp_path_factory):
        """The MultiSteps wrapper adds a params-sized gradient buffer to the
        opt_state: a checkpoint saved by an accumulating trainer must restore
        into a fresh accumulating trainer (the template pytree must match)
        and continue fitting. The epoch-end flush guarantees saved windows
        are closed (mini_step == 0) and global_step sits on a boundary."""
        import copy

        import jax

        ckpt = str(tmp_path_factory.mktemp("acc_ckpt"))
        model = RetinaNetModel(copy.deepcopy(conf))
        tr = Trainer(
            max_epochs=1, checkpoint_dir=ckpt, warmup_steps=0,
            accumulate_grad_batches=3,
        )
        tr.fit(model)
        assert int(jax.device_get(tr.state.opt_state.mini_step)) == 0
        saved_step = tr.global_step
        assert saved_step % 3 == 0  # flush rounded to the window boundary

        model2 = RetinaNetModel(copy.deepcopy(conf))
        tr2 = Trainer(
            max_epochs=2, checkpoint_dir=None, warmup_steps=0,
            accumulate_grad_batches=3,
            resume_from_checkpoint=os.path.join(ckpt, "last"),
        )
        tr2.fit(model2)
        assert tr2.global_step > saved_step
        assert tr2.global_step % 3 == 0
        assert tr2._opt_step == tr2.global_step // 3
        assert int(jax.device_get(tr2.state.opt_state.mini_step)) == 0
        assert all(
            bool(np.all(np.isfinite(np.asarray(x))))
            for x in jax.tree_util.tree_leaves(tr2.state.params)
        )

    def test_warmup_cap_counts_flushed_steps(self, conf):
        """The warmup cap (a fifth of planned optimizer steps) must count
        flushed partial windows: 4 batches/epoch with k=3 is 2 optimizer
        steps/epoch (ceil), so 5 epochs plan 10 steps -> cap 2 (floor-divide
        would plan 6 -> cap 1)."""
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=5, checkpoint_dir=None, warmup_steps=500,
            accumulate_grad_batches=3,
        )
        trainer.fit(model)
        assert trainer._warmup_eff == 2

    def test_max_steps_counts_optimizer_steps(self, conf):
        """Lightning's max_steps counts OPTIMIZER steps: with k=2,
        max_steps=1 must consume two loader batches (one full window), not
        stop mid-window after one."""
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            accumulate_grad_batches=2, max_steps=1,
        )
        trainer.fit(model)
        assert trainer.global_step == 2
        assert trainer._opt_step == 1
        assert trainer.should_stop


def test_fit_only_config_needs_no_test_paths(conf, csv_dataset):
    """A fit-only csv config (no test_paths/valid_paths) must prepare
    cleanly — test_ds stays None and test_dataloader raises a guided error
    instead of crashing in PascalDataset(None) (r3 verify-drive regression)."""
    fit_conf = OmegaConf.create(
        {
            "model": dict(conf.model),
            "dataset": {"kind": "csv", "trn_paths": csv_dataset,
                        "valid_paths": False},
            "dataloader": dict(conf.dataloader),
            "optimizer": dict(conf.optimizer),
        }
    )
    model = RetinaNetModel(fit_conf)
    model.prepare_data()
    assert model.trn_ds is not None
    assert model.val_ds is None and model.test_ds is None
    with pytest.raises(ValueError, match="test_paths"):
        model.test_dataloader()
    with pytest.raises(ValueError, match="test_paths"):
        model.test_evaluator()


class TestTrainerKnobs:
    """pl.Trainer 1.0 loop-control knobs (r3 verdict missing #1 / task #5):
    limit_*_batches, fast_dev_run, check_val_every_n_epoch, overfit_batches,
    num_sanity_val_steps — and a VISIBLE warning for anything unknown."""

    def test_unknown_kwarg_warns(self):
        with pytest.warns(UserWarning, match="limit_trian_batchez"):
            Trainer(max_epochs=1, limit_trian_batchez=2, checkpoint_dir=None)

    def test_gpus_precision_absorbed_silently(self, recwarn):
        Trainer(max_epochs=1, gpus=1, precision=16, checkpoint_dir=None)
        assert not [w for w in recwarn if issubclass(w.category, UserWarning)]

    def test_limit_train_batches_int(self, conf):
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            limit_train_batches=2, num_sanity_val_steps=0,
        )
        trainer.fit(model)
        assert trainer.global_step == 2  # 4 loader batches, limited to 2

    def test_limit_train_batches_fraction(self, conf):
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            limit_train_batches=0.5, num_sanity_val_steps=0,
        )
        trainer.fit(model)
        assert trainer.global_step == 2  # int(4 * 0.5)

    def test_fast_dev_run(self, conf, tmp_path):
        ckpt = str(tmp_path / "fdr_ckpt")
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=7, checkpoint_dir=ckpt, warmup_steps=0,
            fast_dev_run=True,
        )
        metrics = trainer.fit(model)
        assert trainer.global_step == 1  # one train batch
        assert trainer.max_epochs == 1
        assert np.isfinite(metrics["val_loss"])  # one val batch ran
        assert not os.path.isdir(ckpt)  # checkpointing disabled

    def test_check_val_every_n_epoch(self, conf):
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            check_val_every_n_epoch=2, num_sanity_val_steps=0,
        )
        metrics = trainer.fit(model)
        assert trainer.val_check_interval == 2
        assert "val_loss" not in metrics  # epoch 1 of 2: no val yet

    def test_overfit_batches(self, conf):
        model = RetinaNetModel(conf)
        trainer = Trainer(
            max_epochs=3, checkpoint_dir=None, warmup_steps=0,
            overfit_batches=1,
        )
        metrics = trainer.fit(model)
        assert trainer.global_step == 3  # 1 fixed batch x 3 epochs
        assert np.isfinite(metrics["val_loss"])  # val ran on the train slice

    def test_sanity_check_fails_before_training(self, conf, tmp_path):
        """A broken val pipeline must fail during the pre-fit sanity check
        (global_step still 0), not after the first training epoch."""
        import copy

        import pandas as pd

        bad_csv = str(tmp_path / "bad.csv")
        pd.DataFrame(
            [{"filename": str(tmp_path / "missing.png"), "width": 80,
              "height": 100, "class": "car", "xmin": 1.0, "ymin": 1.0,
              "xmax": 20.0, "ymax": 20.0, "labels": 1}]
        ).to_csv(bad_csv, index=False)
        c = copy.deepcopy(conf)
        c.dataset.valid_paths = bad_csv
        model = RetinaNetModel(c)
        trainer = Trainer(
            max_epochs=1, checkpoint_dir=None, warmup_steps=0,
            num_sanity_val_steps=2,
        )
        with pytest.raises(Exception):
            trainer.fit(model)
        assert trainer.global_step == 0


class TestDPNumericalEquivalence:
    """r3 verdict task #6: pin data-parallel training NUMERICALLY — the
    8-device SPMD fit must produce the same parameters as a 1-device fit of
    the same global batches, and accumulate_grad_batches=k must match the
    fused k-times-bigger batch (the Lightning-exactness claim, grad-math
    tested)."""

    @staticmethod
    def _final_leaves(trainer):
        import jax

        return [
            np.asarray(l)
            for l in jax.tree_util.tree_leaves(
                jax.device_get(trainer.state.params)
            )
        ]

    def test_8device_fit_matches_1device(self, conf):
        import copy

        import jax

        assert jax.device_count() == 8
        c = copy.deepcopy(conf)
        c.dataloader.train_bs = 8
        c.dataset.valid_paths = False  # params only move in training

        results = []
        for devices in (None, jax.devices()[:1]):
            model = RetinaNetModel(copy.deepcopy(c))
            trainer = Trainer(
                max_epochs=3, checkpoint_dir=None, warmup_steps=0,
                devices=devices, num_sanity_val_steps=0,
            )
            trainer.fit(model)
            assert trainer.global_step == 3  # 1 batch/epoch x 3
            results.append((trainer.mesh.num_devices, self._final_leaves(trainer)))

        (n8, leaves8), (n1, leaves1) = results
        assert n8 == 8 and n1 == 1
        # Identical global batches + identical init => identical training up
        # to bf16 forward / cross-device reduction-order drift (measured:
        # max abs drift ~2.5e-5 after 3 steps on the CPU mesh).
        for a, b in zip(leaves8, leaves1):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)

    def test_accumulation_matches_fused_batch(self, conf):
        import copy

        import jax

        def run(train_bs, accumulate):
            c = copy.deepcopy(conf)
            c.dataloader.train_bs = train_bs
            c.dataset.valid_paths = False
            model = RetinaNetModel(c)
            orig = model.train_dataloader

            def no_shuffle(**kw):  # identical batch ORDER across runs
                ld = orig(**kw)
                ld.shuffle = False
                return ld

            model.train_dataloader = no_shuffle
            trainer = Trainer(
                max_epochs=1, checkpoint_dir=None, warmup_steps=0,
                accumulate_grad_batches=accumulate,
                devices=jax.devices()[:1],  # isolate the accumulation math
                num_sanity_val_steps=0,
            )
            trainer.fit(model)
            return trainer

        acc = run(train_bs=2, accumulate=2)  # windows ([0,1],[2,3]), ([4,5],[6,7])
        fused = run(train_bs=4, accumulate=1)  # batches [0..3], [4..7]
        assert acc._opt_step == fused._opt_step == 2
        for a, b in zip(self._final_leaves(acc), self._final_leaves(fused)):
            np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
