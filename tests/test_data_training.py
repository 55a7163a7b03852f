"""Data layer + trainer + checkpoint tests (SURVEY.md §4 test strategy).

End-to-end slice on the tiny config: synthetic LeRobot-schema data -> Trainer
-> checkpoint -> reload -> eval. This mirrors the reference's implied workflow
(``scripts/train.py`` then ``scripts/eval_dataset.py``) without network.
"""

import json
import numpy as np
import pytest

from vla_fastvlm_tpu.data import (
    AlohaDataset,
    AlohaIterableDataset,
    DataLoader,
    SyntheticAlohaSource,
    aloha_collate_fn,
    create_aloha_dataloader,
    default_aloha_transforms,
)
from vla_fastvlm_tpu.data.aloha_dataset import _resolve_task
from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLAPolicy
from vla_fastvlm_tpu.training import Trainer, TrainingConfig


TINY = dict(
    vlm_model_name="fastvlm-tiny",
    bootstrap_model_name="fastvlm-tiny",
    state_dim=4,
    action_dim=4,
    hidden_dim=16,
    fusion_dim=16,
    tokenizer_max_length=16,
    dropout=0.0,
)


def make_dataset(n=16, image_hw=(32, 32)):
    return AlohaDataset(
        source=SyntheticAlohaSource(
            num_samples=n, image_hw=image_hw, state_dim=4, action_dim=4
        )
    )


class TestData:
    def test_transform_rescales(self):
        img = np.full((3, 4, 4), 255.0, dtype=np.float32)
        out = default_aloha_transforms(img)
        assert out.max() == pytest.approx(1.0)
        # already-[0,1] images pass through
        np.testing.assert_array_equal(default_aloha_transforms(out), out)

    def test_resolve_task_fallbacks(self):
        assert _resolve_task({"task": "lift"}, "task") == "lift"
        assert _resolve_task({"task_id": 3}, None) == "3"
        assert _resolve_task({"task_name": "x"}, "missing") == "x"
        assert _resolve_task({}, "task") == "unknown"

    def test_map_dataset_and_collate(self):
        ds = make_dataset(8)
        assert len(ds) == 8
        sample = ds[0]
        assert sample.image.shape == (3, 32, 32)
        assert sample.image.max() <= 1.0
        assert sample.state.dtype == np.float32
        batch = aloha_collate_fn([ds[0], ds[1]])
        assert batch["images"].shape == (2, 3, 32, 32)
        assert batch["tasks"] == ["insert the peg"] * 2
        assert len(batch["metadata"]) == 2

    def test_limit_samples(self):
        ds = AlohaDataset(source=SyntheticAlohaSource(num_samples=10), limit_samples=4)
        assert len(ds) == 4

    def test_iterable_dataset(self):
        ds = AlohaIterableDataset(source=SyntheticAlohaSource(num_samples=6))
        samples = list(ds)
        assert len(samples) == 6
        assert samples[0].image.shape == (3, 48, 48)

    def test_loader_batching_and_shuffle(self):
        ds = make_dataset(10)
        loader = create_aloha_dataloader(ds, batch_size=4, shuffle=False, num_workers=0)
        batches = list(loader)
        assert [b["images"].shape[0] for b in batches] == [4, 4, 2]
        # shuffle determinism by (seed, epoch)
        l1 = DataLoader(ds, batch_size=10, shuffle=True, num_workers=0, seed=1)
        l2 = DataLoader(ds, batch_size=10, shuffle=True, num_workers=0, seed=1)
        b1, b2 = next(iter(l1)), next(iter(l2))
        np.testing.assert_array_equal(b1["states"], b2["states"])

    def test_loader_threaded_matches_sync(self):
        ds = make_dataset(9)
        sync = list(DataLoader(ds, batch_size=3, shuffle=False, num_workers=0))
        threaded = list(DataLoader(ds, batch_size=3, shuffle=False, num_workers=2))
        for a, b in zip(sync, threaded):
            np.testing.assert_array_equal(a["actions"], b["actions"])

    def test_loader_sharding_partitions(self):
        ds = make_dataset(8)
        all_idx = []
        for shard in range(2):
            loader = DataLoader(
                ds, batch_size=4, shuffle=False, num_workers=0,
                shard_index=shard, num_shards=2,
            )
            for batch in loader:
                all_idx.extend(int(m["index"]) for m in batch["metadata"])
        assert sorted(all_idx) == list(range(8))

    def test_iterable_loader(self):
        ds = AlohaIterableDataset(source=SyntheticAlohaSource(num_samples=5))
        loader = create_aloha_dataloader(ds, batch_size=2, shuffle=True)
        batches = list(loader)
        assert [b["images"].shape[0] for b in batches] == [2, 2, 1]


class TestTrainer:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        out = tmp_path_factory.mktemp("train_out")
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(16)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=True, num_workers=0)
        eval_loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(out),
            num_epochs=4,
            learning_rate=1e-2,
            logging_steps=1,
            eval_steps=4,
            save_steps=4,
            report_to=[],
            mixed_precision=None,
        )
        trainer = Trainer(policy, loader, eval_loader, cfg)
        first_eval = trainer.evaluate()["eval/mse"]
        trainer.fit()
        return policy, trainer, out, first_eval

    def test_loss_decreases(self, trained):
        policy, trainer, out, first_eval = trained
        final_eval = trainer.evaluate()["eval/mse"]
        assert final_eval < first_eval

    def test_layout_and_logs(self, trained):
        _, trainer, out, _ = trained
        assert (out / "training_config.json").exists()
        assert (out / "checkpoints").is_dir()
        ckpts = sorted((out / "checkpoints").glob("step-*"))
        assert ckpts, "expected periodic checkpoints"
        assert (ckpts[0] / "policy_config.json").exists()
        assert (ckpts[0] / "policy_state_dict.safetensors").exists()
        lines = (out / "logs" / "metrics.jsonl").read_text().strip().splitlines()
        assert lines
        record = json.loads(lines[0])
        assert "train/loss" in record and "train/lr" in record

    def test_checkpoint_roundtrip(self, trained):
        from vla_fastvlm_tpu.utils import load_policy_from_checkpoint

        policy, trainer, out, _ = trained
        ckpt = sorted((out / "checkpoints").glob("step-*"))[-1]
        loaded, device = load_policy_from_checkpoint(ckpt)
        imgs = np.zeros((1, 3, 32, 32), dtype=np.float32)
        states = np.zeros((1, 4), dtype=np.float32)
        a1 = policy.forward(imgs, states, "t")
        a2 = loaded.forward(imgs, states, "t")
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)

    def test_loaded_params_are_device_resident(self, trained):
        """load_policy_from_checkpoint must device_put the loaded tree ONCE:
        safetensors yields host numpy, and numpy leaves in policy.params
        make every jitted call re-upload the full tree (a 0.5B eval loop
        hit its 30-min timeout on 16 batches over the tunnel — round 5)."""
        import jax

        from vla_fastvlm_tpu.utils import load_policy_from_checkpoint

        _, _, out, _ = trained
        ckpt = sorted((out / "checkpoints").glob("step-*"))[-1]
        loaded, device = load_policy_from_checkpoint(ckpt)
        leaves = jax.tree_util.tree_leaves(loaded.params)
        assert leaves
        for leaf in leaves:
            assert isinstance(leaf, jax.Array)
            assert next(iter(leaf.devices())) == device

    def test_resume_restores_counters(self, trained):
        policy, trainer, out, _ = trained
        ckpt = sorted(
            (out / "checkpoints").glob("step-*"),
            key=lambda p: int(p.name.split("-")[1]),
        )[-1]
        step = int(ckpt.name.split("-")[1])
        policy2 = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(16)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=True, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(out), num_epochs=4, resume_from=str(ckpt),
            report_to=[], mixed_precision=None,
        )
        t2 = Trainer(policy2, loader, None, cfg)
        t2._load_checkpoint(str(ckpt))
        assert t2.global_step == step

    def test_scheduler_shape(self):
        from vla_fastvlm_tpu.training.trainer import _linear_warmup_decay

        sched = _linear_warmup_decay(1.0, 100, 10)
        assert float(sched(0)) == 0.0
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(55)) == pytest.approx(0.5)
        assert float(sched(100)) == pytest.approx(0.0)

    def test_bad_precision_falls_back(self):
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(8)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        cfg = TrainingConfig(mixed_precision="fp8-bogus", report_to=[], max_steps=1)
        trainer = Trainer(policy, loader, None, cfg)
        assert trainer.config.mixed_precision == "no"

    def test_trainer_fit_on_mesh(self, tmp_path):
        """Trainer(mesh=...) end to end on the virtual 8-device mesh: fit,
        eval, checkpoint — the full DP x TP training loop, not just the step
        fn (which test_parallel covers)."""
        from vla_fastvlm_tpu.parallel import make_mesh

        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(16)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=True, num_workers=0)
        eval_loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(tmp_path), num_epochs=3, learning_rate=1e-2,
            save_steps=6, report_to=[], mixed_precision=None,
        )
        trainer = Trainer(policy, loader, eval_loader, cfg, mesh=make_mesh(data=4, model=2))
        first = trainer.evaluate()["eval/mse"]
        trainer.fit()
        final = trainer.evaluate()["eval/mse"]
        assert final < first
        ckpts = list((tmp_path / "checkpoints").glob("step-*"))
        assert ckpts
        from vla_fastvlm_tpu.utils import load_policy_from_checkpoint

        load_policy_from_checkpoint(ckpts[-1])

    def test_keep_last_n_prunes_old_checkpoints(self, tmp_path):
        """save_steps=1 over 6 steps with keep_last_n=2 leaves exactly the
        two newest step-* dirs (async writes joined at end of training)."""
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(8)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(tmp_path), num_epochs=6, save_steps=1,
            keep_last_n=2, report_to=[], mixed_precision=None,
        )
        Trainer(policy, loader, None, cfg).fit()
        ckpts = sorted(
            (tmp_path / "checkpoints").glob("step-*"),
            key=lambda p: int(p.name.split("-")[1]),
        )
        assert [c.name for c in ckpts] == ["step-5", "step-6"]
        # the survivors are loadable
        from vla_fastvlm_tpu.utils import load_policy_from_checkpoint

        load_policy_from_checkpoint(ckpts[-1])

    def test_prune_checkpoints_ignores_non_step_dirs(self, tmp_path):
        from vla_fastvlm_tpu.io.checkpoint import prune_checkpoints

        for name in ("step-1", "step-2", "step-10", "preempt-step3", "final"):
            (tmp_path / name).mkdir()
        removed = prune_checkpoints(tmp_path, keep_last_n=1)
        assert sorted(p.name for p in removed) == ["step-1", "step-2"]
        left = sorted(p.name for p in tmp_path.iterdir())
        assert left == ["final", "preempt-step3", "step-10"]

    def test_preemption_checkpoint(self, tmp_path):
        """SIGTERM-style preemption saves a resumable checkpoint mid-run."""
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(16)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(tmp_path), num_epochs=10, report_to=[],
            mixed_precision=None, save_steps=1000,
        )
        trainer = Trainer(policy, loader, None, cfg)

        original = trainer._train_step

        def step_then_preempt(*args_, **kw):
            out = original(*args_, **kw)
            trainer._preempted = True  # what the signal handler sets
            return out

        trainer._train_step = step_then_preempt
        trainer.fit()
        assert trainer.global_step == 1
        preempt = list((tmp_path / "checkpoints").glob("preempt-step-*"))
        assert len(preempt) == 1
        assert (preempt[0] / "policy_state_dict.safetensors").exists()
        # resumable: counters restored
        t2 = Trainer(
            FastVLAPolicy(FastVLAConfig(**TINY)), loader, None,
            TrainingConfig(output_dir=str(tmp_path), report_to=[],
                           mixed_precision=None),
        )
        t2._load_checkpoint(str(preempt[0]))
        assert t2.global_step == 1

    def test_gradient_accumulation(self, tmp_path):
        """MultiSteps: params move only every k batches; the dual-clock quirk
        (global_step counts batches, updates count optimizer steps) holds."""
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = make_dataset(16)
        loader = create_aloha_dataloader(ds, batch_size=4, shuffle=False, num_workers=0)
        cfg = TrainingConfig(
            output_dir=str(tmp_path), num_epochs=1, report_to=[],
            mixed_precision=None, gradient_accumulation_steps=2,
            learning_rate=1e-2, save_steps=1000,
        )
        trainer = Trainer(policy, loader, None, cfg)
        # 4 batches/epoch, accum 2 -> 2 updates/epoch
        assert trainer.num_training_steps == 2

        import jax

        before = jax.tree_util.tree_leaves(trainer.trainable)[0].copy()
        batch = next(iter(loader))
        arrays = trainer.model.prepare_batch(batch)
        rng = jax.random.PRNGKey(0)
        trainer.trainable, trainer.opt_state, _ = trainer._train_step(
            trainer.trainable, trainer.opt_state, trainer.frozen, arrays, rng
        )
        mid = jax.tree_util.tree_leaves(trainer.trainable)[0]
        np.testing.assert_array_equal(np.asarray(mid), np.asarray(before))
        trainer.trainable, trainer.opt_state, _ = trainer._train_step(
            trainer.trainable, trainer.opt_state, trainer.frozen, arrays, rng
        )
        after = jax.tree_util.tree_leaves(trainer.trainable)[0]
        assert not np.array_equal(np.asarray(after), np.asarray(before))

    def test_bf16_compute_training(self, tmp_path):
        """bf16 compute + fp32 params trains and yields finite loss."""
        cfg_kw = dict(TINY)
        cfg_kw.update(dtype="bfloat16", param_dtype="float32")
        policy = FastVLAPolicy(FastVLAConfig(**cfg_kw))
        ds = make_dataset(8)
        loader = create_aloha_dataloader(ds, batch_size=8, shuffle=False, num_workers=0)
        trainer = Trainer(
            policy, loader, None,
            TrainingConfig(output_dir=str(tmp_path), max_steps=2, report_to=[],
                           logging_steps=1, save_steps=1000),
        )
        trainer.fit()
        import json as _json

        lines = (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()
        losses = [_json.loads(l)["train/loss"] for l in lines]
        assert all(np.isfinite(losses))

    def test_infer_steps_requires_length(self):
        policy = FastVLAPolicy(FastVLAConfig(**TINY))
        ds = AlohaIterableDataset(
            source=SyntheticAlohaSource(num_samples=4, image_hw=(32, 32),
                                        state_dim=4, action_dim=4)
        )
        loader = create_aloha_dataloader(ds, batch_size=2)
        with pytest.raises(ValueError, match="max_steps"):
            Trainer(policy, loader, None, TrainingConfig(report_to=[]))
