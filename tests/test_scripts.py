"""Script-level behavior tests: split fallbacks and arg surfaces.

Pins the reference's graceful-degradation behaviors: eval's validation->train
fallback gated by allow_missing_split (reference ``eval_dataset.py:34-61``)
and train's Unknown-split tolerance (``train.py:117-126``).
"""

import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

import eval_dataset as eval_script  # noqa: E402
import train as train_script  # noqa: E402


class TestShardedClosedLoop:
    def test_eval_closed_loop_sharded_runs(self, capsys):
        """--dp/--tp drive the ShardedPolicyRuntime end to end on the
        virtual mesh (conftest supplies 8 CPU devices)."""
        import json

        import eval_closed_loop as ecl

        args = ecl.ClosedLoopArgs(
            model_id="fastvlm-tiny", state_dim=4, action_dim=4,
            num_envs=8, max_steps=2, image_size=64, dp=4, tp=2,
        )
        ecl.main(args)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(out)
        assert summary["total_actions"] == 16
        assert summary["mean_length"] == 2.0


class TestTokenServingClosedLoop:
    @pytest.mark.parametrize("serving", ["paged", "spec-paged"])
    def test_eval_closed_loop_token_serving_runs(self, serving, capsys):
        """--action-head token --serving paged|spec-paged drives the
        TokenPolicyServer end to end from the CLI, including raw-frame
        admission (image_prep letterboxes inside the servers' jitted
        prefill — the closed-loop tunnel-traffic fix)."""
        import json

        import eval_closed_loop as ecl

        args = ecl.ClosedLoopArgs(
            model_id="fastvlm-tiny", state_dim=4, action_dim=4,
            num_envs=3, max_steps=2, image_size=64,
            action_head="token", serving=serving,
            num_slots=2, prefill_batch=2,
            draft_model_id="fastvlm-tiny", spec_k=2,
        )
        ecl.main(args)
        out = capsys.readouterr().out.strip().splitlines()[-1]
        summary = json.loads(out)
        assert summary["total_actions"] == 6
        assert summary["mean_length"] == 2.0


class TestTrainEvalSeedAgreement:
    def test_eval_scores_the_training_records(self, tmp_path, capsys):
        """train.py and eval_dataset.py must build the SAME synthetic
        records: the sources generate data FROM the seed, so a seed
        mismatch silently evaluates a different random dataset and reports
        the noise floor (~1.0 for IID-normal actions) instead of the
        memorization MSE (round-5 regression: eval hardcoded seed 0 while
        train defaulted to 42)."""
        train_args = train_script.TrainArgs(
            synthetic_data=True, synthetic_samples=8, synthetic_image_size=32,
            model_id="fastvlm-tiny", bootstrap_model_id="fastvlm-tiny",
            # batch 8: train.py auto-meshes over every visible device and
            # the conftest supplies 8 virtual CPU devices (DP batch split).
            state_dim=4, action_dim=4, batch_size=8, max_steps=40,
            num_epochs=100, save_steps=40, eval_steps=100000,
            logging_steps=20, num_workers=0, learning_rate=1e-2,
            output_dir=str(tmp_path / "out"),
        )
        train_script.main(train_args)
        eval_args = eval_script.EvalArgs(
            checkpoint_dir=str(tmp_path / "out" / "checkpoints" / "step-40"),
            synthetic_data=True, synthetic_samples=8, synthetic_image_size=32,
            state_dim=4, action_dim=4, batch_size=4, num_workers=0,
        )
        eval_script.main(eval_args)
        out = capsys.readouterr().out
        [mse_line] = [
            l for l in out.strip().splitlines() if l.startswith("MSE on split")
        ]
        mse = float(mse_line.rsplit(":", 1)[1])
        # Memorization MSE after 40 steps at lr 1e-2 sits far below the
        # IID-noise floor; a seed mismatch would score ~1.0+.
        assert mse < 0.5

    def test_eval_reports_token_head_metrics(self, tmp_path, capsys):
        """The head-family quality pair (BASELINE) scores BOTH heads with
        eval_dataset.py: for the token policy it must surface the CE loss,
        token accuracy, and the binning floor (the best MSE any predictor
        of discretized actions can reach) next to the decoded MSE."""
        train_args = train_script.TrainArgs(
            synthetic_data=True, synthetic_samples=8, synthetic_image_size=32,
            model_id="fastvlm-tiny", bootstrap_model_id="fastvlm-tiny",
            state_dim=4, action_dim=4, batch_size=8, max_steps=10,
            num_epochs=100, save_steps=10, eval_steps=100000,
            logging_steps=5, num_workers=0, learning_rate=1e-3,
            action_head="token", lora_rank=2,
            output_dir=str(tmp_path / "out"),
        )
        train_script.main(train_args)
        eval_args = eval_script.EvalArgs(
            checkpoint_dir=str(tmp_path / "out" / "checkpoints" / "step-10"),
            synthetic_data=True, synthetic_samples=8, synthetic_image_size=32,
            state_dim=4, action_dim=4, batch_size=4, num_workers=0,
        )
        eval_script.main(eval_args)
        out = capsys.readouterr().out
        [extra_line] = [
            l for l in out.strip().splitlines()
            if l.startswith("Additional metrics")
        ]
        extras = eval(extra_line.split(":", 1)[1])  # printed as a dict literal
        assert set(extras) >= {"loss", "token_accuracy", "binning_floor_mse"}
        assert 0.0 <= extras["token_accuracy"] <= 1.0
        # At the default +/-1 codebook range the floor on IID-N(0,1)
        # synthetic actions is CLIPPING-dominated (~0.18), not the
        # (range/bins)^2/12 quantization term — exactly what the metric
        # exists to surface. Widening the range shrinks it (pinned in
        # test_action_tokens.py's codec tests).
        assert 0.0 < extras["binning_floor_mse"] < 1.0


class TestEvalSplitFallback:
    def make_args(self, **kw):
        defaults = dict(
            synthetic_data=True, synthetic_samples=4, synthetic_image_size=32,
            state_dim=4, action_dim=4, streaming=False,
        )
        defaults.update(kw)
        return eval_script.EvalArgs(**defaults)

    def test_fallback_to_train(self, monkeypatch, capsys):
        calls = []

        class FakeDataset:
            def __init__(self, split=None, **kw):
                calls.append(split)
                if split == "validation":
                    raise ValueError("Unknown split 'validation'")

        monkeypatch.setattr(eval_script, "AlohaDataset", FakeDataset)
        args = self.make_args(split="validation", allow_missing_split=True)
        _, resolved = eval_script._build_dataset(args)
        assert resolved == "train"
        assert calls == ["validation", "train"]
        assert "not found" in capsys.readouterr().out

    def test_no_fallback_when_disallowed(self, monkeypatch):
        class FakeDataset:
            def __init__(self, split=None, **kw):
                raise ValueError("Unknown split 'validation'")

        monkeypatch.setattr(eval_script, "AlohaDataset", FakeDataset)
        args = self.make_args(split="validation", allow_missing_split=False)
        with pytest.raises(ValueError, match="Unknown split"):
            eval_script._build_dataset(args)

    def test_other_errors_propagate(self, monkeypatch):
        class FakeDataset:
            def __init__(self, split=None, **kw):
                raise ValueError("disk on fire")

        monkeypatch.setattr(eval_script, "AlohaDataset", FakeDataset)
        args = self.make_args(split="validation", allow_missing_split=True)
        with pytest.raises(ValueError, match="disk on fire"):
            eval_script._build_dataset(args)


class TestArgSurfaces:
    def test_train_args_reference_fields(self):
        """Every reference TrainArgs flag exists with the same default
        (reference ``scripts/train.py:24-59``)."""
        ref_defaults = {
            "output_dir": "outputs/train/aloha_fastvlm",
            "dataset_repo_id": "lerobot/aloha_sim_insertion_human_image",
            "train_split": "train",
            "eval_split": "validation",
            "streaming": False,
            "limit_train_samples": None,
            "limit_eval_samples": 1024,
            "batch_size": 4,
            "eval_batch_size": 4,
            "num_workers": 4,
            "model_id": "apple/FastVLM-0.5B",
            "bootstrap_model_id": "apple/FastVLM-0.5B",
            "freeze_backbone": True,
            "hidden_dim": 1024,
            "fusion_dim": 1024,
            "dropout": 0.1,
            "image_size": None,
            "resize_with_padding": True,
            "pad_value": 0.0,
            "tokenizer_max_length": 64,
            "tokenizer_padding_side": "right",
            "pad_to_max_length": False,
            "learning_rate": 1e-4,
            "weight_decay": 1e-4,
            "num_epochs": 5,
            "max_steps": None,
            "gradient_accumulation_steps": 1,
            "logging_steps": 50,
            "eval_steps": 500,
            "save_steps": 1000,
            "mixed_precision": "bf16",
            "seed": 42,
        }
        args = train_script.TrainArgs()
        for name, value in ref_defaults.items():
            assert getattr(args, name) == value, name

    def test_eval_args_reference_fields(self):
        ref_defaults = {
            "checkpoint_dir": "outputs/train/aloha_fastvlm/checkpoints/step-1000",
            "dataset_repo_id": "lerobot/aloha_sim_insertion_human_image",
            "split": "validation",
            "allow_missing_split": True,
            "streaming": False,
            "batch_size": 8,
            "num_workers": 4,
            "limit_samples": None,
        }
        args = eval_script.EvalArgs()
        for name, value in ref_defaults.items():
            assert getattr(args, name) == value, name


class TestCompilationCache:
    def test_enable_creates_dir_and_sets_config(self, tmp_path, monkeypatch):
        import jax

        from vla_fastvlm_tpu.device import enable_compilation_cache

        target = str(tmp_path / "xla_cache")
        monkeypatch.setenv("FASTVLM_COMPILATION_CACHE", target)
        out = enable_compilation_cache()
        assert out == target
        import os

        assert os.path.isdir(target)
        assert jax.config.jax_compilation_cache_dir == target

    def test_opt_out(self, monkeypatch):
        from vla_fastvlm_tpu.device import enable_compilation_cache

        monkeypatch.setenv("FASTVLM_COMPILATION_CACHE", "off")
        assert enable_compilation_cache() is None
