"""Dataclass CLI tests: kebab-case flags, Optional/None, bools, YAML layering."""

from dataclasses import dataclass, field
from typing import Optional

import pytest

from vla_fastvlm_tpu.utils.cli import parse_cli


@dataclass
class Args:
    output_dir: str = "out"
    batch_size: int = 4
    learning_rate: float = 1e-4
    image_size: Optional[int] = None
    streaming: bool = False
    freeze_backbone: bool = True
    betas: tuple[float, float] = field(default_factory=lambda: (0.9, 0.95))


class TestFlags:
    def test_defaults(self):
        args = parse_cli(Args, [])
        assert args == Args()

    def test_kebab_case(self):
        args = parse_cli(Args, ["--batch-size", "8", "--learning-rate", "3e-4"])
        assert args.batch_size == 8
        assert args.learning_rate == pytest.approx(3e-4)

    def test_optional_none(self):
        args = parse_cli(Args, ["--image-size", "512"])
        assert args.image_size == 512
        args = parse_cli(Args, ["--image-size", "None"])
        assert args.image_size is None

    def test_bool_flags(self):
        args = parse_cli(Args, ["--streaming", "--no-freeze-backbone"])
        assert args.streaming is True
        assert args.freeze_backbone is False

    def test_tuple(self):
        args = parse_cli(Args, ["--betas", "0.8", "0.99"])
        assert args.betas == (0.8, 0.99)


class TestYamlConfig:
    def test_yaml_defaults_and_override(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("batch_size: 16\noutput_dir: from_yaml\n")
        args = parse_cli(Args, ["--config", str(cfg)])
        assert args.batch_size == 16
        assert args.output_dir == "from_yaml"
        # explicit flag wins over yaml
        args = parse_cli(Args, ["--config", str(cfg), "--batch-size", "2"])
        assert args.batch_size == 2

    def test_config_equals_spelling(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("batch_size: 16\n")
        args = parse_cli(Args, [f"--config={cfg}"])
        assert args.batch_size == 16

    def test_config_missing_value_errors(self, tmp_path):
        with pytest.raises(SystemExit, match="requires a path"):
            parse_cli(Args, ["--config"])
        with pytest.raises(SystemExit, match="requires a path"):
            parse_cli(Args, ["--config="])

    def test_unknown_yaml_key_rejected(self, tmp_path):
        cfg = tmp_path / "c.yaml"
        cfg.write_text("bogus_key: 1\n")
        with pytest.raises(ValueError, match="bogus_key"):
            parse_cli(Args, ["--config", str(cfg)])

    def test_repo_train_config_is_loadable(self):
        import sys
        from pathlib import Path

        scripts = Path(__file__).resolve().parent.parent / "scripts"
        sys.path.insert(0, str(scripts))
        try:
            from train import TrainArgs
        finally:
            sys.path.remove(str(scripts))
        args = parse_cli(
            TrainArgs,
            ["--config", str(scripts.parent / "configs" / "train_aloha.yaml")],
        )
        assert args.image_size == 512
        assert args.mixed_precision == "bf16"
        assert args.limit_train_samples is None
