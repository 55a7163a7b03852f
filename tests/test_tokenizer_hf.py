"""HF tokenizer adapter through a vendored fast-tokenizer fixture.

The real Qwen2 vocab is unavailable offline (ROADMAP #6), but the HF code
path itself — ``load_tokenizer``'s AutoTokenizer branch and
``HFTokenizerAdapter``'s padding/truncation contract (reference
``fastvlm_adapter.py:361-380``) — is exercised here with a tiny byte-level
BPE built on the fly with the ``tokenizers`` library (the same Rust engine
and tokenizer.json schema Qwen2 checkpoints ship).
"""

import numpy as np
import pytest

from vla_fastvlm_tpu.io.tokenizer import (
    ByteTokenizer,
    HFTokenizerAdapter,
    load_tokenizer,
)


@pytest.fixture(scope="module")
def tiny_tokenizer_dir(tmp_path_factory):
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=400,
        special_tokens=["<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(
        [
            "pick up the red block",
            "move the arm to the left",
            "push the green button\n",
            "close the gripper",
        ],
        trainer,
    )
    out = tmp_path_factory.mktemp("tiny_tok")
    tok.save(str(out / "tokenizer.json"))
    (out / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "PreTrainedTokenizerFast", '
        '"eos_token": "<|endoftext|>", "model_max_length": 512}'
    )
    return out


class TestHFAdapter:
    def test_load_tokenizer_takes_hf_branch(self, tiny_tokenizer_dir):
        tok = load_tokenizer(str(tiny_tokenizer_dir))
        assert isinstance(tok, HFTokenizerAdapter), (
            "local dir with tokenizer.json must resolve through AutoTokenizer,"
            " not the byte fallback"
        )
        # pad token fell back to eos (Qwen2-style: no pad in vocab)
        assert tok.pad_token_id == tok._tok.eos_token_id

    def test_padding_longest_and_mask(self, tiny_tokenizer_dir):
        tok = load_tokenizer(str(tiny_tokenizer_dir))
        batch = tok(["pick up the red block\n", "close\n"], padding="longest")
        ids, mask = batch.input_ids, batch.attention_mask
        assert ids.shape == mask.shape and ids.dtype == np.int32
        lens = mask.sum(axis=1)
        assert lens[0] == ids.shape[1]  # longest row fills the width
        assert lens[1] < lens[0]
        # right padding: mask is a prefix of ones
        for row in range(2):
            assert (mask[row, : lens[row]] == 1).all()
            assert (mask[row, lens[row]:] == 0).all()
            assert (ids[row, lens[row]:] == tok.pad_token_id).all()

    def test_pad_to_max_length_and_truncation(self, tiny_tokenizer_dir):
        tok = load_tokenizer(str(tiny_tokenizer_dir))
        batch = tok(["pick up the red block"], padding="max_length", max_length=16)
        assert batch.input_ids.shape == (1, 16)
        long_text = "move the arm " * 50
        batch = tok([long_text], padding="longest", truncation=True, max_length=8)
        assert batch.input_ids.shape == (1, 8)
        assert batch.attention_mask.sum() == 8

    def test_left_padding_side(self, tiny_tokenizer_dir):
        tok = load_tokenizer(str(tiny_tokenizer_dir), padding_side="left")
        batch = tok(["pick up the red block\n", "close\n"], padding="longest")
        mask = batch.attention_mask
        lens = mask.sum(axis=1)
        row = int(np.argmin(lens))
        assert (mask[row, : mask.shape[1] - lens[row]] == 0).all()
        assert (mask[row, mask.shape[1] - lens[row]:] == 1).all()

    def test_roundtrip_decode(self, tiny_tokenizer_dir):
        tok = load_tokenizer(str(tiny_tokenizer_dir))
        text = "pick up the red block"
        ids = tok.encode(text)
        assert tok.decode(ids) == text

    def test_backbone_prep_text_through_hf_tokenizer(self, tiny_tokenizer_dir):
        """_prep_text contract (reference fastvlm_adapter.py:361-380) with a
        real fast tokenizer: longest-padding + truncation to the configured
        max, identical static shapes for ids/mask."""
        from vla_fastvlm_tpu.fastvla import FastVLAConfig, FastVLMWithExpert

        model = FastVLMWithExpert(
            FastVLAConfig(
                vlm_model_name="fastvlm-tiny",
                bootstrap_model_name="fastvlm-tiny",
                state_dim=2,
                action_dim=2,
                hidden_dim=8,
                fusion_dim=8,
                tokenizer_max_length=8,
            )
        )
        model.backbone.tokenizer = load_tokenizer(str(tiny_tokenizer_dir))
        ids, mask = model.backbone._prep_text(
            ["pick up the red block and stack it somewhere far away\n", "x\n"]
        )
        assert ids.shape == mask.shape
        assert ids.shape[1] <= 8
        assert mask[0].sum() == ids.shape[1]  # truncated row is full width


class TestByteFallback:
    def test_bare_alias_falls_back(self):
        tok = load_tokenizer("fastvlm-tiny")
        assert isinstance(tok, ByteTokenizer)
