"""Autoregressive action-token policy (RT-2 / OpenVLA-style).

The reference's two policy stacks both regress continuous actions through
an MLP head on pooled VLM features (reference
``src/vla_fastvlm/fastvla/fastvlm_with_expert.py:23-38``,
``model/policy.py:34-49``). ``FastVLMTokenPolicy`` is the TPU framework's
second head family: actions (and the robot state) are discretized onto the
tail of the language model's vocabulary (``models/action_tokens.py``) and
the policy **decodes chunk_size x action_dim tokens autoregressively
through the VLM's own lm_head** — no head parameters at all; fine-tuning is
LoRA/QLoRA (``lora_rank > 0``) or full-backbone (``train_backbone``).
Action chunking (reference chunk interface
``lerobot_fastvla/configuration_fastvla.py:17-19``) is just a longer
fixed-length generation; multi-camera observations letterbox through the
same folded-view pass as the MLP head
(``model/fastvlm_adapter.prepare_policy_images``).

Why this exists (round-4 VERDICT #9): the MLP policy's serving step is a
single prefill — the decode-side production stack (paged KV pools, prefix
caching, continuous batching, speculative draft-verify) never engages in
closed-loop control. With the token head every control tick IS a short
generation, so closed-loop robot serving rides the same measured serving
stack as text generation (``serving/token_policy_server.py``,
``scripts/eval_closed_loop.py --action-head token --serving paged``).

Sequence layout (host-packed, right-padded — no mid-sequence padding, so
the prefill's true-last-position logits indexing applies unchanged):

    [image tokens (splice)] [prompt tokens] [state tokens (D_s)]
        -> teacher forcing appends [action tokens (D_a)]

Training: cross-entropy at the D_a action positions (fp32 softmax); the
``mse`` metric decodes the argmax tokens back to bin centers against the
continuous targets, so the loss surface stays comparable with the MLP
policy's. Inference: ``serving/generate.py`` (one jitted prefill + scanned
decode) with ``eos_token_id=-1`` emits exactly ``action_dim`` tokens.

API parity: mirrors ``FastVLAPolicy`` (``prepare_batch`` / ``loss_fn`` /
``compute_loss`` / ``forward`` / ``select_action`` / ``reset`` and the
trainable/frozen parameter split), so the Trainer and the closed-loop
runner drive either head family unchanged.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..model.fastvlm_adapter import FastVLMBackbone, prepare_policy_images
from ..models.action_tokens import ActionTokenizer
from ..models.fastvlm import FastVLM
from .configuration_fastvla import FastVLAConfig
from .processor_fastvla import FastVLAProcessor


class FastVLMTokenPolicy:
    """FastVLM + discretized autoregressive action decoding."""

    config_class = FastVLAConfig
    name = "fastvla-token"

    def __init__(self, config: FastVLAConfig | None = None) -> None:
        self.config = config or FastVLAConfig(action_head="token")
        cfg = self.config
        if cfg.action_head != "token":
            raise ValueError(
                f"FastVLMTokenPolicy requires action_head='token', got "
                f"{cfg.action_head!r}"
            )
        self.backbone = FastVLMBackbone(cfg.to_backbone_config())
        self.processor = FastVLAProcessor(cfg, self.backbone)
        mcfg = self.backbone.model_config
        self.tokenizer = ActionTokenizer(
            vocab_size=mcfg.text.vocab_size,
            num_bins=cfg.action_bins,
            low=cfg.action_token_low,
            high=cfg.action_token_high,
        )

        self.lora = None
        if cfg.lora_rank > 0:
            from ..io.lora import init_lora

            self.lora = init_lora(
                self.backbone.params,
                rank=cfg.lora_rank,
                rng=jax.random.PRNGKey(cfg.seed + 2),
                alpha=cfg.lora_alpha,
            )
        # Inference-only construction is fine with nothing trainable; the
        # training-time guard lives in trainable_params.

        self._jit_loss = jax.jit(self.loss_fn, static_argnames=("train",))
        self._jit_predict = jax.jit(self._predict_fn)

    @property
    def num_action_tokens(self) -> int:
        """Tokens decoded per observation: ``chunk_size x action_dim``
        (action chunking = a longer fixed-length generation — reference
        chunk interface ``lerobot_fastvla/configuration_fastvla.py:17-19``)."""
        return self.config.chunk_size * self.config.action_dim

    # ------------------------------------------------------------------
    # parameters (FastVLAPolicy-compatible split)

    @property
    def params(self) -> Dict:
        out = {"backbone": self.backbone.params}
        if self.lora is not None:
            out["lora"] = self.lora
        return out

    def load_params(self, params: Dict) -> None:
        self.backbone.params = params["backbone"]
        if "lora" in params:
            self.lora = params["lora"]

    def trainable_params(self) -> Dict:
        if self.lora is not None:
            return {"lora": self.lora}
        if not self.config.train_backbone:
            raise ValueError(
                "the token policy has no head parameters: train with "
                "lora_rank > 0 (QLoRA when quantized) or train_backbone=True"
            )
        return {"backbone": self.backbone.params}

    def merge_trainable(self, trainable: Dict) -> Dict:
        if "backbone" in trainable:
            merged = dict(trainable)
            if self.lora is not None:
                merged.setdefault("lora", self.lora)
            return merged
        return {"backbone": self.backbone.params, **trainable}

    def frozen_params(self) -> Dict:
        trainable = self.trainable_params()
        return {k: v for k, v in self.params.items() if k not in trainable}

    # ------------------------------------------------------------------
    # host-side batch prep

    def _pack(
        self,
        ids: np.ndarray,  # (B, L) right-padded prompt
        mask: np.ndarray,  # (B, L)
        state_tokens: np.ndarray,  # (B, D_s)
        action_tokens: Optional[np.ndarray] = None,  # (B, D_a) teacher forcing
    ):
        """Append state (and action) tokens at each row's TRUE prompt end,
        keeping the result right-padded (static width L + D_s [+ D_a])."""
        b, width = ids.shape
        extra = state_tokens.shape[1] + (
            action_tokens.shape[1] if action_tokens is not None else 0
        )
        out_ids = np.zeros((b, width + extra), np.int32)
        out_mask = np.zeros((b, width + extra), np.int32)
        lengths = mask.astype(np.int32).sum(axis=1)
        for i in range(b):
            n = int(lengths[i])
            row = [ids[i, :n], state_tokens[i]]
            if action_tokens is not None:
                row.append(action_tokens[i])
            packed = np.concatenate(row)
            out_ids[i, : packed.shape[0]] = packed
            out_mask[i, : packed.shape[0]] = 1
        return out_ids, out_mask

    def prepare_batch(self, batch: Dict) -> Dict[str, np.ndarray]:
        images = self.processor.prepare_images(batch["images"])
        states = self.processor.prepare_states(batch["states"])
        tasks = self.processor.prepare_tasks(
            batch["tasks"], batch_size=images.shape[0]
        )
        ids, mask = self.backbone._prep_text(tasks)
        state_tokens = self.tokenizer.encode(np.asarray(states))
        actions = None
        action_tokens = None
        if "actions" in batch:
            actions = np.asarray(batch["actions"], dtype=np.float32)
            chunk = self.config.chunk_size
            if chunk == 1:
                if actions.ndim == 3:  # (B, T, D) time-major -> step 0
                    actions = actions[:, 0]
            else:
                # Action chunking: supervise the first `chunk` future steps
                # as one chunk x action_dim token sequence.
                if actions.ndim != 3 or actions.shape[1] < chunk:
                    raise ValueError(
                        f"chunk_size={chunk} needs time-major actions "
                        f"(B, T >= {chunk}, D); got {actions.shape}"
                    )
                actions = actions[:, :chunk]
            action_tokens = self.tokenizer.encode(actions).reshape(
                actions.shape[0], -1
            )  # (B, chunk * D)
        out_ids, out_mask = self._pack(
            np.asarray(ids), np.asarray(mask), state_tokens, action_tokens
        )
        out = {
            "images": images,
            "input_ids": out_ids,
            "attention_mask": out_mask,
        }
        if actions is not None:
            out["actions"] = actions
            out["action_tokens"] = action_tokens
        return out

    # ------------------------------------------------------------------
    # pure compute

    def loss_fn(
        self,
        trainable: Dict,
        frozen: Dict,
        arrays: Dict[str, jnp.ndarray],
        dropout_rng: Optional[jax.Array] = None,
        train: bool = False,
    ):
        """Teacher-forced cross-entropy over the action-token positions."""
        del dropout_rng, train  # no dropout in the token path
        params = {**frozen, **trainable}
        bcfg = self.backbone.config
        mcfg = self.backbone.model_config
        images = prepare_policy_images(arrays["images"], mcfg, bcfg)
        variables = {"params": params["backbone"]}
        if "lora" in params:
            variables["lora"] = params["lora"]
        logits, seq_mask, _ = self.backbone.model.apply(
            variables,
            images,
            arrays["input_ids"],
            arrays["attention_mask"],
            method=FastVLM.forward_logits,
        )
        targets = arrays["action_tokens"].astype(jnp.int32)  # (B, chunk*D)
        b, d_a = targets.shape
        # Predictor positions: the action token for dim j sits at spliced
        # index n_img + true_len - D_a + j (right-packed rows), so the
        # logits that predict it are one position earlier.
        lengths = seq_mask.sum(axis=1)  # includes image + prompt + state + action
        pred_idx = (
            lengths[:, None] - d_a + jnp.arange(d_a, dtype=lengths.dtype)[None, :] - 1
        )  # (B, D_a)
        picked = jnp.take_along_axis(
            logits, pred_idx[:, :, None], axis=1
        )  # (B, D_a, V)
        logp = jax.nn.log_softmax(picked.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]
        loss = jnp.mean(ce)
        # Comparable quality metric: decode the argmax tokens to bin centers
        # against the continuous targets (includes the binning floor).
        # (B, chunk*D) -> the targets' shape ((B, D) or (B, chunk, D)).
        pred_actions = self.tokenizer.decode_jnp(
            jnp.argmax(picked, axis=-1)
        ).reshape(arrays["actions"].shape)
        mse = jnp.mean(
            jnp.square(pred_actions - arrays["actions"].astype(jnp.float32))
        )
        acc = jnp.mean((jnp.argmax(picked, axis=-1) == targets).astype(jnp.float32))
        return loss, {"loss": loss, "mse": mse, "token_accuracy": acc}

    def _predict_fn(self, params, images, input_ids, attention_mask):
        from ..serving.generate import generate

        mcfg = self.backbone.model_config
        bcfg = self.backbone.config
        images = prepare_policy_images(images, mcfg, bcfg)
        tokens = generate(
            self.backbone.model,
            params["backbone"],
            images,
            input_ids,
            attention_mask,
            max_new_tokens=self.num_action_tokens,
            eos_token_id=-1,  # never fires: exactly chunk*action_dim tokens
            lora=params.get("lora"),
        )
        actions = self.tokenizer.decode_jnp(tokens)  # (B, chunk*D)
        if self.config.chunk_size > 1:
            b = actions.shape[0]
            return actions.reshape(
                b, self.config.chunk_size, self.config.action_dim
            )
        return actions  # (B, action_dim)

    # ------------------------------------------------------------------
    # reference-parity API surface

    def forward(
        self,
        images,
        states,
        tasks: List[str] | str,
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        images = self.processor.prepare_images(images, device)
        states = self.processor.prepare_states(states, device)
        tasks = self.processor.prepare_tasks(tasks, batch_size=images.shape[0])
        ids, mask = self.backbone._prep_text(tasks)
        ids, mask = self._pack(
            np.asarray(ids), np.asarray(mask),
            self.tokenizer.encode(np.asarray(states)),
        )
        img = np.asarray(images, np.float32)
        if device is not None:
            img, ids, mask = (
                jax.device_put(x, device) for x in (img, ids, mask)
            )
        return self._jit_predict(self.params, img, jnp.asarray(ids), jnp.asarray(mask))

    def compute_loss(self, batch: Dict) -> Dict[str, jax.Array]:
        arrays = self.prepare_batch(batch)
        _, metrics = self._jit_loss(
            self.trainable_params(), self.frozen_params(), arrays
        )
        return metrics

    def select_action(
        self, image, state, task: str, device: Optional[jax.Device] = None
    ) -> jax.Array:
        image_batch = np.asarray(image, dtype=np.float32)[None]
        state_batch = np.asarray(state, dtype=np.float32)[None]
        return self.forward(image_batch, state_batch, task, device=device)[0]

    def reset(self) -> None:
        return
