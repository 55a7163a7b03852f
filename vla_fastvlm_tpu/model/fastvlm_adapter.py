"""FastVLM backbone adapter: images + task strings -> pooled features.

TPU-native rebuild of reference ``src/vla_fastvlm/model/fastvlm_adapter.py``.
The public surface is the same — ``FastVLMBackboneConfig``,
``FastVLMBackbone.forward(images, tasks, device) -> (B, H)``,
``resize_with_pad`` — but the implementation inverts the reference's design:

- The VLM is in-repo Flax (``models/fastvlm.py``), not opaque HF remote code,
  so the whole pixels+text -> pooled-features path is ONE jitted XLA program.
- Image letterboxing runs on-device inside that program (the reference pins it
  to CPU per batch, ``fastvlm_adapter.py:485``, starving the accelerator).
- Tokenization pads to the static ``tokenizer_max_length`` inside jit; the
  attention mask preserves ``padding="longest"`` semantics exactly (last-token
  pooling indexes by mask sum, ``fastvlm_adapter.py:353-358``).
- The reference's ``@torch.no_grad()`` on forward (``fastvlm_adapter.py:501``)
  — backbone never receives gradients even with ``freeze_backbone=False`` —
  is reproduced via ``stop_gradient``, overridable with ``train_backbone``.

Config-resolution behaviors preserved: expected-image-size priority chain
(``fastvlm_adapter.py:245-278``), tower-name size regex (``:300-335``), the
guard rejecting ``force_image_size`` below the declared tower size
(``:144-154``), and the llava_qwen2 bootstrap loader semantics (``:183-241``,
restated in ``io/model_loader.py``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..io.model_loader import (
    infer_size_from_tower_name,
    load_fastvlm_params,
    resolve_fastvlm_config,
)
from ..io.tokenizer import load_tokenizer
from ..models.fastvlm import FastVLM, pool_hidden, pool_last_text_token
from ..ops.image import prepare_image_batch, resize_with_pad  # noqa: F401  (re-export)

logger = logging.getLogger(__name__)

ImageLike = Union[jnp.ndarray, np.ndarray, "Any"]


@dataclass
class FastVLMBackboneConfig:
    """Parity fields from reference ``fastvlm_adapter.py:58-80`` + TPU knobs."""

    model_id: str = "apple/FastVLM-0.5B"
    # Used only when loading local llava_qwen2 checkpoints missing `auto_map`.
    bootstrap_model_id: str = "apple/FastVLM-0.5B"
    freeze_backbone: bool = True
    # "last_token" | "mean_pool"
    image_feature_pool: str = "last_token"
    # Square side fed to the vision tower when nothing declares a size.
    fallback_image_size: int = 512
    # Overrides auto-detection when set.
    force_image_size: Optional[int] = None
    # Scale [0,255] input to [0,1] then ImageNet-normalize.
    normalize_imagenet: bool = False
    # Letterbox (aspect-preserving resize + pad) instead of stretch.
    resize_with_padding: bool = True
    pad_value: float = 0.0
    # Tokenizer knobs.
    tokenizer_max_length: int = 64
    pad_to_max_length: bool = False
    tokenizer_padding_side: str = "right"
    # Kept for API parity; the in-repo model has one canonical image input so
    # the reference's multi-key retry loop (``fastvlm_adapter.py:530-546``)
    # is no longer needed.
    image_key_order: Tuple[str, ...] = ("images", "pixel_values", "pixel_values_vit")

    # --- TPU-native knobs (no reference counterpart) ---
    # "prefix": splice projected image tokens before the text (what a VLA
    # needs). "none": strict reference parity — Apple's remote code drops
    # image features when the prompt has no <image> placeholder, which is
    # exactly what the reference's raw-task tokenization produces.
    image_token_mode: str = "prefix"
    # Compute/param dtypes ("bfloat16" for TPU speed, "float32" for parity).
    dtype: str = "float32"
    param_dtype: str = "float32"
    # Decoder attention implementation: "auto" (Pallas flash on TPU where
    # profitable), "flash" (force), "xla" (never).
    attention_impl: str = "auto"
    # Vision RepMixer block implementation: "auto" (fused Pallas block kernel
    # on TPU where supported), "fused" (force; errors when unsupported),
    # "xla" (unfused composition).
    vision_block_impl: str = "auto"
    # Concatenate q/k/v and gate/up kernels at apply time (one MXU matmul
    # each; measured faster at serving shapes, see models/qwen2.py).
    fused_projections: bool = True
    # Weight-only int8 decoder kernels ("none" | "int8"): params are
    # quantized after load (io/quantize.py), halving decode weight-HBM
    # traffic. Incompatible with train_backbone (the base itself cannot
    # train quantized) but composes with LoRA adapters, whose gradients
    # flow through the frozen quantized matmuls (QLoRA — io/lora.py).
    quantization: str = "none"
    # KV cache storage ("none" | "int8"): int8 halves persistent cache HBM
    # (2x slots/context per budget); dense serving paths only.
    kv_cache_quantization: str = "none"
    # jax.checkpoint the decoder blocks (memory for FLOPs; matters whenever
    # gradients traverse the decoder — train_backbone OR lora_rank > 0, since
    # LoRA grads flow through the frozen base's scanned layers).
    gradient_checkpointing: bool = False
    # Truly train the backbone (reference always stop-grads it).
    train_backbone: bool = False
    # Benchmark-only: fabricate params host-side at exact init shapes
    # (io/fabricate.py) instead of running device init — required to stand
    # up 7B-shape models on one chip (a float 7B init neither compiles fast
    # over the tunnel nor coexists with its int8 copy in 16 GB HBM). Values
    # are throughput-irrelevant; never use for numerics.
    fabricate_params: bool = False
    # Cameras per observation; >1 expects (B, ncam, C, H, W) image batches
    # and concatenates per-view visual tokens.
    num_cameras: int = 1
    seed: int = 0


def _np_dtype(name: str):
    return {"float32": np.float32, "bfloat16": jnp.bfloat16, "float16": np.float16}[name]


def prepare_policy_images(images, mcfg, cfg):
    """Model-facing image prep shared by every policy compute path.

    (B, 3, H, W) — or (B, ncam, 3, H, W) when ``mcfg.num_cameras > 1`` —
    float in [0,1] -> letterboxed/normalized batch at the tower resolution
    (multi-camera folds views into the batch dim for ONE prepare pass, the
    same MXU-friendly fold ``models/fastvlm.encode_images`` uses). Returns
    ``None`` for text-only configs. Pure jnp: runs inside jitted programs.
    Reference pipeline: ``fastvlm_adapter.py:479-488`` (pinned to CPU per
    batch there; on-device here).
    """
    if mcfg.num_image_tokens == 0:
        return None
    if mcfg.num_cameras > 1:
        b, ncam = images.shape[:2]
        folded = images.reshape((b * ncam,) + images.shape[2:])
        folded = prepare_image_batch(
            folded,
            size=mcfg.image_size,
            resize_with_padding=cfg.resize_with_padding,
            pad_value=cfg.pad_value,
            normalize=cfg.normalize_imagenet,
            dtype=mcfg.text.dtype,
        )
        return folded.reshape((b, ncam) + folded.shape[1:])
    return prepare_image_batch(
        images,
        size=mcfg.image_size,
        resize_with_padding=cfg.resize_with_padding,
        pad_value=cfg.pad_value,
        normalize=cfg.normalize_imagenet,
        dtype=mcfg.text.dtype,
    )


class FastVLMBackbone:
    """Host-side wrapper owning the Flax FastVLM, its params, and tokenizer.

    The compute path is exposed two ways:
    - ``forward(images, tasks)`` — the reference-parity eager API;
    - ``features_fn(params, images, input_ids, attention_mask)`` — a pure
      function for composition into larger jitted programs (policy loss,
      train step).
    """

    def __init__(self, config: FastVLMBackboneConfig | None = None) -> None:
        self.config = config or FastVLMBackboneConfig()
        cfg = self.config

        dtype = _np_dtype(cfg.dtype)
        param_dtype = _np_dtype(cfg.param_dtype)
        self.model_config, self._raw_hf_config = resolve_fastvlm_config(
            cfg.model_id,
            bootstrap_model_id=cfg.bootstrap_model_id,
            dtype=dtype,
            param_dtype=param_dtype,
            image_token_mode=cfg.image_token_mode,
        )

        # ---- expected image size (priority chain, reference :245-278) ----
        self.expected_size = self._resolve_expected_image_size()
        declared_size, tower_name = self._resolve_declared_tower_size()
        if (
            declared_size is not None
            and cfg.force_image_size is not None
            and int(self.expected_size) < int(declared_size)
        ):
            raise ValueError(
                "Configured image_size is too small for this FastVLM vision tower. "
                f"force_image_size={self.expected_size}, tower={tower_name}, "
                f"required>={declared_size}. Set image_size to the declared tower "
                "size (e.g. 1024) or leave it unset (None) for auto-detection."
            )
        self.model_config = self.model_config.replace(
            image_size=int(self.expected_size),
            num_cameras=int(cfg.num_cameras),
            text=self.model_config.text.replace(
                attention_impl=cfg.attention_impl,
                remat=cfg.gradient_checkpointing,
                fused_projections=cfg.fused_projections,
                quantization=cfg.quantization,
                kv_cache_quantization=cfg.kv_cache_quantization,
            ),
            vision=self.model_config.vision.replace(
                block_impl=cfg.vision_block_impl,
            ),
        )

        self.model = FastVLM(self.model_config)
        self.tokenizer = load_tokenizer(
            cfg.model_id, padding_side=cfg.tokenizer_padding_side
        )
        self.output_dim = int(self.model_config.text.hidden_size)

        self.params = self._load_or_init_params()
        if cfg.quantization != "none":
            if cfg.train_backbone:
                raise ValueError(
                    "quantization is inference-only: incompatible with "
                    "train_backbone=True"
                )
            from ..device import place_params, tree_to_host
            from ..io.quantize import quantize_params

            if cfg.quantization == "int4":
                # int4 must quantize HOST-side then stage through
                # ``place_params``: a jit call cannot relayout an s4
                # argument, and s4 device arrays cannot D2H-fetch on this
                # backend (device.py note) — so never create one except as
                # the canonical-layout output of the staging cast.
                self.params = place_params(
                    quantize_params(
                        tree_to_host(self.params), mode="int4"
                    )
                )
            else:
                self.params = quantize_params(
                    self.params, mode=cfg.quantization
                )
        if cfg.fabricate_params and cfg.quantization != "int4":
            # Fabricated trees are host numpy (quantization must run host-side
            # for 7B — the float tree does not fit the chip). Place them ONCE:
            # jitted calls with numpy leaves re-transfer the whole tree every
            # step, which on the tunnel turns a ~0.5 s 7B step into ~5 min.
            # (place_params = device_put + the int4 layout staging; the int4
            # branch above already placed — re-placing a staged s4 tree is a
            # pointless full-tree repack.)
            from ..device import place_params

            self.params = place_params(self.params)
        self._jitted_forward = jax.jit(self._forward_impl)
        logger.info(
            "[FastVLMBackbone] expected (S,S) = (%d,%d)",
            self.expected_size,
            self.expected_size,
        )

    # ------------------------------------------------------------------
    # loading

    def _load_or_init_params(self):
        cfg = self.config
        if cfg.fabricate_params:
            from ..io.fabricate import fabricate_like

            return fabricate_like(self._init_shapes(), seed=cfg.seed)
        params = None
        if Path(cfg.model_id).is_dir():
            params = load_fastvlm_params(cfg.model_id, self.model_config)
        if params is not None:
            init = self._init_params()
            # Overlay converted weights onto the randomly initialized tree so
            # partially-convertible checkpoints (e.g. decoder-only) still run.
            params = _deep_merge(init, params)
        else:
            params = self._init_params()
        return params

    def _init_method(self):
        """Init through ``forward_logits`` when the decoder is untied.

        Untied presets (7B) keep a separate ``lm_head`` Dense that the
        feature path (``__call__``) never touches, and Flax only creates
        params for modules the init trace uses — so a feature-only init
        yields a tree with NO ``lm_head`` leaf and every logits surface
        (generation servers, the action-token policy) dies with a KeyError
        at 7B while tied presets (tiny/0.5B/1.5B) work. ``forward_logits``
        traces the identical tree plus the head. Costs untied feature-only
        policies the head's storage (~0.5 GB int8 at 7B) — the backbone
        owns the FULL FastVLM by contract."""
        from ..models.fastvlm import FastVLM

        if self.model_config.text.tie_word_embeddings:
            return None  # __call__ already creates every param
        return FastVLM.forward_logits

    def _init_params(self):
        variables = self.model.init(
            jax.random.PRNGKey(self.config.seed),
            *self._dummy_inputs(),
            method=self._init_method(),
        )
        return variables["params"]

    def _dummy_inputs(self):
        cfg = self.model_config
        b, t = 1, self.config.tokenizer_max_length
        dummy_ids = jnp.zeros((b, t), jnp.int32)
        if cfg.num_image_tokens == 0:
            dummy_imgs = None
        elif cfg.num_cameras > 1:
            dummy_imgs = jnp.zeros(
                (b, cfg.num_cameras, 3, cfg.image_size, cfg.image_size),
                cfg.text.dtype,
            )
        else:
            dummy_imgs = jnp.zeros(
                (b, 3, cfg.image_size, cfg.image_size), cfg.text.dtype
            )
        return dummy_imgs, dummy_ids

    def _init_shapes(self):
        """Abstract init param tree (no tracing on device)."""
        imgs, ids = self._dummy_inputs()
        method = self._init_method()
        return jax.eval_shape(
            lambda: self.model.init(
                jax.random.PRNGKey(self.config.seed), imgs, ids, method=method
            )["params"]
        )

    # ------------------------------------------------------------------
    # size resolution (parity with reference :245-335)

    def _resolve_expected_image_size(self) -> int:
        cfg = self.config
        if cfg.force_image_size is not None:
            return int(cfg.force_image_size)

        raw = self._raw_hf_config or {}
        vision_cfg = raw.get("vision_config") or {}
        img_size = vision_cfg.get("image_size")
        if isinstance(img_size, (int, float)):
            return int(img_size)
        if isinstance(img_size, (tuple, list)) and len(img_size) > 0:
            return int(img_size[0])

        tower_size, _ = self._resolve_declared_tower_size()
        if tower_size is not None:
            return int(tower_size)

        # Processor-declared size (reference step 2, ``fastvlm_adapter.py:
        # 266-275``): local checkpoints may ship preprocessor_config.json.
        proc_size = self._resolve_processor_size()
        if proc_size is not None:
            return int(proc_size)

        if self._raw_hf_config is None:
            # Preset path: the preset's own declared size.
            return int(self.model_config.image_size)
        return int(cfg.fallback_image_size)

    def _resolve_processor_size(self) -> Optional[int]:
        model_dir = Path(self.config.model_id)
        if not model_dir.is_dir():
            return None
        proc_path = model_dir / "preprocessor_config.json"
        if not proc_path.is_file():
            return None
        import json

        try:
            with open(proc_path, encoding="utf-8") as f:
                proc = json.load(f)
        except Exception:
            return None
        size = proc.get("size")
        if isinstance(size, dict):
            h = size.get("height") or size.get("shortest_edge") or size.get("max_height")
            if isinstance(h, (int, float)):
                return int(h)
        if isinstance(size, (int, float)):
            return int(size)
        return None

    def _resolve_declared_tower_size(self) -> tuple[Optional[int], Optional[str]]:
        raw = self._raw_hf_config or {}
        candidates = [raw.get("mm_vision_tower"), raw.get("vision_tower")]
        vision_cfg = raw.get("vision_config") or {}
        candidates.append(vision_cfg.get("model_name"))
        candidates.append(vision_cfg.get("name_or_path"))
        for tower_name in candidates:
            tower_size = infer_size_from_tower_name(tower_name)
            if tower_size is not None:
                return tower_size, str(tower_name)
        return None, None

    # behavior-parity alias (reference staticmethod name)
    _infer_size_from_tower_name = staticmethod(infer_size_from_tower_name)

    # ------------------------------------------------------------------
    # text

    def _prep_text(self, tasks: List[str]) -> tuple[np.ndarray, np.ndarray]:
        """Tokenize tasks to static (B, T) int32 ids + mask.

        The jitted program always sees width ``tokenizer_max_length``;
        ``pad_to_max_length=False`` ("longest") differs only in mask content,
        never in shape — pooled features are identical because pooling is
        mask-driven (reference ``fastvlm_adapter.py:353-358``).
        """
        cfg = self.config
        batch = self.tokenizer(
            tasks,
            padding="max_length",
            truncation=True,
            max_length=cfg.tokenizer_max_length,
        )
        return batch.input_ids, batch.attention_mask

    # ------------------------------------------------------------------
    # images

    def _as_bchw(self, images) -> np.ndarray:
        """Normalize PIL / numpy / jax arrays (BCHW/BHWC/CHW/HWC/lists) to
        float32 BCHW — behavior of reference ``_as_bchw``
        (``fastvlm_adapter.py:384-442``)."""

        def one_to_chw(x) -> np.ndarray:
            if hasattr(x, "convert"):  # PIL image
                x = np.asarray(x)
            arr = np.asarray(x)
            if arr.ndim == 3:
                if arr.shape[0] in (1, 3):
                    return arr.astype(np.float32)
                if arr.shape[-1] in (1, 3):
                    return np.transpose(arr, (2, 0, 1)).astype(np.float32)
                raise ValueError(f"Unsupported array shape: {arr.shape}")
            if arr.ndim == 2:
                return arr[None].astype(np.float32)
            raise ValueError(f"Unsupported tensor shape: {tuple(arr.shape)}")

        if isinstance(images, (list, tuple)):
            return np.stack([one_to_chw(img) for img in images], axis=0)
        arr = np.asarray(images) if not isinstance(images, (np.ndarray, jnp.ndarray)) else images
        arr = np.asarray(arr)
        if arr.ndim == 5:  # (B, ncam, C, H, W) multi-camera batch
            if arr.shape[-1] in (1, 3) and arr.shape[2] not in (1, 3):
                arr = np.transpose(arr, (0, 1, 4, 2, 3))
            return arr.astype(np.float32)
        if arr.ndim == 4:
            if arr.shape[-1] in (1, 3) and arr.shape[1] not in (1, 3):
                arr = np.transpose(arr, (0, 3, 1, 2))
            return arr.astype(np.float32)
        return one_to_chw(arr)[None]

    # ------------------------------------------------------------------
    # forward

    def _forward_impl(self, params, images, input_ids, attention_mask,
                      lora=None):
        cfg = self.config
        mcfg = self.model_config
        images = prepare_policy_images(images, mcfg, cfg)
        variables = {"params": params}
        if lora is not None:
            variables["lora"] = lora
        hidden, seq_mask, text_mask = self.model.apply(
            variables, images, input_ids, attention_mask
        )
        if cfg.image_feature_pool == "mean_pool":
            pooled = pool_hidden(hidden, text_mask, "mean_pool")
        else:
            pooled = pool_last_text_token(hidden, text_mask)
        if not cfg.train_backbone and lora is None:
            # Reference parity: backbone forward is @torch.no_grad()
            # (``fastvlm_adapter.py:501``) regardless of freeze_backbone.
            # With LoRA mounted the gradient MUST flow through the backbone
            # to reach the adapters; the base params stay frozen because
            # the trainer differentiates the trainable sub-tree only
            # (fastvla/modeling_fastvla.py::loss_fn).
            pooled = jax.lax.stop_gradient(pooled)
        return pooled

    def features_fn(self, params, images, input_ids, attention_mask,
                    lora=None):
        """Pure feature extractor for composition into jitted programs.

        ``lora``: optional ``"lora"`` collection tree (``io/lora.py``) —
        mounts low-rank adapters on the decoder projections and keeps the
        feature path differentiable w.r.t. them."""
        return self._forward_impl(
            params, images, input_ids, attention_mask, lora=lora
        )

    def forward(
        self,
        images,
        tasks: List[str],
        device: Optional[jax.Device] = None,
    ) -> jax.Array:
        """(images, task strings) -> (B, H) pooled features."""
        img = self._as_bchw(images)
        ids, mask = self._prep_text(tasks)
        if device is not None:
            img = jax.device_put(img, device)
            ids = jax.device_put(ids, device)
            mask = jax.device_put(mask, device)
        return self._jitted_forward(self.params, img, ids, mask)

    __call__ = forward

    # Compat: old call style `self.backbone(images, tasks, device=...)`
    # (reference ``fastvlm_adapter.py:562-564``).
    def backbone(self, images, tasks, device=None, **kwargs):
        return self.forward(images, tasks, device=device)


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for key, value in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out
