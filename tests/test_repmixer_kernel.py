"""Fused RepMixer/ConvFFN Pallas kernel vs the unfused composition.

Interpreter-mode exactness on CPU (the virtual-mesh conftest environment);
the on-chip path is exercised by scripts/bench_repmixer.py and the model
dispatch test below.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from vla_fastvlm_tpu.ops.pallas.repmixer import (
    _repmixer_block_pallas,
    _repmixer_block_xla,
    repmixer_block,
    supports_fused_repmixer,
)


def make_args(b, h, w, c, f, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)

    def arr(*shape, scale=0.5):
        return jnp.asarray(rng.standard_normal(shape) * scale, dtype)

    x = arr(b, h, w, c, scale=1.0)
    # dirac-ish dw kernels + noise: realistic post-reparam weights
    w3 = np.zeros((3, 3, 1, c), np.float32)
    w3[1, 1, 0, :] = 1.0
    w3 = jnp.asarray(w3 + rng.standard_normal(w3.shape) * 0.1, dtype)
    w7 = np.zeros((7, 7, 1, c), np.float32)
    w7[3, 3, 0, :] = 1.0
    w7 = jnp.asarray(w7 + rng.standard_normal(w7.shape) * 0.05, dtype)
    return (
        x, w3, arr(c), w7, arr(c),
        arr(c, f, scale=c ** -0.5), arr(f),
        arr(f, c, scale=f ** -0.5), arr(c),
        arr(c, scale=0.01),
    )


CASES = [
    # (B, H, W, C, hidden): stage-1-like, stage-2-like, uneven-lane C,
    # multi-row-tile tall case
    (2, 16, 24, 128, 512),
    (1, 8, 56, 384, 1536),
    (2, 32, 24, 192, 768),
    (1, 64, 24, 128, 512),
]


class TestFusedRepMixerExactness:
    @pytest.mark.parametrize("b,h,w,c,f", CASES)
    def test_matches_unfused_f32(self, b, h, w, c, f):
        args = make_args(b, h, w, c, f)
        ref = _repmixer_block_xla(*args)
        out = _repmixer_block_pallas(*args, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_matches_unfused_bf16(self):
        args = make_args(1, 16, 24, 128, 512, dtype=jnp.bfloat16)
        ref = np.asarray(_repmixer_block_xla(*args), np.float32)
        out = np.asarray(
            _repmixer_block_pallas(*args, interpret=True), np.float32
        )
        # bf16 rounding points differ slightly (f32 accumulate + single
        # rounding in the kernel vs XLA's); bound the relative error.
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)

    def test_border_masking_is_exact(self):
        """The dw3-bias leak at image borders is the subtle failure mode:
        make biases large so any leak is far above tolerance."""
        args = list(make_args(1, 16, 24, 128, 512, seed=3))
        args[2] = args[2] + 10.0  # b3
        args[4] = args[4] + 5.0  # b7
        ref = _repmixer_block_xla(*args)
        out = _repmixer_block_pallas(*args, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5, rtol=1e-5
        )

    def test_grad_matches_unfused(self):
        """custom_vjp backward == grads of the unfused composition."""
        args = make_args(1, 8, 24, 128, 512, seed=5)

        def loss_fused(*a):
            return jnp.sum(repmixer_block(*a) ** 2)

        def loss_ref(*a):
            return jnp.sum(_repmixer_block_xla(*a) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 5, 9))(*args)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 5, 9))(*args)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4
            )


class TestModelDispatch:
    def test_repmixer_block_module_fused_matches_xla(self):
        """Model-level dispatch: same params, block_impl fused == xla."""
        from vla_fastvlm_tpu.models.fastvit import FastViTHDConfig, RepMixerBlock

        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 32)), jnp.float32)
        cfg_xla = FastViTHDConfig(block_impl="xla")
        cfg_fused = FastViTHDConfig(block_impl="fused")

        params = RepMixerBlock(cfg_xla, 4.0).init(jax.random.PRNGKey(0), x)
        ref = RepMixerBlock(cfg_xla, 4.0).apply(params, x)
        with pltpu.force_tpu_interpret_mode():
            out = RepMixerBlock(cfg_fused, 4.0).apply(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5
        )

    def test_auto_keeps_xla_while_unprofitable(self):
        """block_impl='auto' must NOT dispatch to the kernel while the
        measured-unprofitable gate (AUTO_PROFITABLE=False) holds, even on a
        TPU backend with a supported shape."""
        from vla_fastvlm_tpu.models.fastvit import FastViTHDConfig, RepMixerBlock
        from vla_fastvlm_tpu.ops.pallas import repmixer

        block = RepMixerBlock(FastViTHDConfig(block_impl="auto"), 4.0)
        x = jnp.zeros((16, 128, 128, 192), jnp.float32)
        assert repmixer.supports_fused_repmixer(tuple(x.shape), 768, backend="tpu")
        orig = jax.default_backend
        try:
            jax.default_backend = lambda: "tpu"
            assert not block._use_fused(x, 768)
            repmixer.AUTO_PROFITABLE = True
            assert block._use_fused(x, 768)
        finally:
            jax.default_backend = orig
            repmixer.AUTO_PROFITABLE = False

    def test_forced_fused_rejects_bad_shape(self):
        from vla_fastvlm_tpu.models.fastvit import FastViTHDConfig, RepMixerBlock

        x = jnp.zeros((1, 12, 30, 32), jnp.float32)  # W+8 not 8-aligned
        cfg = FastViTHDConfig(block_impl="fused")
        params = RepMixerBlock(
            FastViTHDConfig(block_impl="xla"), 4.0
        ).init(jax.random.PRNGKey(0), x)
        with pytest.raises(ValueError, match="unsupported"):
            RepMixerBlock(cfg, 4.0).apply(params, x)


class TestSupports:
    def test_rejects_cpu_backend(self):
        assert not supports_fused_repmixer((2, 32, 32, 192), 768, backend="cpu")

    def test_accepts_stage_shapes_on_tpu(self):
        # 1024px flagship: stage1 (B,128,128,192) f=768, stage2 (B,64,64,384)
        assert supports_fused_repmixer((16, 128, 128, 192), 768, backend="tpu")
        assert supports_fused_repmixer((16, 64, 64, 384), 1536, backend="tpu")
        # 256px bench config
        assert supports_fused_repmixer((128, 32, 32, 192), 768, backend="tpu")

    def test_rejects_unaligned(self):
        # W + 8 not a multiple of 8
        assert not supports_fused_repmixer((1, 32, 30, 192), 768, backend="tpu")
        # H not divisible by any row block
        assert not supports_fused_repmixer((1, 12, 32, 192), 768, backend="tpu")
