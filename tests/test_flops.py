"""utils/flops: XLA-cost-model FLOP extraction + MFU arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.utils.flops import compiled_flops, device_peak_flops, mfu


class TestCompiledFlops:
    def test_matmul_flops_match_analytic(self):
        m, k, n = 256, 128, 512

        def f(a, b):
            return a @ b

        compiled = (
            jax.jit(f)
            .lower(
                jax.ShapeDtypeStruct((m, k), jnp.float32),
                jax.ShapeDtypeStruct((k, n), jnp.float32),
            )
            .compile()
        )
        flops = compiled_flops(compiled)
        assert flops is not None
        # XLA counts 2*M*K*N for a matmul
        assert flops == pytest.approx(2 * m * k * n, rel=0.05)

    def test_unknown_device_peak_is_none(self):
        # conftest forces the CPU platform
        assert device_peak_flops(jax.devices()[0]) is None


class TestMfu:
    def test_mfu_math(self):
        class FakeDevice:
            device_kind = "TPU v5 lite"

        # 197e12 peak: 1.97e12 FLOP in 10ms on 1 chip = 100% of peak
        assert mfu(1.97e12, 0.01, n_chips=1, device=FakeDevice()) == pytest.approx(1.0)
        assert mfu(1.97e12, 0.01, n_chips=2, device=FakeDevice()) == pytest.approx(0.5)

    def test_mfu_none_paths(self):
        class FakeDevice:
            device_kind = "TPU v5 lite"

        assert mfu(None, 0.01, device=FakeDevice()) is None
        assert mfu(1e12, 0.0, device=FakeDevice()) is None
        assert mfu(1e12, 0.01, device=jax.devices()[0]) is None  # cpu: no peak
