"""Device prefetch: ordering, pass-through, lookahead, and trainer wiring."""

import numpy as np
import pytest

from vla_fastvlm_tpu.data.prefetch import device_prefetch


class TestDevicePrefetch:
    def test_order_and_values_preserved(self):
        batches = [{"x": np.full((2,), i, np.float32), "tasks": [f"t{i}"]}
                   for i in range(5)]
        out = list(device_prefetch(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])
            assert b["tasks"] == [f"t{i}"]  # non-arrays pass through

    def test_lookahead_depth(self):
        placed = []

        def tracking_placer(batch):
            placed.append(batch["i"])
            return batch

        def gen():
            for i in range(4):
                yield {"i": i}

        stream = device_prefetch(gen(), size=3, placer=tracking_placer)
        first = next(stream)
        # 3 batches were placed before the first was consumed
        assert first["i"] == 0 and placed == [0, 1, 2]
        assert [b["i"] for b in stream] == [1, 2, 3]
        assert placed == [0, 1, 2, 3]

    def test_empty_iterator(self):
        assert list(device_prefetch(iter([]), size=2)) == []

    def test_bad_size(self):
        with pytest.raises(ValueError, match="size"):
            list(device_prefetch(iter([]), size=0))

    def test_default_placer_puts_arrays_on_device(self):
        import jax

        out = list(device_prefetch(iter([{"x": np.ones((2, 2), np.float32)}])))
        assert isinstance(out[0]["x"], jax.Array)
