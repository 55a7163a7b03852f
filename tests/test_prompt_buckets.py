"""Prompt-width buckets (VERDICT r2 #7).

Both servers accept requests at any width <= the largest configured bucket,
pad to the smallest covering bucket, and batch admission per bucket — one
compiled prefill program per width. Exactness anchor: the model is
pad-width invariant by construction (mask-driven attention, RoPE on true
lengths, slot-index causality), so bucketized serving must emit exactly the
tokens full-width sequential generation emits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.serving import GenerationServer, generate
from vla_fastvlm_tpu.serving.continuous_batching import (
    normalize_buckets,
    pick_bucket,
)
from vla_fastvlm_tpu.serving.paged_kv import PagedGenerationServer


@pytest.fixture(scope="module")
def vlm():
    cfg = fastvlm_tiny()
    model = FastVLM(cfg)
    ids = jnp.ones((1, 8), jnp.int32)
    imgs = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
    return cfg, model, params


def test_bucket_helpers():
    assert normalize_buckets(64) == (64,)
    assert normalize_buckets([32, 8, 16, 8]) == (8, 16, 32)
    assert pick_bucket((8, 16, 32), 5) == 8
    assert pick_bucket((8, 16, 32), 8) == 8
    assert pick_bucket((8, 16, 32), 9) == 16
    with pytest.raises(ValueError, match="exceeds"):
        pick_bucket((8, 16), 17)
    with pytest.raises(ValueError, match="invalid"):
        normalize_buckets([])


def _mixed_requests(prompt_max, size, n=6, seed=5):
    """Raw-width requests: ids arrive at their true width (no caller pad)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        length = int(rng.integers(2, prompt_max + 1))
        ids = rng.integers(3, 100, (1, length)).astype(np.int32)
        mask = np.ones((1, length), np.int32)
        img = rng.random((1, 3, size, size), dtype=np.float32)
        out.append((ids, mask, img))
    return out


def _reference_tokens(model, params, reqs, prompt_max, new):
    ids = np.zeros((len(reqs), prompt_max), np.int32)
    mask = np.zeros((len(reqs), prompt_max), np.int32)
    imgs = np.concatenate([r[2] for r in reqs])
    for i, (rid, rmask, _) in enumerate(reqs):
        ids[i, : rid.shape[1]] = rid[0]
        mask[i, : rmask.shape[1]] = rmask[0]
    return np.asarray(
        generate(model, params, jnp.asarray(imgs), jnp.asarray(ids),
                 jnp.asarray(mask), max_new_tokens=new, eos_token_id=-1)
    )


@pytest.mark.parametrize("server_kind", ["dense", "paged"])
def test_mixed_width_load_matches_sequential(vlm, server_kind):
    cfg, model, params = vlm
    prompt_max, new = 12, 5
    buckets = (4, 8, 12)
    reqs = _mixed_requests(prompt_max, cfg.image_size)
    ref = _reference_tokens(model, params, reqs, prompt_max, new)

    if server_kind == "dense":
        server = GenerationServer(
            model, params, num_slots=3, prompt_len=buckets,
            max_new_tokens=new, eos_token_id=-1,
        )
    else:
        server = PagedGenerationServer(
            model, params, num_slots=3, prompt_len=buckets,
            max_new_tokens=new, eos_token_id=-1, page_size=4,
        )
    outputs = {}
    it = iter(reqs)
    pending = next(it, None)
    while pending is not None or server.num_active:
        while pending is not None and server.has_free_slot():
            ids, mask, img = pending
            server.submit(ids, mask, img)
            pending = next(it, None)
        outputs.update(server.step())
    assert len(outputs) == len(reqs)
    for rid in sorted(outputs):
        np.testing.assert_array_equal(
            np.asarray(outputs[rid]), ref[rid], err_msg=f"request {rid}"
        )


def test_short_bucket_reserves_fewer_pages(vlm):
    """Bucketing buys paged admission capacity: a short-bucket request
    reserves pages for its bucket's worst case, not the largest bucket's."""
    cfg, model, params = vlm
    server = PagedGenerationServer(
        model, params, num_slots=2, prompt_len=(4, 12),
        max_new_tokens=4, eos_token_id=-1, page_size=4,
    )
    n_img = cfg.num_image_tokens
    short = server.pool.pages_needed(n_img + 4 + 4)
    long = server.pool.pages_needed(n_img + 12 + 4)
    assert short < long
    server.submit(np.ones((1, 3), np.int32), np.ones((1, 3), np.int32),
                  np.zeros((1, 3, 64, 64), np.float32))
    assert int(server.pool._reserved[0]) == short


def test_width_above_largest_bucket_rejected(vlm):
    cfg, model, params = vlm
    server = GenerationServer(
        model, params, num_slots=2, prompt_len=(4, 8), max_new_tokens=2,
    )
    with pytest.raises(ValueError, match="exceeds"):
        server.submit(np.ones((1, 9), np.int32), np.ones((1, 9), np.int32),
                      np.zeros((1, 3, 64, 64), np.float32))
