"""Continuous-batching server: outputs must match offline greedy generation.

The strongest invariant available: a request admitted mid-flight into a busy
server must produce exactly the tokens the standalone ``generate`` path
produces for the same prompt (greedy, same weights).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import FastVLM, fastvlm_tiny
from vla_fastvlm_tpu.serving import GenerationServer, generate

PROMPT_LEN = 8
MAX_NEW = 5
EOS = 2


@pytest.fixture(scope="module")
def vlm():
    cfg = fastvlm_tiny()
    model = FastVLM(cfg)
    ids = jnp.ones((1, PROMPT_LEN), jnp.int32)
    imgs = jnp.zeros((1, 3, 64, 64))
    params = model.init(jax.random.PRNGKey(0), imgs, ids)["params"]
    return cfg, model, params


def make_prompt(rng, length):
    ids = np.zeros((1, PROMPT_LEN), np.int32)
    mask = np.zeros((1, PROMPT_LEN), np.int32)
    ids[0, :length] = rng.integers(3, 100, length)
    mask[0, :length] = 1
    return ids, mask


def offline(model, params, images, ids, mask):
    return np.asarray(
        generate(model, params, images, jnp.asarray(ids), jnp.asarray(mask),
                 max_new_tokens=MAX_NEW, eos_token_id=EOS)
    )[0]


class TestGenerationServer:
    def test_single_request_matches_offline(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(0)
        ids, mask = make_prompt(rng, 5)
        images = np.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))

        server = GenerationServer(model, params, num_slots=2,
                                  prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW,
                                  eos_token_id=EOS)
        rid = server.submit(ids, mask, images)
        outputs = server.run_to_completion()
        ref = offline(model, params, jnp.asarray(images), ids, mask)
        got = np.asarray(outputs[rid])
        # offline pads with eos after finish; compare up to the server length
        np.testing.assert_array_equal(got, ref[: len(got)])

    def test_staggered_admission_matches_offline(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(1)
        prompts = [make_prompt(rng, n) for n in (4, 6, 8)]
        images = [
            np.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))
            for _ in prompts
        ]

        server = GenerationServer(model, params, num_slots=2,
                                  prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW,
                                  eos_token_id=EOS)
        rid0 = server.submit(*prompts[0], images[0])
        rid1 = server.submit(*prompts[1], images[1])
        outputs = {}
        outputs.update(server.step())  # advance with 2 active
        outputs.update(server.step())
        # third request arrives mid-flight; needs a free slot eventually
        rid2 = None
        for _ in range(MAX_NEW + 2):
            if server.has_free_slot() and rid2 is None:
                rid2 = server.submit(*prompts[2], images[2])
            outputs.update(server.step())
            if rid2 is not None and len(outputs) == 3:
                break
        outputs.update(server.run_to_completion())

        assert rid2 is not None
        for rid, (ids, mask), img in zip([rid0, rid1, rid2], prompts, images):
            ref = offline(model, params, jnp.asarray(img), ids, mask)
            got = np.asarray(outputs[rid])
            np.testing.assert_array_equal(got, ref[: len(got)])

    def test_interleaved_load_matches_offline(self, vlm):
        """VERDICT r1 #8 load test: many requests admitted in bursts,
        interleaved with decode ticks, some batched through one prefill
        program — every output must equal sequential generation."""
        cfg, model, params = vlm
        rng = np.random.default_rng(7)
        n_requests = 6
        prompts = [make_prompt(rng, int(rng.integers(2, PROMPT_LEN + 1)))
                   for _ in range(n_requests)]
        images = [np.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))
                  for _ in range(n_requests)]

        server = GenerationServer(
            model, params, num_slots=3, prompt_len=PROMPT_LEN,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, prefill_batch=2,
        )
        rids = {}
        outputs = {}
        next_req = 0
        for _ in range(60):
            # admit in bursts of up to 2 (exercises full + padded admission)
            burst = 0
            while (next_req < n_requests and server.has_free_slot()
                   and burst < 2):
                rids[next_req] = server.submit(
                    *prompts[next_req], images[next_req]
                )
                next_req += 1
                burst += 1
            outputs.update(server.step())
            if next_req == n_requests and not server.num_active:
                break
        outputs.update(server.run_to_completion())

        assert len(outputs) == n_requests
        for req, rid in rids.items():
            ref = offline(
                model, params, jnp.asarray(images[req]), *prompts[req]
            )
            got = np.asarray(outputs[rid])
            np.testing.assert_array_equal(
                got, ref[: len(got)], err_msg=f"request {req}"
            )

    def test_tp_sharded_server_matches_offline(self, vlm):
        """GenerationServer on a TP mesh (params + kv-head-sharded cache)
        produces the same tokens as single-device offline generation."""
        import jax as _jax

        from vla_fastvlm_tpu.parallel import make_mesh

        cfg, model, params = vlm
        mesh = make_mesh(data=1, model=2, devices=_jax.devices()[:2])
        rng = np.random.default_rng(21)
        server = GenerationServer(
            model, params, num_slots=2, prompt_len=PROMPT_LEN,
            max_new_tokens=MAX_NEW, eos_token_id=EOS, prefill_batch=2,
            mesh=mesh,
        )
        prompts = [make_prompt(rng, n) for n in (5, 7)]
        images = [np.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))
                  for _ in prompts]
        rids = [server.submit(*p, img) for p, img in zip(prompts, images)]
        outputs = server.run_to_completion()
        for rid, (ids, mask), img in zip(rids, prompts, images):
            ref = offline(model, params, jnp.asarray(img), ids, mask)
            got = np.asarray(outputs[rid])
            np.testing.assert_array_equal(got, ref[: len(got)])

    def test_slot_exhaustion_raises(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(2)
        server = GenerationServer(model, params, num_slots=1,
                                  prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW,
                                  eos_token_id=EOS)
        ids, mask = make_prompt(rng, 4)
        img = np.zeros((1, 3, 64, 64), np.float32)
        server.submit(ids, mask, img)
        with pytest.raises(RuntimeError, match="free generation slots"):
            server.submit(ids, mask, img)

    def test_prompt_len_guard(self, vlm):
        """Shorter prompts now pad to the bucket (tests/test_prompt_buckets);
        only widths beyond the largest compiled bucket are rejected."""
        cfg, model, params = vlm
        server = GenerationServer(model, params, num_slots=1,
                                  prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW)
        too_wide = PROMPT_LEN + 1
        with pytest.raises(ValueError, match="exceeds"):
            server.submit(np.zeros((1, too_wide), np.int32),
                          np.zeros((1, too_wide), np.int32),
                          np.zeros((1, 3, 64, 64), np.float32))


class TestStepN:
    """step_n: N decode ticks as one scanned program (the action-token
    serving tick). Greedy outputs must be token-identical to per-tick
    stepping — both are compared against the offline generate reference."""

    def _submit_all(self, server, rng, lengths):
        prompts = [make_prompt(rng, n) for n in lengths]
        images = [np.asarray(rng.random((1, 3, 64, 64), dtype=np.float32))
                  for _ in prompts]
        rids = [server.submit(*p, img) for p, img in zip(prompts, images)]
        return prompts, images, rids

    def test_matches_offline_and_per_tick(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(31)
        server = GenerationServer(
            model, params, num_slots=3, prompt_len=PROMPT_LEN,
            max_new_tokens=MAX_NEW, eos_token_id=-1, prefill_batch=2,
        )
        prompts, images, rids = self._submit_all(server, rng, (4, 6, 8))
        outputs = server.step_n(MAX_NEW)
        # all three finish in the single scanned program
        assert set(outputs) == set(rids)
        for rid, (ids, mask), img in zip(rids, prompts, images):
            ref = np.asarray(
                generate(model, params, jnp.asarray(img), jnp.asarray(ids),
                         jnp.asarray(mask), max_new_tokens=MAX_NEW,
                         eos_token_id=-1)
            )[0]
            np.testing.assert_array_equal(np.asarray(outputs[rid]), ref)

    def test_partial_budget_then_drain(self, vlm):
        """Mixed remaining: one slot a tick ahead caps n_eff; the rest of
        the tail drains exactly."""
        cfg, model, params = vlm
        rng = np.random.default_rng(32)
        server = GenerationServer(
            model, params, num_slots=3, prompt_len=PROMPT_LEN,
            max_new_tokens=MAX_NEW, eos_token_id=-1, prefill_batch=2,
        )
        (ids0, mask0), img0 = make_prompt(rng, 5), np.asarray(
            rng.random((1, 3, 64, 64), dtype=np.float32))
        rid0 = server.submit(ids0, mask0, img0)
        server.step()  # admit + 1 tick: rid0 a tick ahead
        (ids1, mask1), img1 = make_prompt(rng, 7), np.asarray(
            rng.random((1, 3, 64, 64), dtype=np.float32))
        rid1 = server.submit(ids1, mask1, img1)
        outputs = {}
        while len(outputs) < 2:
            outputs.update(server.step_n(MAX_NEW))
        for rid, ids, mask, img in ((rid0, ids0, mask0, img0),
                                    (rid1, ids1, mask1, img1)):
            ref = np.asarray(
                generate(model, params, jnp.asarray(img), jnp.asarray(ids),
                         jnp.asarray(mask), max_new_tokens=MAX_NEW,
                         eos_token_id=-1)
            )[0]
            np.testing.assert_array_equal(np.asarray(outputs[rid]), ref)

    def test_eos_guard(self, vlm):
        cfg, model, params = vlm
        rng = np.random.default_rng(33)
        server = GenerationServer(
            model, params, num_slots=2, prompt_len=PROMPT_LEN,
            max_new_tokens=MAX_NEW, eos_token_id=EOS,
        )
        ids, mask = make_prompt(rng, 5)
        server.submit(ids, mask, np.zeros((1, 3, 64, 64), np.float32))
        with pytest.raises(ValueError, match="eos_token_id"):
            server.step_n(MAX_NEW)

    def test_speculative_refuses_step_n(self, vlm):
        from vla_fastvlm_tpu.serving import SpeculativeGenerationServer

        cfg, model, params = vlm
        server = SpeculativeGenerationServer(
            model, params, model, params, k=2, num_slots=2,
            prompt_len=PROMPT_LEN, max_new_tokens=MAX_NEW, eos_token_id=-1,
        )
        with pytest.raises(NotImplementedError, match="draft"):
            server.step_n(MAX_NEW)
