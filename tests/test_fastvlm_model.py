"""Shape/behavior tests for FastViTHD, FastVLM composition, and action heads.

The reference has no tests (SURVEY.md §4); these follow its implied contract:
the backbone maps (B,3,S,S) images + tokenized tasks to (B,T,H) hidden states
that get pooled to (B,H) (reference ``fastvlm_adapter.py:501-560``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vla_fastvlm_tpu.models import (
    ActionChunkHead,
    ActionExpertHead,
    FastVLM,
    FastViTHD,
    fastvithd_tiny,
    fastvlm_tiny,
    pool_hidden,
    pool_last_text_token,
)


class TestFastViTHD:
    def test_token_count_and_width(self):
        cfg = fastvithd_tiny()
        model = FastViTHD(cfg)
        x = jnp.zeros((2, 3, 64, 64))  # NCHW like the reference feed
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        # 64px / 64x downsample -> 1x1 tokens; width = 48 * 2 = 96.
        assert out.shape == (2, 1, 96)

    def test_nhwc_input_equivalent(self):
        cfg = fastvithd_tiny()
        model = FastViTHD(cfg)
        rng = np.random.default_rng(0)
        nchw = jnp.asarray(rng.random((1, 3, 128, 128), dtype=np.float32))
        nhwc = jnp.transpose(nchw, (0, 2, 3, 1))
        params = model.init(jax.random.PRNGKey(0), nchw)
        np.testing.assert_allclose(
            model.apply(params, nchw), model.apply(params, nhwc), rtol=1e-6
        )

    def test_128px_gives_4_tokens(self):
        cfg = fastvithd_tiny()
        model = FastViTHD(cfg)
        x = jnp.zeros((1, 3, 128, 128))
        params = model.init(jax.random.PRNGKey(0), x)
        assert model.apply(params, x).shape == (1, 4, 96)

    def test_jit_compiles(self):
        cfg = fastvithd_tiny()
        model = FastViTHD(cfg)
        x = jnp.zeros((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), x)
        out = jax.jit(model.apply)(params, x)
        assert out.shape == (1, 1, 96)


class TestFastVLM:
    def test_prefix_splice_shapes(self):
        cfg = fastvlm_tiny()
        assert cfg.num_image_tokens == 1  # 64px / 64x
        model = FastVLM(cfg)
        b, t = 2, 8
        images = jnp.zeros((b, 3, 64, 64))
        ids = jnp.ones((b, t), jnp.int32)
        mask = jnp.ones((b, t), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), images, ids, mask)
        hidden, seq_mask, text_mask = model.apply(params, images, ids, mask)
        assert hidden.shape == (b, t + 1, cfg.text.hidden_size)
        assert seq_mask.shape == (b, t + 1)
        assert text_mask.shape == (b, t + 1)
        assert int(text_mask[0, 0]) == 0  # image slot is not text
        assert int(seq_mask[0, 0]) == 1  # but is a real position

    def test_text_only_reference_parity_mode(self):
        cfg = fastvlm_tiny(image_token_mode="none")
        model = FastVLM(cfg)
        ids = jnp.ones((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), None, ids)
        hidden, seq_mask, text_mask = model.apply(params, None, ids)
        assert hidden.shape == (1, 4, cfg.text.hidden_size)
        np.testing.assert_array_equal(np.asarray(seq_mask), np.asarray(text_mask))

    def test_images_change_features_in_prefix_mode(self):
        cfg = fastvlm_tiny()
        model = FastVLM(cfg)
        ids = jnp.ones((1, 4), jnp.int32)
        img0 = jnp.zeros((1, 3, 64, 64))
        img1 = jnp.ones((1, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), img0, ids)
        h0, _, _ = model.apply(params, img0, ids)
        h1, _, _ = model.apply(params, img1, ids)
        assert not np.allclose(np.asarray(h0), np.asarray(h1))


class TestPooling:
    def test_last_token_respects_mask(self):
        hidden = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
        mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
        out = pool_hidden(hidden, mask, "last_token")
        np.testing.assert_allclose(out[0], hidden[0, 2])
        np.testing.assert_allclose(out[1], hidden[1, 4])

    def test_last_token_no_mask(self):
        hidden = jnp.arange(1 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 2)
        np.testing.assert_allclose(pool_hidden(hidden, None, "last_token")[0], hidden[0, -1])

    def test_mean_pool(self):
        hidden = jnp.asarray([[[2.0], [4.0], [100.0]]])
        mask = jnp.asarray([[1, 1, 0]])
        np.testing.assert_allclose(pool_hidden(hidden, mask, "mean_pool"), [[3.0]])

    def test_mean_pool_no_mask(self):
        hidden = jnp.asarray([[[3.0], [5.0]]])
        np.testing.assert_allclose(pool_hidden(hidden, None, "mean_pool"), [[4.0]])

    def test_bad_mode_raises(self):
        with pytest.raises(ValueError):
            pool_hidden(jnp.zeros((1, 2, 3)), None, "bogus")

    def test_last_text_token_with_image_prefix(self):
        # 2 image slots then 3 text (one padded): true last text pos is 3.
        hidden = jnp.arange(1 * 5 * 2, dtype=jnp.float32).reshape(1, 5, 2)
        text_mask = jnp.asarray([[0, 0, 1, 1, 0]])
        out = pool_last_text_token(hidden, text_mask)
        np.testing.assert_allclose(out[0], hidden[0, 3])


class TestActionHeads:
    def test_expert_head_shapes(self):
        head = ActionExpertHead(state_dim=14, action_dim=14, hidden_dim=32,
                                fusion_dim=32)
        feats = jnp.zeros((3, 64))
        states = jnp.zeros((3, 14))
        params = head.init(jax.random.PRNGKey(0), feats, states)
        out = head.apply(params, feats, states)
        assert out.shape == (3, 14)

    def test_dropout_stochastic_in_train_mode(self):
        head = ActionExpertHead(state_dim=4, action_dim=4, hidden_dim=16,
                                fusion_dim=16, dropout=0.5)
        feats = jnp.ones((2, 8))
        states = jnp.ones((2, 4))
        params = head.init(jax.random.PRNGKey(0), feats, states)
        d1 = head.apply(params, feats, states, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        d2 = head.apply(params, feats, states, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
        assert not np.allclose(np.asarray(d1), np.asarray(d2))
        # deterministic path is reproducible
        e1 = head.apply(params, feats, states)
        e2 = head.apply(params, feats, states)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_chunk_head_shapes(self):
        head = ActionChunkHead(state_dim=6, action_dim=7, chunk_size=5,
                               hidden_dim=16, fusion_dim=16)
        feats = jnp.zeros((2, 12))
        states = jnp.zeros((2, 6))
        params = head.init(jax.random.PRNGKey(0), feats, states)
        assert head.apply(params, feats, states).shape == (2, 5, 7)
