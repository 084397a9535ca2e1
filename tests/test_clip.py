"""CLIP tower + tokenizer tests.

The vendored reference tests check jit-vs-eager consistency
(CLIP/tests/test_consistency.py); without downloadable weights the analogue
here is architecture shape/causality checks and tokenizer behavior against
the published vocab (loaded by path, skipped when absent).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfd_tpu.models.clip import (
    Clip,
    DEFAULT_BPE_PATHS,
    SimpleTokenizer,
    init_clip,
    tokenize,
)

_HAS_VOCAB = any(p and os.path.exists(p) for p in DEFAULT_BPE_PATHS)


@pytest.fixture(scope="module")
def clip_model():
    return init_clip()


def test_clip_shapes(clip_model):
    model, variables = clip_model
    img = jnp.zeros((2, 224, 224, 3))
    tok = jnp.zeros((2, 77), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407)
    emb_i = model.encode_image(variables, img)
    emb_t = model.encode_text(variables, tok)
    assert emb_i.shape == (2, 512)
    assert emb_t.shape == (2, 512)
    n_params = sum(p.size for p in jax.tree.leaves(variables))
    # ViT-B/32 CLIP ≈ 151M params
    assert 140e6 < n_params < 165e6


def test_text_tower_causal(clip_model):
    """Tokens AFTER the EOT position must not affect the embedding."""
    model, variables = clip_model
    tok1 = np.zeros((1, 77), np.int32)
    tok1[0, 0] = 49406
    tok1[0, 1] = 100
    tok1[0, 2] = 49407  # EOT at position 2
    tok2 = tok1.copy()
    tok2[0, 10] = 777  # change a later position (argmax still position 2)
    e1 = model.encode_text(variables, jnp.asarray(tok1))
    e2 = model.encode_text(variables, jnp.asarray(tok2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


@pytest.mark.skipif(not _HAS_VOCAB, reason="published BPE vocab not available")
def test_tokenizer_roundtrip_properties():
    tok = SimpleTokenizer()
    ids = tok.encode("a photo of a dress")
    assert len(ids) >= 5
    assert all(0 <= i < 49408 for i in ids)
    # deterministic
    assert ids == tok.encode("a photo of a dress")
    # case-insensitive (CLIP lowercases)
    assert ids == tok.encode("A PHOTO OF A DRESS")


@pytest.mark.skipif(not _HAS_VOCAB, reason="published BPE vocab not available")
def test_tokenize_matrix():
    m = tokenize(["a dress", "a very long caption " * 30])
    assert m.shape == (2, 77)
    assert m[0, 0] == 49406  # SOT
    assert 49407 in m[0]  # EOT
    assert m[1, -1] == 49407  # truncated sequence still ends with EOT


@pytest.mark.skipif(not _HAS_VOCAB, reason="published BPE vocab not available")
def test_tokenizer_matches_reference_implementation():
    """Cross-check token ids against the reference tokenizer (pure python)."""
    import sys

    sys.path.insert(0, "/root/reference/CLIP")
    try:
        from clip.simple_tokenizer import SimpleTokenizer as RefTok
    except Exception:
        pytest.skip("reference tokenizer unavailable")
    ref = RefTok()
    ours = SimpleTokenizer()
    for text in ["a photo of a dress", "short-sleeve shirt, blue!", "3d shape of a chair"]:
        assert ours.encode(text) == ref.encode(text), text
