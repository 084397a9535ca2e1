"""CLIP ViT-B/32 (image + text towers) in Flax, with BPE tokenizer and a
torch-checkpoint converter.

Re-implementation of the towers the reference vendors
(/root/reference/CLIP/clip/model.py:243-436: `CLIP`, `VisionTransformer`,
text transformer; loader/tokenize at CLIP/clip/clip.py:94-237) — only the
pieces Surf-D uses: `encode_image` / `encode_text` producing 512-d embeddings
(conditioning context, models/mdm.py:86-89; sketch/image encodes at
training_loop_single.py:207-208 and sample/generate_sketch.py:74-82).
Outputs are UNnormalized projections, matching those call sites.

Weights: CLIP is frozen everywhere in Surf-D, so weights are an interchange
artifact, not a training concern — `convert_torch_clip_state_dict` maps an
OpenAI CLIP .pt state_dict (torch CPU load) onto this module's params, and
`save/load_clip_params` round-trips them as npz.

Tokenizer: byte-pair encoding written from the published algorithm; the
merge table is loaded from the standard `bpe_simple_vocab_16e6.txt.gz` (pure
data, path-configurable — not vendored into this repo).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        # pre-LN transformer block (CLIP/clip/model.py:190-204)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        mask = None
        if self.causal:
            T = x.shape[1]
            mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.width, name="attn"
        )(h, h, mask=mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(self.width * 4, name="mlp_fc")(h)
        h = QuickGELU()(h)
        h = nn.Dense(self.width, name="mlp_proj")(h)
        return x + h


class VisionTower(nn.Module):
    """ViT-B/32 image encoder (CLIP/clip/model.py:206-241)."""

    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    out_dim: int = 512

    @nn.compact
    def __call__(self, images):
        # images: (B, H, W, 3) normalized
        B = images.shape[0]
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            name="conv1",
        )(images)
        x = x.reshape(B, -1, self.width)  # (B, 49, width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (x.shape[1], self.width),
        )
        x = x + pos
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width**-0.5), (self.width, self.out_dim)
        )
        return x @ proj


class TextTower(nn.Module):
    """Causal text transformer (CLIP/clip/model.py:330-345 encode_text)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    out_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        # tokens: (B, 77) int32
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, causal=True, name=f"block_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # take features at the EOT token (highest token id per sequence)
        eot = tokens.argmax(axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.out_dim),
        )
        return x @ proj


class Clip(nn.Module):
    """Both towers under one param tree, ViT-B/32 configuration."""

    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    embed_dim: int = 512
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12

    def setup(self):
        # one head per 64 channels — the published CLIP rule
        # (CLIP/clip/model.py build_model:399-436 infers the whole config
        # from the state dict the same way)
        self.visual = VisionTower(
            image_size=self.image_size, patch_size=self.patch_size,
            width=self.vision_width, layers=self.vision_layers,
            heads=max(self.vision_width // 64, 1), out_dim=self.embed_dim,
            name="visual",
        )
        self.text = TextTower(
            vocab_size=self.vocab_size, context_length=self.context_length,
            width=self.text_width, layers=self.text_layers,
            heads=max(self.text_width // 64, 1), out_dim=self.embed_dim,
            name="text",
        )

    def __call__(self, images, tokens):
        return self.visual(images), self.text(tokens)

    def encode_image(self, variables, images):
        return self.apply(variables, images, method=lambda m, im: m.visual(im))

    def encode_text(self, variables, tokens):
        return self.apply(variables, tokens, method=lambda m, tk: m.text(tk))


def init_clip(rng=None, **cfg):
    model = Clip(**cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(
        rng,
        jnp.zeros((1, model.image_size, model.image_size, 3)),
        jnp.zeros((1, model.context_length), jnp.int32),
    )
    return model, variables


def clip_config_from_shapes(shape_of) -> dict:
    """Infer the tower configuration from parameter shapes — the same
    inference the reference performs on a raw state dict
    (CLIP/clip/model.py build_model:399-436). `shape_of(key)` maps a
    'params/...'-style flat key to its shape."""
    import math

    conv = shape_of("params/visual/conv1/kernel")  # (p, p, 3, width)
    npos = shape_of("params/visual/positional_embedding")[0]
    grid = int(math.isqrt(npos - 1))
    layers = 0
    while True:
        try:
            shape_of(f"params/visual/block_{layers}/ln_1/scale")
            layers += 1
        except KeyError:
            break
    tlayers = 0
    while True:
        try:
            shape_of(f"params/text/block_{tlayers}/ln_1/scale")
            tlayers += 1
        except KeyError:
            break
    vocab, twidth = shape_of("params/text/token_embedding/embedding")
    return dict(
        patch_size=int(conv[0]),
        vision_width=int(conv[3]),
        image_size=int(conv[0]) * grid,
        vision_layers=layers,
        embed_dim=int(shape_of("params/visual/proj")[1]),
        vocab_size=int(vocab),
        context_length=int(shape_of("params/text/positional_embedding")[0]),
        text_width=int(twidth),
        text_layers=tlayers,
    )


def clip_config_from_variables(variables) -> dict:
    import jax.tree_util as jtu

    flat = {}
    for kp, leaf in jtu.tree_flatten_with_path(variables)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        flat[key] = tuple(np.shape(leaf))

    def shape_of(key):
        return flat[key]

    return clip_config_from_shapes(shape_of)


# ---------------------------------------------------------------------------
# Tokenizer (BPE)
# ---------------------------------------------------------------------------

DEFAULT_BPE_PATHS = (
    os.environ.get("SURFD_CLIP_BPE", ""),
    # packaged merge list (pure data, shipped in the wheel): the exact
    # 48894-merge slice the tokenizer consumes, no version header
    os.path.join(os.path.dirname(__file__), os.pardir, "assets", "clip_bpe_merges.txt.gz"),
    "/root/reference/CLIP/clip/bpe_simple_vocab_16e6.txt.gz",
)


@functools.lru_cache()
def _bytes_to_unicode():
    """Reversible byte→unicode map (standard GPT-2/CLIP construction)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class SimpleTokenizer:
    """CLIP BPE tokenizer (algorithmic re-implementation; merge table loaded
    from the standard published vocab file)."""

    def __init__(self, bpe_path: Optional[str] = None):
        if bpe_path is None:
            bpe_path = next((p for p in DEFAULT_BPE_PATHS if p and os.path.exists(p)), None)
        if bpe_path is None:
            raise FileNotFoundError(
                "CLIP BPE vocab not found; set SURFD_CLIP_BPE to "
                "bpe_simple_vocab_16e6.txt.gz"
            )
        self.byte_encoder = _bytes_to_unicode()
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        if merges and merges[0].startswith('"'):
            # published bpe_simple_vocab_16e6 format: version header + full
            # 262k list, of which only this slice is consumed
            merges = merges[1 : 49152 - 256 - 2 + 1]
        else:
            # packaged format: exactly the consumed merges, no header
            merges = [m for m in merges if m][: 49152 - 256 - 2]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        # The published pattern uses unicode classes \p{L}/\p{N}, which need
        # the third-party `regex` module; stdlib `re` lacks them, so when
        # `regex` is unavailable we fall back to ASCII classes (identical on
        # English prompts, mistokenizes other scripts — warned in encode()).
        try:
            import regex as re

            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
                re.IGNORECASE,
            )
            self.unicode_ok = True
        except ImportError:
            import re

            self.pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
                re.IGNORECASE,
            )
            self.unicode_ok = False
        self._re = re

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        text = html.unescape(html.unescape(text)).strip().lower()
        text = self._re.sub(r"\s+", " ", text)
        ids = []
        for token in self._re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids


_TOKENIZER: Optional[SimpleTokenizer] = None


def tokenize(texts, context_length: int = 77, truncate: bool = True, bpe_path=None):
    """Texts → (B, 77) int32 token matrix (CLIP/clip/clip.py:197-237)."""
    global _TOKENIZER
    if _TOKENIZER is None:
        _TOKENIZER = SimpleTokenizer(bpe_path)
    tok = _TOKENIZER
    if isinstance(texts, str):
        texts = [texts]
    sot = tok.encoder["<|startoftext|>"]
    eot = tok.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, t in enumerate(texts):
        ids = [sot] + tok.encode(t) + [eot]
        if len(ids) > context_length:
            if not truncate:
                raise ValueError(f"text too long: {t!r}")
            ids = ids[:context_length]
            ids[-1] = eot
        out[i, : len(ids)] = ids
    return out


# ---------------------------------------------------------------------------
# Weight interchange
# ---------------------------------------------------------------------------


def convert_torch_clip_state_dict(sd) -> dict:
    """OpenAI CLIP ViT-B/32 torch state_dict → this module's param tree.

    Accepts tensors or numpy arrays keyed by the published names
    (CLIP/clip/model.py build_model:399-436 layout).
    """
    def g(name):
        v = sd[name]
        return np.asarray(v.float().cpu().numpy() if hasattr(v, "cpu") else v, np.float32)

    def attn_params(prefix, width):
        w = g(f"{prefix}.attn.in_proj_weight")  # (3W, W)
        b = g(f"{prefix}.attn.in_proj_bias")
        wq, wk, wv = np.split(w, 3, axis=0)
        bq, bk, bv = np.split(b, 3, axis=0)
        ow = g(f"{prefix}.attn.out_proj.weight")
        ob = g(f"{prefix}.attn.out_proj.bias")
        # the published CLIP rule (CLIP/clip/model.py build_model): one head
        # per 64 channels (768→12, 512→8); holds for every zoo checkpoint
        heads = max(width // 64, 1)
        hd = width // heads

        def shape_in(wm, bm):
            # torch (out=W, in=W) → flax MHA kernel (in=W, heads, head_dim)
            return {
                "kernel": wm.T.reshape(width, heads, hd),
                "bias": bm.reshape(heads, hd),
            }

        return {
            "query": shape_in(wq, bq),
            "key": shape_in(wk, bk),
            "value": shape_in(wv, bv),
            "out": {"kernel": ow.T.reshape(heads, hd, width), "bias": ob},
        }

    def block(prefix, width):
        return {
            "ln_1": {"scale": g(f"{prefix}.ln_1.weight"), "bias": g(f"{prefix}.ln_1.bias")},
            "ln_2": {"scale": g(f"{prefix}.ln_2.weight"), "bias": g(f"{prefix}.ln_2.bias")},
            "attn": attn_params(prefix, width),
            "mlp_fc": {
                "kernel": g(f"{prefix}.mlp.c_fc.weight").T,
                "bias": g(f"{prefix}.mlp.c_fc.bias"),
            },
            "mlp_proj": {
                "kernel": g(f"{prefix}.mlp.c_proj.weight").T,
                "bias": g(f"{prefix}.mlp.c_proj.bias"),
            },
        }

    # infer tower sizes from the state dict itself (ViT-B/32 is 12×768 /
    # 12×512, but the layout rule generalizes to any ViT checkpoint)
    def n_blocks(prefix):
        i = 0
        while f"{prefix}.{i}.ln_1.weight" in sd:
            i += 1
        return i

    vis_width = int(np.asarray(sd["visual.ln_pre.weight"]).shape[0])
    txt_width = int(np.asarray(sd["ln_final.weight"]).shape[0])

    visual = {
        # torch conv (out, in, kh, kw) → flax (kh, kw, in, out)
        "conv1": {"kernel": g("visual.conv1.weight").transpose(2, 3, 1, 0)},
        "class_embedding": g("visual.class_embedding"),
        "positional_embedding": g("visual.positional_embedding"),
        "ln_pre": {"scale": g("visual.ln_pre.weight"), "bias": g("visual.ln_pre.bias")},
        "ln_post": {"scale": g("visual.ln_post.weight"), "bias": g("visual.ln_post.bias")},
        "proj": g("visual.proj"),
    }
    for i in range(n_blocks("visual.transformer.resblocks")):
        visual[f"block_{i}"] = block(f"visual.transformer.resblocks.{i}", vis_width)

    text = {
        "token_embedding": {"embedding": g("token_embedding.weight")},
        "positional_embedding": g("positional_embedding"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
        "text_projection": g("text_projection"),
    }
    for i in range(n_blocks("transformer.resblocks")):
        text[f"block_{i}"] = block(f"transformer.resblocks.{i}", txt_width)

    return {"params": {"visual": visual, "text": text}}


def convert_torch_clip_file(pt_path: str) -> dict:
    """Load an OpenAI CLIP .pt (jit or plain) and convert (torch CPU)."""
    import torch

    try:
        model = torch.jit.load(pt_path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(pt_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
    return convert_torch_clip_state_dict(sd)


# Model zoo (reference CLIP/clip/clip.py:30-41 `_MODELS`; the sha256 is the
# path component of each published URL). Only ViT-B/32 matches this module's
# tower configuration — it is the model Surf-D uses everywhere.
CLIP_ZOO = {
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/"
    "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
}


def _default_cache_dir() -> str:
    return os.environ.get(
        "SURFD_CLIP_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "surfd_tpu", "clip"),
    )


def download_clip_checkpoint(name: str = "ViT-B/32", cache_dir: Optional[str] = None) -> str:
    """Fetch a published CLIP .pt into the cache with SHA-256 verification
    (reference CLIP/clip/clip.py:44-76 `_download`). Returns the local path;
    raises with instructions in air-gapped environments."""
    import hashlib
    import urllib.request

    if name not in CLIP_ZOO:
        raise KeyError(f"unknown CLIP model {name!r}; available: {list(CLIP_ZOO)}")
    url = CLIP_ZOO[name]
    sha = url.split("/")[-2]
    root = cache_dir or _default_cache_dir()
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    if os.path.exists(target):
        with open(target, "rb") as fh:
            if hashlib.sha256(fh.read()).hexdigest() == sha:
                return target
        os.remove(target)  # corrupt/partial — re-fetch
    try:
        urllib.request.urlretrieve(url, target + ".part")
    except Exception as e:
        raise RuntimeError(
            f"cannot download {name} ({url}): {e}. In air-gapped environments "
            f"place the checkpoint at {target} (or pass a .pt/.npz path to "
            "load_clip directly)."
        ) from e
    with open(target + ".part", "rb") as fh:
        got = hashlib.sha256(fh.read()).hexdigest()
    if got != sha:
        os.remove(target + ".part")
        raise RuntimeError(f"{name}: SHA-256 mismatch ({got} != {sha})")
    os.replace(target + ".part", target)
    return target


def load_clip(name_or_path: str = "ViT-B/32", cache_dir: Optional[str] = None):
    """One-stop loader (the reference's `clip.load`, CLIP/clip/clip.py:94-142):
    a zoo name downloads + verifies + converts (cached as npz next to the
    .pt); a .pt path converts; a .npz path loads directly. fp16 checkpoints
    are cast to fp32 during conversion. Returns (model, variables)."""
    if name_or_path.endswith(".npz"):
        return load_clip_params(name_or_path)
    if name_or_path.endswith(".pt"):
        pt_path = name_or_path
    else:
        pt_path = download_clip_checkpoint(name_or_path, cache_dir)
    npz_cache = pt_path + ".surfd.npz"
    if os.path.exists(npz_cache):
        return load_clip_params(npz_cache)
    variables = jax.tree.map(jnp.asarray, convert_torch_clip_file(pt_path))
    save_clip_params(npz_cache, variables)
    return _BoundClip(Clip(**clip_config_from_variables(variables))), variables


def save_clip_params(npz_path: str, variables) -> None:
    from ..utils.checkpoint import save_params_npz

    save_params_npz(npz_path, variables)


def load_clip_params(npz_path: str):
    from ..utils.checkpoint import load_params_npz

    with np.load(npz_path) as z:
        cfg = clip_config_from_shapes(lambda k: z[k].shape)
    model, template = init_clip(**cfg)
    variables = load_params_npz(npz_path, template)
    return _BoundClip(model), variables


class _BoundClip:
    def __init__(self, model: Clip):
        self.model = model

    def encode_image(self, variables, images):
        return self.model.encode_image(variables, images)

    def encode_text(self, variables, tokens):
        return self.model.encode_text(variables, tokens)
