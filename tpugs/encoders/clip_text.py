"""CLIP text tower + BPE tokenizer (queries for open-vocabulary
segmentation — reference ``segment.py:42-52`` uses
``net.clip_pretrained.encode_text`` + ``clip.tokenize``).

The tokenizer is the standard CLIP byte-pair encoder; the merges file
(``bpe_simple_vocab_16e6.txt.gz``) ships with every CLIP distribution
and must be provided as a file in this offline environment (same class
of requirement as the LSeg checkpoint itself)."""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import List

import numpy as np
import flax.linen as nn
import jax
import jax.numpy as jnp


# ------------------------------------------------------------- tokenizer


@lru_cache()
def bytes_to_unicode():
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


def get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def basic_clean(text):
    return html.unescape(html.unescape(text)).strip()


def whitespace_clean(text):
    import re

    return re.sub(r"\s+", " ", text).strip()


class SimpleTokenizer:
    """CLIP BPE tokenizer; pass the merges file path (gz or txt)."""

    def __init__(self, bpe_path: str):
        import re

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        if bpe_path.endswith(".gz"):
            merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        else:
            merges = open(bpe_path, encoding="utf-8").read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        # CLIP's original pattern uses \p{L}/\p{N} (regex module); the
        # ASCII classes below are equivalent for English prompts.
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
            r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
            re.IGNORECASE,
        )

    def bpe(self, token):
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = whitespace_clean(basic_clean(text)).lower()
        for token in self.pat.findall(text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self.bpe(token).split(" ")
            )
        return bpe_tokens


def tokenize(
    tokenizer: SimpleTokenizer, texts: List[str], context_length: int = 77
) -> np.ndarray:
    """(P, 77) int tokens with SOT/EOT, matching ``clip.tokenize``."""
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        toks = [sot] + tokenizer.encode(text)[: context_length - 2] + [eot]
        out[i, : len(toks)] = toks
    return out


# ------------------------------------------------------------ text tower


class CLIPTextTower(nn.Module):
    """CLIP's causal text transformer -> (P, embed_dim) embeddings."""

    # Defaults are CLIP ViT-B/32's text tower — the one inside
    # lseg_minimal_e200.ckpt (LSeg's ``clip_pretrained`` is ViT-B/32;
    # its 512-d text space is why LSeg features are 512-d).
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512

    @nn.compact
    def __call__(self, tokens):  # (P, 77) int32
        from tpugs.encoders.vit import Block, ViTConfig

        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(
            tokens
        )
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, : x.shape[1]]

        # causal attention via masking inside a local block impl
        B, T, C = x.shape
        mask = jnp.tril(jnp.ones((T, T), bool))

        for i in range(self.layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            qkv = nn.Dense(3 * C, name=f"attn_qkv_{i}")(h)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            hd = C // self.heads
            sp = lambda t: t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)
            q, k, v = map(sp, (q, k, v))
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd)
            attn = jnp.where(mask[None, None], attn, -1e9)
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
            x = x + nn.Dense(C, name=f"attn_proj_{i}")(o)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(4 * C, name=f"mlp_fc_{i}")(h)
            h = jax.nn.sigmoid(1.702 * h) * h  # quick_gelu
            x = x + nn.Dense(C, name=f"mlp_proj_{i}")(h)

        x = nn.LayerNorm(name="ln_final")(x)
        # embedding at the EOT token (argmax of token id)
        eot_idx = jnp.argmax(tokens, axis=-1)
        feats = x[jnp.arange(x.shape[0]), eot_idx]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(0.02),
            (self.width, self.embed_dim),
        )
        return feats @ proj
