"""CLIP text tower for open-vocabulary heads (SAN).

Behavioral spec: reference ``mmseg/models/text_encoder/clip_text_encoder.py``
— token embedding over the 49408 BPE vocab, learned positional embedding
(context 77), ``num_layers`` pre-LN transformer blocks with a causal
attention mask, ``ln_final``, linear text projection, features taken at the
EOT token (argmax of ids), L2-normalized; prompt-template ensembling
averages the embeddings of every template filled with each class name, and
an optional learnable background embedding is appended (``cat_bg``).

The vocabulary/templates are static config, so tokenization happens on the
host at trace time and the ids enter the jitted program as constants.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from lednet_tpu.models.text_encoder.tokenizer import VOCAB_SIZE, tokenize
from lednet_tpu.registry import MODELS

# Prompt-template sets (reference ``mmseg/utils/get_templates.py``). 'vild'
# is the ViLD prompt-engineering set; a compact subset keeps trace-time
# tokenization cheap while preserving the ensembling behavior.
PREDEFINED_TEMPLATES = {
    'vild': [
        'a photo of a {}.', 'a photo of the {}.', 'a photo of one {}.',
        'a photo of many {}.', 'a photo of a small {}.',
        'a photo of a large {}.', 'a photo of the small {}.',
        'a photo of the large {}.', 'a cropped photo of a {}.',
        'a close-up photo of a {}.', 'a bright photo of a {}.',
        'a dark photo of a {}.', 'a photo of a clean {}.',
        'a photo of a dirty {}.', 'there is a {} in the scene.',
        'there is the {} in the scene.', 'this is a {} in the scene.',
        'this is the {} in the scene.', 'this is one {} in the scene.',
    ],
    'simple': ['a photo of a {}.'],
}


def get_predefined_templates(name: str) -> List[str]:
    if name not in PREDEFINED_TEMPLATES:
        raise ValueError(f'Template set {name} not found '
                         f'(have {sorted(PREDEFINED_TEMPLATES)})')
    return PREDEFINED_TEMPLATES[name]


class _TextBlock(nn.Module):
    dims: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask):
        B, L, D = x.shape
        hd = D // self.num_heads
        h = nn.LayerNorm(name='ln_1')(x)
        q = nn.Dense(D, name='q')(h).reshape(B, L, self.num_heads, hd)
        k = nn.Dense(D, name='k')(h).reshape(B, L, self.num_heads, hd)
        v = nn.Dense(D, name='v')(h).reshape(B, L, self.num_heads, hd)
        attn = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        attn = nn.softmax(attn + mask, axis=-1).astype(v.dtype)
        o = jnp.einsum('bhqk,bkhd->bqhd', attn, v,
                       preferred_element_type=jnp.float32).astype(v.dtype)
        x = x + nn.Dense(D, name='proj')(o.reshape(B, L, D))
        h = nn.LayerNorm(name='ln_2')(x)
        m = nn.Dense(4 * D, name='fc1')(h)
        return x + nn.Dense(D, name='fc2')(
            nn.gelu(m, approximate=False))


@MODELS.register_module()
class CLIPTextEncoder(nn.Module):
    """Encodes the configured vocabulary into class embeddings.

    ``__call__()`` takes no tensor input (vocabulary and templates are
    static) and returns (num_classes [+1 bg], out_dims) normalized
    embeddings — exactly the reference's forward contract.
    """
    vocabulary: Optional[Sequence[str]] = None
    templates: str = 'vild'
    total_vocab_size: int = VOCAB_SIZE
    context_length: int = 77
    embed_dims: int = 512
    num_layers: int = 12
    num_heads: int = 8
    output_dims: int = 512
    cat_bg: bool = True
    bpe_path: Optional[str] = None

    def _encode_tokens(self, tokens: np.ndarray) -> jnp.ndarray:
        tok = jnp.asarray(tokens)
        emb = nn.Embed(self.total_vocab_size, self.embed_dims,
                       name='token_embedding')(tok)
        pos = self.param('positional_embedding', nn.initializers.normal(0.01),
                         (self.context_length, self.embed_dims))
        x = emb + pos[None]
        L = self.context_length
        causal = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)[None, None]
        for i in range(self.num_layers):
            x = _TextBlock(self.embed_dims, self.num_heads,
                           name=f'block{i}')(x, causal)
        x = nn.LayerNorm(name='ln_final')(x)
        eot = jnp.argmax(tok, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        proj = self.param('text_projection', nn.initializers.normal(
            self.embed_dims ** -0.5), (self.embed_dims, self.output_dims))
        x = x @ proj
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        assert self.vocabulary, 'CLIPTextEncoder requires a vocabulary'
        templates = get_predefined_templates(self.templates) \
            if isinstance(self.templates, str) else list(self.templates)
        # tokenize every (template, class) pair on the host; ids become
        # constants of the traced program
        all_tokens = np.stack([
            tokenize([t.format(noun) for noun in self.vocabulary],
                     self.context_length, self.bpe_path)
            for t in templates])  # (T, C, L)
        T, C, L = all_tokens.shape
        embeds = self._encode_tokens(all_tokens.reshape(T * C, L))
        embeds = embeds.reshape(T, C, self.output_dims).mean(0)
        embeds = embeds / (jnp.linalg.norm(embeds, axis=-1, keepdims=True)
                           + 1e-12)
        if self.cat_bg:
            bg = self.param('bg_embed', nn.initializers.normal(
                self.output_dims ** -0.5), (1, self.output_dims))
            bg = bg / (jnp.linalg.norm(bg, axis=-1, keepdims=True) + 1e-12)
            embeds = jnp.concatenate([embeds, bg], axis=0)
        return embeds
