"""CLIP-style text tokenization.

Behavioral spec: reference ``mmseg/utils/tokenizer.py`` (OpenAI CLIP's BPE:
byte-level encoding, lower-case + whitespace cleanup, merges-ranked BPE with
'</w>' word markers, SOT/EOT wrapping, context length 77). The merges table
(``bpe_simple_vocab_16e6.txt.gz``) is DATA we must not copy from the
reference tree, so:

- the standard merges table is BUNDLED at ``data/bpe_simple_vocab_16e6
  .txt.gz`` and used by default, so token ids match OpenAI CLIP exactly.
  This is published DATA, not code: OpenAI CLIP's BPE vocabulary, sha256
  924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a (the
  hash pinned by openai/CLIP's simple_tokenizer) — a public constant of
  the CLIP model spec, like a dataset's class/palette table;
- ``bpe_path=`` / env ``CLIP_BPE_PATH`` override the table;
- if no merges data can be found (e.g. a stripped install), ``tokenize``
  raises unless ``allow_hash_fallback=True``, in which case a
  deterministic per-word hash id is emitted (only sane for randomly
  initialized text towers) with a one-time warning.

Golden ids asserted in ``tests/test_san.py`` ("a photo of a cat" ->
[49406, 320, 1125, 539, 320, 2368, 49407], etc.).
"""
from __future__ import annotations

import functools
import gzip
import hashlib
import html
import os
import re
import warnings
from typing import List, Optional

import numpy as np

SOT = 49406
EOT = 49407
VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77


@functools.lru_cache()
def _bytes_to_unicode():
    """Reversible byte -> unicode mapping (GPT-2/CLIP standard)."""
    bs = (list(range(ord('!'), ord('~') + 1)) +
          list(range(ord('\xa1'), ord('\xac') + 1)) +
          list(range(ord('\xae'), ord('\xff') + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r'\s+', ' ', text.strip())
    return text.lower()


_WORD_RE = re.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[^\s\w]+|\w+", re.IGNORECASE)


class _BPE:
    """Merges-file-backed CLIP BPE."""

    def __init__(self, bpe_path: str):
        opener = gzip.open if bpe_path.endswith('.gz') else open
        with opener(bpe_path, 'rt', encoding='utf-8') as f:
            merges = f.read().split('\n')
        merges = [tuple(m.split()) for m in merges[1:48894 + 1] if m]
        self.byte_enc = _bytes_to_unicode()
        vocab = list(self.byte_enc.values())
        vocab = vocab + [v + '</w>' for v in vocab]
        for merge in merges:
            vocab.append(''.join(merge))
        vocab.extend(['<|startoftext|>', '<|endoftext|>'])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}

    def _bpe(self, token: str) -> List[str]:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + '</w>',)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1e9))
            if best not in self.ranks:
                break
            first, second = best
            new = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new.append(first + second)
                    i += 2
                else:
                    new.append(word[i])
                    i += 1
            word = tuple(new)
        self.cache[token] = list(word)
        return list(word)

    def encode(self, text: str) -> List[int]:
        out = []
        for word in _WORD_RE.findall(_clean(text)):
            encoded = ''.join(self.byte_enc[b] for b in word.encode('utf-8'))
            out.extend(self.encoder[t] for t in self._bpe(encoded))
        return out


_BUNDLED_BPE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            'data', 'bpe_simple_vocab_16e6.txt.gz')

_warned = [False]


def _hash_encode(text: str) -> List[int]:
    """Deterministic per-word fallback ids in [1000, SOT)."""
    out = []
    for word in _WORD_RE.findall(_clean(text)):
        h = int(hashlib.md5(word.encode()).hexdigest(), 16)
        out.append(1000 + h % (SOT - 1000))
    return out


@functools.lru_cache()
def _get_bpe(bpe_path: Optional[str]):
    if bpe_path and os.path.exists(bpe_path):
        return _BPE(bpe_path)
    return None


def tokenize(texts, context_length: int = CONTEXT_LENGTH,
             bpe_path: Optional[str] = None,
             allow_hash_fallback: bool = False) -> np.ndarray:
    """Texts -> (N, context_length) int32 token ids, SOT/EOT wrapped and
    truncated like the reference tokenizer.

    Ids match OpenAI CLIP exactly via the bundled merges table; without any
    merges data this raises, unless ``allow_hash_fallback=True`` opts into
    the deterministic (CLIP-incompatible) per-word hash ids.
    """
    if isinstance(texts, str):
        texts = [texts]
    bpe = _get_bpe(bpe_path or os.environ.get('CLIP_BPE_PATH')
                   or _BUNDLED_BPE)
    if bpe is None:
        if not allow_hash_fallback:
            raise FileNotFoundError(
                'CLIP BPE merges data not found (bundled file missing and '
                'no bpe_path/CLIP_BPE_PATH override). Pass '
                'allow_hash_fallback=True only for randomly initialized '
                'text towers.')
        if not _warned[0]:
            warnings.warn('CLIP BPE merges file not found; using the hash '
                          'fallback tokenizer (set CLIP_BPE_PATH for real '
                          'CLIP-compatible ids)', stacklevel=2)
            _warned[0] = True
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        ids = bpe.encode(text) if bpe else _hash_encode(text)
        ids = [SOT] + ids[:context_length - 2] + [EOT]
        out[i, :len(ids)] = ids
    return out
