"""Self-contained WordPiece tokenizer (BERT-uncased semantics).

The reference loads an HF tokenizer from `<experiment>/tokenizer`
(/root/reference/recipes/vanilla_bert.py:92-96).  This module provides the
same surface with zero network dependencies: if `transformers` can load the
directory it is used; otherwise a pure-Python greedy-longest-match WordPiece
over the directory's `vocab.txt` applies (identical algorithm to BERT's
WordPiece, including basic lowercasing, punctuation splitting and the `##`
continuation convention).  `build_vocab` lets tests and offline runs derive
a vocab from a corpus.
"""

from __future__ import annotations

import pathlib
import unicodedata
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np

PAD, UNK, CLS, SEP, MASK = "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"
SPECIALS = [PAD, UNK, CLS, SEP, MASK]


def _basic_tokenize(text: str) -> List[str]:
    """Lowercase, strip accents, split on whitespace and punctuation."""
    text = unicodedata.normalize("NFD", text.lower())
    out: List[str] = []
    word = ""

    def flush():
        nonlocal word
        if word:
            out.append(word)
            word = ""

    for ch in text:
        cat = unicodedata.category(ch)
        if cat == "Mn":  # accent
            continue
        if ch.isspace():
            flush()
        elif cat.startswith("P") or cat.startswith("S"):
            flush()
            out.append(ch)
        else:
            word += ch
    flush()
    return out


class WordPieceTokenizer:
    def __init__(self, vocab: List[str]):
        self.vocab = list(vocab)
        self.token_to_id: Dict[str, int] = {t: i for i, t in enumerate(self.vocab)}
        for sp in SPECIALS:
            if sp not in self.token_to_id:
                raise ValueError(f"vocab missing special token {sp}")
        self.pad_id = self.token_to_id[PAD]
        self.unk_id = self.token_to_id[UNK]
        self.cls_id = self.token_to_id[CLS]
        self.sep_id = self.token_to_id[SEP]
        self._native = None
        self._native_handle = None

    def _native_tokenizer(self):
        """Lazily build/load the C++ WordPiece core (ASCII fast path)."""
        if self._native is not None:
            return self._native_handle
        import ctypes

        from ..native import build_and_load

        self._native = build_and_load("wordpiece") or False
        if self._native:
            lib = self._native
            lib.wp_create.restype = ctypes.c_void_p
            lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.wp_encode_batch.restype = ctypes.c_int64
            lib.wp_encode_batch.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.wp_destroy.argtypes = [ctypes.c_void_p]
            blob = "\n".join(self.vocab).encode("utf-8")
            handle = lib.wp_create(blob, len(blob))
            self._native_handle = handle or None
        return self._native_handle

    def encode_batch_native(
        self, texts: List[str], max_length: int
    ) -> Optional[np.ndarray]:
        """C++ batch encode; None when unavailable or any text is non-ASCII
        (parity: the Python path strips accents, which ASCII never needs).
        NUL is the record separator in the wire blob, so texts containing
        it also fall back to the Python path."""
        import ctypes

        if not all(t.isascii() and "\x00" not in t for t in texts):
            return None
        handle = self._native_tokenizer()
        if handle is None:
            return None
        blob = b"\x00".join(t.encode() for t in texts) + b"\x00"
        out = np.empty((len(texts), max_length), dtype=np.int64)
        got = self._native.wp_encode_batch(
            handle, blob, len(blob), len(texts), max_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out if got == len(texts) else None

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    @classmethod
    def load(cls, path: pathlib.Path) -> "WordPieceTokenizer":
        vocab_file = path / "vocab.txt" if path.is_dir() else path
        with open(vocab_file, "r", encoding="utf-8") as f:
            vocab = [line.rstrip("\n") for line in f if line.rstrip("\n")]
        return cls(vocab)

    def save(self, path: pathlib.Path) -> None:
        path.mkdir(parents=True, exist_ok=True)
        with open(path / "vocab.txt", "w", encoding="utf-8") as f:
            f.write("\n".join(self.vocab) + "\n")

    def _wordpiece(self, word: str, max_chars: int = 100) -> List[int]:
        if len(word) > max_chars:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur: Optional[int] = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.token_to_id:
                    cur = self.token_to_id[piece]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def encode(
        self, text: str, max_length: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """-> (input_ids <max_length>, attention_mask <max_length>), padded /
        truncated with [CLS] ... [SEP] framing, matching HF
        `tokenizer(text, padding="max_length", max_length=L)`."""
        ids: List[int] = [self.cls_id]
        for word in _basic_tokenize(text):
            ids.extend(self._wordpiece(word))
        ids = ids[: max_length - 1]
        ids.append(self.sep_id)
        attn = [1] * len(ids)
        while len(ids) < max_length:
            ids.append(self.pad_id)
            attn.append(0)
        return np.asarray(ids, dtype=np.int64), np.asarray(attn, dtype=np.int64)

    def decode_tokens(self, ids: Iterable[int]) -> List[str]:
        return [self.vocab[i] for i in ids]

    @property
    def all_special_ids(self) -> List[int]:
        return [self.token_to_id[t] for t in SPECIALS]

    def decode(self, token_id: int) -> str:
        return self.vocab[int(token_id)]


def build_vocab(texts: Iterable[str], max_size: int = 2000) -> List[str]:
    """Whole-word + suffix-piece vocab from a corpus (deterministic order)."""
    from collections import Counter

    words = Counter()
    for text in texts:
        for w in _basic_tokenize(text):
            words[w] += 1
    vocab: List[str] = list(SPECIALS)
    seen = set(vocab)
    # single characters first so WordPiece never falls to UNK for seen words
    chars = sorted({ch for w in words for ch in w})
    for ch in chars:
        for piece in (ch, f"##{ch}"):
            if piece not in seen:
                vocab.append(piece)
                seen.add(piece)
    for w, _n in sorted(words.items(), key=lambda kv: (-kv[1], kv[0])):
        if len(vocab) >= max_size:
            break
        if w not in seen:
            vocab.append(w)
            seen.add(w)
    return vocab


def load_tokenizer(path: pathlib.Path):
    """HF tokenizer if the directory parses as one, else pure WordPiece."""
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(str(path))
    except Exception:
        return WordPieceTokenizer.load(path)


def encode_batch(tokenizer, texts: List[str], max_length: int) -> np.ndarray:
    """Uniform adapter: -> input_ids <B, max_length> for either tokenizer."""
    if isinstance(tokenizer, WordPieceTokenizer):
        native = tokenizer.encode_batch_native(list(texts), max_length)
        if native is not None:
            return native
        return np.stack([tokenizer.encode(t, max_length)[0] for t in texts])
    enc = tokenizer(
        list(texts),
        padding="max_length",
        truncation=True,
        max_length=max_length,
        return_tensors="np",
    )
    return np.asarray(enc["input_ids"], dtype=np.int64)
