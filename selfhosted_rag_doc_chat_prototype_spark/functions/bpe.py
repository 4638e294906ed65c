"""Minimal byte-pair-encoding tokenizer (Sennrich et al. 2016): the
pinned LOCAL fixture that closes T5's budget-guarantee argument with a
real merge-table tokenizer instead of a network-downloaded one.

The chunkers budget in PRE-TOKENIZER counts (``textstats.BPE_RE``:
letter runs / digit runs / single punctuation -- the GPT-2-family
pre-tokenization shape). The relationship to a real BPE's count is
CONDITIONAL, and this module makes the condition explicit and testable:

- a BPE token never crosses a pre-token boundary, so
  ``n_bpe(text) >= n_pretokens(text)`` always;
- therefore the pre-token budget guarantees the real-token budget
  IFF every pre-token in the text encodes to exactly ONE token, i.e.
  the tokenizer's vocabulary covers the corpus pre-tokens -- true for
  a tokenizer trained on (a superset of) the serving corpus, and
  exactly what the committed fixture pins for the test corpus;
- for open-vocabulary text, an out-of-vocab pre-token splits into
  several tokens and the pre-token count UNDER-counts -- callers that
  must hold a hard budget under an arbitrary external tokenizer should
  re-count chunks with that tokenizer through this encoder interface
  (``tests/test_bpe_budget.py`` documents both sides).

Training and encoding are the textbook algorithm: word-frequency pair
counting with deterministic tie-breaks, ``</w>`` end-of-word marker,
rank-ordered greedy merging at encode time, character fallback for
symbols never merged. No numpy, no network, pure Python -- the encoder
is for tests and bounded driver-side use, not the distributed hot path
(corpus-scale token COUNTS stay in codegen via ``BPE_RE``)."""

from __future__ import annotations

import json
import re

# textstats.BPE_RE verbatim (explicit whitespace class since round 5:
# identical across Python/Java/RE2, closing the \x0B and NBSP-class
# divergences) -- a pre-token the distributed counter emits must be
# one this encoder sees, or n_bpe >= n_pretokens silently breaks
_PRETOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]")
_EOW = "</w>"


def train_bpe(
    word_freqs: dict[str, int], max_merges: int = 4096
) -> list[tuple[str, str]]:
    """Learn a merge table from a pre-token frequency map. Stops when
    every word is a single symbol or ``max_merges`` is reached.
    Deterministic: ties break on the pair itself."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(list(w) + [_EOW]): f for w, f in word_freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(max_merges):
        pairs: dict[tuple[str, str], int] = {}
        for seq, f in vocab.items():
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = max(pairs, key=lambda p: (pairs[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for seq, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(seq):
                if (
                    i + 1 < len(seq)
                    and seq[i] == best[0]
                    and seq[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
        if all(len(s) == 1 for s in vocab):
            break
    return merges


class BPETokenizer:
    """Encode via rank-ordered greedy merging (the standard BPE apply
    loop); ``decode`` inverts exactly for single-space-joined text."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        # per-word memo: natural text is Zipf-distributed, so the same
        # few thousand words dominate -- the merge loop runs once per
        # DISTINCT word per executor task, not once per occurrence
        self._cache: dict[str, list[str]] = {}

    def _encode_word(self, word: str) -> list[str]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        seq = self._encode_word_uncached(word)
        if len(self._cache) < 1_000_000:  # bound executor memory
            self._cache[word] = seq
        return seq

    def _encode_word_uncached(self, word: str) -> list[str]:
        seq = list(word) + [_EOW]
        while len(seq) > 1:
            ranked = [
                (self.ranks.get((a, b)), i)
                for i, (a, b) in enumerate(zip(seq, seq[1:]))
            ]
            ranked = [(r, i) for r, i in ranked if r is not None]
            if not ranked:
                break
            _, i = min(ranked)
            seq = seq[:i] + [seq[i] + seq[i + 1]] + seq[i + 2:]
        return seq

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in _PRETOKEN_RE.findall(text):
            out.extend(self._encode_word(w))
        return out

    def n_tokens(self, text: str) -> int:
        return len(self.encode(text))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"merges": [list(m) for m in self.merges]}, f, indent=0)

    @classmethod
    def load(cls, path: str) -> BPETokenizer:
        with open(path) as f:
            data = json.load(f)
        return cls([tuple(m) for m in data["merges"]])

    def covers(self, word: str) -> bool:
        """True iff ``word`` encodes to exactly one token -- the
        per-pre-token condition under which the pre-tokenizer budget
        bounds the real-token budget."""
        return len(self._encode_word(word)) == 1
