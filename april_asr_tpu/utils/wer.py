"""Word/token error rate utilities for the accuracy harness.

The reference publishes WER numbers for its models (april-docs/src/models.md)
but ships no scoring code; this module provides the standard Levenshtein
WER plus a corpus aggregator, used by tests and tools/wer_harness.py.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> Tuple[int, int, int, int]:
    """Levenshtein alignment counts: (substitutions, deletions, insertions,
    correct). Runs in O(len(ref) * len(hyp)) with two rows."""
    R, H = len(ref), len(hyp)
    # dp[j] = (cost, subs, dels, ins) for ref[:i], hyp[:j]
    prev = [(j, 0, 0, j) for j in range(H + 1)]
    for i in range(1, R + 1):
        cur = [(i, 0, i, 0)] + [None] * H
        for j in range(1, H + 1):
            if ref[i - 1] == hyp[j - 1]:
                c, s, d, ins = prev[j - 1]
                cur[j] = (c, s, d, ins)
                continue
            sub_c, sub_s, sub_d, sub_i = prev[j - 1]
            del_c, del_s, del_d, del_i = prev[j]
            ins_c, ins_s, ins_d, ins_i = cur[j - 1]
            best = min(sub_c, del_c, ins_c)
            if best == sub_c:
                cur[j] = (sub_c + 1, sub_s + 1, sub_d, sub_i)
            elif best == del_c:
                cur[j] = (del_c + 1, del_s, del_d + 1, del_i)
            else:
                cur[j] = (ins_c + 1, ins_s, ins_d, ins_i + 1)
        prev = cur
    cost, subs, dels, ins = prev[H]
    correct = R - subs - dels
    return subs, dels, ins, correct


@dataclasses.dataclass
class WerAccumulator:
    """Corpus-level WER: sum error counts over utterances, divide once."""

    subs: int = 0
    dels: int = 0
    ins: int = 0
    ref_words: int = 0

    def add(self, ref: str, hyp: str) -> None:
        r, h = normalize(ref).split(), normalize(hyp).split()
        s, d, i, _ = edit_distance(r, h)
        self.subs += s
        self.dels += d
        self.ins += i
        self.ref_words += len(r)

    @property
    def wer(self) -> float:
        if self.ref_words == 0:
            return 0.0
        return (self.subs + self.dels + self.ins) / self.ref_words

    def summary(self) -> str:
        return (
            f"WER {self.wer * 100:.2f}% "
            f"(sub {self.subs}, del {self.dels}, ins {self.ins}, "
            f"ref words {self.ref_words})"
        )


def normalize(text: str) -> str:
    """Uppercase, strip punctuation except apostrophes, collapse whitespace —
    the usual LibriSpeech scoring normalization."""
    out = []
    for ch in text.upper():
        if ch.isalnum() or ch == "'":
            out.append(ch)
        else:
            out.append(" ")
    return " ".join("".join(out).split())


def wer(pairs: Iterable[Tuple[str, str]]) -> float:
    acc = WerAccumulator()
    for ref, hyp in pairs:
        acc.add(ref, hyp)
    return acc.wer
