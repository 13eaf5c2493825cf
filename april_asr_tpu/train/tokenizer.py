"""Piece tokenizer over the model's token table.

The reference stores SentencePiece pieces (with the `▁` word marker
already rewritten to a leading space at export, export-april.py:364) in the
.april PARAMS block and never needs to *encode* text — it only decodes ids.
Training needs the inverse: this module encodes transcripts into piece ids by
greedy longest-match over the stored table, and can build a char-level
vocabulary from a corpus when training from scratch (no external
sentencepiece dependency; zero-egress environment).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

BLANK_PIECE = b"<blk>"
UNK_PIECE = b"<unk>"


def normalize_text(text: str) -> str:
    """Lowercase, collapse whitespace, and prefix the leading word boundary —
    mirrors how decoded reference transcripts look (pieces carry a leading
    space on word starts)."""
    out = " ".join(text.strip().lower().split())
    return " " + out if out else ""


def build_char_pieces(texts: Iterable[str]) -> List[bytes]:
    """Char-level vocabulary: <blk>, <unk>, then for every character seen
    both its word-initial form (space-prefixed) and its word-internal form.

    Layout matches the reference token-table conventions: blank first
    (blank_id=0), word starts begin with a space byte (the WORD_BOUNDARY
    flag derives from that — april_session.c:338).
    """
    chars = set()
    for t in texts:
        for ch in normalize_text(t):
            if ch != " ":
                chars.add(ch)
    pieces: List[bytes] = [BLANK_PIECE, UNK_PIECE]
    for ch in sorted(chars):
        pieces.append((" " + ch).encode("utf-8"))
        pieces.append(ch.encode("utf-8"))
    return pieces


class PieceTokenizer:
    """Greedy longest-match encoder over a byte-piece table."""

    def __init__(self, pieces: Sequence[bytes], blank_id: int = 0):
        self.pieces = list(pieces)
        self.blank_id = blank_id
        self._by_piece: Dict[bytes, int] = {}
        for i, p in enumerate(self.pieces):
            # first occurrence wins (duplicate pieces exist in some tables)
            self._by_piece.setdefault(p, i)
        self.unk_id = self._by_piece.get(UNK_PIECE)
        self.max_len = max((len(p) for p in self.pieces), default=1)

    @property
    def vocab_size(self) -> int:
        return len(self.pieces)

    def encode(self, text: str) -> List[int]:
        data = normalize_text(text).encode("utf-8")
        ids: List[int] = []
        i = 0
        while i < len(data):
            match = None
            # longest match first; never emit blank/control pieces
            for L in range(min(self.max_len, len(data) - i), 0, -1):
                j = self._by_piece.get(data[i : i + L])
                if j is not None and j != self.blank_id and j != self.unk_id:
                    match = (j, L)
                    break
            if match is None:
                if data[i : i + 1] == b" ":
                    i += 1  # bare space with no match: boundary folds into next piece
                    continue
                if self.unk_id is not None:
                    ids.append(self.unk_id)
                i += 1
            else:
                ids.append(match[0])
                i += match[1]
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        out = b"".join(
            self.pieces[i]
            for i in ids
            if i != self.blank_id and i != self.unk_id and 0 <= i < len(self.pieces)
        )
        return out.decode("utf-8", errors="replace").strip()
