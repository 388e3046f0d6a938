"""Tiny vendored byte-level BPE tokenizer (U1 subword seam).

The reference chunks with tiktoken cl100k_base
(VectorDatabase/TextProcessor.py:38-40); this container has no tiktoken, so
round 3 left the subword path an unexercised seam.  This module is a
self-contained, deterministic stand-in implementing the public byte-pair
encoding algorithm (Sennrich et al. 2016, as applied byte-level by GPT-2):
a fixed merge table over UTF-8 bytes, greedy lowest-rank-first application.

Properties the chunker relies on (pinned in tests/test_chunker.py):
  * deterministic — no I/O, no randomness, no external lib;
  * lossless — ``decode(encode(text)) == text`` for all valid UTF-8 (byte
    concatenation is exact; merges only group bytes, never drop them);
  * picklable — module-level functions ship to executors via cloudpickle.

This is a FIXTURE-GRADE vocabulary (256 byte tokens + ~60 common English
merges), not a trained production tokenizer; swap ``pair()`` for
``chunker.tiktoken_pair()`` where tiktoken is installed — the chunker seam
is identical.
"""

from __future__ import annotations

# Common English byte pairs, GPT-2 style (space-prefixed word starts).
# Rank == list index: lower rank merges first.  Merges may chain (e.g.
# 'th' + 'e' -> 'the') because each entry refers to byte strings that
# earlier merges can produce.
_MERGE_STRS = [
    ("t", "h"),     # th
    ("th", "e"),    # the
    (" ", "the"),   # ' the'
    ("i", "n"),     # in
    ("e", "r"),     # er
    ("a", "n"),     # an
    ("r", "e"),     # re
    ("o", "n"),     # on
    ("a", "t"),     # at
    ("e", "n"),     # en
    ("o", "r"),     # or
    ("e", "s"),     # es
    ("s", "t"),     # st
    ("a", "r"),     # ar
    ("o", "u"),     # ou
    ("l", "e"),     # le
    ("i", "s"),     # is
    ("i", "t"),     # it
    ("a", "l"),     # al
    ("in", "g"),    # ing
    (" ", "a"),     # ' a'
    (" ", "t"),     # ' t'
    (" ", "s"),     # ' s'
    (" ", "o"),     # ' o'
    (" ", "w"),     # ' w'
    (" ", "b"),     # ' b'
    (" ", "c"),     # ' c'
    (" ", "f"),     # ' f'
    (" ", "m"),     # ' m'
    (" ", "p"),     # ' p'
    (" ", "d"),     # ' d'
    (" ", "l"),     # ' l'
    (" ", "in"),    # ' in'
    (" ", "re"),    # ' re'
    (" ", "is"),    # ' is'
    ("e", "d"),     # ed
    ("n", "d"),     # nd
    ("a", "nd"),    # and
    (" ", "and"),   # ' and'
    ("o", "w"),     # ow
    ("r", "o"),     # ro
    ("i", "c"),     # ic
    ("u", "m"),     # um
    ("c", "k"),     # ck
    ("o", "g"),     # og
    ("l", "a"),     # la
    ("z", "y"),     # zy
    ("q", "u"),     # qu
    ("qu", "i"),    # qui
    ("f", "o"),     # fo
    ("fo", "x"),    # fox
    ("j", "um"),    # jum
    ("jum", "p"),   # jump
    ("b", "ro"),    # bro
    ("bro", "w"),   # brow
    ("d", "og"),    # dog
    ("la", "zy"),   # lazy
    ("o", "v"),     # ov
    ("ov", "er"),   # over
    (" ", "over"),  # ' over'
]

MERGES: list[tuple[bytes, bytes]] = [
    (a.encode(), b.encode()) for a, b in _MERGE_STRS
]
_RANK: dict[tuple[bytes, bytes], int] = {p: i for i, p in enumerate(MERGES)}

# id space: 0..255 = single bytes, 256+rank = merged tokens
VOCAB: list[bytes] = [bytes([i]) for i in range(256)] + [a + b for a, b in MERGES]
_TOKEN_ID: dict[bytes, int] = {tok: i for i, tok in enumerate(VOCAB)}


def _apply_bpe(parts: list[bytes]) -> list[bytes]:
    """Greedy BPE: repeatedly merge the lowest-rank adjacent pair until no
    mergeable pair remains.  Reference implementation — exact but O(n^2);
    ``encode`` uses the piece-cached fast path and a test pins equality."""
    while len(parts) > 1:
        best_rank = None
        for i in range(len(parts) - 1):
            rank = _RANK.get((parts[i], parts[i + 1]))
            if rank is not None and (best_rank is None or rank < best_rank):
                best_rank = rank
        if best_rank is None:
            break
        merged = MERGES[best_rank][0] + MERGES[best_rank][1]
        # merge every occurrence of this exact pair left-to-right
        out: list[bytes] = []
        i = 0
        while i < len(parts):
            if (
                i < len(parts) - 1
                and parts[i] == MERGES[best_rank][0]
                and parts[i + 1] == MERGES[best_rank][1]
            ):
                out.append(merged)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def _apply_bpe_fast(parts: list[bytes]) -> list[bytes]:
    """Sequential rank-order application — equivalent to lowest-rank-first
    greedy because the merge table is well-ordered (every pair's components
    are created by strictly lower-rank merges, as in any trained BPE list),
    so applying rank r can never surface an un-applied rank < r.  One pass
    per present rank instead of one full rescan per merge step."""
    for rank, (a, b) in enumerate(MERGES):
        if len(parts) < 2:
            break
        out: list[bytes] = []
        i = 0
        n = len(parts)
        while i < n:
            if i < n - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


# Piece-level encode cache (GPT-2's lru_cache-per-word trick): splitting on
# word boundaries WITH the leading space attached is exact for this merge
# table because no merge's right-hand component begins with a space, so no
# pair can span two pieces.  Natural corpora repeat words massively, making
# encode ~dict-lookup cost; the cache is capped to bound executor memory.
_PIECE_CACHE: dict[str, list[int]] = {}
_PIECE_CACHE_MAX = 200_000


def _encode_piece(piece: str) -> list[int]:
    ids = _PIECE_CACHE.get(piece)
    if ids is None:
        parts = [bytes([b]) for b in piece.encode("utf-8")]
        ids = [_TOKEN_ID[p] for p in _apply_bpe_fast(parts)]
        if len(_PIECE_CACHE) < _PIECE_CACHE_MAX:
            _PIECE_CACHE[piece] = ids
    return ids


def encode(text: str) -> list[int]:
    if not text:
        return []
    out: list[int] = []
    start = 0
    # pieces: maximal space-runs are split so each piece is either the text
    # head or begins with exactly one space boundary (" word")
    for i in range(1, len(text)):
        if text[i] == " " and text[i - 1] != " ":
            out.extend(_encode_piece(text[start:i]))
            start = i
    out.extend(_encode_piece(text[start:]))
    return out


def decode(ids) -> str:
    # errors='replace' mirrors tiktoken's decode on windows that split a
    # multi-byte character; full-sequence round-trips are exact
    return b"".join(VOCAB[i] for i in ids).decode("utf-8", errors="replace")


def pair():
    """(tokenizer, detokenizer) for chunker.make_chunk_udf — the vendored
    counterpart of chunker.tiktoken_pair(), always importable."""
    return encode, decode
