"""DNA handling: complement, reverse-complement, codon translation,
six-frame protein generation.

Parity targets:

* ``GENETIC_CODE`` — the engine-internal bacterial code table used by
  KmerGuts::translate for DNA inputs (/root/reference/kguts.cc:24-29);
  ambiguous codons produce ``'x'`` (offset 20) (kguts.cc:529-532).
* ``TABLE_11`` — the NCBI-style table-11 built from the 5-row raw spec
  (/root/reference/trans_table.cc:8-15,36-63); ambiguous codons produce
  ``'X'``.  Used by the FASTQ path (fq_process_request.cc:306).
* complement table — the full-IUPAC complement shared by KmerGuts::comp
  (kguts.cc:341-425) and DNASequence::complement (dna_seq.h:28-111),
  including its quirks ('s'->'S' uppercases, 'w'->'w' does not).
* ``get_possible_proteins`` — 6 frames, each split on stop codons with
  run-compression (dna_seq.cc:9-23, boost token_compress_on).
"""

from __future__ import annotations

import re

import numpy as np

# Indexed by c1*16 + c2*4 + c3 with A=0, C=1, G=2, T/U=3 (kguts.cc:24-29).
GENETIC_CODE = (
    "KNKNTTTTRSRSIIMI"
    "QHQHPPPPRRRRLLLL"
    "EDEDAAAAGGGGVVVV"
    "*Y*YSSSS*CWCLFLF"
)

# trans_table.cc:8-15 raw table-11 spec rows (Base1*16+Base2*4+Base3
# indexing, same A=0,C=1,G=2,T=3 encoding; trans_table.h:72-83).
_T11_AAS = "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG"
_T11_B1 = "TTTTTTTTTTTTTTTTCCCCCCCCCCCCCCCCAAAAAAAAAAAAAAAAGGGGGGGGGGGGGGGG"
_T11_B2 = "TTTTCCCCAAAAGGGGTTTTCCCCAAAAGGGGTTTTCCCCAAAAGGGGTTTTCCCCAAAAGGGG"
_T11_B3 = "TCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAGTCAG"

_DNA_CHAR = np.full(256, 4, dtype=np.uint8)  # kguts.cc:486-511 / trans_table.h:45-70
for _c, _v in (("aA", 0), ("cC", 1), ("gG", 2), ("tTuU", 3)):
    for _ch in _c:
        _DNA_CHAR[ord(_ch)] = _v


def _build_table(aas: str, b1: str, b2: str, b3: str) -> np.ndarray:
    tbl = np.full(65, ord("X"), dtype=np.uint8)
    for aa, c1, c2, c3 in zip(aas, b1, b2, b3):
        idx = _DNA_CHAR[ord(c1)] * 16 + _DNA_CHAR[ord(c2)] * 4 + _DNA_CHAR[ord(c3)]
        tbl[idx] = ord(aa)
    tbl[64] = ord("X")
    return tbl


TABLE_11 = _build_table(_T11_AAS, _T11_B1, _T11_B2, _T11_B3)

# KmerGuts internal table: same codon indexing, ambiguous -> 'x'
# (lowercase, kguts.cc:530).
KGUTS_TABLE = np.frombuffer(GENETIC_CODE.encode(), dtype=np.uint8).copy()
KGUTS_TABLE = np.concatenate([KGUTS_TABLE, np.array([ord("x")], dtype=np.uint8)])

# Full IUPAC complement (kguts.cc:341-425 == dna_seq.h:28-111, including
# the 's'->'S' uppercase quirk and 'w'->'w' non-quirk).
_COMP = np.arange(256, dtype=np.uint8)  # default: identity (kguts.cc:422-423)
for _src, _dst in [
    ("a", "t"), ("A", "T"), ("c", "g"), ("C", "G"), ("g", "c"), ("G", "C"),
    ("t", "a"), ("u", "a"), ("T", "A"), ("U", "A"),
    ("m", "k"), ("M", "K"), ("r", "y"), ("R", "Y"),
    ("w", "w"), ("W", "W"), ("s", "S"), ("S", "S"),
    ("y", "r"), ("Y", "R"), ("k", "m"), ("K", "M"),
    ("b", "v"), ("B", "V"), ("d", "h"), ("D", "H"),
    ("h", "d"), ("H", "D"), ("v", "b"), ("V", "B"),
    ("n", "n"), ("N", "N"),
]:
    _COMP[ord(_src)] = ord(_dst)
COMPLEMENT = _COMP


def _to_bytes(seq: str | bytes) -> np.ndarray:
    if isinstance(seq, str):
        seq = seq.encode("latin-1")
    return np.frombuffer(seq, dtype=np.uint8)


def rev_comp(seq: str | bytes) -> str:
    """Reverse complement (kguts.cc:427-436 / dna_seq.cc:39-47)."""
    b = _to_bytes(seq)
    return COMPLEMENT[b[::-1]].tobytes().decode("latin-1")


def _translate_frame(b: np.ndarray, off: int, table: np.ndarray) -> str:
    """Translate bytes from offset ``off`` in codon steps.

    Codon count = floor((len-off)/3), matching both KmerGuts::translate
    (kguts.cc:513-539: loop while start <= len-3) and
    TranslationTable::translate (trans_table.cc:65-84).
    """
    n = (len(b) - off) // 3
    if n <= 0:
        return ""
    c = b[off : off + 3 * n].reshape(n, 3)
    d = _DNA_CHAR[c]
    idx = d[:, 0] * 16 + d[:, 1] * 4 + d[:, 2]
    idx = np.where((d >= 4).any(axis=1), 64, idx)
    return table[idx].tobytes().decode("latin-1")


def translate_kguts(seq: str | bytes, off: int) -> str:
    """KmerGuts::translate parity: engine-internal code, ambiguous->'x'."""
    return _translate_frame(_to_bytes(seq), off, KGUTS_TABLE)


def translate_t11(seq: str | bytes, off: int = 0) -> str:
    """TranslationTable(11) parity: ambiguous->'X'."""
    return _translate_frame(_to_bytes(seq), off, TABLE_11)


def six_frames_kguts(seq: str | bytes) -> list[tuple[str, int, str]]:
    """The six (strand, offset, protein) translations in KmerGuts::process_seq
    order (kguts.cc:910-937): +0,+1,+2 then -0,-1,-2 on the reverse
    complement."""
    out = []
    for off in range(3):
        out.append(("+", off, translate_kguts(seq, off)))
    rc = rev_comp(seq)
    for off in range(3):
        out.append(("-", off, translate_kguts(rc, off)))
    return out


# -- digit-space fast path (no string round-trips) ----------------------
#
# The string pipeline (DNA str -> translate -> protein str ->
# seq_to_offsets) pays two latin-1 encode/decode passes per frame; at
# genome scale (30M codons across 6 frames) that is ~0.2 s/pass of pure
# conversion.  These helpers stay in uint8 digit space end-to-end and
# produce the aa OFFSET arrays the engine consumes directly.
#
# Base-5 codon table: digits are 0-3 (acgt) or 4 (ambiguous), so
# idx5 = d0*25 + d1*5 + d2 < 125 and any codon containing a 4 lands on
# an entry precomputed to the offset of 'x' (= 20, invalid) — the
# ambiguity test disappears into the table.

_DIGIT_COMP = np.array([3, 2, 1, 0, 4], dtype=np.uint8)  # a<->t, c<->g


def _codon5_offsets(table: np.ndarray) -> np.ndarray:
    from .encoder import AA_TO_OFFSET
    t = np.empty(125, dtype=np.uint8)
    for d0 in range(5):
        for d1 in range(5):
            for d2 in range(5):
                if d0 > 3 or d1 > 3 or d2 > 3:
                    idx = 64
                else:
                    idx = d0 * 16 + d1 * 4 + d2
                t[d0 * 25 + d1 * 5 + d2] = AA_TO_OFFSET[table[idx]]
    return t


_KGUTS_OFF5 = _codon5_offsets(KGUTS_TABLE)


def _frame_offsets(d: np.ndarray, off: int) -> np.ndarray:
    n = (len(d) - off) // 3
    if n <= 0:
        return np.empty(0, dtype=np.uint8)
    c = d[off:off + 3 * n].reshape(n, 3)
    return _KGUTS_OFF5[c[:, 0] * np.uint8(25) + c[:, 1] * np.uint8(5)
                       + c[:, 2]]


def six_frame_kguts_offsets(seq: str | bytes) -> list[tuple[str, int, np.ndarray]]:
    """six_frames_kguts in digit space: (strand, offset, aa-offset uint8
    array) per frame, byte-equal to seq_to_offsets(translate_kguts(...))
    (tested), ~3x faster at genome scale."""
    d = _DNA_CHAR[_to_bytes(seq)]
    dc = _DIGIT_COMP[d][::-1]
    return ([("+", off, _frame_offsets(d, off)) for off in range(3)]
            + [("-", off, _frame_offsets(dc, off)) for off in range(3)])


_T11_OFF5 = _codon5_offsets(TABLE_11)
_T11_STOP5 = np.zeros(125, dtype=bool)
for _d0 in range(4):
    for _d1 in range(4):
        for _d2 in range(4):
            _T11_STOP5[_d0 * 25 + _d1 * 5 + _d2] = \
                TABLE_11[_d0 * 16 + _d1 * 4 + _d2] == ord("*")


def _row_tokens(stops: list, n_aa: int):
    """Token (start, end) spans of re.split('\\*+') given a row's sorted
    stop positions: interior stop runs compress; leading/trailing stops
    produce empty edge tokens (dna_seq.cc:9-23, token_compress_on)."""
    spans = []
    tok_start = 0
    prev = -2
    for s in stops:
        if s != prev + 1:          # run break: close the open token
            spans.append((tok_start, s))
        tok_start = s + 1
        prev = s
    spans.append((tok_start, n_aa))
    return spans


def batch_possible_protein_orfs(seqs: list, min_len: int = 10):
    """Vectorized get_possible_proteins over a batch of DNA reads, in
    digit space (no string round-trips — the per-read regex pipeline
    costs ~17 us/read-frame, which dominates FASTQ serving).

    Returns (orfs, read_frames):
      orfs — list of uint8 aa-offset arrays, one per token with
        len > min_len, in (read, frame, token) order — feed directly to
        pad_batch;
      read_frames — per read, the 6 (frame, [(tok_len, orf_idx)])
        entries in reference frame order (1,2,3,-1,-2,-3;
        fq_process_request.cc:298-317); orf_idx is -1 for short tokens.

    Token lists match get_possible_proteins exactly (tested): interior
    stop runs compress, leading/trailing stops give empty edge tokens.
    """
    R = len(seqs)
    if R == 0:
        return [], []
    rows = [_DNA_CHAR[_to_bytes(s)] for s in seqs]
    n = np.array([len(r) for r in rows], dtype=np.int64)
    Lmax = max(int(n.max()), 3)
    d = np.full((R, Lmax), 4, dtype=np.uint8)
    for r, row in enumerate(rows):
        d[r, :len(row)] = row
    # reverse complement, vectorized over the ragged rows
    j = np.arange(Lmax, dtype=np.int64)[None, :]
    src = n[:, None] - 1 - j
    rc = np.where(src >= 0,
                  _DIGIT_COMP[d[np.arange(R)[:, None],
                                np.clip(src, 0, Lmax - 1)]],
                  np.uint8(4))

    frames = []  # (frame, off_mat [R, W], per-row stop lists, n_aa [R])
    for sign, mat in ((1, d), (-1, rc)):
        for off in range(3):
            W = (Lmax - off) // 3
            if W <= 0:
                W = 0
            c = mat[:, off:off + 3 * W]
            idx5 = (c[:, 0::3] * np.uint8(25) + c[:, 1::3] * np.uint8(5)
                    + c[:, 2::3]) if W else np.zeros((R, 0), np.uint8)
            # one global nonzero per frame instead of one per row (pad
            # digits are 4, so positions beyond a read's n_aa are never
            # stops and need no clipping)
            srows, scols = np.nonzero(_T11_STOP5[idx5])
            row_ptr = np.searchsorted(srows, np.arange(R + 1))
            scols = scols.tolist()
            frames.append((sign * (off + 1), _T11_OFF5[idx5],
                           (row_ptr, scols),
                           np.maximum((n - off) // 3, 0)))

    orfs: list[np.ndarray] = []
    read_frames = []
    for r in range(R):
        per_read = []
        for frame, off_mat, (row_ptr, scols), n_aa in frames:
            toks = []
            stops = scols[row_ptr[r]:row_ptr[r + 1]]
            for a, b in _row_tokens(stops, int(n_aa[r])):
                ln = b - a
                if ln > min_len:
                    toks.append((ln, len(orfs)))
                    orfs.append(off_mat[r, a:b])
                else:
                    toks.append((ln, -1))
            per_read.append((frame, toks))
        read_frames.append(per_read)
    return orfs, read_frames


def get_possible_proteins(seq: str | bytes) -> list[tuple[int, list[str]]]:
    """DNASequence::get_possible_proteins parity (dna_seq.cc:9-23): frames
    1,2,3,-1,-2,-3 translated with table 11, each split on runs of '*'
    (boost token_compress_on keeps leading/trailing empty tokens)."""
    b = _to_bytes(seq)
    rc = _to_bytes(rev_comp(seq))
    out = []
    for frame in (1, 2, 3, -1, -2, -3):
        src = rc if frame < 0 else b
        p = _translate_frame(src, abs(frame) - 1, TABLE_11)
        out.append((frame, re.split(r"\*+", p)))
    return out
