"""Encoder parity tests vs the reference semantics
(/root/reference/kmer_encoder.h, kguts.cc:273-339,438-483)."""

import numpy as np
import pytest

from close_kmers_tpu.params import CORE, HI_CARD, K, LO_CARD, MAX_ENCODED
from close_kmers_tpu.ops import encoder as E


def ref_encode(kmer: str):
    """Independent scalar re-statement of encoded_aa_kmer."""
    code = 0
    for c in kmer:
        off = E.PROT_ALPHA.index(c) if c in E.PROT_ALPHA else 20
        if off >= 20:
            return MAX_ENCODED + 1
        code = code * 20 + off
    return code


def test_alphabet_offsets():
    # kguts.cc:273-339: exactly the 20 uppercase letters map below 20.
    for i, c in enumerate("ACDEFGHIKLMNPQRSTVWY"):
        assert E.AA_TO_OFFSET[ord(c)] == i
    for c in "acdefghiklmnpqrstvwyXxZz*-123 \n":
        assert E.AA_TO_OFFSET[ord(c)] == 20


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(200):
        kmer = "".join(rng.choice(list(E.PROT_ALPHA), size=K))
        code = E.encode_aa_kmer(kmer)
        assert code == ref_encode(kmer)
        assert code <= MAX_ENCODED
        assert E.decode_kmer(code) == kmer
        hi, lo = E.split_hi_lo(code)
        assert 0 <= hi < HI_CARD and 0 <= lo < LO_CARD
        assert int(E.join_hi_lo(hi, lo)) == code


def test_invalid_kmer_sentinel():
    assert E.encode_aa_kmer("ACDEFGHX") == MAX_ENCODED + 1
    assert E.encode_aa_kmer("acdefghi") == MAX_ENCODED + 1  # lowercase invalid


def test_rolling_reencode_identity():
    # gather_hits' rolling update (kguts.cc:862): next = (cur % CORE)*20 + aa.
    seq = "MKLVINGKTACDEFWYHH"
    off = E.seq_to_offsets(seq)
    codes = []
    for i in range(len(seq) - K + 1):
        codes.append(ref_encode(seq[i:i + K]))
    for i in range(1, len(codes)):
        assert codes[i] == (codes[i - 1] % CORE) * 20 + int(off[i + K - 1])


def test_windows_hi_lo_matches_scalar():
    rng = np.random.default_rng(1)
    chars = list(E.PROT_ALPHA) + ["X", "*"]
    seq = "".join(rng.choice(chars, size=100))
    off = E.seq_to_offsets(seq)
    hi, lo, valid = E.encode_windows_hi_lo(off)
    n = E.num_scanned_positions(len(seq))
    assert len(hi) == n == len(seq) - K
    for i in range(n):
        code = ref_encode(seq[i:i + K])
        if code > MAX_ENCODED:
            assert not valid[i]
        else:
            assert valid[i]
            assert int(hi[i]) * LO_CARD + int(lo[i]) == code


def test_short_sequences():
    for s in ["", "A", "ACDEFGH", "ACDEFGHI"]:
        off = E.seq_to_offsets(s)
        hi, lo, valid = E.encode_windows_hi_lo(off)
        # The engine never scans the final window (kguts.cc:792): an
        # 8-char sequence has zero scanned positions.
        assert len(hi) == max(0, len(s) - K)
