"""FASTA/FASTQ parser parity tests (/root/reference/fasta_parser.h,
fastq_parser.h state machines)."""

from close_kmers_tpu.io.fasta import (FastaParser, FastqParser,
                                      parse_fasta_bytes, parse_fastq_bytes)


def test_basic_fasta():
    recs = parse_fasta_bytes(">a\nMKLV\nINGK\n>b desc here\nACDE\n")
    assert recs == [("a", "", "MKLVINGK"), ("b", " desc here", "ACDE")]


def test_fasta_defline_keeps_separator():
    # fasta_parser.h:64-68: the blank lands in the defline.
    recs = parse_fasta_bytes(">x\tdef\nAA\n")
    assert recs == [("x", "\tdef", "AA")]


def test_fasta_crlf():
    recs = parse_fasta_bytes(">a\r\nMK\r\nLV\r\n")
    assert recs == [("a", "", "MKLV")]


def test_fasta_star_allowed_mid_data():
    recs = parse_fasta_bytes(">a\nMK*LV\n")
    assert recs == [("a", "", "MK*LV")]


def test_fasta_star_dropped_at_line_start():
    # s_id_or_data accepts only letters (fasta_parser.h:109-133): a '*'
    # opening a continuation line is dropped.
    recs = parse_fasta_bytes(">a\nMKLV\n*AC\n")
    assert recs == [("a", "", "MKLVAC")]
    # ...but '*' later in that same line is kept.
    recs = parse_fasta_bytes(">a\nMKLV\n*A*C\n")
    assert recs == [("a", "", "MKLVA*C")]


def test_fasta_bad_chars_skipped():
    errors = []
    p = FastaParser(on_seq=lambda i, s: None,
                    on_error=lambda m, l, i: (errors.append((m, l)), True)[1])
    out = []
    p.on_seq = lambda i, s: out.append((i, s))
    p.parse_chunk(">a\nMK1LV\n")
    p.parse_complete()
    assert out == [("a", "MKLV")]
    assert errors and "Bad data character" in errors[0][0]


def test_fasta_chunked_feeding():
    data = ">abc def\nMKLVINGK\nACDE\n>xy\nWWWW\n"
    for cut in range(1, len(data)):
        p1, p2 = data[:cut], data[cut:]
        out = []
        p = FastaParser(on_seq=lambda i, s: out.append((i, s)))
        p.parse_chunk(p1)
        p.parse_chunk(p2)
        p.parse_complete()
        assert [r for r in out if r[0]] == \
            [("abc", "MKLVINGKACDE"), ("xy", "WWWW")], cut


def test_fasta_final_record_without_newline():
    recs = parse_fasta_bytes(">a\nMKLV")
    assert recs == [("a", "", "MKLV")]


def test_basic_fastq():
    recs = parse_fastq_bytes("@r1\nACGT\n+\nIIII\n@r2 d\nGGTT\n+x\n!!!!\n")
    assert recs == [("r1", "ACGT"), ("r2", "GGTT")]


def test_fastq_qual_discarded_and_at_in_qual_ok():
    # Quality line may contain '@' (it's consumed as qual, not a header).
    recs = parse_fastq_bytes("@r1\nACGT\n+\n@@@@\n@r2\nTTTT\n+\nIIII\n")
    assert recs == [("r1", "ACGT"), ("r2", "TTTT")]


def test_fastq_fasta_confusion_error():
    errs = []
    p = FastqParser(on_seq=lambda i, s: None,
                    on_error=lambda m, l, i: (errs.append(m), True)[1])
    p.parse_chunk(">a\nACGT\n")
    assert errs and "fasta file" in errs[0]
