"""Parity vs the COMPILED reference engine (kguts.cc built verbatim).

These tests compile /root/reference's engine core behind the boost shim
in scripts/ref_harness/ and assert byte equality of the oracle's
PROTEIN-ID/HIT/CALL/OTU-COUNTS/BEST-CALL stream against the real binary
— closing the loop that every other parity test bottoms out in the
hand-written oracle.  Skipped when the reference tree or a C++ toolchain
is unavailable.
"""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import ref_parity  # noqa: E402

_HAVE_REF = os.path.isdir(ref_parity.REFERENCE) and shutil.which("g++")

pytestmark = pytest.mark.skipif(
    not _HAVE_REF, reason="reference sources or g++ unavailable")


@pytest.fixture(scope="module")
def harness():
    return ref_parity.build_harness()


def test_golden_corpus_matches_reference(harness):
    assert ref_parity.golden_round()


@pytest.mark.parametrize("seed", [11, 12])
def test_fuzzed_protein_rounds_match_reference(harness, seed):
    assert ref_parity.fuzz_round(seed, dna=False)


def test_fuzzed_dna_round_matches_reference(harness):
    assert ref_parity.fuzz_round(13, dna=True)


@pytest.fixture(scope="module")
def family_harness():
    return ref_parity.build_family_harness()


@pytest.mark.parametrize("seed", [1000, 1001, 1002])
def test_family_rounds_match_reference(family_harness, seed):
    """Family scoring (kmer.cc + family_mapper.cc compiled verbatim
    against oneTBB): load_families + NR preload + find_best_family_match
    + find_all_matches vs core.family over fuzzed universes."""
    assert ref_parity.family_fuzz_round(seed)
