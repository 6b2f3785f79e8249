"""propagate_names renumbering tests: identity mapping, split, join,
all-new families, and the phase-3 leftover rule."""

import os

import pytest

from close_kmers_tpu.db.propagate_names import FamData, RenumberState, GLOBAL


def write_release(tmp, name, genus, pegsyn_entries, fam_rows):
    """pegsyn_entries: list of (md5, [fids]); fam_rows: list of
    (gf, peg, function, localnum, genus)."""
    d = tmp / name
    nr = d / "data" / genus / "nr"
    nr.mkdir(parents=True)
    with open(nr / "peg.synonyms", "w") as f:
        for md5, fids in pegsyn_entries:
            rest = ";".join(f"{fid},100" for fid in fids) + ";"
            f.write(f"gnl|md5|{md5},100\t{rest}\n")
    fams = d / "fams.tsv"
    with open(fams, "w") as f:
        for gf, peg, function, lnum, gen in fam_rows:
            f.write(f"{gf}\t1\t1\t{peg}\t100\t{function}\t{lnum}\t{gen}\t{lnum}\n")
    return str(fams), str(d / "data")


def load(tmp, name, genus, pegsyn, rows):
    fams, data = write_release(tmp, name, genus, pegsyn, rows)
    fd = FamData(fams, data, "", GLOBAL)
    fd.read_pegsyn()
    fd.read_fams_file()
    return fd


def test_identity_mapping(tmp_path):
    pegsyn = [(f"md5_{i}", [f"fig|1.1.peg.{i}"]) for i in range(4)]
    old_rows = [("GFOLD1", "fig|1.1.peg.0", "fnA", "1", "G"),
                ("GFOLD1", "fig|1.1.peg.1", "fnA", "1", "G"),
                ("GFOLD2", "fig|1.1.peg.2", "fnB", "2", "G")]
    new_rows = [("GFNEW7", "fig|1.1.peg.0", "fnA", "1", "G"),
                ("GFNEW7", "fig|1.1.peg.1", "fnA", "1", "G"),
                ("GFNEW8", "fig|1.1.peg.2", "fnB", "2", "G")]
    old = load(tmp_path, "old", "G", pegsyn, old_rows)
    new = load(tmp_path, "new", "G", pegsyn, new_rows)
    rs = RenumberState(old, new)
    results = rs.run()
    assert rs.new_fam_name["GFNEW7"] == "GFOLD1"
    assert rs.new_fam_name["GFNEW8"] == "GFOLD2"
    assert "GFNEW7 NOW GFOLD1\n" in results
    assert any(r.startswith("M\tGFNEW7\tfnA\tGFOLD1") for r in results)


def test_split(tmp_path):
    # Old family with 3 members splits into two new families (2 + 1).
    pegsyn = [(f"m{i}", [f"fig|1.1.peg.{i}"]) for i in range(3)]
    old_rows = [("GFOLD1", f"fig|1.1.peg.{i}", "fn", "1", "G")
                for i in range(3)]
    new_rows = [("GFN_A", "fig|1.1.peg.0", "fn", "1", "G"),
                ("GFN_A", "fig|1.1.peg.1", "fn", "1", "G"),
                ("GFN_B", "fig|1.1.peg.2", "fn", "2", "G")]
    old = load(tmp_path, "old", "G", pegsyn, old_rows)
    new = load(tmp_path, "new", "G", pegsyn, new_rows)
    rs = RenumberState(old, new)
    results = rs.run()
    assert "SPLIT O GFOLD1 => N GFN_A GFN_B\n" in results
    assert rs.new_fam_name["GFN_A"] == "GFOLD1"   # largest keeps the name
    assert rs.new_fam_name["GFN_B"] == "NEW_1"


def test_join(tmp_path):
    # Two old families merge into one new family.
    pegsyn = [(f"m{i}", [f"fig|1.1.peg.{i}"]) for i in range(4)]
    old_rows = [("GFO_A", "fig|1.1.peg.0", "fn", "1", "G"),
                ("GFO_A", "fig|1.1.peg.1", "fn", "1", "G"),
                ("GFO_B", "fig|1.1.peg.2", "fn", "2", "G")]
    new_rows = [("GFN_J", f"fig|1.1.peg.{i}", "fn", "1", "G")
                for i in range(3)]
    old = load(tmp_path, "old", "G", pegsyn, old_rows)
    new = load(tmp_path, "new", "G", pegsyn, new_rows)
    rs = RenumberState(old, new)
    results = rs.run()
    # phase 1 can't name GFN_J (its members span two old fams -> bad>0
    # from each old fam's perspective); phase 2 joins.
    assert rs.new_fam_name["GFN_J"] == "GFO_A"    # largest contributor
    assert "JOIN GFO_A GFO_B => GFN_J\n" in results


def test_all_new_family(tmp_path):
    pegsyn_old = [("m0", ["fig|1.1.peg.0"])]
    pegsyn_new = [("m0", ["fig|1.1.peg.0"]), ("m9", ["fig|9.9.peg.9"])]
    old_rows = [("GFO", "fig|1.1.peg.0", "fn", "1", "G")]
    new_rows = [("GFN1", "fig|1.1.peg.0", "fn", "1", "G"),
                ("GFN2", "fig|9.9.peg.9", "fn2", "2", "G")]
    old = load(tmp_path, "old", "G", pegsyn_old, old_rows)
    new = load(tmp_path, "new", "G", pegsyn_new, new_rows)
    rs = RenumberState(old, new)
    rs.run()
    assert rs.new_fam_name["GFN1"] == "GFO"
    # GFN2's only member doesn't exist in the old release -> NEW_n id
    assert rs.new_fam_name["GFN2"].startswith("NEW_")


def test_local_family_keying(tmp_path):
    from close_kmers_tpu.db.propagate_names import LOCAL
    pegsyn = [("m0", ["fig|1.1.peg.0"])]
    rows = [("GF1", "fig|1.1.peg.0", "fn", "42", "Bacillus")]
    fams, data = write_release(tmp_path, "x", "Bacillus", pegsyn, rows)
    fd = FamData(fams, data, "", LOCAL)
    fd.read_pegsyn()
    fd.read_fams_file()
    assert "Bacillus.42" in fd.fam_to_md5s
