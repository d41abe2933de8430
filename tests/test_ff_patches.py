"""Force-field <Patches> support + XML corpus fuzz (reference:
force_field.jl:297-521 patch parsing, residues.jl:739-877 application,
test/check_ff_xml.jl corpus sweep over every shipped XML)."""

import glob
import os
import warnings
import xml.etree.ElementTree as ET

import pytest

from mollytpu.models.forcefield import ForceField

DATA = "/root/reference/data/force_fields"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


BASE_XML = """<ForceField>
 <AtomTypes>
  <Type name="tC" class="CT" element="C" mass="12.01"/>
  <Type name="tH" class="HC" element="H" mass="1.008"/>
  <Type name="tO" class="OH" element="O" mass="16.0"/>
  <Type name="tHO" class="HO" element="H" mass="1.008"/>
 </AtomTypes>
 <Residues>
  <Residue name="MEO">
   <Atom name="C" type="tC" charge="0.1"/>
   <Atom name="H1" type="tH" charge="0.0"/>
   <Atom name="H2" type="tH" charge="0.0"/>
   <Atom name="H3" type="tH" charge="0.0"/>
   <Atom name="O" type="tO" charge="-0.5"/>
   <Atom name="HO" type="tHO" charge="0.4"/>
   <Bond atomName1="C" atomName2="H1"/>
   <Bond atomName1="C" atomName2="H2"/>
   <Bond atomName1="C" atomName2="H3"/>
   <Bond atomName1="C" atomName2="O"/>
   <Bond atomName1="O" atomName2="HO"/>
   <AllowPatch name="DEPROT"/>
  </Residue>
 </Residues>
 <Patches>
  <Patch name="DEPROT">
   <RemoveAtom name="HO"/>
   <RemoveBond atomName1="O" atomName2="HO"/>
   <ChangeAtom name="O" type="tO" charge="-0.9"/>
  </Patch>
  <Patch name="LINK">
   <AddExternalBond atomName="C"/>
   <ApplyToResidue name="MEO"/>
  </Patch>
  <Patch name="ADDH">
   <AddAtom name="HX" type="tH" charge="0.05"/>
   <AddBond atomName1="C" atomName2="HX"/>
   <ApplyToResidue name="MEO"/>
  </Patch>
  <Patch name="BAD">
   <RemoveAtom name="NOPE"/>
   <ApplyToResidue name="MEO"/>
  </Patch>
  <Patch name="MULTI" residues="2">
   <RemoveAtom name="HO"/>
  </Patch>
 </Patches>
</ForceField>
"""


@pytest.fixture()
def ff(tmp_path):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return ForceField(_write(tmp_path, "base.xml", BASE_XML))


def test_patch_parsing(ff):
    assert set(ff.patches) == {"DEPROT", "LINK", "ADDH", "BAD"}
    p = ff.patches["DEPROT"]
    assert p.remove_atoms == ["HO"]
    assert p.remove_bonds == [("O", "HO")]
    assert p.change_atoms == [("O", "tO", -0.9)]
    assert ff.residues["MEO"].allowed_patches == ["DEPROT"]
    # multi-residue patch skipped with a warning
    assert "MULTI" not in ff.patches


def test_patched_variants_generated(ff):
    # AllowPatch + two ApplyToResidue patches; BAD fails and is skipped
    assert "MEO_DEPROT" in ff.residues
    assert "MEO_LINK" in ff.residues
    assert "MEO_ADDH" in ff.residues
    assert "MEO_BAD" not in ff.residues

    dep = ff.residues["MEO_DEPROT"]
    assert [a.name for a in dep.atoms] == ["C", "H1", "H2", "H3", "O"]
    o_idx = 4
    assert dep.atoms[o_idx].charge == -0.9
    assert all(o_idx in b or max(b) < o_idx for b in dep.bonds)
    assert len(dep.bonds) == 4           # O-HO bond removed

    link = ff.residues["MEO_LINK"]
    assert link.external == [0]          # C gained an external bond

    addh = ff.residues["MEO_ADDH"]
    assert [a.name for a in addh.atoms][-1] == "HX"
    assert (0, 6) in addh.bonds or (6, 0) in addh.bonds


def test_patched_template_matches_by_nameset(ff):
    # a residue missing HO with the extra charge state resolves to the
    # patched template through the ordinary name-set matcher
    t = ff.find_template("MEO", ["C", "H1", "H2", "H3", "O"])
    assert t.name == "MEO_DEPROT"


def test_remove_atom_reindexes_virtual_sites(tmp_path):
    xml = """<ForceField>
 <AtomTypes>
  <Type name="tO" class="OW" element="O" mass="16.0"/>
  <Type name="tH" class="HW" element="H" mass="1.008"/>
  <Type name="tM" class="EP" element="?" mass="0.0"/>
  <Type name="tX" class="XX" element="N" mass="14.0"/>
 </AtomTypes>
 <Residues>
  <Residue name="W4">
   <Atom name="X" type="tX" charge="0.0"/>
   <Atom name="O" type="tO" charge="0.0"/>
   <Atom name="H1" type="tH" charge="0.5"/>
   <Atom name="H2" type="tH" charge="0.5"/>
   <Atom name="M" type="tM" charge="-1.0"/>
   <Bond atomName1="O" atomName2="H1"/>
   <Bond atomName1="O" atomName2="H2"/>
   <VirtualSite type="average3" siteName="M" atomName1="O" atomName2="H1"
      atomName3="H2" weight1="0.8" weight2="0.1" weight3="0.1"/>
   <AllowPatch name="DROPX"/>
  </Residue>
 </Residues>
 <Patches>
  <Patch name="DROPX">
   <RemoveAtom name="X"/>
  </Patch>
 </Patches>
</ForceField>
"""
    ff = ForceField(_write(tmp_path, "w4.xml", xml))
    w = ff.residues["W4_DROPX"]
    assert [a.name for a in w.atoms] == ["O", "H1", "H2", "M"]
    vs = w.virtual_sites[0]
    assert vs.index == 3 and vs.atoms == (0, 1, 2)
    assert w.bonds == [(0, 1), (0, 2)]


def test_ff_xml_corpus_parses():
    """Every shipped ForceField XML parses (test/check_ff_xml.jl analogue
    restricted to the offline corpus)."""
    fine, skipped = 0, 0
    for path in sorted(glob.glob(os.path.join(DATA, "*.xml"))):
        root = ET.parse(path).getroot()
        if root.tag != "ForceField":
            skipped += 1
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ForceField(path)
        fine += 1
    assert fine >= 20, (fine, skipped)
