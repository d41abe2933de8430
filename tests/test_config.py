"""Strictness levels + env-flag registry (reference:
MOLLY_STRICTNESS/report_issue, types.jl:1924-1945)."""

import warnings

import pytest

import mollytpu as mt
from mollytpu.models.forcefield import ForceField


def test_report_issue_levels(monkeypatch):
    monkeypatch.delenv("MOLLYTPU_STRICTNESS", raising=False)
    with pytest.warns(UserWarning, match="boom"):
        mt.report_issue("boom")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        mt.report_issue("quiet", "nowarn")
    with pytest.raises(ValueError, match="boom"):
        mt.report_issue("boom", "error")
    monkeypatch.setenv("MOLLYTPU_STRICTNESS", "error")
    with pytest.raises(ValueError):
        mt.report_issue("env-driven")
    with pytest.raises(ValueError, match="strictness must be"):
        mt.report_issue("x", "bogus")


def test_describe_env_lists_all_flags():
    out = mt.describe_env()
    for flag in mt.ENV_FLAGS:
        assert flag in out


def test_ff_unknown_entry_strictness(tmp_path, monkeypatch):
    xml = tmp_path / "odd.xml"
    xml.write_text("""<ForceField>
  <AtomTypes><Type name="X" class="X" element="C" mass="12.0"/></AtomTypes>
  <MadeUpForce><Entry foo="1"/></MadeUpForce>
</ForceField>""")
    monkeypatch.delenv("MOLLYTPU_STRICTNESS", raising=False)
    with pytest.warns(UserWarning, match="MadeUpForce"):
        ForceField(str(xml))
    with pytest.raises(ValueError, match="MadeUpForce"):
        ForceField(str(xml), strictness="error")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        ff = ForceField(str(xml), strictness="nowarn")
    assert "X" in ff.atom_types


def test_unsupported_virtual_site_skipped(tmp_path):
    xml = tmp_path / "vs.xml"
    xml.write_text("""<ForceField>
  <AtomTypes>
    <Type name="A" class="A" element="O" mass="16.0"/>
    <Type name="B" class="B" element="H" mass="1.0"/>
  </AtomTypes>
  <Residues>
    <Residue name="R">
      <Atom name="O" type="A"/>
      <Atom name="H" type="B"/>
      <Atom name="M" type="B"/>
      <Bond atomName1="O" atomName2="H"/>
      <VirtualSite type="fancyNewKind" siteName="M" atomName1="O"
                   atomName2="H"/>
    </Residue>
  </Residues>
</ForceField>""")
    with pytest.warns(UserWarning, match="fancyNewKind"):
        ff = ForceField(str(xml))
    assert ff.residues["R"].virtual_sites == []
    with pytest.raises(ValueError, match="fancyNewKind"):
        ForceField(str(xml), strictness="error")


def test_units_api_edge():
    from mollytpu import units
    assert units.to_internal(1.0, "kcal/mol") == pytest.approx(4.184)
    assert units.to_internal(2.0, "fs") == pytest.approx(0.002)
    assert units.parse("2.5 angstrom") == pytest.approx(0.25)
    assert units.parse("300K") == pytest.approx(300.0)
    assert units.from_internal(units.to_internal(3.2, "bar"),
                               "bar") == pytest.approx(3.2)
    # Langevin dt in fs through the edge converter
    assert units.parse("2 fs") == pytest.approx(0.002)
    with pytest.raises(ValueError, match="unknown unit"):
        units.to_internal(1.0, "furlong")
    with pytest.raises(ValueError, match="can't parse"):
        units.parse("fast")
