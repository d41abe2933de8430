"""Unit system for mollytpu.

The reference (Molly.jl) threads Unitful quantities through every kernel
(/root/reference/src/units.jl). That approach does not fit XLA: traced arrays
must be plain numeric. We instead fix an *internal* unit system — the same one
Molly defaults to — and keep all device arrays unitless in these units:

    length       nm
    time         ps
    mass         u  (g/mol)
    energy       kJ/mol
    charge       e  (proton charge)
    temperature  K

These are consistent: 1 kJ/mol == 1 u nm^2 / ps^2, so acceleration = force/mass
needs no conversion factor. A thin conversion layer at the API edge handles
other unit systems (Molly's ``NoUnits`` mode is the precedent; see
/root/reference/benchmark/protein.jl which runs fastest with units stripped).
"""

from __future__ import annotations

# Boltzmann constant in kJ/(mol*K) — molar form, matches Molly's default_k
# (/root/reference/src/units.jl:186).
BOLTZMANN = 0.008314462618153239  # kJ/(mol*K)
# Alias used throughout.
KB = BOLTZMANN

# Coulomb constant 1/(4 pi eps0) in kJ*nm/(mol*e^2)
# (matches Molly's coulomb_const, /root/reference/src/interactions/coulomb.jl).
COULOMB_CONST = 138.93545764438198

# Avogadro constant (1/mol).
AVOGADRO = 6.02214076e23

# Atmospheric pressure in internal pressure units kJ/(mol*nm^3):
# 1 bar = 1e5 Pa = 1e5 J/m^3 = 1e5 * 1e-27 J/nm^3 * NA / 1000 kJ/mol/nm^3
BAR = 0.06022140760000001  # kJ/(mol*nm^3)
ATM = 1.01325 * BAR

# Common conversions into internal units.
ANGSTROM = 0.1          # nm
FEMTOSECOND = 1e-3      # ps
NANOSECOND = 1e3        # ps
KCAL = 4.184            # kJ
EV = 96.48533212331001  # kJ/mol per eV (per particle)

# Speed of light in nm/ps (for spectroscopy-adjacent helpers).
SPEED_OF_LIGHT = 299792.458 * 1e-3  # nm/ps


def kelvin_to_energy(temp):
    """k_B * T in kJ/mol."""
    return KB * temp


# -- API-edge unit conversion / checking -------------------------------------
#
# The reference accepts Unitful quantities at its API edge and converts (or
# errors) there (src/units.jl). The TPU-native equivalent: values entering
# the framework are converted ONCE, host-side, by name — `to_internal(2.0,
# "fs")` — with unknown or dimensionally inconsistent unit strings raising
# immediately. Device arrays stay raw floats in internal units.

#: unit string -> factor converting INTO the internal unit of its dimension.
#: Aliases included (Å, amu, kcal/mol/A, ...). All factors are exact or
#: CODATA-2018 derived.
UNITS = {
    # length -> nm
    "nm": 1.0, "angstrom": ANGSTROM, "Å": ANGSTROM, "A": ANGSTROM,
    "pm": 1e-3, "um": 1e3, "m": 1e9,
    # time -> ps
    "ps": 1.0, "fs": FEMTOSECOND, "ns": NANOSECOND, "us": 1e6, "s": 1e12,
    # mass -> u
    "u": 1.0, "amu": 1.0, "g/mol": 1.0, "kg": AVOGADRO * 1e3,
    # energy -> kJ/mol
    "kJ/mol": 1.0, "kj/mol": 1.0, "kcal/mol": KCAL, "J/mol": 1e-3,
    "eV": EV, "ev": EV, "hartree": 2625.4996394798254,
    # charge -> e
    "e": 1.0, "C": 6.241509074460763e18,
    # temperature -> K
    "K": 1.0,
    # pressure -> kJ/(mol*nm^3)
    "bar": BAR, "atm": ATM, "Pa": BAR * 1e-5, "kPa": BAR * 1e-2,
    "MPa": BAR * 10.0, "kJ/mol/nm^3": 1.0,
    # force -> kJ/(mol*nm)
    "kJ/mol/nm": 1.0, "kcal/mol/angstrom": KCAL / ANGSTROM,
    "kcal/mol/A": KCAL / ANGSTROM,
    # spring constant -> kJ/(mol*nm^2)
    "kJ/mol/nm^2": 1.0, "kcal/mol/angstrom^2": KCAL / ANGSTROM ** 2,
    "kcal/mol/A^2": KCAL / ANGSTROM ** 2,
    # velocity -> nm/ps
    "nm/ps": 1.0, "angstrom/fs": ANGSTROM / FEMTOSECOND, "m/s": 1e-3,
    # angle -> rad
    "rad": 1.0, "deg": 0.017453292519943295,
    # frequency / rate -> 1/ps
    "1/ps": 1.0, "THz": 1.0, "1/fs": 1e3, "1/ns": 1e-3, "1/s": 1e-12,
}


def to_internal(value, unit):
    """Convert `value` expressed in `unit` into internal units. Raises
    ValueError for unknown unit strings — the API-edge unit check."""
    try:
        return value * UNITS[unit]
    except KeyError:
        raise ValueError(
            f"unknown unit {unit!r}; known units: {sorted(UNITS)}") from None


def from_internal(value, unit):
    """Convert an internal-units `value` into `unit` (for output/interop)."""
    try:
        return value / UNITS[unit]
    except KeyError:
        raise ValueError(
            f"unknown unit {unit!r}; known units: {sorted(UNITS)}") from None


def parse(text):
    """Parse a "<number> <unit>" string ("2.5 fs", "300 K", "1.2kcal/mol")
    into internal units. The Unitful-at-the-edge analogue for config files
    and CLI surfaces."""
    import re
    m = re.fullmatch(r"\s*([-+0-9.eE]+)\s*(\S+)\s*", text)
    if not m:
        raise ValueError(f"can't parse quantity {text!r}; "
                         "expected '<number> <unit>'")
    return to_internal(float(m.group(1)), m.group(2))


def ps_per_step_to_ns_per_day(dt_ps, seconds_per_step):
    """Throughput helper: simulated ns/day given wall seconds per MD step."""
    steps_per_day = 86400.0 / seconds_per_step
    return steps_per_day * dt_ps * 1e-3
