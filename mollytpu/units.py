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


def ps_per_step_to_ns_per_day(dt_ps, seconds_per_step):
    """Throughput helper: simulated ns/day given wall seconds per MD step."""
    steps_per_day = 86400.0 / seconds_per_step
    return steps_per_day * dt_ps * 1e-3
