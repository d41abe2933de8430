"""mollytpu — a TPU-native molecular dynamics framework.

From-scratch re-design of the capabilities of Molly.jl (reference mounted at
/root/reference) for TPU hardware: JAX + Pallas compute path, immutable pytree
state, fully jit-compiled scan-based stepping, sharded replica parallelism.
See SURVEY.md for the reference structural analysis this build tracks.
"""

import os as _os

import jax as _jax

# Matmul precision default: on TPU, unannotated matmuls/einsums run on the
# MXU in bf16 — which silently corrupts PHYSICS (measured: the PME
# fractional-coordinate matmul alone produced 166 kJ/mol/nm force errors on
# chip; pressure tensors and triclinic culling have the same hazard). The
# audited hot contractions request their precision explicitly; everything
# else defaults to full f32. Override with MOLLYTPU_MATMUL_PRECISION
# (highest|high|default) before import.
_prec = _os.environ.get("MOLLYTPU_MATMUL_PRECISION", "highest")
if _prec in ("highest", "high"):
    _jax.config.update("jax_default_matmul_precision", _prec)

from . import units
from .config import report_issue, strictness, describe_env, ENV_FLAGS
from .atoms import Atoms, AtomData, make_atoms, ALCH_CORE, ALCH_INSERT, ALCH_DELETE
from .boundary import (
    Orthorhombic, Triclinic, cubic, rectangular, triclinic_from_lengths_angles,
    place_atoms, place_diatomics, random_coords, distance, sq_distance,
)
from .spatial import (
    random_velocity, random_velocities, kinetic_energy, kinetic_energy_tensor,
    temperature, remove_cm_motion, pressure_tensor, scalar_pressure,
    scale_coords, n_dof, unwrap_molecules,
)
from .system import System, Exclusions, molecule_ids_from_bonds
from .forces import (
    potential_energy, forces, forces_virial, accelerations, total_energy,
)
from .ops.cutoffs import (
    NoCutoff, DistanceCutoff, ShiftedPotentialCutoff, ShiftedForceCutoff,
    CubicSplineCutoff, PolynomialCutoff,
)
from .ops.mixing import (
    LorentzMixing, GeometricMixing, WaldmanHaglerMixing, FenderHalseyMixing,
    InverseMixing, MinimumMixing, MixingException, ExceptionTable,
)
from .ops.pairwise import (
    LennardJones, LennardJonesSoftCoreBeutler, LennardJonesSoftCoreGapsys,
    AshbaughHatch, SoftSphere, Mie, Buckingham, DoubleExponential,
    DoubleExponentialSoftCore, Gravity, Coulomb, CoulombScaled,
    CoulombReactionField, CoulombReactionFieldScaled, CoulombSoftCoreBeutler,
    CoulombSoftCoreGapsys, CoulombEwald, CoulombEwaldScaled,
    CoulombSoftCoreBeutlerEwald, CoulombSoftCoreGapsysEwald,
    CoulombSoftCoreBeutlerReactionField, CoulombSoftCoreGapsysReactionField,
    Yukawa, DPDInteraction,
)
from .ops.bonded import (
    SpecificList, harmonic_bonds, morse_bonds, fene_bonds, harmonic_angles,
    cosine_angles, urey_bradleys, periodic_torsions, rb_torsions,
    harmonic_torsions, position_restraints, specific_energy, specific_forces,
    all_specific_forces,
)
from .ops.general import GeneralInteraction, MullerBrown, LJDispersionCorrection
from .ops.neighbors import (
    Neighbors, NoNeighborFinder, DistanceNeighborFinder, CellListNeighborFinder,
    find_neighbors,
)
from .ops.celltiles import CellTileFinder, CellTiles
from .sim.integrators import (
    VelocityVerlet, Verlet, StormerVerlet, Langevin, LangevinSplitting,
    OverdampedLangevin, NoseHoover, DPDVelocityVerlet, MTSIntegrator,
    MTSLangevinIntegrator,
)
from .sim.coupling import (
    ImmediateThermostat, VelocityRescaleThermostat, AndersenThermostat,
    BerendsenThermostat, BerendsenBarostat, MonteCarloBarostat, CRescaleBarostat,
)
from .sim.minimize import SteepestDescentMinimizer
from .sim.mc import (
    MetropolisMonteCarlo, random_uniform_translation, random_normal_translation,
)
from .sim.remd import ReplicaExchangeMD, HamiltonianReplicaExchangeMD
from .interop import ExternalCalculator, Calculator
from .models.setup import add_position_restraints, crystal_system
from .ops.constraints import SHAKERattle, angle_constraint
from .ops.lincs import LINCS
from .sim.simulate import simulate
from .sim.simulate import simulate_differentiable
from .free_energy.mbar import (
    MBARInput, assemble_mbar_inputs, iterate_mbar, mbar_weights, mbar_pmf,
    pmf_with_uncertainty, free_energy_differences, PMF,
)
from .free_energy.stats import (
    statistical_inefficiency, subsample_indices, effective_sample_size,
)
from .free_energy.cv import (
    CalcSingleDist, CalcDist, CalcMinDist, CalcMaxDist, CalcCMDist, CalcRg,
    CalcRMSD, CalcTorsion, cv_gradient,
)
from .free_energy.bias import (
    LinearBias, SquareBias, FlatBottomSquareBias, PeriodicFlatBottomBias,
    BiasPotential,
)
from .free_energy.thermo import (
    ThermoState, LambdaHamiltonian, AlchemicalPartition, set_lambda,
)
from .free_energy.extended_ensemble import ExtendedStateSpace, ActiveThermoState
from .free_energy.awh import (
    AWHSimulation, AWHState, AWHPMFBackend, GridBias, GridAWH, GridAWHState,
)
from .free_energy.pmf import (
    PMFGrid as PMFGridND, PMFResult, SampledPMFDeconvolutionAccumulator,
    build_log_coupling_matrix, pmf_log_bin_weights, pmf_bin_quality,
    pmf_result_from_sampled_deconvolution,
)
from .free_energy.tss import (
    TSSSimulation, TSSState, TSSLocalEstimator, TSSHistoryForgetting,
    TSSPMFDeconvolution, TSSJackknifeResult, tss_free_energies,
    tss_free_energy_uncertainties,
)
from .free_energy.tss_graph import (
    TSSWindow, TSSGraph, TSSGraphBuilder, add_tss_edge, build_tss_graph,
    tss_grid_graph, single_window_tss_graph,
)
from .free_energy.alchemy import (
    DefaultLambdaScheduler, NAMDLambdaScheduler, QuartersLambdaScheduler,
    EleScaledLambdaScheduler,
)
from .utils import analysis
from .utils.analysis import (
    displacements, distances, rmsd, radius_gyration, hydrodynamic_radius, rdf,
    dipole_moment,
)
from .utils.trajectory import TrajectoryWriter, EnsembleSystem
from .utils.visualize import visualize, render_frame
from .utils.checkpoint import save_checkpoint, load_checkpoint
from .ops.cmap import cmap_coefficients, make_cmap_list
from .ops.gbsa import ImplicitSolventOBC, ImplicitSolventGBN2, make_implicit_solvent
from .ops.ewald import Ewald, PME
from .ops.blockpairs import BlockPairFinder, BlockPairs
from .models.setup import system_from_pdb
from .models.forcefield import ForceField
from .models.gromacs import system_from_gromacs
from .utils import loggers
from .utils.loggers import (
    GeneralObservableLogger, TemperatureLogger, CoordinatesLogger,
    VelocitiesLogger, ForcesLogger, KineticEnergyLogger, PotentialEnergyLogger,
    TotalEnergyLogger, VolumeLogger, BoxLogger, DensityLogger, VirialLogger,
    ScalarVirialLogger, PressureLogger, ScalarPressureLogger,
    AverageObservableLogger, TimeCorrelationLogger, DisplacementsLogger,
    ReplicaExchangeLogger, MonteCarloLogger, autocorrelation,
)

__version__ = "0.1.0"
