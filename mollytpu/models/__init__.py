from . import forcefield, gromacs, pdb, setup
