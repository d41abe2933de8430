from . import forcefield, pdb, setup
