from . import bonded, cutoffs, general, mixing, neighbors, nonbonded, pairwise
