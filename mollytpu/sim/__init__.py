from . import coupling, integrators, simulate
