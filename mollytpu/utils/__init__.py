from . import analysis, checkpoint, loggers, trajectory
