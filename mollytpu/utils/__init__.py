from . import loggers
