from . import replicas
