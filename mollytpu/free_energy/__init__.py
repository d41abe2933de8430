from . import alchemy
