from .dust import ParticlesDust
from .interp import deposit, interpolate
