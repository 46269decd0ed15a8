from .coagulation import ParticlesCoagulation
from .dust import ParticlesDust
from .sink import ParticlesSink
from .interp import deposit, interpolate
