from . import calc, read, sim, visu
from .sim import Simulation, get_sim, simulations
