from .base import ModuleBase
from .density import Density
from .entropy import Entropy
from .eos import EosIdealGas, EosIonization
from .forcing import Forcing
from .gravity import Gravity
from .hydro import Hydro
from .magnetic import Magnetic
from .viscosity import Viscosity
from .shock import Shock
from .pscalar import PassiveScalar
from .shear import Shear
from .selfgravity import SelfGravity
from .hydro_kinematic import HydroKinematic
from .radiation import RadiationRay
from .temperature import TemperatureIdealGas
from .testfield import TestfieldZ
from .testflow import TestflowZ
from .border import BorderProfiles
from .cosmicray import CosmicRay
from .dustfluid import DustFluid
from .neutrals import Neutrals
from .chemistry import Chemistry
from .interstellar import Interstellar
from .smallslots import ActiveScalar, Chiral, HeatFlux, LorenzGauge, Polymer
from .initial_condition import InitialCondition
