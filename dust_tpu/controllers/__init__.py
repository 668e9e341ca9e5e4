from .disco import DiscoState, MultiDisco
from .amppi import AMPPIState, AMPPI

__all__ = ["DiscoState", "MultiDisco", "AMPPIState", "AMPPI"]
