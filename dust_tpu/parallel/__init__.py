from .mesh import make_mesh, scenario_sharding, replicated_sharding
from .sweep import ScenarioSweep

__all__ = [
    "make_mesh",
    "scenario_sharding",
    "replicated_sharding",
    "ScenarioSweep",
]
