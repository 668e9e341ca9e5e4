from .mesh import (
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    scenario_sharding,
)
from .rollout import make_sharded_disco_forward
from .stein import ShardedMPF, make_sharded_svgd_phi
from .svmpc_sharded import ShardedSVMPC
from .sweep import (
    MegakernelGroupSweep,
    ParticleScenarioSweep,
    ScenarioSweep,
    broadcast_scenarios,
)

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "replicated_sharding",
    "scenario_sharding",
    "make_sharded_disco_forward",
    "ShardedMPF",
    "make_sharded_svgd_phi",
    "ShardedSVMPC",
    "MegakernelGroupSweep",
    "ParticleScenarioSweep",
    "ScenarioSweep",
    "broadcast_scenarios",
]
