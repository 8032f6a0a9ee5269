from .world import NavWorld
from .rollout import NavRollout, RolloutConfig
