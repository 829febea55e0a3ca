from s2p_tpu.samplers.agents import PolicyAgent, RandomAgent, SlacObservation
from s2p_tpu.samplers.rollout import rollout
from s2p_tpu.samplers.path_collector import MdpPathCollector
from s2p_tpu.samplers.step_collector import MdpStepCollector
from s2p_tpu.samplers.extra_collectors import (
    GoalConditionedPathCollector,
    InPlacePathSampler,
    ObsDictPathCollector,
)

__all__ = [
    "PolicyAgent",
    "RandomAgent",
    "SlacObservation",
    "rollout",
    "MdpPathCollector",
    "MdpStepCollector",
    "GoalConditionedPathCollector",
    "InPlacePathSampler",
    "ObsDictPathCollector",
]
