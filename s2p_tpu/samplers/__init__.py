from s2p_tpu.samplers.agents import PolicyAgent, SlacObservation
from s2p_tpu.samplers.rollout import rollout
from s2p_tpu.samplers.path_collector import MdpPathCollector

__all__ = ["PolicyAgent", "SlacObservation", "rollout", "MdpPathCollector"]
