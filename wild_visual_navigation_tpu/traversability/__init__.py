from .estimator import TraversabilityEstimator
from .graphs import BaseGraph, DistanceWindowGraph, MaxElementsGraph, TemporalWindowGraph
from .mission_buffer import MissionBuffer, buffer_init, buffer_insert
from .nodes import BaseNode, MissionNode, SupervisionNode, TwistNode
