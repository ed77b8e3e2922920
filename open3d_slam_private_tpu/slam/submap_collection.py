"""Submap lifecycle management (host-side control, device-side banks).

Analogue of the reference ``SubmapCollection`` (``SubmapCollection.cpp``):
submap creation/activation by robot proximity (``:94-148``), scan insertion
with an overlap transition region (``:189-245``), finished-submap queue
feeding feature computation and loop-closure candidate search, pose-graph
update application (``:322-373``), and the ``AdjacencyMatrix``
(``AdjacencyMatrix.hpp``) with BFS distances.

The collection itself is cheap host bookkeeping; each submap's point bank
lives on device (``slam.submap.SubmapState``).
"""

from __future__ import annotations

import dataclasses
from collections import deque
from typing import Dict, List, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from open3d_slam_private_tpu.ops import pointcloud as pc
from open3d_slam_private_tpu.slam import submap as submap_mod


class AdjacencyMatrix:
    """Undirected submap adjacency + BFS hop distance
    (≙ ``AdjacencyMatrix.hpp:16-35``)."""

    def __init__(self):
        self._adj: Dict[int, Set[int]] = {}

    def add_edge(self, i: int, j: int) -> None:
        self._adj.setdefault(i, set()).add(j)
        self._adj.setdefault(j, set()).add(i)

    def is_adjacent(self, i: int, j: int) -> bool:
        return j in self._adj.get(i, set())

    def distance(self, src: int, dst: int) -> int:
        """BFS hop count; large sentinel if disconnected."""
        if src == dst:
            return 0
        seen = {src}
        frontier = deque([(src, 0)])
        while frontier:
            node, d = frontier.popleft()
            for nb in self._adj.get(node, ()):
                if nb == dst:
                    return d + 1
                if nb not in seen:
                    seen.add(nb)
                    frontier.append((nb, d + 1))
        return 1 << 30


@dataclasses.dataclass
class SubmapEntry:
    state: submap_mod.SubmapState
    anchor: np.ndarray  # [4, 4] creation pose (map frame)
    parent: Optional[int]
    finished: bool = False


@dataclasses.dataclass(frozen=True)
class SubmapCollectionConfig:
    """≙ ``SubmapParameters`` (radius, max points, adjacency-based switching)."""

    submap_capacity: int = 131072
    submap_voxel_size: float = 0.15
    submap_crop_radius: float = 50.0
    creation_radius: float = 20.0  # create a new submap beyond this distance
    activation_radius: float = 22.0  # switch to an existing submap within
    min_scans_before_switch: int = 5


class SubmapCollection:
    """Owns the submaps; mirrors the reference's insert/activate/finish flow."""

    def __init__(self, cfg: Optional[SubmapCollectionConfig] = None):
        self.cfg = cfg or SubmapCollectionConfig()
        self.submaps: List[SubmapEntry] = []
        self.adjacency = AdjacencyMatrix()
        self.active_idx: int = -1
        self.finished_queue: List[int] = []
        self._scans_in_active = 0

    def __len__(self) -> int:
        return len(self.submaps)

    @property
    def active(self) -> SubmapEntry:
        return self.submaps[self.active_idx]

    def _create_submap(self, pose: np.ndarray, parent: Optional[int]) -> int:
        entry = SubmapEntry(
            state=submap_mod.create(self.cfg.submap_capacity),
            anchor=np.asarray(pose, np.float64).copy(),
            parent=parent,
        )
        self.submaps.append(entry)
        idx = len(self.submaps) - 1
        if parent is not None:
            self.adjacency.add_edge(parent, idx)
        return idx

    def update_active_submap(self, robot_pose: np.ndarray) -> Tuple[int, bool]:
        """(≙ ``updateActiveSubmap``, ``SubmapCollection.cpp:94-148``):
        pick/create the active submap for the current robot pose. Returns
        (active index, switched)."""
        cfg = self.cfg
        if not self.submaps:
            self.active_idx = self._create_submap(robot_pose, None)
            self._scans_in_active = 0
            return self.active_idx, True

        pos = np.asarray(robot_pose)[:3, 3]
        cur = self.active_idx
        d_cur = np.linalg.norm(self.submaps[cur].anchor[:3, 3] - pos)
        if d_cur <= cfg.creation_radius or self._scans_in_active < cfg.min_scans_before_switch:
            return cur, False

        # Closest existing submap (proximity activation).
        dists = [np.linalg.norm(e.anchor[:3, 3] - pos) for e in self.submaps]
        best = int(np.argmin(dists))
        if dists[best] <= cfg.activation_radius and best != cur:
            self._finish(cur)
            self.adjacency.add_edge(cur, best)
            self.active_idx = best
            self._scans_in_active = 0
            return best, True

        # Nothing close: spawn a new submap anchored at the robot.
        self._finish(cur)
        self.active_idx = self._create_submap(robot_pose, cur)
        self._scans_in_active = 0
        return self.active_idx, True

    def _finish(self, idx: int) -> None:
        e = self.submaps[idx]
        if not e.finished:
            e.finished = True
            self.finished_queue.append(idx)

    def insert_scan(
        self, scan: pc.PointBatch, T_map_scan: np.ndarray, robot_pose: np.ndarray
    ) -> Tuple[int, bool]:
        """Insert into the active submap, handling activation/creation."""
        idx, switched = self.update_active_submap(robot_pose)
        e = self.submaps[idx]
        e.state = submap_mod.insert_scan(
            e.state,
            scan,
            jnp.asarray(T_map_scan, jnp.float32),
            self.cfg.submap_voxel_size,
            self.cfg.submap_crop_radius,
        )
        self._scans_in_active += 1
        return idx, switched

    def pop_finished(self) -> Optional[int]:
        return self.finished_queue.pop(0) if self.finished_queue else None

    def apply_pose_updates(self, increments: Dict[int, np.ndarray]) -> None:
        """Rigidly move submaps by optimized increments; un-optimized
        submaps inherit their parent's increment
        (≙ ``SubmapCollection::transform`` parent-chain propagation,
        ``SubmapCollection.cpp:322-373``)."""
        resolved: Dict[int, np.ndarray] = {}

        def resolve(i: int) -> np.ndarray:
            if i in resolved:
                return resolved[i]
            if i in increments:
                resolved[i] = np.asarray(increments[i], np.float64)
            elif self.submaps[i].parent is not None:
                resolved[i] = resolve(self.submaps[i].parent)
            else:
                resolved[i] = np.eye(4)
            return resolved[i]

        for i, e in enumerate(self.submaps):
            T = resolve(i)
            if not np.allclose(T, np.eye(4), atol=1e-9):
                e.state = submap_mod.transform_submap(e.state, jnp.asarray(T, jnp.float32))
                e.anchor = T @ e.anchor

    def map_points(self, max_per_submap: Optional[int] = None) -> np.ndarray:
        """Assembled map (all submaps concatenated, host numpy)."""
        outs = []
        for e in self.submaps:
            m = np.asarray(e.state.cloud.mask)
            pts = np.asarray(e.state.cloud.xyz)[m]
            if max_per_submap is not None and len(pts) > max_per_submap:
                pts = pts[:: len(pts) // max_per_submap + 1]
            outs.append(pts)
        return np.concatenate(outs, axis=0) if outs else np.zeros((0, 3), np.float32)
